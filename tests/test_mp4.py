"""MP4 / ISO-BMFF container: writer->reader roundtrips, box-structure
gates, stsc chunk-run expansion, largesize framing, honest codec
boundary, and the Spark frame-sampling path."""

import struct

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.raster import codec, mp4
from gis_scripts_spark.operators import multimodal as mm


def _scene(i: int, h: int = 24, w: int = 32, bands: int = 3) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [120 + 60 * np.sin((xx + 3 * i) / 9.0) + 30 * np.cos((yy + 2 * i) / 7.0 + c)
             for c in range(bands)]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


def test_roundtrip_color_psnr():
    frames = [_scene(i) for i in range(7)]  # 7 -> chunk pattern 2,3,2
    buf = mp4.mp4_encode(frames, fps=10)
    info = mp4.mp4_parse(buf)
    assert info["n_samples"] == 7
    assert (info["w"], info["h"]) == (32, 24)
    assert info["codec"] == b"jpeg"
    assert info["timescale"] == 10
    got = mp4.mp4_decode_frames(buf)
    assert len(got) == 7
    for src, dec in zip(frames, got):
        assert dec.shape == src.shape
        assert codec.psnr(src, dec) >= 40.0


def test_roundtrip_grayscale():
    frames = [_scene(i, bands=1) for i in range(4)]
    buf = mp4.mp4_encode(frames)
    got = mp4.mp4_decode_frames(buf)
    assert len(got) == 4
    for src, dec in zip(frames, got):
        assert dec.shape == src.shape
        assert codec.psnr(src, dec) >= 40.0


def test_box_structure_gates():
    buf = mp4.mp4_encode([_scene(i) for i in range(7)])
    # ftyp first, then mdat, then moov — the streaming-friendly layout
    tops = [fc for fc, _b, _e in mp4._iter_boxes(buf, 0, len(buf))]
    assert tops == [b"ftyp", b"mdat", b"moov"]
    info = mp4.mp4_parse(buf)
    # stsc expansion produced strictly increasing, non-overlapping ranges
    samples = info["samples"]
    for (o1, s1), (o2, _s2) in zip(samples, samples[1:]):
        assert o1 + s1 <= o2
    # every sample is a complete JPEG (SOI..EOI) inside the buffer
    for off, size in samples:
        assert bytes(buf[off: off + 2]) == b"\xff\xd8"
        assert bytes(buf[off + size - 2: off + size]) == b"\xff\xd9"


def test_stsc_irregular_chunking_exercised():
    buf = mp4.mp4_encode([_scene(i) for i in range(7)])
    moov = mp4._find(buf, 0, len(buf), b"moov")
    trak = mp4._find(buf, moov[0], moov[1], b"trak")
    mdia = mp4._find(buf, trak[0], trak[1], b"mdia")
    minf = mp4._find(buf, mdia[0], mdia[1], b"minf")
    stbl = mp4._find(buf, minf[0], minf[1], b"stbl")
    stsc = mp4._find(buf, stbl[0], stbl[1], b"stsc")
    n_runs, = struct.unpack_from(">I", buf, stsc[0] + 4)
    assert n_runs >= 2  # 2,3,2 pattern => at least two stsc runs
    stco = mp4._find(buf, stbl[0], stbl[1], b"stco")
    n_chunks, = struct.unpack_from(">I", buf, stco[0] + 4)
    assert n_chunks == 3


def test_largesize_box_framing():
    """size==1 + 64-bit largesize walks identically (the >4 GiB mdat
    convention). Rewrites the encoded file's mdat header in place and
    shifts stco offsets by the 8 inserted bytes."""
    buf = bytearray(mp4.mp4_encode([_scene(i) for i in range(3)]))
    boxes = list(mp4._iter_boxes(buf, 0, len(buf)))
    (fc, b, e) = boxes[1]
    assert fc == b"mdat"
    size32 = struct.unpack_from(">I", buf, b - 8)[0]
    large = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", size32 + 8)
        + bytes(buf[b:e])
    )
    out = bytearray(bytes(buf[: b - 8]) + large + bytes(buf[e:]))
    info0 = mp4.mp4_parse(bytes(buf))
    # locate stco inside the shifted file and patch each offset
    moov = mp4._find(out, 0, len(out), b"moov")
    trak = mp4._find(out, moov[0], moov[1], b"trak")
    mdia = mp4._find(out, trak[0], trak[1], b"mdia")
    minf = mp4._find(out, mdia[0], mdia[1], b"minf")
    stbl = mp4._find(out, minf[0], minf[1], b"stbl")
    stco = mp4._find(out, stbl[0], stbl[1], b"stco")
    n, = struct.unpack_from(">I", out, stco[0] + 4)
    for k in range(n):
        o, = struct.unpack_from(">I", out, stco[0] + 8 + 4 * k)
        struct.pack_into(">I", out, stco[0] + 8 + 4 * k, o + 8)
    info = mp4.mp4_parse(bytes(out))
    assert info["n_samples"] == info0["n_samples"]
    a = mp4.mp4_decode_frames(bytes(out))
    b2 = mp4.mp4_decode_frames(bytes(buf))
    for x, y in zip(a, b2):
        assert np.array_equal(x, y)


def test_intercoded_codec_raises():
    buf = bytearray(mp4.mp4_encode([_scene(0)]))
    idx = bytes(buf).find(b"jpeg", bytes(buf).find(b"stsd"))
    buf[idx: idx + 4] = b"avc1"
    assert mp4.mp4_frame_count(bytes(buf)) == 1  # structural walk still works
    with pytest.raises(NotImplementedError, match="avc1"):
        list(mp4.mp4_iter_frames(bytes(buf)))


def test_multimodal_dispatch_and_spark_sampling(spark):
    vids = []
    for k in range(4):
        frames = [_scene(k * 10 + i) for i in range(6)]
        vids.append((k, bytearray(mp4.mp4_encode(frames))))
    assert mm.video_frame_count(vids[0][1]) == 6
    df = spark.createDataFrame(pd.DataFrame(vids, columns=["video_id", "bytes"]))
    out = mm.sample_frames(df, every_k=2).toPandas()
    assert len(out) == 4 * 3  # frames 0, 2, 4 of each video
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4]
    for _, r in out.iterrows():
        img = codec.decode(bytes(r["frame_bytes"]))
        src = _scene(int(r["video_id"]) * 10 + int(r["frame_idx"]))
        assert codec.psnr(src, img) >= 40.0
