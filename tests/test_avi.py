"""AVI/MJPEG container exactness (raster/avi.py).

The container math is structural (RIFF chunk walking), so assertions are
exact: frame counts, header probes, idx1 consistency, and the raw-DIB
path roundtrips bit-for-bit. MJPG frames ride the from-scratch T.81
codec, so pixel assertions there are PSNR-gated like test_jpeg. The AVI1
abbreviated-stream convention (frames with no DHT) is pinned by asserting
the Annex-K splice reproduces bit-identical pixels vs the table-carrying
stream.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.raster import codec
from gis_scripts_spark.raster.avi import (
    _ensure_dht,
    _strip_dht,
    avi_decode_frames,
    avi_encode,
    avi_frame_count,
    avi_iter_frames,
    avi_probe_shape,
)


def _frames(n=5, h=40, w=56, bands=3, seed=3):
    # smooth low-frequency scenes (like test_jpeg's fixture) so the q92
    # MJPG roundtrip sits comfortably above the 40 dB gate; frame i is the
    # scene panned by i pixels — a plausible "video".
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0 : h + n, 0 : w + n].astype(np.float64)
    chans = [
        120 + 60 * np.sin(xx / 25.0 + rng.uniform(0, 2)) + 30 * np.cos(yy / 19.0 + c)
        for c in range(bands)
    ]
    scene = np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)
    return [np.ascontiguousarray(scene[i : i + h, i : i + w]) for i in range(n)]


class TestStructure:
    def test_count_and_probe(self):
        frames = _frames(7)
        buf = avi_encode(frames, fps=12)
        assert avi_frame_count(buf) == 7
        assert avi_probe_shape(buf) == (40, 56, 3)

    def test_riff_size_consistent(self):
        buf = avi_encode(_frames(3))
        (sz,) = struct.unpack_from("<I", buf, 4)
        assert 8 + sz == len(buf)

    def test_idx1_entries_point_at_chunks(self):
        buf = avi_encode(_frames(4))
        i = buf.rindex(b"idx1")
        (sz,) = struct.unpack_from("<I", buf, i + 4)
        assert sz == 4 * 16
        movi = buf.index(b"movi")
        for k in range(4):
            ckid, flags, off, ln = struct.unpack_from("<4sIII", buf, i + 8 + 16 * k)
            assert ckid == b"00dc"
            # offset convention: from the 'movi' fourcc to the chunk ckid
            assert buf[movi + off : movi + off + 4] == b"00dc"
            (csz,) = struct.unpack_from("<I", buf, movi + off + 4)
            assert csz == ln


class TestMJPEG:
    def test_decode_psnr(self):
        frames = _frames(4)
        dec = avi_decode_frames(avi_encode(frames, quality=92))
        assert len(dec) == 4
        for a, b in zip(frames, dec):
            assert codec.psnr(a, b) >= 40.0

    def test_iter_yields_self_contained_jpegs(self):
        buf = avi_encode(_frames(3))
        for i, fb in avi_iter_frames(buf):
            assert fb[:2] == b"\xff\xd8"
            assert b"\xff\xc4" in fb  # DHT present
            img = codec.decode(fb)  # magic sniff, no fmt hint
            assert img.shape == (40, 56, 3)

    def test_avi1_stripped_dht_decodes_identically(self):
        frames = _frames(3)
        full = avi_encode(frames, strip_dht=False)
        avi1 = avi_encode(frames, strip_dht=True)
        # the abbreviated stream really has no DHT until the splice
        raw_frames = [fb for _i, fb in _mjpg_payloads(avi1)]
        assert all(b"\xff\xc4" not in f[: f.index(b"\xff\xda")] for f in raw_frames)
        a = avi_decode_frames(full)
        b = avi_decode_frames(avi1)
        for x, y in zip(a, b):
            # Annex K tables are the encoder's tables -> identical pixels
            assert np.array_equal(x, y)

    def test_strip_then_ensure_is_lossless_bytes(self):
        frames = _frames(1)
        from gis_scripts_spark.raster import jpeg as _j

        jb = _j.jpeg_encode(frames[0], quality=90, subsampling="4:2:0")
        spliced = _ensure_dht(_strip_dht(jb))
        # same pixels either way (splice inserts the same 4 Annex K tables)
        assert np.array_equal(_j.jpeg_decode(jb), _j.jpeg_decode(spliced))
        # ensure_dht on a table-carrying frame is a no-op
        assert _ensure_dht(jb) is jb


class TestRawDIB:
    def test_lossless_roundtrip_rgb(self):
        frames = _frames(3, h=17, w=13)  # odd width exercises row padding
        dec = avi_decode_frames(avi_encode(frames, compressed=False))
        for a, b in zip(frames, dec):
            assert np.array_equal(a, b)

    def test_lossless_roundtrip_gray(self):
        rng = np.random.RandomState(1)
        frames = [rng.randint(0, 256, size=(9, 11, 1)).astype(np.uint8) for _ in range(2)]
        dec = avi_decode_frames(avi_encode(frames, compressed=False))
        for a, b in zip(frames, dec):
            assert np.array_equal(a, b)


class TestErrors:
    def test_not_avi(self):
        with pytest.raises(ValueError):
            avi_frame_count(b"RIFF\x04\x00\x00\x00WAVE")

    def test_mismatched_shapes(self):
        with pytest.raises(ValueError):
            avi_encode([np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)])


def _mjpg_payloads(buf):
    from gis_scripts_spark.raster.avi import _parse

    _a, _s, frames = _parse(buf)
    return [(i, buf[p : p + sz]) for i, (_st, _c, p, sz) in enumerate(frames)]


def test_sample_frames_over_avi(spark):
    """End-to-end: an AVI row through the Spark frame-sampling stage —
    the video modality's container is now real (MJPEG riding the
    from-scratch JPEG codec), matching the reference's ffmpeg-style
    frame extraction step."""
    from gis_scripts_spark.operators import multimodal as mm

    frames = _frames(6)
    buf = avi_encode(frames, strip_dht=True)  # the harder, AVI1 layout
    assert mm.video_frame_count(buf) == 6  # structural, no JPEG decode
    pdf = pd.DataFrame({"video_id": ["a0"], "bytes": [bytearray(buf)]})
    out = mm.sample_frames(spark.createDataFrame(pdf), every_k=2).toPandas()
    assert sorted(out["frame_idx"]) == [0, 2, 4]
    for _, row in out.iterrows():
        img = codec.decode(bytes(row["frame_bytes"]))
        assert codec.psnr(frames[int(row["frame_idx"])], img) >= 40.0
