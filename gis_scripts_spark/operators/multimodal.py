"""Multimodal binary columns: image / audio / video as opaque bytes with
typed metadata, processed by Arrow-batched mapInPandas kernels.

Container formats (real, dependency-free — the sandbox has no image/audio
libs, so images use the engine's own PNG/QNT codecs and audio/video use
tiny deterministic containers; where a REAL external codec would be needed
(jpeg/mp3/h264) decode raises NotImplementedError, keeping the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — fully real and
tested):

  AUD1: b"AUD1" | u32 sample_rate | u32 n_samples | int16 PCM samples
  VID1: b"VID1" | u32 n_frames | n x (u32 len | QNT-encoded frame)

Operators: decode stats, image resize (area resample), audio features
(rms / zero-crossings / duration), video frame sampling (explode every
k-th frame as its own row).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gis_scripts_spark.raster import codec

# ------------------------------------------------------------- containers
def audio_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    s = np.asarray(samples)
    s16 = np.clip(np.rint(s * 32767.0), -32768, 32767).astype("<i2") if s.dtype.kind == "f" else s.astype("<i2")
    return b"AUD1" + struct.pack("<II", sample_rate, len(s16)) + s16.tobytes()


def audio_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Dispatch: real RIFF/WAV (PCM + IEEE float), real FLAC (the
    from-scratch lossless codec, raster/flac.py), or the AUD1 test
    container. Perceptual codecs (mp3/ogg/aac) raise — honest sandbox
    boundary, now at actual LOSSY bitstreams."""
    magic = bytes(buf[:4])
    if magic == b"RIFF":
        return wav_decode(buf)
    if magic == b"fLaC":
        from gis_scripts_spark.raster.flac import flac_decode

        ints, sr, bps = flac_decode(bytes(buf))
        # same normalization as the WAV PCM path at the same depth
        s = ints.astype(np.float64) / float((1 << (bps - 1)) - 1)
        return (s[:, 0] if s.shape[1] == 1 else s), sr
    if magic != b"AUD1":
        raise NotImplementedError(
            "only WAV (RIFF PCM/float), FLAC and AUD1 supported in-sandbox "
            "(no mp3/ogg/aac codecs)"
        )
    sr, n = struct.unpack_from("<II", buf, 4)
    return np.frombuffer(buf, dtype="<i2", count=n, offset=12).astype(np.float64) / 32767.0, sr


# ------------------------------------------------------------- WAV (RIFF)
# From-scratch per the public RIFF/WAVE layout (Microsoft multimedia spec):
# 'RIFF' size 'WAVE', then chunks; 'fmt ' carries wFormatTag (1=PCM,
# 3=IEEE float, 0xFFFE=EXTENSIBLE with a SubFormat GUID), 'data' carries
# interleaved frames. Chunks are word-aligned (odd sizes padded).
_WAV_PCM, _WAV_FLOAT, _WAV_EXT = 1, 3, 0xFFFE
# first 4 bytes of the canonical SubFormat GUIDs (rest is the fixed ksmedia
# base GUID suffix)
_EXT_GUID_SUFFIX = bytes.fromhex("00001000800000AA00389B71")


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16, float_fmt: bool = False
) -> bytes:
    """float samples in [-1,1] (shape (n,) or (n,channels)) -> WAV bytes.
    bits: 8 (unsigned PCM) / 16 / 24 / 32; float_fmt=True writes IEEE
    float32 (bits must be 32)."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if float_fmt:
        if bits != 32:
            raise ValueError("float WAV must be 32-bit")
        raw = s.astype("<f4").tobytes()
    elif bits == 8:
        raw = np.clip(np.rint(s * 127.0) + 128, 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.clip(np.rint(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 24:
        i32 = np.clip(np.rint(s * 8388607.0), -8388608, 8388607).astype("<i4")
        b4 = i32.reshape(-1).view(np.uint8).reshape(-1, 4)
        raw = b4[:, :3].tobytes()  # little-endian: low 3 bytes
    elif bits == 32:
        i64 = np.clip(np.rint(s * 2147483647.0), -2147483648, 2147483647)
        raw = i64.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block = ch * bits // 8
    fmt_tag = _WAV_FLOAT if float_fmt else _WAV_PCM
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, sample_rate, sample_rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) % 2:
        chunks += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1,1], sample_rate). Mono returns
    shape (n,); multi-channel (n, channels). Walks chunks per the RIFF
    spec (skips LIST/fact/etc., honors word alignment); supports PCM
    8/16/24/32, IEEE float32/64, and WAVE_FORMAT_EXTENSIBLE."""
    if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    off, end = 12, min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    fmt = data = None
    while off + 8 <= end:
        cid = bytes(buf[off : off + 4])
        (size,) = struct.unpack_from("<I", buf, off + 4)
        body = buf[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _WAV_EXT:
        if len(fmt) < 40:
            raise ValueError("EXTENSIBLE fmt chunk truncated")
        sub = bytes(fmt[24:40])
        if sub[4:] != _EXT_GUID_SUFFIX:
            raise NotImplementedError("unknown EXTENSIBLE SubFormat GUID")
        # storage layout follows the CONTAINER bits already parsed above
        # (wValidBitsPerSample <= container bits merely marks padding bits)
        tag = struct.unpack_from("<I", sub, 0)[0]
    if tag == _WAV_FLOAT:
        dt = {32: "<f4", 64: "<f8"}.get(bits)
        if dt is None:
            raise ValueError(f"unsupported float bit depth {bits}")
        s = np.frombuffer(data, dtype=dt).astype(np.float64)
    elif tag == _WAV_PCM:
        if bits == 8:
            s = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 127.0
        elif bits == 16:
            s = np.frombuffer(data, "<i2").astype(np.float64) / 32767.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            i32 = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
            )
            s = i32.astype(np.float64) / 8388607.0
        elif bits == 32:
            s = np.frombuffer(data, "<i4").astype(np.float64) / 2147483647.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise NotImplementedError(f"WAV format tag {tag} not supported (compressed?)")
    if ch > 1:
        s = s[: (len(s) // ch) * ch].reshape(-1, ch)
    return s, sr


def video_encode(frames: list[np.ndarray]) -> bytes:
    out = [b"VID1", struct.pack("<I", len(frames))]
    for f in frames:
        enc = codec.qnt_encode(f)
        out.append(struct.pack("<I", len(enc)))
        out.append(enc)
    return b"".join(out)


def _is_avi(buf: bytes) -> bool:
    return bytes(buf[:4]) == b"RIFF" and bytes(buf[8:12]) == b"AVI "


def video_frame_count(buf: bytes) -> int:
    if bytes(buf[:4]) == b"GIF8":  # animated GIF: structural walk, no decode
        from gis_scripts_spark.raster.gif import gif_frame_count

        return gif_frame_count(bytes(buf))
    if _is_avi(buf):  # AVI/MJPEG: structural chunk walk, no decode
        from gis_scripts_spark.raster.avi import avi_frame_count

        return avi_frame_count(bytes(buf))
    from gis_scripts_spark.raster.mp4 import is_mp4, mp4_frame_count

    if is_mp4(bytes(buf)):  # ISO-BMFF: sample-table walk, no decode
        return mp4_frame_count(bytes(buf))
    if bytes(buf[:4]) != b"VID1":
        raise NotImplementedError(
            "only VID1, animated GIF, AVI/MJPEG and MP4/motion-JPEG "
            "supported in-sandbox (no h264/vp9 codecs)"
        )
    return struct.unpack_from("<I", buf, 4)[0]


def video_iter_frames(buf: bytes):
    """(frame_idx, encoded frame bytes) per frame. VID1 yields the stored
    QNT payloads verbatim; animated GIF yields each disposal-composited
    canvas re-encoded as lossless PNG (a composited canvas can exceed 256
    colors, so GIF re-encode is not always possible). Either way the
    yielded bytes decode with codec.decode (magic sniff). AVI/MJPEG
    yields each '00dc' payload as a self-contained JPEG (Annex K tables
    spliced for AVI1-abbreviated streams — byte surgery, no pixel
    decode) and '00db' raw-DIB chunks as lossless PNG."""
    if bytes(buf[:4]) == b"GIF8":
        from gis_scripts_spark.raster.gif import gif_decode_frames

        for i, frame in enumerate(gif_decode_frames(bytes(buf))):
            yield i, codec.png_encode(frame)
        return
    if _is_avi(buf):
        from gis_scripts_spark.raster.avi import avi_iter_frames

        yield from avi_iter_frames(bytes(buf))
        return
    from gis_scripts_spark.raster.mp4 import is_mp4, mp4_iter_frames

    if is_mp4(bytes(buf)):
        # motion-JPEG samples are self-contained JPEGs (inter-coded
        # codecs raise inside mp4_iter_frames — the honest boundary)
        yield from mp4_iter_frames(bytes(buf))
        return
    n = video_frame_count(buf)
    off = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        yield i, bytes(buf[off : off + ln])
        off += ln


# ---------------------------------------------------------------- image ops
def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Area/nearest resample of the image `bytes` column to (out_w, out_h);
    updates w/h columns. Pure numpy index-math resample (nearest for
    upscale, block-mean for integer downscale)."""
    schema = df.schema

    def run(batches):
        for pdf in batches:
            out_bytes = []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"])
                h, w = img.shape[:2]
                if h % out_h == 0 and w % out_w == 0:
                    img2 = (
                        img.reshape(out_h, h // out_h, out_w, w // out_w, img.shape[2])
                        .mean(axis=(1, 3))
                        .round()
                        .astype(np.uint8)
                    )
                else:
                    ry = np.floor(np.arange(out_h) * h / out_h).astype(np.int64)
                    rx = np.floor(np.arange(out_w) * w / out_w).astype(np.int64)
                    img2 = img[np.ix_(ry, rx)]
                out_bytes.append(bytearray(codec.encode(img2, row["fmt"])))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            pdf["w"] = np.int32(out_w)
            pdf["h"] = np.int32(out_h)
            yield pdf[[f.name for f in schema.fields]]

    return df.mapInPandas(run, schema)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("mean_px", DoubleType(), False),
        StructField("std_px", DoubleType(), False),
        StructField("edge_density", DoubleType(), False),
        StructField("phash", LongType(), False),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Cheap visual features: global mean/std, gradient edge density,
    perceptual hash — the feature-extraction stage of a multimodal
    training-data pipeline."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"]).astype(np.float64)
                gray = img.mean(axis=2)
                gx = np.abs(np.diff(gray, axis=1)).mean()
                gy = np.abs(np.diff(gray, axis=0)).mean()
                rows.append(
                    (row["image_id"], float(img.mean()), float(img.std()),
                     float((gx + gy) / 2.0), codec.phash64(img))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def phash_neardup_pairs(df: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: decode the `bytes`
    column, pHash each image (one Arrow mapInPandas pass, image_features),
    then the banded hamming self-join from operators/dedup.py — the
    pigeonhole blocking means only (hash, id) scalars enter the candidate
    Exchange, never the image bytes. The image twin of the text simhash
    dedup stage; catches re-encoded / brightness-shifted re-posts.

    Returns (id_a, id_b, hamming), id_a < id_b.
    """
    from gis_scripts_spark.operators import dedup

    hashes = image_features(df).select("image_id", "phash")
    return dedup.hamming_neardup_pairs(
        hashes, hash_col="phash", id_col="image_id", max_hamming=max_hamming
    )


PHASH256_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("phash256", ArrayType(LongType(), False), False),
    ]
)


def image_phash256(df: DataFrame) -> DataFrame:
    """(image_id, phash256: array<bigint>[4]) — the 256-bit perceptual
    hash in one Arrow mapInPandas pass (codec.phash256)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"]).astype(np.float64)
                rows.append((row["image_id"], codec.phash256(img)))
            yield pd.DataFrame(rows, columns=["image_id", "phash256"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, PHASH256_SCHEMA)


def phash256_neardup_pairs(df: DataFrame, max_hamming: int = 10) -> DataFrame:
    """256-bit image near-dup pairs — the 10^12-row scale variant of
    phash_neardup_pairs: at max_hamming=10 a 64-bit hash gives ~6-bit
    bands (occupancy n/2^6 — unusable at web scale) while 256 bits keeps
    23-bit bands at the SAME threshold. Decode + DCT in one Arrow pass,
    then the multiword banded join (bands may span word boundaries; only
    ids + 4 hash words cross the Exchange, never the bytes)."""
    from gis_scripts_spark.operators import dedup

    hashes = image_phash256(df)
    return dedup.hamming_neardup_pairs_multiword(
        hashes, hash_col="phash256", id_col="image_id",
        max_hamming=max_hamming, n_words=4,
    )


def exif_metadata(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Per-image EXIF geotag + metadata from the JPEG bytes column — the
    north-star "geotagged image" last mile: real crawl JPEGs carry GPS in
    an APP1 TIFF (raster/exif.py), not as table columns. One Arrow pass;
    bytes stay map-local, only (id, lat, lon, orientation, datetime)
    scalars leave the stage. Rows without EXIF/GPS come back null."""
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("image_id", id_type, False),
            StructField("lat", DoubleType(), True),
            StructField("lon", DoubleType(), True),
            StructField("orientation", IntegerType(), True),
            StructField("datetime", StringType(), True),
        ]
    )

    def run(batches):
        from gis_scripts_spark.raster import exif

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            # batch parse: rows sharing one byte STRUCTURE decode
            # vectorized (span-verified against row 0 — exif_parse_batch);
            # corrupt/odd rows fall back to the scalar parser per row and
            # yield a null row, never a dead task
            metas = exif.exif_parse_batch(
                [bytes(b) for b in pdf[bytes_col].to_numpy()]
            )
            rows = [
                (rid, m.get("lat"), m.get("lon"),
                 m.get("orientation"), m.get("datetime"))
                for rid, m in zip(ids, (m or {} for m in metas))
            ]
            yield pd.DataFrame(
                rows, columns=["image_id", "lat", "lon", "orientation", "datetime"]
            )

    return df.select(id_col, bytes_col).mapInPandas(run, schema)


def geotagged_jpegs(
    df: DataFrame,
    id_col: str = "image_id",
    lat_md_col: str = "lat_md",
    lon_md_col: str = "lon_md",
    orientation_col: str | None = None,
    dt_col: str | None = None,
    base_jpeg: bytes | None = None,
) -> DataFrame:
    """(id, bytes) rows: one shared base JPEG (encoded once, shipped in
    the closure) with a PER-ROW EXIF APP1 spliced in — integer
    millidegree geotags in, spec-shaped geotagged JPEG bytes out. The
    write half of exif_metadata's read; pure byte surgery per row."""
    if base_jpeg is None:
        from gis_scripts_spark.raster.jpeg import jpeg_encode

        scene = (np.arange(16 * 16, dtype=np.int64) % 251).reshape(16, 16, 1)
        base_jpeg = jpeg_encode(scene.astype(np.uint8))
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("image_id", id_type, False),
            StructField("bytes", BinaryType(), False),
        ]
    )
    cols = [id_col, lat_md_col, lon_md_col]
    if orientation_col:
        cols.append(orientation_col)
    if dt_col:
        cols.append(dt_col)

    def run(batches):
        import struct

        from gis_scripts_spark.raster import exif

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            lats = pdf[lat_md_col].to_numpy()
            lons = pdf[lon_md_col].to_numpy()
            ors = pdf[orientation_col].to_numpy() if orientation_col else None
            dts = pdf[dt_col].to_numpy() if dt_col else None
            n = len(pdf)
            # vectorized fast path (guide §4.2): equal-length datetimes
            # make the APP1 fixed-layout, so the whole batch patches one
            # template as numpy column writes — byte-identical to the
            # scalar builder (exif_build_batch self-checks row 0). The
            # scalar loop remains for ragged datetimes / no-dt callers.
            fixed_dt = dts is not None and n > 0 and len(
                {len(str(d)) for d in dts}
            ) == 1
            if fixed_dt:
                app1s = exif.exif_build_batch(
                    lats.astype(np.int64), lons.astype(np.int64),
                    np.asarray([str(d) for d in dts]),
                    ors.astype(np.int64) if ors is not None else np.ones(n, np.int64),
                )
                seg_hdr = struct.pack(">HH", 0xFFE1, app1s.shape[1] + 2)
                pre = base_jpeg[:2] + seg_hdr
                post = base_jpeg[2:]
                rows = [(ids[i], pre + app1s[i].tobytes() + post) for i in range(n)]
            else:
                rows = []
                for i in range(n):
                    app1 = exif.exif_build(
                        int(lats[i]), int(lons[i]),
                        dt=str(dts[i]) if dts is not None else None,
                        orientation=int(ors[i]) if ors is not None else 1,
                    )
                    rows.append((ids[i], exif.jpeg_with_exif(base_jpeg, app1)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return df.select(*cols).mapInPandas(run, schema)


# ---------------------------------------------------------------- audio ops
AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("duration_sec", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_cross_rate", DoubleType(), False),
        StructField("peak", DoubleType(), False),
    ]
)


def audio_features(df: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes") -> DataFrame:
    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                wave, sr = audio_decode(bytes(row[bytes_col]))
                if wave.ndim == 2:  # multi-channel WAV: feature over the mixdown
                    wave = wave.mean(axis=1)
                zc = float(np.mean(np.abs(np.diff(np.signbit(wave).astype(np.int8))))) if len(wave) > 1 else 0.0
                rows.append(
                    (row[id_col], len(wave) / sr, float(np.sqrt(np.mean(wave**2))),
                     zc, float(np.abs(wave).max(initial=0.0)))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def _hann(n: int) -> np.ndarray:
    # periodic Hann (the STFT convention): 0.5 - 0.5 cos(2*pi*k/N)
    k = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)


def stft_mag(wave: np.ndarray, n_fft: int = 512, hop: int = 256) -> np.ndarray:
    """(frames, n_fft//2 + 1) magnitude spectrogram: periodic-Hann
    windowed rFFT frames, no padding (frames that don't fill n_fft are
    dropped — deterministic row counts per clip)."""
    n = (len(wave) - n_fft) // hop + 1 if len(wave) >= n_fft else 0
    if n <= 0:
        return np.empty((0, n_fft // 2 + 1))
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = wave[idx] * _hann(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=1))


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular mel filters on the HTK mel scale
    mel(f) = 2595 * log10(1 + f/700) — the public formula every speech
    pipeline uses — with edges equally spaced in mel between 0 and sr/2."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    edges = from_mel(np.linspace(0.0, float(to_mel(sr / 2.0)), n_mels + 2))
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, c, hi = edges[m], edges[m + 1], edges[m + 2]
        up = (bins - lo) / max(c - lo, 1e-12)
        down = (hi - bins) / max(hi - c, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def _spectrogram_schema(id_type) -> StructType:
    # clip_id keeps its source type (string fixtures, int64 event keys)
    return StructType(
        [
            StructField("clip_id", id_type, False),
            StructField("frame_idx", IntegerType(), False),
            StructField("energies", ArrayType(DoubleType(), False), False),
        ]
    )


def audio_spectrogram(
    df: DataFrame,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 0,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Explode each audio clip into STFT frames — one row per frame with
    the magnitude spectrum (n_mels=0) or log-mel energies (n_mels>0), the
    standard acoustic front-end for training-data pipelines. UDTF-shaped
    like sample_frames (one clip in, many frames out); bytes decode and
    the FFT stay map-local inside the Arrow batch, only (id, idx,
    energies) scalars/arrays leave the stage."""

    def run(batches):
        fb_cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            ids, idxs, arrs = [], [], []
            for _, row in pdf.iterrows():
                wave, sr = audio_decode(bytes(row[bytes_col]))
                if wave.ndim == 2:
                    wave = wave.mean(axis=1)
                spec = stft_mag(wave, n_fft=n_fft, hop=hop)
                if n_mels:
                    if sr not in fb_cache:
                        fb_cache[sr] = mel_filterbank(sr, n_fft, n_mels)
                    spec = np.log(spec**2 @ fb_cache[sr].T + 1e-10)
                ids.extend([row[id_col]] * len(spec))
                idxs.extend(range(len(spec)))
                arrs.extend(list(spec))
            yield pd.DataFrame(
                {"clip_id": ids,
                 "frame_idx": np.asarray(idxs, np.int32),
                 "energies": arrs}
            )

    return df.select(id_col, bytes_col).mapInPandas(
        run, _spectrogram_schema(df.schema[id_col].dataType)
    )


# ---------------------------------------------------------------- video ops
def _frame_schema(id_type) -> StructType:
    # video_id keeps its source type (string fixtures, int64 event keys)
    return StructType(
        [
            StructField("video_id", id_type, False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", BinaryType(), False),
        ]
    )


def sample_frames(df: DataFrame, every_k: int = 2, id_col: str = "video_id", bytes_col: str = "bytes") -> DataFrame:
    """Explode every k-th frame of each video row into its own row — the
    UDTF-shaped frame-sampling stage (one video in, many frames out)."""

    def run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                for i, frame in video_iter_frames(bytes(row[bytes_col])):
                    if i % every_k == 0:
                        ids.append(row[id_col])
                        idxs.append(i)
                        frames.append(bytearray(frame))
            yield pd.DataFrame({"video_id": ids, "frame_idx": np.asarray(idxs, np.int32), "frame_bytes": frames})

    return df.select(id_col, bytes_col).mapInPandas(
        run, _frame_schema(df.schema[id_col].dataType)
    )
