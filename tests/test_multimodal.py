"""Multimodal binary-column operators: containers roundtrip, resize,
features, frame sampling; codec stubs raise for absent external formats."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.operators import multimodal as mm
from gis_scripts_spark.raster import codec
from gis_scripts_spark.sources import synth


def test_audio_container_roundtrip_and_features(spark):
    sr = 8000
    tt = np.arange(sr * 2) / sr
    wave = 0.5 * np.sin(2 * np.pi * 440 * tt)
    buf = mm.audio_encode(wave, sr)
    dec, sr2 = mm.audio_decode(buf)
    assert sr2 == sr and len(dec) == len(wave)
    assert np.allclose(dec, wave, atol=1e-3)
    pdf = pd.DataFrame({"clip_id": ["c0"], "bytes": [bytearray(buf)]})
    out = mm.audio_features(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert np.isclose(out["duration_sec"], 2.0)
    assert np.isclose(out["rms"], 0.5 / np.sqrt(2), atol=1e-3)
    assert np.isclose(out["peak"], 0.5, atol=1e-3)


def test_audio_decode_stub_for_external_formats():
    with pytest.raises(NotImplementedError):
        mm.audio_decode(b"ID3\x04fake-mp3-bytes")


def test_video_container_and_frame_sampling(spark):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (16, 16, 1)).astype(np.uint8) for _ in range(7)]
    buf = mm.video_encode(frames)
    assert mm.video_frame_count(buf) == 7
    pdf = pd.DataFrame({"video_id": ["v0"], "bytes": [bytearray(buf)]})
    out = mm.sample_frames(spark.createDataFrame(pdf), every_k=3).toPandas()
    assert out["frame_idx"].tolist() == [0, 3, 6]
    # frames decode back within QNT loss
    f0 = codec.qnt_decode(bytes(out["frame_bytes"][0]))
    assert codec.psnr(frames[0], f0) >= 40


def test_resize_and_features(spark):
    df = synth.images_df(spark, 12, parts=2)
    out = mm.resize_images(df, 16, 16).toPandas()
    assert set(out["w"]) == {16} and set(out["h"]) == {16}
    for _, r in out.iterrows():
        img = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert img.shape[:2] == (16, 16)
    feats = mm.image_features(df).toPandas()
    assert len(feats) == 12
    assert (feats["std_px"] > 0).all()
    # phash from features matches the table's phash column
    tbl = df.select("image_id", "phash").toPandas().set_index("image_id")
    lossless = df.filter(F.col("fmt") == "png").select("image_id").toPandas()["image_id"]
    for _, r in feats[feats["image_id"].isin(set(lossless))].iterrows():
        assert r["phash"] == tbl.loc[r["image_id"], "phash"]


def test_phash_neardup_pairs_bruteforce(spark):
    """Banded hamming join == numpy all-pairs oracle, and every planted
    near-dup (re-encoded + brightness-shifted) is caught."""
    df = synth.images_df(spark, 100, parts=4, dup_every=5, fmts=("png", "qnt", "jpeg"))
    got = mm.phash_neardup_pairs(df, max_hamming=10).toPandas()
    feats = mm.image_features(df).select("image_id", "phash").toPandas()
    # stored phash (synth computes it from the decoded bytes) == recomputed
    stored = df.select("image_id", "phash").toPandas().set_index("image_id")["phash"]
    for _, r in feats.iterrows():
        assert r["phash"] == stored[r["image_id"]]
    ids = feats["image_id"].tolist()
    h = feats["phash"].tolist()
    want = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1")
            if d <= 10:
                pa, pb = sorted((ids[a], ids[b]))
                want.add((pa, pb, d))
    got_set = set(map(tuple, got[["id_a", "id_b", "hamming"]].itertuples(index=False)))
    assert got_set == want
    planted = {(f"img_{i-1:08d}", f"img_{i:08d}") for i in range(1, 100) if i % 5 == 1}
    assert planted <= {(a, b) for a, b, _ in got_set}


def test_hamming_banding_pigeonhole_worst_case(spark):
    """Adversarial completeness: pairs at EXACTLY max_hamming distance with
    the differing bits spread one-per-band (the pigeonhole worst case) are
    still found — one band must remain clean."""
    from gis_scripts_spark.operators import dedup

    max_h = 6  # 7 bands: widths 10,9,9,9,9,9,9 starting at bit 0
    starts = [0, 10, 19, 28, 37, 46, 55]
    base = 0x5A5A_1234_ABCD_0F0F
    rows = [("x0", base)]
    flip = 0
    for s in starts[:max_h]:  # flip one bit in each of the first 6 bands
        flip |= 1 << s
    h2 = (base ^ flip)
    h2 = h2 - (1 << 64) if h2 >= (1 << 63) else h2
    b0 = base - (1 << 64) if base >= (1 << 63) else base
    rows = [("x0", b0), ("x1", h2)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "h"]))
    out = dedup.hamming_neardup_pairs(df, "h", "doc_id", max_hamming=max_h).toPandas()
    assert len(out) == 1 and int(out["hamming"][0]) == max_h
    # and one past the bound is rejected even when a band collides
    h3 = b0 ^ (flip | (1 << starts[6]))  # 7 bits, one per band: NO clean band
    h3 = h3 - (1 << 64) if h3 >= (1 << 63) else h3
    df2 = spark.createDataFrame(pd.DataFrame([("y0", b0), ("y1", h3)], columns=["doc_id", "h"]))
    out2 = dedup.hamming_neardup_pairs(df2, "h", "doc_id", max_hamming=max_h).toPandas()
    assert len(out2) == 0  # correctly absent: 7 flips > max_hamming


def test_phash_pairs_bytes_never_in_exchange(spark):
    """Plan gate (mirror of the WKB/embedding gates): image bytes must not
    ride any Exchange in the phash near-dup plan — only (id, hash) scalars
    shuffle."""
    import contextlib
    import io
    import re

    df = synth.images_df(spark, 20, parts=2, dup_every=5)
    out = mm.phash_neardup_pairs(df, max_hamming=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    blocks = re.findall(r"\(\d+\) (?:Broadcast)?Exchange[^\n]*\nInput[^\n]*", plan)
    assert blocks, "expected at least one Exchange in the candidate join plan"
    for block in blocks:
        assert "bytes" not in block, block


# ------------------------------------------------------------------ WAV
def _hand_wav_16(samples_i16, sr, ch=1, extra_chunk=True):
    """Hand-packed per the RIFF spec, independent of wav_encode: optional
    LIST chunk before fmt, word-aligned odd-size chunk in the middle."""
    import struct as st

    raw = np.asarray(samples_i16, "<i2").tobytes()
    body = b""
    if extra_chunk:
        body += b"LIST" + st.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body += b"fmt " + st.pack("<I", 16) + st.pack(
        "<HHIIHH", 1, ch, sr, sr * 2 * ch, 2 * ch, 16
    )
    body += b"data" + st.pack("<I", len(raw)) + raw
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decode_hand_built_spec_fixture():
    i16 = [0, 16384, -16384, 32767, -32768, 100]
    buf = _hand_wav_16(i16, 8000)
    s, sr = mm.wav_decode(buf)
    assert sr == 8000
    assert np.allclose(s * 32767.0, i16, atol=1e-9)
    # through the dispatcher too
    s2, _ = mm.audio_decode(buf)
    assert np.array_equal(s, s2)


def test_wav_decode_stereo_hand_built():
    inter = [10, -10, 20, -20, 30, -30]  # L,R interleaved
    buf = _hand_wav_16(inter, 44100, ch=2)
    s, sr = mm.wav_decode(buf)
    assert s.shape == (3, 2)
    assert np.allclose(s[:, 0] * 32767.0, [10, 20, 30])
    assert np.allclose(s[:, 1] * 32767.0, [-10, -20, -30])


@pytest.mark.parametrize(
    "bits,float_fmt", [(8, False), (16, False), (24, False), (32, False), (32, True)]
)
def test_wav_roundtrip_depths(bits, float_fmt):
    rng = np.random.default_rng(bits)
    wave = np.clip(rng.normal(0, 0.3, 240), -1, 1)
    buf = mm.wav_encode(wave, 16000, bits=bits, float_fmt=float_fmt)
    dec, sr = mm.wav_decode(buf)
    assert sr == 16000 and len(dec) == 240
    tol = 1e-6 if float_fmt else {8: 1 / 127.0, 16: 1 / 32767.0, 24: 1 / 8388607.0, 32: 1e-6}[bits]
    assert np.max(np.abs(dec - wave)) <= tol


def test_wav_extensible_format_tag():
    """WAVE_FORMAT_EXTENSIBLE wrapping PCM16 decodes like plain PCM16."""
    import struct as st

    i16 = np.array([100, -200, 300], "<i2")
    raw = i16.tobytes()
    sub = st.pack("<I", 1) + bytes.fromhex("00001000800000AA00389B71")
    # cbSize=22, wValidBits=16, channel mask (4B), then the 16B SubFormat GUID
    fmt = st.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + st.pack("<HHI", 22, 16, 0x4) + sub
    body = b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(raw)) + raw
    buf = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body
    s, sr = mm.wav_decode(buf)
    assert np.allclose(s * 32767.0, i16)


def test_wav_compressed_tag_raises():
    import struct as st

    fmt = st.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # 85 = MP3
    body = b"fmt " + st.pack("<I", 16) + fmt + b"data" + st.pack("<I", 0)
    buf = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="format tag"):
        mm.wav_decode(buf)


def test_audio_features_over_wav_bytes(spark):
    """The Spark features path accepts real WAV rows (mono + stereo mixed)."""
    sr = 8000
    t = np.arange(sr) / sr
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([mono, -mono], axis=1)  # mixdown cancels to ~0
    pdf = pd.DataFrame(
        {
            "clip_id": ["m", "s"],
            "bytes": [bytearray(mm.wav_encode(mono, sr)), bytearray(mm.wav_encode(stereo, sr))],
        }
    )
    out = mm.audio_features(spark.createDataFrame(pdf)).toPandas().set_index("clip_id")
    assert abs(out.loc["m", "duration_sec"] - 1.0) < 1e-9
    assert abs(out.loc["m", "rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert out.loc["s", "rms"] < 1e-4  # anti-phase mixdown


# ----------------------------------------------------------- animated GIF
def test_animated_gif_frame_sampling(spark):
    """sample_frames over a REAL animation container: an animated GIF's
    disposal-composited frames come out as lossless PNG bytes that decode
    bit-exactly to the source frames."""
    from gis_scripts_spark.raster.gif import gif_encode_frames

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 255, (16, 3)).astype(np.uint8)
    frames = [pal[rng.integers(0, 16, (12, 18))] for _ in range(5)]
    buf = gif_encode_frames(frames, delay_cs=3)
    assert mm.video_frame_count(buf) == 5  # structural walk, no LZW decode
    pdf = pd.DataFrame({"video_id": ["g0"], "bytes": [bytearray(buf)]})
    out = mm.sample_frames(spark.createDataFrame(pdf), every_k=2).toPandas()
    assert out["frame_idx"].tolist() == [0, 2, 4]
    for _, r in out.iterrows():
        got = codec.decode(bytes(r["frame_bytes"]))  # sniffs PNG
        assert np.array_equal(got, frames[int(r["frame_idx"])])


def test_images_df_full_codec_mix(spark):
    """input_hint rows in every implemented codec (incl. gif/bmp) decode,
    match their metadata, and keep the planted-dup guarantee."""
    df = synth.images_df(
        spark, 60, parts=4, dup_every=5,
        fmts=("png", "qnt", "jpeg", "jpegp", "gif", "bmp"),
    )
    pdf = df.toPandas()
    assert set(pdf["fmt"]) == {"png", "qnt", "jpeg", "jpegp", "gif", "bmp"}
    for _, r in pdf.iterrows():
        img = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert img.shape[:2] == (r["h"], r["w"])
        assert codec.phash64(img) == r["phash"]
    got = mm.phash_neardup_pairs(df, max_hamming=10).toPandas()
    pairs = {(a, b) for a, b in got[["id_a", "id_b"]].itertuples(index=False)}
    planted = {(f"img_{i-1:08d}", f"img_{i:08d}") for i in range(1, 60) if i % 5 == 1}
    assert planted <= pairs


class TestSpectrogram:
    def test_stft_matches_literal_dft(self):
        """Pin stft_mag to the textbook definition: per-frame periodic-Hann
        window then |sum_k x[k] e^{-2pi i k n / N}| computed by a literal
        O(n^2) DFT."""
        rng = np.random.RandomState(5)
        wave = rng.standard_normal(1000)
        n_fft, hop = 64, 32
        spec = mm.stft_mag(wave, n_fft=n_fft, hop=hop)
        assert spec.shape == ((1000 - n_fft) // hop + 1, n_fft // 2 + 1)
        k = np.arange(n_fft)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * k / n_fft)
        for fi in (0, 3, spec.shape[0] - 1):
            frame = wave[fi * hop : fi * hop + n_fft] * win
            dft = np.array(
                [np.abs(np.sum(frame * np.exp(-2j * np.pi * k * b / n_fft)))
                 for b in range(n_fft // 2 + 1)]
            )
            assert np.allclose(spec[fi], dft, atol=1e-9)

    def test_pure_tone_dominant_bin(self):
        sr, n_fft = 16000, 512
        t = np.arange(sr, dtype=np.float64) / sr
        wave = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        spec = mm.stft_mag(wave, n_fft=n_fft, hop=256)
        # 1 kHz at sr=16k, n_fft=512 -> bin 32 exactly
        assert (spec.argmax(axis=1) == 32).all()

    def test_mel_filterbank_shape_and_coverage(self):
        fb = mm.mel_filterbank(16000, 512, 24)
        assert fb.shape == (24, 257)
        # triangles tile the band: every interior bin is under some filter
        interior = fb.sum(axis=0)[3:-3]
        assert (interior > 0).all()
        # peak frequencies strictly increase (monotone mel centers)
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) > 0).all()

    def test_audio_spectrogram_spark(self, spark):
        sr = 8000
        t = np.arange(2 * sr, dtype=np.float64) / sr
        clips = {
            "tone_low": 0.4 * np.sin(2 * np.pi * 500.0 * t),
            "tone_high": 0.4 * np.sin(2 * np.pi * 3000.0 * t),
        }
        pdf = pd.DataFrame(
            {"clip_id": list(clips),
             "bytes": [bytearray(mm.wav_encode(w, sr)) for w in clips.values()]}
        )
        out = mm.audio_spectrogram(
            spark.createDataFrame(pdf), n_fft=256, hop=128
        ).toPandas()
        n_frames = (2 * sr - 256) // 128 + 1
        assert (out.groupby("clip_id").size() == n_frames).all()
        for cid, hz in (("tone_low", 500.0), ("tone_high", 3000.0)):
            e = np.stack(out[out.clip_id == cid]["energies"].to_numpy())
            assert (e.argmax(axis=1) == round(hz * 256 / sr)).all()

    def test_log_mel_path(self, spark):
        sr = 8000
        t = np.arange(sr, dtype=np.float64) / sr
        wave = 0.3 * np.sin(2 * np.pi * 440.0 * t)
        pdf = pd.DataFrame({"clip_id": ["a"], "bytes": [bytearray(mm.wav_encode(wave, sr))]})
        out = mm.audio_spectrogram(
            spark.createDataFrame(pdf), n_fft=256, hop=128, n_mels=20
        ).toPandas()
        e = np.stack(out["energies"].to_numpy())
        assert e.shape[1] == 20
        # log-mel energies of a mid-band tone: the peak mel filter must be
        # the one whose passband contains 440 Hz
        fb = mm.mel_filterbank(sr, 256, 20)
        want = fb[:, round(440 * 256 / sr)].argmax()
        assert (e.argmax(axis=1) == want).all()
