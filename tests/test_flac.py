"""FLAC codec: bit-exact roundtrips, hand-assembled spec vectors for the
decode paths the encoder doesn't emit (LPC, stereo decorrelation, wasted
bits, escape partitions), CRC corruption, and the Spark audio dispatch."""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.raster import flac
from gis_scripts_spark.raster.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_coded_number,
)
from gis_scripts_spark.operators import multimodal as mm


def _sig(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    s = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return np.clip(np.rint(s * 32767.0), -32768, 32767).astype(np.int16)


def test_roundtrip_mono_bit_exact():
    s = _sig(10000)
    buf = flac.flac_encode(s, 16000)
    out, sr, bps = flac.flac_decode(buf)
    assert sr == 16000 and bps == 16
    assert np.array_equal(out[:, 0], s.astype(np.int32))


def test_roundtrip_multiblock_and_partial_tail():
    s = _sig(4096 * 2 + 137, seed=3)  # 3 frames, irregular tail
    buf = flac.flac_encode(s, 44100)
    out, sr, _ = flac.flac_decode(buf)
    assert sr == 44100
    assert np.array_equal(out[:, 0], s.astype(np.int32))


def test_roundtrip_stereo_bit_exact():
    s = np.stack([_sig(5000, 1), _sig(5000, 2)], axis=1)
    buf = flac.flac_encode(s, 22050)
    out, _, _ = flac.flac_decode(buf)
    assert np.array_equal(out, s.astype(np.int32))


def test_compresses_smooth_signal():
    t = np.arange(20000) / 16000.0
    s = np.clip(np.rint(0.5 * np.sin(2 * np.pi * 220 * t) * 32767), -32768, 32767).astype(np.int16)
    buf = flac.flac_encode(s, 16000)
    assert len(buf) < 0.6 * s.nbytes  # FIXED-order-2 + rice actually compresses


def test_crc_corruption_raises():
    buf = bytearray(flac.flac_encode(_sig(3000), 16000))
    buf[len(buf) // 2] ^= 0x40  # flip a bit mid-frame
    with pytest.raises(ValueError, match="CRC|sync|truncated|reserved|flac"):
        flac.flac_decode(bytes(buf))


# ------------------------------------------------- hand-assembled vectors
def _streaminfo(n: int, rate: int, ch: int, bps: int) -> bytes:
    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(bw: _BitWriter, bs: int, ch_code: int, bps_code: int):
    bw.write(flac._SYNC, 14)
    bw.write(0, 2)  # reserved + fixed blocking
    bw.write(7, 4)  # 16-bit block size follows
    bw.write(0, 4)  # rate from streaminfo
    bw.write(ch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    _write_coded_number(bw, 0)
    bw.write(bs - 1, 16)
    assert bw.nbits == 0
    bw.write(_crc8(bytes(bw.out)), 8)


def _finish_frame(bw: _BitWriter) -> bytes:
    bw.align()
    bw.write(_crc16(bytes(bw.out)), 16)
    return bw.bytes()


def _verbatim(bw: _BitWriter, vals, bits: int, wasted: int = 0):
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)  # unary(wasted-1): (wasted-1) zeros then a 1
    else:
        bw.write(0, 1)
    for v in vals:
        bw.write(int(v) & ((1 << (bits - wasted)) - 1), bits - wasted)


def test_mid_side_reconstruction():
    l = [100, 5, -3, 7]
    r = [40, -2, 9, 7]
    mid = [(a + b) >> 1 for a, b in zip(l, r)]
    side = [a - b for a, b in zip(l, r)]
    bw = _BitWriter()
    _frame_header(bw, 4, 10, 4)  # mid/side, 16 bps
    _verbatim(bw, mid, 16)
    _verbatim(bw, side, 17)  # side channel carries +1 bit
    buf = _streaminfo(4, 8000, 2, 16) + _finish_frame(bw)
    out, _, _ = flac.flac_decode(buf)
    assert out[:, 0].tolist() == l
    assert out[:, 1].tolist() == r


def test_left_side_and_right_side():
    l = [1000, -32768, 32767, 0]
    r = [999, -32768, 32700, -1]
    side = [a - b for a, b in zip(l, r)]
    bw = _BitWriter()
    _frame_header(bw, 4, 8, 4)  # left/side
    _verbatim(bw, l, 16)
    _verbatim(bw, side, 17)
    out, _, _ = flac.flac_decode(_streaminfo(4, 8000, 2, 16) + _finish_frame(bw))
    assert out[:, 0].tolist() == l and out[:, 1].tolist() == r

    bw = _BitWriter()
    _frame_header(bw, 4, 9, 4)  # right/side: side first, then right
    _verbatim(bw, side, 17)
    _verbatim(bw, r, 16)
    out, _, _ = flac.flac_decode(_streaminfo(4, 8000, 2, 16) + _finish_frame(bw))
    assert out[:, 0].tolist() == l and out[:, 1].tolist() == r


def test_wasted_bits_shift():
    vals = [4, -8, 12, 0]  # all divisible by 4 -> 2 wasted bits
    bw = _BitWriter()
    _frame_header(bw, 4, 0, 4)
    _verbatim(bw, [v >> 2 for v in vals], 16, wasted=2)
    out, _, _ = flac.flac_decode(_streaminfo(4, 8000, 1, 16) + _finish_frame(bw))
    assert out[:, 0].tolist() == vals


def test_lpc_subframe_hand_vector():
    """LPC order 2, precision 4, shift 1, coefs [3, -1]:
    s[i] = res[i] + ((3*s[i-1] - s[i-2]) >> 1)."""
    warm = [10, 12]
    res = [1, -2, 0, 3]
    bw = _BitWriter()
    _frame_header(bw, 6, 0, 4)
    bw.write(0, 1)
    bw.write(32 + (2 - 1), 6)  # LPC order 2
    bw.write(0, 1)  # no wasted bits
    for v in warm:
        bw.write(v, 16)
    bw.write(3, 4)   # precision - 1
    bw.write(1, 5)   # shift
    bw.write(3 & 0xF, 4)
    bw.write(-1 & 0xF, 4)
    # residual: rice method 0, partition order 0, param 2
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(2, 4)
    for v in res:
        z = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(z >> 2)
        bw.write(z, 2)
    out, _, _ = flac.flac_decode(_streaminfo(6, 8000, 1, 16) + _finish_frame(bw))
    want = list(warm)
    for v in res:
        want.append(v + ((3 * want[-1] - want[-2]) >> 1))
    assert out[:, 0].tolist() == want


def test_escape_partition_raw_bits():
    vals = [63, -64, 1, -1]
    bw = _BitWriter()
    _frame_header(bw, 4, 0, 4)
    bw.write(0, 1)
    bw.write(8, 6)  # FIXED order 0 -> residual is the signal
    bw.write(0, 1)
    bw.write(0, 2)  # rice method 0
    bw.write(0, 4)  # partition order 0
    bw.write(0xF, 4)  # ESCAPE
    bw.write(7, 5)   # raw 7-bit residuals
    for v in vals:
        bw.write(v & 0x7F, 7)
    out, _, _ = flac.flac_decode(_streaminfo(4, 8000, 1, 16) + _finish_frame(bw))
    assert out[:, 0].tolist() == vals


def test_constant_and_fixed_orders_via_roundtrip():
    # constant signal exercises order-2 FIXED with all-zero residuals
    s = np.full(5000, -1234, np.int16)
    out, _, _ = flac.flac_decode(flac.flac_encode(s, 16000))
    assert np.array_equal(out[:, 0], s.astype(np.int32))


def test_audio_decode_dispatch_matches_wav():
    """audio_decode('fLaC'...) must produce the same floats as the WAV
    path for identical 16-bit PCM."""
    s16 = _sig(6000, seed=9)
    fbuf = flac.flac_encode(s16, 16000)
    wbuf = mm.wav_encode(s16.astype(np.float64) / 32767.0, 16000, bits=16)
    fs, fr = mm.audio_decode(fbuf)
    ws, wr = mm.audio_decode(wbuf)
    assert fr == wr == 16000
    assert np.array_equal(fs, ws)


def test_spark_audio_features_on_flac(spark):
    rows = []
    for k in range(6):
        s = _sig(4000, seed=k)
        rows.append((f"clip_{k}", bytearray(flac.flac_encode(s, 16000))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"]))
    out = mm.audio_features(df, id_col="clip_id").toPandas()
    assert len(out) == 6
    assert np.allclose(out["duration_sec"], 4000 / 16000.0)
    assert (out["rms"] > 0.1).all() and (out["peak"] <= 1.0).all()
