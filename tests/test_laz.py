"""Compressed point-cloud source (sources/laz.py): coder exactness by
fuzz roundtrip, IntegerCompressor bijections, chunked container
roundtrips per point format, chunk-independence (the Spark-parallelism
property), distributed read_laz vs written arrays, and the loud
foreign-item-version boundary."""

import struct

import numpy as np
import pytest

from gis_scripts_spark.sources import las, laz


# --------------------------------------------------------------------------
# coder primitives


def test_arith_coder_bits_roundtrip_fuzz():
    rng = np.random.default_rng(11)
    enc = laz.Encoder()
    ops = []
    for _ in range(3000):
        bits = int(rng.integers(1, 33))
        val = int(rng.integers(0, 1 << bits))
        ops.append((bits, val))
        enc.write_bits(bits, val)
    buf = enc.done()
    dec = laz.Decoder(buf)
    for bits, val in ops:
        assert dec.read_bits(bits) == val


def test_arith_coder_models_roundtrip_fuzz():
    """Mixed bit-model / symbol-model traffic with skewed distributions —
    the adaptive-update paths (update cycles, count halving, carry
    propagation) all exercise over 20k events."""
    rng = np.random.default_rng(12)
    enc = laz.Encoder()
    bm = laz.BitModel()
    sm5 = laz.SymbolModel(5)
    sm256 = laz.SymbolModel(256)
    events = []
    for _ in range(20000):
        kind = int(rng.integers(0, 3))
        if kind == 0:
            v = int(rng.random() < 0.15)  # skewed bits
            enc.encode_bit(bm, v)
        elif kind == 1:
            v = int(min(rng.geometric(0.5), 5) - 1)  # skewed symbols
            enc.encode_symbol(sm5, v)
        else:
            v = int(rng.integers(0, 256)) if rng.random() < 0.2 else 42
            enc.encode_symbol(sm256, v)
        events.append((kind, v))
    buf = enc.done()
    dec = laz.Decoder(buf)
    bm2, sm5b, sm256b = laz.BitModel(), laz.SymbolModel(5), laz.SymbolModel(256)
    for kind, v in events:
        if kind == 0:
            assert dec.decode_bit(bm2) == v
        elif kind == 1:
            assert dec.decode_symbol(sm5b) == v
        else:
            assert dec.decode_symbol(sm256b) == v


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_integer_compressor_roundtrip_fuzz(bits):
    rng = np.random.default_rng(13 + bits)
    enc = laz.Encoder()
    ic = laz.IntegerCompressor(enc, bits=bits, contexts=2)
    lo, hi = (0, 1 << bits) if bits < 32 else (-(1 << 31), 1 << 31)
    vals = [int(rng.integers(lo, hi)) for _ in range(4000)]
    # mix of small deltas (the common case) and wild jumps
    preds = [vals[i - 1] if i and rng.random() < 0.8 else int(rng.integers(lo, hi))
             for i in range(len(vals))]
    for i, (p, v) in enumerate(zip(preds, vals)):
        ic.compress(p, v, i & 1)
    buf = enc.done()
    dec = laz.Decoder(buf)
    ic2 = laz.IntegerCompressor(dec, bits=bits, contexts=2)
    for i, (p, v) in enumerate(zip(preds, vals)):
        assert ic2.decompress(p, i & 1) == v


def test_streaming_median5():
    """The predictor is an APPROXIMATE streaming median (laszip's design),
    so the oracle is its contract, not the literal 5-window median:
    deterministic, bounded by the values seen, converges on constants,
    and tracks the center of a noisy level shift."""
    rng = np.random.default_rng(14)
    a, b = laz.StreamingMedian5(), laz.StreamingMedian5()
    seen_max = 0
    for _ in range(500):
        v = int(rng.integers(-1000, 1000))
        a.add(v)
        b.add(v)
        seen_max = max(seen_max, abs(v))
        assert a.get() == b.get()  # deterministic
        assert abs(a.get()) <= seen_max  # bounded by observed values
    for _ in range(5):
        a.add(77)
    assert a.get() == 77  # constant input converges
    for _ in range(50):
        a.add(int(5000 + rng.integers(-3, 4)))
    assert abs(a.get() - 5000) <= 3  # tracks a level shift


# --------------------------------------------------------------------------
# container roundtrips


def _synth_points(n, rng, clustered=True):
    if clustered:  # flight-line-ish: small deltas with occasional jumps
        x = np.cumsum(rng.normal(0.5, 0.2, n)) + 500000.0
        y = np.cumsum(rng.normal(0.1, 0.3, n)) + 4_000_000.0
        z = 100.0 + np.cumsum(rng.normal(0, 0.05, n))
    else:
        x = rng.uniform(0, 1000, n)
        y = rng.uniform(0, 1000, n)
        z = rng.uniform(0, 100, n)
    cls = rng.choice([1, 2, 2, 2, 5], n)
    inten = rng.integers(0, 65536, n)
    return x, y, z, cls, inten


@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_write_parse_roundtrip_formats(tmp_path, fmt):
    rng = np.random.default_rng(20 + fmt)
    n = 3000
    x, y, z, cls, inten = _synth_points(n, rng)
    kw = {}
    if fmt in (1, 3):
        kw["gps_time"] = 300000.0 + np.cumsum(rng.uniform(0, 1e-4, n))
    if fmt in (2, 3):
        kw["rgb"] = (rng.integers(0, 65536, n), rng.integers(0, 65536, n),
                     rng.integers(0, 65536, n))
    p = str(tmp_path / f"f{fmt}.laz")
    laz.write_laz(p, x, y, z, cls, intensity=inten, chunk_size=1000, **kw)
    with open(p, "rb") as f:
        buf = f.read()
    got = laz.parse_laz(buf)
    assert len(got) == n
    # exact after the writer's own quantization (scale 0.001, auto offset)
    meta = laz.probe_laz(buf)
    for col, arr, ax in (("x", x, 0), ("y", y, 1), ("z", z, 2)):
        off = meta["offset"][ax]
        assert np.array_equal(
            got[col].to_numpy(), np.round((arr - off) / 0.001) * 0.001 + off
        ), col
    assert np.array_equal(got["classification"].to_numpy(), cls & 0x1F)
    assert np.array_equal(got["intensity"].to_numpy(), inten)
    if fmt in (1, 3):
        assert np.array_equal(got["gps_time"].to_numpy(), kw["gps_time"])
    if fmt in (2, 3):
        for c, arr in zip(("red", "green", "blue"), kw["rgb"]):
            assert np.array_equal(got[c].to_numpy(), arr)


def test_compression_actually_compresses(tmp_path):
    """Coherent (flight-line) data must come out well under the raw record
    size — the entire point of the predictive codec."""
    rng = np.random.default_rng(30)
    n = 20000
    x, y, z, cls, inten = _synth_points(n, rng)
    inten = (inten // 256) * 0 + 100  # near-constant intensity
    p = str(tmp_path / "c.laz")
    laz.write_laz(p, x, y, z, cls, intensity=inten)
    import os
    raw_size = 227 + 20 * n
    assert os.path.getsize(p) < raw_size * 0.55, (os.path.getsize(p), raw_size)


def test_chunks_decode_independently(tmp_path):
    """Chunk k alone == rows [k*cs, (k+1)*cs) of the full decode — NO state
    crosses chunks (the property read_laz's parallelism rests on)."""
    rng = np.random.default_rng(31)
    n, cs = 5000, 1000
    x, y, z, cls, inten = _synth_points(n, rng)
    p = str(tmp_path / "i.laz")
    laz.write_laz(p, x, y, z, cls, intensity=inten, chunk_size=cs)
    with open(p, "rb") as f:
        buf = f.read()
    meta = laz.probe_laz(buf)
    full = laz.parse_laz(buf)
    ch = meta["chunks"][3]
    fields = laz.decompress_chunk(buf[ch["offset"]: ch["offset"] + ch["size"]],
                                  ch["n"], meta["fmt"])
    part = laz._fields_to_pdf(fields, meta, 3 * cs)
    want = full.iloc[3 * cs: 4 * cs].reset_index(drop=True)
    for col in ("point_id", "x", "y", "z", "intensity", "classification"):
        assert np.array_equal(part[col].to_numpy(), want[col].to_numpy()), col


def test_parse_las_routes_laz(tmp_path):
    rng = np.random.default_rng(32)
    x, y, z, cls, inten = _synth_points(500, rng)
    p = str(tmp_path / "r.laz")
    laz.write_laz(p, x, y, z, cls, intensity=inten)
    with open(p, "rb") as f:
        got = las.parse_las(f.read())  # auto-detects the 0x80 marker
    assert len(got) == 500
    assert np.array_equal(got["classification"].to_numpy(), cls & 0x1F)


def test_foreign_item_version_raises(tmp_path):
    """A real-world LASzip file (item version != 99) must refuse loudly,
    never silently mis-decode (module-docstring interop boundary)."""
    rng = np.random.default_rng(33)
    x, y, z, cls, inten = _synth_points(100, rng)
    p = str(tmp_path / "v.laz")
    laz.write_laz(p, x, y, z, cls, intensity=inten)
    buf = bytearray(open(p, "rb").read())
    # patch the first item's version field (VLR payload starts at 227+54;
    # items start 34 bytes into the payload; version is the 3rd u2)
    item0 = 227 + 54 + 34
    struct.pack_into("<H", buf, item0 + 4, 2)  # pretend official v2
    with pytest.raises(NotImplementedError, match="foreign LASzip item"):
        laz.parse_laz(bytes(buf))


def test_read_laz_distributed(spark, tmp_path):
    """read_laz: chunk-per-task scan over two files == the written arrays;
    point_ids contiguous per file; path column populated."""
    rng = np.random.default_rng(34)
    tot = {}
    for fi in range(2):
        n = 2500
        x, y, z, cls, inten = _synth_points(n, rng)
        p = str(tmp_path / f"d{fi}.laz")
        laz.write_laz(p, x, y, z, cls, intensity=inten, chunk_size=800)
        ox = float(np.min(x))
        tot[f"d{fi}.laz"] = (np.round((x - ox) / 0.001) * 0.001 + ox, cls & 0x1F)
    df = laz.read_laz(spark, str(tmp_path / "*.laz"))
    got = df.toPandas()
    assert len(got) == 5000
    for name, (xq, clsq) in tot.items():
        sub = got[got["path"].str.endswith(name)].sort_values("point_id")
        assert np.array_equal(sub["point_id"].to_numpy(), np.arange(2500))
        assert np.array_equal(sub["x"].to_numpy(), xq)
        assert np.array_equal(sub["classification"].to_numpy(), clsq)
