"""ZIP-archive source exactness (sources/ziparchive.py).

Unlike LAZ (no external implementation in the sandbox), stdlib zipfile IS
available, so interop is pinned in BOTH directions: archives written by
stdlib must parse + extract through our reader bit-for-bit, and archives
written by our writer must open cleanly in stdlib (including the forced
Zip64 layout — Zip64 extras, Zip64 EOCD + locator — without a 4 GiB
fixture). The WorldView manifest test mirrors the reference flow
(seagrass_lib.py:168-193): *MUL*.XML filter, first-occurrence tag
extraction, footprint corner parse.
"""

import io
import zipfile

import numpy as np
import pytest

from gis_scripts_spark.sources.ziparchive import (
    _find_eocd,
    parse_central_directory,
    read_member,
    worldview_manifest,
    write_zip,
    zip_extract,
    zip_manifest,
)


def _members(n=6, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        # mix of compressible and incompressible payloads, nested paths
        if i % 2:
            data = bytes(rng.randint(0, 256, size=200 + 37 * i, dtype=np.uint8))
        else:
            data = (f"line {i}\n" * (30 + i)).encode()
        out.append((f"ACQ_{i:04d}/{i:03d}_MUL.XML" if i % 3 == 0 else f"dir{i}/f{i}.bin", data))
    return out


def _stdlib_zip(path, members, compress=zipfile.ZIP_DEFLATED):
    with zipfile.ZipFile(path, "w", compression=compress) as zf:
        for name, data in members:
            zf.writestr(name, data)


class TestReaderVsStdlib:
    @pytest.mark.parametrize("compress", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED])
    def test_stdlib_written_archive_reads_exactly(self, tmp_path, compress):
        members = _members()
        p = str(tmp_path / "a.zip")
        _stdlib_zip(p, members, compress)
        n, cd_size, cd_off = _find_eocd(p)
        assert n == len(members)
        with open(p, "rb") as f:
            f.seek(cd_off)
            entries = parse_central_directory(f.read(cd_size), n)
            assert [e["name"] for e in entries] == [m[0] for m in members]
            for e, (_nm, data) in zip(entries, members):
                got = read_member(f, e["local_offset"], e["csize"], e["method"],
                                  e["crc32"], e["usize"], e["name"])
                assert got == data

    def test_stdlib_zip64_forced_entries_read(self, tmp_path):
        members = _members(3)
        p = str(tmp_path / "z64e.zip")
        with zipfile.ZipFile(p, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for name, data in members:
                with zf.open(name, "w", force_zip64=True) as fh:
                    fh.write(data)
        n, cd_size, cd_off = _find_eocd(p)
        with open(p, "rb") as f:
            f.seek(cd_off)
            entries = parse_central_directory(f.read(cd_size), n)
            for e, (_nm, data) in zip(entries, members):
                assert read_member(f, e["local_offset"], e["csize"], e["method"],
                                   e["crc32"], e["usize"]) == data


class TestWriterVsStdlib:
    @pytest.mark.parametrize("method", [0, 8])
    @pytest.mark.parametrize("force_zip64", [False, True])
    def test_our_archive_opens_in_stdlib(self, tmp_path, method, force_zip64):
        members = _members()
        p = str(tmp_path / "ours.zip")
        write_zip(p, members, method=method, force_zip64=force_zip64)
        with zipfile.ZipFile(p) as zf:
            assert zf.testzip() is None  # CRC pass over every member
            assert zf.namelist() == [m[0] for m in members]
            for name, data in members:
                assert zf.read(name) == data

    def test_roundtrip_through_own_reader(self, tmp_path):
        members = _members()
        p = str(tmp_path / "rt.zip")
        write_zip(p, members, method=8, force_zip64=True)
        n, cd_size, cd_off = _find_eocd(p)
        assert n == len(members)
        with open(p, "rb") as f:
            f.seek(cd_off)
            entries = parse_central_directory(f.read(cd_size), n)
            for e, (_nm, data) in zip(entries, members):
                assert read_member(f, e["local_offset"], e["csize"], e["method"],
                                   e["crc32"], e["usize"]) == data


class TestCorruption:
    def test_crc_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "bad.zip")
        write_zip(p, [("x.bin", b"A" * 100)], method=0)
        buf = bytearray(open(p, "rb").read())
        i = buf.index(b"A" * 100)
        buf[i] ^= 0xFF
        p2 = str(tmp_path / "bad2.zip")
        open(p2, "wb").write(bytes(buf))
        n, cd_size, cd_off = _find_eocd(p2)
        with open(p2, "rb") as f:
            f.seek(cd_off)
            (e,) = parse_central_directory(f.read(cd_size), n)
            with pytest.raises(ValueError, match="CRC32"):
                read_member(f, e["local_offset"], e["csize"], e["method"],
                            e["crc32"], e["usize"])

    def test_not_a_zip(self, tmp_path):
        p = str(tmp_path / "no.zip")
        open(p, "wb").write(b"\x00" * 64)
        with pytest.raises(ValueError, match="end-of-central"):
            _find_eocd(p)

    def test_eocd_with_trailing_comment(self, tmp_path):
        members = _members(2)
        p = str(tmp_path / "c.zip")
        with zipfile.ZipFile(p, "w") as zf:
            zf.comment = b"trailing archive comment, " * 40
            for name, data in members:
                zf.writestr(name, data)
        n, _sz, _off = _find_eocd(p)
        assert n == 2


class TestSpark:
    def test_manifest_and_distributed_extract(self, spark, tmp_path):
        members = _members(8)
        p = str(tmp_path / "s.zip")
        _stdlib_zip(p, members)
        man = zip_manifest(spark, p)
        assert man.count() == 8
        got = {r["name"]: bytes(r["content"])
               for r in zip_extract(man.repartition(4), p).collect()}
        assert got == dict(members)

    def test_pattern_filter_prunes_before_decode(self, spark, tmp_path):
        members = _members(9)
        p = str(tmp_path / "f.zip")
        _stdlib_zip(p, members)
        out = zip_extract(zip_manifest(spark, p), p, pattern="*MUL*.XML").collect()
        want = {n for n, _d in members if "_MUL.XML" in n}
        assert {r["name"] for r in out} == want


_WV_XML = """<isd><IMD>
 <IMAGE><SATID>{satid}</SATID><TLCTIME>{tlc}</TLCTIME>
   <CLOUDCOVER>{cc}</CLOUDCOVER></IMAGE>
 <BAND_C><ULLON>{ullon}</ULLON><ULLAT>{ullat}</ULLAT>
   <URLON>{urlon}</URLON><URLAT>{urlat}</URLAT>
   <LRLON>{lrlon}</LRLON><LRLAT>{lrlat}</LRLAT>
   <LLLON>{lllon}</LLLON><LLLAT>{lllat}</LLLAT></BAND_C>
</IMD></isd>"""


def test_worldview_manifest_parse(spark, tmp_path):
    """list_files-equivalent: XML members -> typed metadata columns; a
    decoy non-MUL member and a non-XML member must be filtered out."""
    mem = []
    for k in range(4):
        x0, y0 = -100.0 + 10 * k, -40.0 + 5 * k
        xml = _WV_XML.format(
            satid="WV02" if k % 2 == 0 else "WV03", tlc=f"2019-0{k+1}-02T10:00:00Z",
            cc=repr(k / 128.0),
            ullon=repr(x0), ullat=repr(y0 + 8.0), urlon=repr(x0 + 12.0),
            urlat=repr(y0 + 8.0), lrlon=repr(x0 + 12.0), lrlat=repr(y0),
            lllon=repr(x0), lllat=repr(y0),
        )
        mem.append((f"ACQ_{k:04d}/{k:03d}_MUL.XML", xml.encode()))
    mem.append(("ACQ_9999/999_PAN.XML", b"<isd><IMD></IMD></isd>"))
    mem.append(("README.txt", b"not xml"))
    p = str(tmp_path / "wv.zip")
    write_zip(p, mem)
    pdf = worldview_manifest(spark, p).toPandas().sort_values("directory")
    assert list(pdf["directory"]) == [f"ACQ_{k:04d}" for k in range(4)]
    assert list(pdf["satid"]) == ["WV02", "WV03", "WV02", "WV03"]
    assert pdf["cloudcover"].tolist() == [k / 128.0 for k in range(4)]
    assert pdf["ullon"].tolist() == [-100.0 + 10 * k for k in range(4)]
    assert pdf["lrlat"].tolist() == [-40.0 + 5 * k for k in range(4)]


def test_coverage_formula_matches_polygon_clip_kernel():
    """The oracled rect formula in q_zip_manifest_coverage must agree with
    the general Sutherland-Hodgman coverage kernel (geom.core
    coverage_fraction — the reference's seagrass_lib.py:185-192 math) on
    every fixture footprint."""
    import numpy as np

    from gis_scripts_spark.geom.core import coverage_fraction
    from gis_scripts_spark.queries import _WV_AOI, _wv_member

    ax0, ay0, ax1, ay1 = _WV_AOI
    import re

    for k in range(25):
        _name, xml = _wv_member(k)
        vals = {m[0].decode(): float(m[1])
                for m in re.findall(rb"<([A-Z]+)>([-0-9.e]+)</", xml)}
        fx0, fy0 = vals["ULLON"], vals["LLLAT"]
        fx1, fy1 = vals["URLON"], vals["ULLAT"]
        ring = np.array([[fx0, fy1], [fx1, fy1], [fx1, fy0], [fx0, fy0], [fx0, fy1]])
        kernel = coverage_fraction([ring], (ax0, ay0, ax1, ay1))
        iw = max(0.0, min(fx1, ax1) - max(fx0, ax0))
        ih = max(0.0, min(fy1, ay1) - max(fy0, ay0))
        rect = iw * ih / ((fx1 - fx0) * (fy1 - fy0))
        assert abs(kernel - rect) < 1e-12, (k, kernel, rect)
