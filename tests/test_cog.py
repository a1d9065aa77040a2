"""Cloud-Optimized GeoTIFF writer (geotiff.cog_encode + ingest.export_cog):
tiled multi-IFD pyramid, COG byte layout, and the export->re-ingest loop."""

import struct

import numpy as np
import pytest

from gis_scripts_spark.raster import geotiff as gt


def _rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.normal(0, 100, shape).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, shape, endpoint=True).astype(dtype)


class TestPyramid:
    def test_levels_until_one_tile(self):
        img = _rand((700, 530, 3), np.uint8)
        buf = gt.cog_encode(img, tile=256, compress="deflate")
        assert gt.tiff_levels(buf) == [(530, 700), (265, 350), (133, 175)]

    def test_overview_is_block_average(self):
        # even dims: the 'average' overview equals the plain 2x2 block
        # mean (round-half-away for ints), computed independently
        img = _rand((64, 96, 1), np.uint8, seed=3)
        buf = gt.cog_encode(img, tile=32, compress="none")
        ov, _ = gt.tiff_decode(buf, level=1)
        want = np.floor(
            img.reshape(32, 2, 48, 2, 1).mean(axis=(1, 3)) + 0.5
        ).astype(np.uint8)
        assert np.array_equal(ov, want)

    def test_overview_edge_pixels_average_existing_only(self):
        img = np.full((33, 32, 1), 10, dtype=np.uint8)
        img[32, :] = 250  # odd final row: its overview blocks are 1x2
        buf = gt.cog_encode(img, tile=16, compress="none")
        # 33 -> 17 -> 9: last row of level 1 averages ONLY source row 32
        assert gt.tiff_levels(buf) == [(32, 33), (16, 17), (8, 9)]
        ov, _ = gt.tiff_decode(buf, level=1)
        assert np.all(ov[16, :, 0] == 250)
        assert np.all(ov[:16, :, 0] == 10)

    def test_pixel_scale_doubles_per_level(self):
        img = _rand((64, 64, 1), np.uint8)
        buf = gt.cog_encode(img, tile=16, compress="none",
                            pixel_scale=(0.25, 0.5), tiepoint=(0, 0, 0, 7.0, 46.0, 0))
        _, m0 = gt.tiff_decode(buf, level=0)
        _, m2 = gt.tiff_decode(buf, level=2)
        assert m0["pixel_scale"][:2] == (0.25, 0.5)
        assert m2["pixel_scale"][:2] == (1.0, 2.0)
        assert m0["tiepoint"] == m2["tiepoint"]  # shared origin


class TestRoundtrip:
    @pytest.mark.parametrize("dtype,compress,predictor", [
        (np.uint8, "deflate", 2),
        (np.uint8, "lzw", 1),
        (np.uint16, "packbits", 1),
        (np.int32, "deflate", 2),
        (np.float32, "lzw", 3),
        (np.float64, "deflate", 3),
    ])
    def test_level0_bit_exact(self, dtype, compress, predictor):
        img = _rand((300, 290, 2), dtype, seed=5)
        buf = gt.cog_encode(img, tile=128, compress=compress, predictor=predictor)
        out, _ = gt.tiff_decode(buf)
        assert out.dtype == np.dtype(dtype)
        assert np.array_equal(out, img)

    def test_windowed_decode_both_levels(self):
        img = _rand((520, 400, 3), np.uint8, seed=7)
        buf = gt.cog_encode(img, tile=256, compress="deflate", predictor=2)
        win, _ = gt.tiff_decode_window(buf, 130, 250, 200, 100)
        assert np.array_equal(win, img[250:350, 130:330])
        ov, _ = gt.tiff_decode(buf, level=1)
        wv, _ = gt.tiff_decode_window(buf, 10, 20, 50, 60, level=1)
        assert np.array_equal(wv, ov[20:80, 10:60])

    def test_validation(self):
        img = _rand((64, 64, 1), np.uint8)
        with pytest.raises(ValueError, match="multiples of 16"):
            gt.cog_encode(img, tile=100)
        with pytest.raises(ValueError, match="deflate/lzw"):
            gt.cog_encode(img, compress="jpeg")
        with pytest.raises(ValueError, match="integer"):
            gt.cog_encode(img.astype(np.float32), predictor=2)


class TestCogLayout:
    """The byte layout IS the 'cloud-optimized' claim: every IFD readable
    from the head of the file, overview tiles before full-res tiles."""

    def _ifd_and_data_offsets(self, buf):
        bo = "<"
        ifd_offs, tile_offs = [], {}
        off = struct.unpack_from(bo + "I", buf, 4)[0]
        li = 0
        while off:
            ifd_offs.append(off)
            t, nxt = gt._read_ifd_at(buf, bo, off)
            tile_offs[li] = [int(o) for o in t[gt.TAG_TILE_OFFSETS]]
            off = nxt
            li += 1
        return ifd_offs, tile_offs

    def test_header_first_and_overviews_before_fullres(self):
        img = _rand((700, 600, 1), np.uint8, seed=9)
        buf = gt.cog_encode(img, tile=256, compress="deflate")
        ifd_offs, tile_offs = self._ifd_and_data_offsets(buf)
        assert len(ifd_offs) == 3
        first_data = min(min(v) for v in tile_offs.values())
        assert max(ifd_offs) < first_data  # whole IFD chain at the head
        # smallest overview's data precedes every coarser level's
        assert max(tile_offs[2]) < min(tile_offs[1]) < min(tile_offs[0])

    def test_overviews_flagged_reduced_resolution(self):
        img = _rand((600, 600, 1), np.uint8)
        buf = gt.cog_encode(img, tile=256, compress="none")
        t0 = gt._read_ifd(buf, "<", 0)
        t1 = gt._read_ifd(buf, "<", 1)
        assert gt.TAG_NEW_SUBFILE_TYPE not in t0
        assert t1[gt.TAG_NEW_SUBFILE_TYPE][0] == 1


class TestSparkExport:
    def test_export_then_reingest_roundtrip(self, spark, tmp_path):
        """images -> distributed COG files -> ingest_geotiffs recovers the
        exact pixels and the bottom-left lon/lat anchors."""
        from gis_scripts_spark.raster import codec
        from gis_scripts_spark.sources import ingest, synth

        df = synth.images_df(spark, 8, parts=2, sizes=(32, 64))
        out_dir = str(tmp_path / "cogs")
        manifest = ingest.export_cog(
            df, out_dir, tile=16, compress="deflate", pixel_scale=(0.001, 0.001)
        ).toPandas()
        assert len(manifest) == 8
        assert (manifest["n_levels"] >= 2).all()

        back = ingest.ingest_geotiffs(spark, out_dir + "/*.tif").toPandas()
        back["image_id"] = back["image_id"].str.replace(".tif", "", regex=False)
        back = back.set_index("image_id")
        src = df.toPandas().set_index("image_id")
        assert set(back.index) == set(src.index)
        for iid in src.index:
            want = codec.decode(bytes(src.loc[iid, "bytes"]), src.loc[iid, "fmt"])
            got = codec.decode(bytes(back.loc[iid, "bytes"]), "raw")
            assert np.array_equal(got[:, :, : want.shape[2]], want)
            assert abs(back.loc[iid, "lon"] - src.loc[iid, "lon"]) < 1e-9
            assert abs(back.loc[iid, "lat"] - src.loc[iid, "lat"]) < 1e-9
