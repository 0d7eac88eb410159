"""download_sentinel12 manifest builder (demo_preprocess_height_v2.py:
1210-1261 twin): grid intersection, per-type URL schema, skip-existing,
zero-egress manifest output."""
import os

import numpy as np
import pytest

from srbh_tpu.data.shapefile import ShapeRecord, write_shapefile
from srbh_tpu.tools.preprocess import (
    build_sentinel12_manifest,
    download_sentinel12,
)


@pytest.fixture()
def grids(tmp_path):
    # WorldCover composite grid: 3x3-degree cells with the reference's
    # attribute schema (ll_tile + per-type s3 paths)
    recs = []
    fields = [("ll_tile", "C", 16, 0),
              ("s1_vvvhratio_2020", "C", 80, 0),  # DBF truncates to 10
              ("s2_rgbnir_2020", "C", 80, 0)]
    for i, (x0, y0) in enumerate([(0, 30), (3, 30), (0, 33), (3, 33)]):
        tile = f"N{y0:02d}E{x0:03d}"
        recs.append(ShapeRecord(
            (x0, y0, x0 + 3, y0 + 3),
            {"ll_tile": tile,
             "s1_vvvhratio_2020":
                 f"s3://esa-worldcover-s1/vvvhratio/2020/{tile}.tif",
             "s2_rgbnir_2020":
                 f"s3://esa-worldcover-s2/rgbnir/2020/{tile}.tif"}))
    grid_shp = str(tmp_path / "grid.shp")
    write_shapefile(grid_shp, recs, fields)
    # city extent: overlaps ONLY the (0,30) and (3,30) cells
    query_shp = str(tmp_path / "city.shp")
    write_shapefile(query_shp, [ShapeRecord((2.0, 30.5, 4.0, 31.5), {})],
                    [("id", "N", 4, 0)])
    return query_shp, grid_shp


class TestManifest:
    def test_intersection_and_urls(self, grids, tmp_path):
        query_shp, grid_shp = grids
        fplist, commands = build_sentinel12_manifest(
            query_shp, grid_shp, str(tmp_path / "out"),
            typelist=("s1_vvvhratio", "s2_rgbnir"))
        # 2 intersecting cells x 2 types
        assert len(fplist) == 4 and len(commands) == 4
        assert all("--no-sign-request" in c for c in commands)
        assert any("N30E000" in f for f in fplist)
        assert any("N30E003" in f for f in fplist)
        assert not any("N33" in f for f in fplist)
        assert fplist[0].startswith(str(tmp_path / "out"))

    def test_single_prj_sidecar_fails_loudly(self, grids, tmp_path):
        """ADVICE r3: with exactly one .prj present the CRSs cannot be
        verified — silently assuming they match turns a projected-vs-
        geographic mismatch into an empty/wrong intersection. Must raise."""
        query_shp, grid_shp = grids
        wgs84 = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                 '6378137,298.257223563]],PRIMEM["Greenwich",0],'
                 'UNIT["degree",0.0174532925199433]]')
        qprj = tmp_path / "city.prj"
        qprj.write_text(wgs84)
        with pytest.raises(ValueError, match="prj"):
            build_sentinel12_manifest(query_shp, grid_shp,
                                      str(tmp_path / "out"))
        # both sidecars present (same CRS): works again
        (tmp_path / "grid.prj").write_text(wgs84)
        fplist, _ = build_sentinel12_manifest(query_shp, grid_shp,
                                              str(tmp_path / "out"))
        assert len(fplist) == 4
        # grid-only .prj raises too
        qprj.unlink()
        with pytest.raises(ValueError, match="prj"):
            build_sentinel12_manifest(query_shp, grid_shp,
                                      str(tmp_path / "out"))

    def test_landcover_type_uses_esa_url_schema(self, grids, tmp_path):
        query_shp, grid_shp = grids
        _, commands = build_sentinel12_manifest(
            query_shp, grid_shp, str(tmp_path / "out"),
            typelist=("landcover",), year="2020")
        assert len(commands) == 2
        assert all("s3://esa-worldcover/v100/2020/map/"
                   "ESA_WorldCover_10m_2020_v100_" in c for c in commands)
        _, c21 = build_sentinel12_manifest(
            query_shp, grid_shp, str(tmp_path / "out"),
            typelist=("landcover",), year="2021")
        assert all("v200/2021" in c for c in c21)

    def test_driver_writes_manifest_and_skips_existing(self, grids,
                                                       tmp_path, capsys):
        query_shp, grid_shp = grids
        out = str(tmp_path / "dl")
        os.makedirs(os.path.join(out, "s1_vvvhratio"))
        # pre-place one file: the reference skips existing downloads
        open(os.path.join(out, "s1_vvvhratio", "N30E000.tif"), "w").close()
        fplist = download_sentinel12(query_shp, out,
                                     typelist=("s1_vvvhratio",),
                                     ref_shp=grid_shp)
        assert len(fplist) == 2
        sh = os.path.join(out, "download_manifest.sh")
        assert os.path.exists(sh)
        body = open(sh).read()
        assert "N30E003.tif" in body and "N30E000.tif" not in body

    def test_requires_ref_grid(self, grids, tmp_path):
        query_shp, _ = grids
        with pytest.raises(ValueError, match="ref_shp"):
            download_sentinel12(query_shp, str(tmp_path))
