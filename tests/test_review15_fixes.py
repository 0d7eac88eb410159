"""Regression tests for the fifteenth adversarial review pass.

Findings: VirtualMosaic NaN-collar transparency, main_proc_product
mixed-CRS fail-loud, from_wkt datum guards, epsg_from_geokeys 32767
sentinel, per-loss USM switches reaching the GAN step, dead
compare_height_products parameter.
"""
import inspect
import os

import numpy as np
import pytest

from srbh_tpu.data import crs
from srbh_tpu.data.tiff import write_tiff
from srbh_tpu.tools import products as prod


def _tif(tmp_path, name, arr, gt, **kw):
    p = str(tmp_path / name)
    write_tiff(p, arr, geotransform=gt, **kw)
    return p


class TestVirtualMosaicNaN:
    def test_nan_collar_is_transparent(self, tmp_path):
        # later tile's NaN fill must not punch holes into the earlier
        # tile's real data (CNBH-10m uses NaN fill, nodata=0 products)
        g1 = (0, 1, 0, 10, 0, -1)
        a = np.full((10, 10), 7.0, np.float32)
        b = np.full((10, 10), np.nan, np.float32)
        b[:, :3] = 3.0
        p1 = _tif(tmp_path, "a.tif", a, g1)
        p2 = _tif(tmp_path, "b.tif", b, g1)
        m = prod.VirtualMosaic([p1, p2], nodata=0.0)
        out = m.read_window((0, 0, 10, 10), resolution=1.0)
        assert (out[:, :3] == 3.0).all()       # later valid wins
        assert (out[:, 3:] == 7.0).all()       # NaN collar transparent
        vals = m.sample(np.array([5.5]), np.array([5.5]))
        assert vals[0] == 7.0

    def test_nan_nodata_sentinel(self, tmp_path):
        g1 = (0, 1, 0, 4, 0, -1)
        a = np.full((4, 4), np.nan, np.float32)
        a[0, 0] = 2.0  # row 0 = top (y in (3,4))
        p = _tif(tmp_path, "n.tif", a, g1)
        m = prod.VirtualMosaic([p], nodata=float("nan"))
        out = m.read_window((0, 0, 4, 4), resolution=1.0)
        assert out[0, 0] == 2.0
        assert np.isnan(out[1:]).all()

    def test_integer_dtype_mask_safe(self, tmp_path):
        # the NaN test must not break integer mosaics
        g1 = (0, 1, 0, 4, 0, -1)
        p = _tif(tmp_path, "i.tif", np.full((4, 4), 5, np.uint8), g1)
        m = prod.VirtualMosaic([p], nodata=9)
        out = m.read_window((0, 0, 4, 4), resolution=1.0, dtype=np.int32)
        assert (out == 5).all()


class TestMixedCrsFailLoud:
    def test_mixed_codes_without_common_epsg_raise(self, tmp_path):
        g = (500000, 10, 0, 4000000, 0, -10)
        p1 = _tif(tmp_path, "P_a.tif", np.ones((4, 4), np.uint8), g,
                  geo_keys=crs.geokeys_for_epsg(32617))
        p2 = _tif(tmp_path, "P_b.tif", np.ones((4, 4), np.uint8), g,
                  geo_keys=crs.geokeys_for_epsg(32618))
        with pytest.raises(ValueError, match="multiple CRSes"):
            prod.main_proc_product([p1, p2], [], str(tmp_path / "res"),
                                   suffix="P")

    def test_user_defined_geokey_is_none(self):
        # ProjectedCSTypeGeoKey=32767 is the user-defined sentinel
        import struct

        payload = struct.pack("<8H", 1, 1, 0, 1, 3072, 0, 1, 32767)
        assert crs.epsg_from_geokeys(payload) is None
        # ...and a geographic fallback key still wins over the sentinel
        payload = struct.pack("<12H", 1, 1, 0, 2,
                              3072, 0, 1, 32767, 2048, 0, 1, 4326)
        assert crs.epsg_from_geokeys(payload) == 4326


class TestDatumGuards:
    BEIJING = ('PROJCS["Beijing 1954 / Gauss-Kruger zone 20",GEOGCS['
               '"Beijing 1954",DATUM["Beijing_1954",SPHEROID['
               '"Krassowsky 1940",6378245,298.3],TOWGS84[15.8,-154.4,'
               '-82.3,0,0,0,0]],PRIMEM["Greenwich",0],UNIT["degree",'
               '0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
               'PARAMETER["central_meridian",117],PARAMETER['
               '"scale_factor",1],PARAMETER["false_easting",500000],'
               'UNIT["metre",1]]')

    # Round-3 policy change: datums with an explicit TOWGS84 clause now
    # PARSE and transform() applies the Helmert shift (tests/
    # test_crs_conic.py pins the math); only unknown datums WITHOUT a
    # TOWGS84 clause still fail loudly — the original silent-~100 m-error
    # guard this review introduced.

    def test_non_wgs84_datum_without_towgs84_raises(self):
        import re

        stripped = re.sub(r",TOWGS84\[[^\]]*\]", "", self.BEIJING)
        with pytest.raises(ValueError, match="datum"):
            crs.from_wkt(stripped)

    def test_towgs84_datum_parses_with_shift(self):
        p = crs.from_wkt(self.BEIJING)
        assert isinstance(p, crs.TransverseMercator)
        assert p.towgs84 == (15.8, -154.4, -82.3, 0.0, 0.0, 0.0, 0.0)

    def test_nonzero_towgs84_is_applied_not_ignored(self):
        wkt = ('GEOGCS["x",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
               '298.257223563],TOWGS84[1,2,3,0,0,0,0]],PRIMEM["Greenwich",'
               '0],UNIT["degree",0.0174532925199433]]')
        p = crs.from_wkt(wkt)
        lon, lat = crs.transform(p, crs.Geographic(), 116.0, 40.0)
        shift_m = float(np.hypot((lon - 116.0) * 111e3 * np.cos(np.radians(40)),
                                 (lat - 40.0) * 111e3))
        assert 0.5 < shift_m < 5.0, f"TOWGS84[1,2,3] shift {shift_m} m"

    def test_wgs84_variants_still_parse(self):
        for name in ("WGS_1984", "D_WGS_1984", "World Geodetic System 1984"):
            wkt = (f'GEOGCS["WGS 84",DATUM["{name}",SPHEROID["WGS 84",'
                   '6378137,298.257223563],TOWGS84[0,0,0,0,0,0,0]],'
                   'PRIMEM["Greenwich",0],UNIT["degree",'
                   '0.0174532925199433]]')
            assert isinstance(crs.from_wkt(wkt), crs.Geographic)


class TestUsmSwitches:
    def test_yml_switches_reach_trainer(self, tmp_path):
        yml = tmp_path / "f.yml"
        yml.write_text(
            "scale: 4\nl1_gt_usm: false\npercep_gt_usm: false\n"
            "gan_gt_usm: true\nnetwork_g: {num_feat: 8, num_block: 1}\n"
            "train: {optim_g: {lr: 1.0e-4}}\n")
        from srbh_tpu.train.sr_config import trainer_from_yml

        t = trainer_from_yml(str(yml), perceptual=False)
        assert t.l1_gt_usm is False
        assert t.percep_gt_usm is False
        assert t.gan_gt_usm is True

    def test_l1_usm_switch_changes_objective(self):
        import jax
        import jax.numpy as jnp

        from srbh_tpu.train.sr_trainer import RealESRGANTrainer

        rng = jax.random.PRNGKey(0)
        lq = jax.random.uniform(rng, (1, 8, 8, 3))
        gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        metrics = {}
        for usm in (True, False):
            t = RealESRGANTrainer(num_feat=8, num_block=1, num_grow_ch=8,
                                  disc_feat=8, perceptual=False,
                                  l1_gt_usm=usm)
            state = t.init(rng, lq.shape)
            _, m = t.make_step()(state, lq, gt)
            metrics[usm] = float(m["l_g_pix"])
        # same init, same data: only the GT sharpening differs
        assert metrics[True] != pytest.approx(metrics[False], rel=1e-6)


def test_compare_height_products_has_no_dead_param():
    sig = inspect.signature(prod.compare_height_products)
    assert "resolution" not in sig.parameters
