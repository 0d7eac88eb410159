"""Round-5 advisor-finding regressions (ADVICE.md r4).

* trainer fsdp batch-divisibility guard
* crs WKT2 'variant A' polar spelling
* mesh_utils fallback warns instead of silently degrading
"""
import numpy as np
import pytest

from srbh_tpu.data import crs


class TestPolarVariantASpelling:
    def test_wkt2_variant_a_spelling_parses(self):
        """'Polar_Stereographic_(variant_A)' (UPS-style, k0 given) must
        parse like the plain spelling — it fell through to the
        unsupported-projection error before round 5."""
        wkt = ('PROJCS["WGS 84 / UPS North",GEOGCS["WGS 84",'
               'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
               '298.257223563]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Polar_Stereographic_(variant_A)"],'
               'PARAMETER["latitude_of_origin",90],'
               'PARAMETER["central_meridian",0],'
               'PARAMETER["scale_factor",0.994],'
               'PARAMETER["false_easting",2000000],'
               'PARAMETER["false_northing",2000000],UNIT["metre",1]]')
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.PolarStereographic)
        assert p.k0 == 0.994
        q = crs.from_epsg(5041)  # UPS North
        x, y = p.forward(45.0, 75.0)
        x2, y2 = q.forward(45.0, 75.0)
        assert abs(float(x) - float(x2)) < 1e-6
        assert abs(float(y) - float(y2)) < 1e-6


class TestFsdpBatchGuard:
    def test_indivisible_batch_raises_descriptive(self, tmp_path):
        """fsdp=True used to force data_parallel without the divisibility
        check the auto-DP path has; now it fails up front."""
        import jax

        from srbh_tpu.train.config import TrainConfig
        from srbh_tpu.train.trainer import main

        n = jax.device_count()
        cfg = TrainConfig(datapath=str(tmp_path), logdir=str(tmp_path),
                          batch_size=n + 1)
        with pytest.raises(ValueError, match="fsdp requires batch_size"):
            main(cfg, fsdp=True)


class TestMeshFallbackWarns:
    def test_fallback_emits_warning(self, monkeypatch):
        from jax.experimental import mesh_utils

        from srbh_tpu.parallel import mesh as pmesh

        def boom(*a, **k):
            raise ValueError("unmappable device subset")

        monkeypatch.setattr(mesh_utils, "create_device_mesh", boom)
        with pytest.warns(RuntimeWarning, match="row-major"):
            m = pmesh.make_mesh()
        # the fallback mesh is still usable
        assert int(np.prod(m.devices.shape)) >= 1
