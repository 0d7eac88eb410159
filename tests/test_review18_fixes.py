"""Regression tests for the eighteenth review (round-5 diff a9f6954..HEAD).

Findings fixed here:
1. crs: spherical-LAEA WKTs (SPHEROID inverse-flattening 0) crashed with
   ZeroDivisionError in _conic_q despite the advertised
   'lambert_azimuthal_equal_area_(spherical)' alias.
2. checkpoint: a converted bare-state_dict .npz (no log_vars — convert
   supports such tars) crashed restore_into_state with a KeyError.
3. losses: pick_class silently zeroed out-of-range labels where the old
   take_along_axis clamped (jit 'clip' mode) — now clamps identically.
(Also fixed without dedicated tests: `python bench.py --sr-train`
dispatch, mesh fallback catching RuntimeError, train_diag closure/no-op
cleanups — covered by the existing tool runs / parallelism suites.)
"""
import numpy as np
import pytest

import jax.numpy as jnp


class TestSphericalLAEA:
    WKT = (
        'PROJCS["Sphere_LAEA",GEOGCS["GCS_Sphere",'
        'DATUM["D_Sphere",SPHEROID["Sphere",6371228,0],'
        'TOWGS84[0,0,0,0,0,0,0]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
        'PARAMETER["latitude_of_origin",90],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],'
        'UNIT["Meter",1]]')

    def test_sphere_wkt_parses_and_roundtrips(self):
        from srbh_tpu.data import crs

        p = crs.from_wkt(self.WKT)
        assert p.f == 0.0
        lon, lat = np.array([10.0, -45.0, 120.0]), np.array([75.0, 60.0, 85.0])
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_sphere_matches_vanishing_flattening_limit(self):
        # the e -> 0 branch must agree with the general ellipsoidal code
        # evaluated at a tiny (but nonzero) flattening
        from srbh_tpu.data.crs import LambertAzimuthalEqualArea

        a = 6371228.0
        sph = LambertAzimuthalEqualArea(lat0=52, lon0=10, a=a, f=0.0)
        lim = LambertAzimuthalEqualArea(lat0=52, lon0=10, a=a, f=1e-12)
        x1, y1 = sph.forward(8.0, 48.0)
        x2, y2 = lim.forward(8.0, 48.0)
        assert abs(x1 - x2) < 1e-2 and abs(y1 - y2) < 1e-2

    def test_polar_sphere_radius_snyder(self):
        # spherical polar LAEA: rho = 2 R sin((90-lat)/2) (Snyder 24-3
        # with R_q = R); check at lat=60
        from srbh_tpu.data.crs import LambertAzimuthalEqualArea

        R = 6371228.0
        p = LambertAzimuthalEqualArea(lat0=90, lon0=0, a=R, f=0.0)
        x, y = p.forward(90.0, 60.0)  # lam=90deg -> x=rho
        rho = 2.0 * R * np.sin(np.radians(15.0))
        assert abs(x - rho) < 1e-3 and abs(y) < 1e-3


class TestNpzWithoutLogVars:
    def test_restore_warns_and_keeps_fresh_log_vars(self, tmp_path):
        from srbh_tpu.train import checkpoint
        from srbh_tpu.train.convert import save_tree_npz
        from srbh_tpu.train.state import TrainState

        variables = {
            "params": {"dense": {"kernel": np.ones((2, 2), np.float32)}},
            "batch_stats": {"bn": {"mean": np.zeros((2,), np.float32)}},
        }
        state = TrainState.create(variables, n_log_vars=3, lr=1e-3)
        path = str(tmp_path / "conv.npz")
        # a converted bare-state_dict tar: params + stats, NO log_vars
        save_tree_npz(path, {"params": variables["params"],
                             "batch_stats": variables["batch_stats"]})
        payload = checkpoint.load_checkpoint(path)
        assert payload is not None and "log_vars" not in payload
        with pytest.warns(UserWarning, match="no log_vars"):
            restored = checkpoint.restore_into_state(state, payload)
        np.testing.assert_array_equal(np.asarray(restored.log_vars),
                                      np.asarray(state.log_vars))
        np.testing.assert_array_equal(
            np.asarray(restored.params["dense"]["kernel"]),
            variables["params"]["dense"]["kernel"])


class TestPickClassClamp:
    def test_out_of_range_labels_clamp_like_take_along_axis(self):
        from srbh_tpu.losses.adaptive import pick_class

        vals = jnp.asarray(np.random.default_rng(0).random((4, 5, 3)),
                           jnp.float32)
        labels = jnp.asarray([[0, 2, -1, 7, 1]] * 4)
        got = pick_class(vals, labels)
        want = jnp.take_along_axis(
            vals, jnp.clip(labels, 0, 2)[..., None], axis=-1)[..., 0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
