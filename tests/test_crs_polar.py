"""Polar Stereographic + (Pseudo-)Mercator CRS engine tests.

Anchored on the EPSG Guidance Note 7-2 worked examples (the same policy as
the conic tests in test_crs_conic.py): the reference warps across arbitrary
GDAL dstSRS (demo_preprocess_height_v2.py:608-655); these families cover
the high-latitude (NSIDC/Antarctic/UPS) and web-tiled (EPSG:3857/3395)
products.
"""
import math

import numpy as np
import pytest

from srbh_tpu.data import crs


class TestPolarStereographicVariantA:
    def test_epsg_ups_north_worked_example(self):
        """EPSG GN7-2 method 9810 example (WGS 84 / UPS North, EPSG:5041):
        73N 44E -> E 3320416.75, N 632668.43 (k0=0.994, FE=FN=2e6)."""
        p = crs.from_epsg(5041)
        x, y = p.forward(44.0, 73.0)
        assert abs(float(x) - 3320416.75) < 0.01
        assert abs(float(y) - 632668.43) < 0.01
        lon, lat = p.inverse(3320416.75, 632668.43)
        assert abs(float(lon) - 44.0) < 1e-7
        assert abs(float(lat) - 73.0) < 1e-7

    def test_ups_south_roundtrip_and_aspect(self):
        p = crs.from_epsg(5042)
        # at the central meridian, points sit NORTH of the grid origin in
        # the south aspect (EPSG: N = FN + rho cos(dlon))
        x, y = p.forward(0.0, -75.0)
        assert abs(float(x) - 2000000.0) < 1e-6
        assert float(y) > 2000000.0
        lon = np.array([-120.0, 0.0, 45.0, 179.0])
        lat = np.array([-65.0, -75.0, -89.0, -70.0])
        rx, ry = p.forward(lon, lat)
        rlon, rlat = p.inverse(rx, ry)
        np.testing.assert_allclose(rlon, lon, atol=1e-9)
        np.testing.assert_allclose(rlat, lat, atol=1e-9)

    def test_legacy_ups_codes_alias(self):
        a = crs.from_epsg(5041).forward(10.0, 80.0)
        b = crs.from_epsg(32661).forward(10.0, 80.0)
        assert a == b


class TestPolarStereographicVariantB:
    def test_epsg_australian_antarctic_worked_example(self):
        """EPSG GN7-2 method 9829 example (WGS 84 / Australian Antarctic
        Polar Stereographic, EPSG:3032): standard parallel 71S, lon0 70E,
        FE=FN=6e6; 75S 120E -> E 7255380.79, N 7053389.56; the derived
        scale at the pole is ko=0.97276901."""
        p = crs.PolarStereographic(lat_ts=-71.0, lon0=70.0,
                                   false_easting=6000000.0,
                                   false_northing=6000000.0)
        assert abs(p.k0 - 0.97276901) < 1e-8
        x, y = p.forward(120.0, -75.0)
        assert abs(float(x) - 7255380.79) < 0.01
        assert abs(float(y) - 7053389.56) < 0.01

    def test_true_scale_at_standard_parallel(self):
        """The defining property of variant B: local scale along the
        meridian equals 1 at the standard parallel (finite differences
        vs the ellipsoidal meridian radius)."""
        for code, lat_ts in ((3413, 70.0), (3031, -71.0), (3976, -70.0)):
            p = crs.from_epsg(code)
            e2 = p.f * (2.0 - p.f)
            d = 1e-6
            x1, y1 = p.forward(p.lon0, lat_ts - d / 2)
            x2, y2 = p.forward(p.lon0, lat_ts + d / 2)
            dist = math.hypot(float(x2) - float(x1), float(y2) - float(y1))
            phi = math.radians(lat_ts)
            merid_r = p.a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            assert abs(dist / (merid_r * math.radians(d)) - 1.0) < 1e-6

    def test_variant_b_equals_variant_a_with_derived_k0(self):
        pb = crs.PolarStereographic(lat_ts=70.0, lon0=-45.0)
        pa = crs.PolarStereographic(lat_ts=90.0, lon0=-45.0, k0=pb.k0)
        lon = np.array([-45.0, 30.0, 150.0])
        lat = np.array([85.0, 70.0, 60.0])
        np.testing.assert_array_equal(pb.forward(lon, lat),
                                      pa.forward(lon, lat))

    def test_variant_b_rejects_explicit_scale(self):
        with pytest.raises(ValueError, match="EITHER"):
            crs.PolarStereographic(lat_ts=70.0, k0=0.994)

    def test_nsidc_north_orientation(self):
        """EPSG:3413 (lon0=-45): along the central meridian the grid-y of
        a point is NEGATIVE (pole at origin, y toward lon0+180)."""
        p = crs.from_epsg(3413)
        x, y = p.forward(-45.0, 70.0)
        assert abs(float(x)) < 1e-6 and float(y) < 0
        # east of the central meridian -> positive x
        x, _ = p.forward(-40.0, 70.0)
        assert float(x) > 0

    def test_inverse_longitude_wraps(self):
        p = crs.from_epsg(3413)  # lon0=-45: naive atan2 offset would give
        x, y = p.forward(170.0, 75.0)  # lon outside (-225, 135]
        lon, lat = p.inverse(x, y)
        assert abs(float(lon) - 170.0) < 1e-9
        assert abs(float(lat) - 75.0) < 1e-9


class TestMercator:
    def test_pseudo_mercator_epsg_worked_example(self):
        """EPSG GN7-2 method 1024 example (WGS 84 / Pseudo-Mercator):
        24d22'54.433"S 100d20'00"W -> E -11169055.58, N -2800000.00."""
        p = crs.from_epsg(3857)
        lat = -(24 + 22 / 60 + 54.433 / 3600)
        lon = -(100 + 20 / 60)
        x, y = p.forward(lon, lat)
        assert abs(float(x) - -11169055.58) < 0.01
        assert abs(float(y) - -2800000.00) < 0.01
        rlon, rlat = p.inverse(x, y)
        assert abs(float(rlon) - lon) < 1e-9
        assert abs(float(rlat) - lat) < 1e-9

    def test_pseudo_differs_from_ellipsoidal_by_kilometres(self):
        """EPSG's warning made concrete: treating 3857 as ellipsoidal
        Mercator (3395) is a >10 km northing error at mid latitudes."""
        lat = -(24 + 22 / 60 + 54.433 / 3600)
        y_sph = float(crs.from_epsg(3857).forward(0.0, lat)[1])
        y_ell = float(crs.from_epsg(3395).forward(0.0, lat)[1])
        assert abs(y_sph - y_ell) > 10000.0

    def test_world_mercator_roundtrip_and_equator_identity(self):
        p = crs.from_epsg(3395)
        # x at the equator is arc length along the equator
        x, y = p.forward(10.0, 0.0)
        assert abs(float(x) - math.radians(10.0) * p.a) < 1e-6
        assert abs(float(y)) < 1e-6
        lon = np.array([-170.0, -10.0, 0.0, 100.0])
        lat = np.array([70.0, -45.0, 0.0, 12.5])
        rlon, rlat = p.inverse(*p.forward(lon, lat))
        np.testing.assert_allclose(rlon, lon, atol=1e-9)
        np.testing.assert_allclose(rlat, lat, atol=1e-9)

    def test_mercator_2sp_scale_at_standard_parallel(self):
        """Variant B (EPSG 9805): k0 = m(lat_ts); x-scale along the
        standard parallel equals 1."""
        p = crs.Mercator(lat_ts=42.0)
        d = 1e-6
        x1, _ = p.forward(10.0 - d / 2, 42.0)
        x2, _ = p.forward(10.0 + d / 2, 42.0)
        e2 = p.f * (2.0 - p.f)
        phi = math.radians(42.0)
        # radius of the parallel on the ellipsoid
        r_par = p.a * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        assert abs((float(x2) - float(x1))
                   / (r_par * math.radians(d)) - 1.0) < 1e-6


class TestWktAndEpsgPlumbing:
    def test_wkt_roundtrips(self):
        for code in (3857, 3413, 3976, 3031):
            w = crs.wkt_for_epsg(code)
            assert crs.epsg_of(crs.from_wkt(w)) == code

    def test_gdal_polar_wkt1_parses_as_variant_b(self):
        w = crs.wkt_for_epsg(3413)
        p = crs.from_wkt(w)
        assert isinstance(p, crs.PolarStereographic)
        assert p.lat_ts == 70.0 and p.lon0 == -45.0
        assert abs(p.k0 - crs.from_epsg(3413).k0) < 1e-15

    def test_esri_south_pole_alias(self):
        wkt = ('PROJCS["South_Pole_Stereographic",GEOGCS["GCS_WGS_1984",'
               'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137,'
               '298.257223563]],PRIMEM["Greenwich",0],'
               'UNIT["Degree",0.0174532925199433]],'
               'PROJECTION["Stereographic_South_Pole"],'
               'PARAMETER["False_Easting",0],PARAMETER["False_Northing",0],'
               'PARAMETER["Central_Meridian",0],'
               'PARAMETER["Standard_Parallel_1",-71],UNIT["Meter",1]]')
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.PolarStereographic)
        assert crs.epsg_of(p) == 3031

    def test_plain_mercator_1sp_stays_ellipsoidal(self):
        wkt = ('PROJCS["WGS 84 / World Mercator",GEOGCS["WGS 84",'
               'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
               '298.257223563]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]],'
               'PROJECTION["Mercator_1SP"],'
               'PARAMETER["central_meridian",0],'
               'PARAMETER["scale_factor",1],'
               'PARAMETER["false_easting",0],'
               'PARAMETER["false_northing",0],UNIT["metre",1]]')
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.Mercator)
        assert crs.epsg_of(p) == 3395

    def test_proj4_extension_forces_spherical(self):
        """A 3857-style WKT without the name marker but with the PROJ4
        +a=+b extension must still be read as spherical."""
        wkt = crs.wkt_for_epsg(3857).replace("WGS 84 / Pseudo-Mercator",
                                             "unnamed")
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.PseudoMercator)

    def test_transform_through_hub(self):
        """transform() composes the new projections with the existing
        geographic hub: 3413 -> 4326 -> 32633 roundtrip."""
        x, y = crs.transform(4326, 3413, np.array([15.0]), np.array([78.0]))
        lon, lat = crs.transform(3413, 4326, x, y)
        assert abs(np.ravel(lon)[0] - 15.0) < 1e-9
        assert abs(np.ravel(lat)[0] - 78.0) < 1e-9
        ex, ny = crs.transform(3413, 32633, x, y)  # Svalbard UTM 33N
        ex2, ny2 = crs.from_epsg(32633).forward(15.0, 78.0)
        assert abs(np.ravel(ex)[0] - float(ex2)) < 1e-6
        assert abs(np.ravel(ny)[0] - float(ny2)) < 1e-6

    def test_ups_epsg_of_requires_ups_scale(self):
        p = crs.PolarStereographic(lat_ts=90.0, k0=1.0,
                                   false_easting=2000000.0,
                                   false_northing=2000000.0)
        assert crs.epsg_of(p) is None

    def test_towgs84_carried_and_applied(self):
        """A TOWGS84-bearing polar WKT shifts through the Helmert hub
        (nonzero shift -> coordinates move, and epsg_of refuses to stamp
        the shifted CRS with a WGS84 code)."""
        base = crs.wkt_for_epsg(3413)
        shifted = base.replace(
            'SPHEROID["WGS 84",6378137,298.257223563]]',
            'SPHEROID["WGS 84",6378137,298.257223563],'
            'TOWGS84[100,0,0,0,0,0,0]]')
        p = crs.from_wkt(shifted)
        assert p.towgs84 == (100.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        assert crs.epsg_of(p) is None
        x0, y0 = crs.transform(4326, crs.from_wkt(base), 10.0, 75.0)
        x1, y1 = crs.transform(4326, p, 10.0, 75.0)
        d = math.hypot(float(x1) - float(x0), float(y1) - float(y0))
        assert 10.0 < d < 200.0  # a ~100 m datum shift, projected
