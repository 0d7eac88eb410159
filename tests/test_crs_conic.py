"""Conic projections + datum shifts (data/crs.py): Lambert Conformal Conic,
Albers Equal-Area, TOWGS84 Helmert — the arbitrary-CRS warp support for
non-UTM height products (reference: gdal.Warp(dstSRS=...) calls in
demo_preprocess_height_v2.py:608-655,1317-1386).

Anchored two ways: Snyder's published ellipsoidal worked examples (USGS PP
1395: LCC pp. 296-297, Albers p. 292, Clarke 1866) and the projections'
defining mathematical invariants (conformality / equal-area / unit scale on
the standard parallels), which no wrong implementation can satisfy
simultaneously with the worked examples.
"""
import numpy as np
import pytest

from srbh_tpu.data import crs

# Clarke 1866 (Snyder's example ellipsoid)
A_CLARKE = 6378206.4
F_CLARKE = 1.0 / 294.9786982


def _meridian_radius(lat, a, f):
    e2 = f * (2 - f)
    s = np.sin(np.radians(lat))
    return a * (1 - e2) / (1 - e2 * s * s) ** 1.5


def _parallel_radius(lat, a, f):
    e2 = f * (2 - f)
    s = np.sin(np.radians(lat))
    return a / np.sqrt(1 - e2 * s * s) * np.cos(np.radians(lat))


def _local_scales(p, lon, lat, d=1e-6):
    """(scale along meridian, scale along parallel) by finite differences."""
    x0, y0 = p.forward(lon, lat)
    xm, ym = p.forward(lon, lat + d)
    xp, yp = p.forward(lon + d, lat)
    dm = np.hypot(xm - x0, ym - y0) / (_meridian_radius(lat, p.a, p.f)
                                       * np.radians(d))
    dp = np.hypot(xp - x0, yp - y0) / (_parallel_radius(lat, p.a, p.f)
                                       * np.radians(d))
    return float(dm), float(dp)


class TestLambertConformalConic:
    def _snyder(self):
        return crs.LambertConformalConic(lat1=33.0, lat2=45.0, lat0=23.0,
                                         lon0=-96.0, a=A_CLARKE, f=F_CLARKE)

    def test_snyder_worked_example(self):
        """PP 1395 pp. 296-297: phi=35N lam=75W -> (1894410.9, 1564649.5)."""
        x, y = self._snyder().forward(-75.0, 35.0)
        assert x == pytest.approx(1894410.9, abs=0.5)
        assert y == pytest.approx(1564649.5, abs=0.5)

    def test_roundtrip_grid(self):
        p = self._snyder()
        lon, lat = np.meshgrid(np.linspace(-120, -70, 7),
                               np.linspace(18, 55, 7))
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_conformal_and_unit_scale_on_parallels(self):
        p = self._snyder()
        for lat in (25.0, 33.0, 38.7, 45.0, 52.0):
            h, k = _local_scales(p, -83.0, lat)
            assert h == pytest.approx(k, rel=1e-6), f"not conformal at {lat}"
        for lat in (33.0, 45.0):  # standard parallels: k == 1
            _, k = _local_scales(p, -101.0, lat)
            assert k == pytest.approx(1.0, abs=1e-7)

    def test_one_sp_variant(self):
        # 1SP with k0: conformal, k == k0 on the standard parallel
        p = crs.LambertConformalConic(lat1=49.0, lat0=49.0, lon0=-95.0,
                                      k0=0.9990, false_easting=100000.0)
        h, k = _local_scales(p, -95.0, 49.0)
        assert k == pytest.approx(0.9990, abs=1e-7)
        assert h == pytest.approx(k, rel=1e-6)
        x, y = p.forward(-92.0, 51.0)
        lon, lat = p.inverse(x, y)
        assert lon == pytest.approx(-92.0, abs=1e-9)
        assert lat == pytest.approx(51.0, abs=1e-9)


class TestAlbersEqualArea:
    def _snyder(self):
        return crs.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23.0,
                                   lon0=-96.0, a=A_CLARKE, f=F_CLARKE)

    def test_snyder_worked_example(self):
        """PP 1395 p. 292: phi=35N lam=75W -> (1885472.7, 1535925.0)."""
        x, y = self._snyder().forward(-75.0, 35.0)
        assert x == pytest.approx(1885472.7, abs=0.5)
        assert y == pytest.approx(1535925.0, abs=0.5)

    def test_roundtrip_grid(self):
        p = self._snyder()
        lon, lat = np.meshgrid(np.linspace(-125, -66, 7),
                               np.linspace(20, 52, 7))
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_equal_area_everywhere(self):
        p = self._snyder()
        for lon, lat in ((-120.0, 24.0), (-96.0, 37.5), (-75.0, 49.0)):
            h, k = _local_scales(p, lon, lat)
            assert h * k == pytest.approx(1.0, rel=1e-6), \
                f"area distorted at {lon},{lat}"

    def test_unit_scale_on_standard_parallels(self):
        p = self._snyder()
        for lat in (29.5, 45.5):
            _, k = _local_scales(p, -110.0, lat)
            assert k == pytest.approx(1.0, abs=1e-7)

    def test_epsg_5070_conus(self):
        """NAD83 / Conus Albers: the CBRA/CNBH-style product CRS."""
        p = crs.from_epsg(5070)
        assert isinstance(p, crs.AlbersEqualArea)
        # Denver area roundtrip through WGS84 UTM 13N
        x, y = p.forward(-104.99, 39.74)
        e, n = crs.transform(p, crs.from_epsg(32613), x, y)
        x2, y2 = crs.transform(crs.from_epsg(32613), p, e, n)
        assert x2 == pytest.approx(x, abs=1e-6)
        assert y2 == pytest.approx(y, abs=1e-6)


class TestHelmertDatumShift:
    def test_epsg_position_vector_example(self):
        """EPSG guidance note 7-2 WGS72->WGS84 example (9606)."""
        x, y, z = crs._helmert(3657660.66, 255768.55, 5201382.11,
                               (0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219))
        assert x == pytest.approx(3657660.78, abs=0.02)
        assert y == pytest.approx(255778.43, abs=0.02)
        assert z == pytest.approx(5201387.75, abs=0.02)

    def test_helmert_inverse(self):
        params = (15.8, -154.4, -82.3, 0.3, -0.2, 0.5, 1.2)
        p0 = (2e6, 4e6, 4.5e6)
        fwd = crs._helmert(*p0, params)
        back = crs._helmert(*fwd, params, inverse=True)
        np.testing.assert_allclose(back, p0, atol=1e-4)

    def test_geodetic_ecef_roundtrip(self):
        lon = np.linspace(-170, 170, 9)
        lat = np.linspace(-80, 80, 9)
        x, y, z = crs._geodetic_to_ecef(lon, lat, crs._A, crs._F)
        lon2, lat2 = crs._ecef_to_geodetic(x, y, z, crs._A, crs._F)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    BEIJING = ('PROJCS["Beijing 1954 / Gauss-Kruger zone 20",GEOGCS['
               '"Beijing 1954",DATUM["Beijing_1954",SPHEROID['
               '"Krassowsky 1940",6378245,298.3],TOWGS84[15.8,-154.4,'
               '-82.3,0,0,0,0]],PRIMEM["Greenwich",0],UNIT["degree",'
               '0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
               'PARAMETER["central_meridian",117],PARAMETER['
               '"scale_factor",1],PARAMETER["false_easting",500000],'
               'UNIT["metre",1]]')

    def test_towgs84_shift_is_applied(self):
        """Beijing 1954 -> WGS84: the ~170 m Helmert shift must show up
        (silently ignoring it was exactly the round-2 failure mode)."""
        p = crs.from_wkt(self.BEIJING)
        assert isinstance(p, crs.TransverseMercator)
        assert p.towgs84 == (15.8, -154.4, -82.3, 0.0, 0.0, 0.0, 0.0)
        x, y = 500000.0, 4427757.0  # on the central meridian, ~40N
        lon_s, lat_s = crs.transform(p, crs.Geographic(), x, y)
        lon_n, lat_n = p.inverse(x, y)  # no datum shift
        dlon = abs(lon_s - lon_n) * 111e3 * np.cos(np.radians(40))
        dlat = abs(lat_s - lat_n) * 111e3
        shift = float(np.hypot(dlon, dlat))
        assert 50.0 < shift < 400.0, f"implausible datum shift {shift} m"

    def test_datum_shift_roundtrips(self):
        p = crs.from_wkt(self.BEIJING)
        utm50 = crs.from_epsg(32650)
        x, y = 455000.0, 4420000.0
        e, n = crs.transform(p, utm50, x, y)
        x2, y2 = crs.transform(utm50, p, e, n)
        assert x2 == pytest.approx(x, abs=1e-3)
        assert y2 == pytest.approx(y, abs=1e-3)

    def test_same_datum_skips_shift(self):
        assert crs._same_datum(crs.Geographic(), crs.from_epsg(32650))
        assert not crs._same_datum(crs.Geographic(),
                                   crs.from_wkt(self.BEIJING))


class TestConicWkts:
    ALBERS_5070 = (
        'PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",'
        'DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",'
        '6378137,298.257222101]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Albers_Conic_Equal_Area"],'
        'PARAMETER["latitude_of_center",23],'
        'PARAMETER["longitude_of_center",-96],'
        'PARAMETER["standard_parallel_1",29.5],'
        'PARAMETER["standard_parallel_2",45.5],'
        'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]')
    LCC_CONUS = (
        'PROJCS["NAD83 / Conus Lambert",GEOGCS["NAD83",'
        'DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",'
        '6378137,298.257222101]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",33],'
        'PARAMETER["standard_parallel_2",45],'
        'PARAMETER["latitude_of_origin",39],'
        'PARAMETER["central_meridian",-96],'
        'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]')

    def test_albers_wkt_parses_and_matches_epsg(self):
        p = crs.from_wkt(self.ALBERS_5070)
        q = crs.from_epsg(5070)
        for lon, lat in ((-104.99, 39.74), (-80.19, 25.76)):
            np.testing.assert_allclose(p.forward(lon, lat),
                                       q.forward(lon, lat), atol=1e-6)

    def test_lcc_wkt_parses(self):
        p = crs.from_wkt(self.LCC_CONUS)
        assert isinstance(p, crs.LambertConformalConic)
        x, y = p.forward(-96.0, 39.0)
        assert x == pytest.approx(0.0, abs=1e-6)
        assert y == pytest.approx(0.0, abs=1e-6)
        # NAD83 accepted as zero-shift: transforms to WGS84 UTM work
        e, n = crs.transform(p, 32614, *p.forward(-98.5, 41.0))
        lon, lat = crs.transform(32614, p, e, n)
        x2, y2 = p.forward(-98.5, 41.0)
        assert lon == pytest.approx(x2, abs=1e-4)
        assert lat == pytest.approx(y2, abs=1e-4)

    def test_epsg_5070_wkt_and_code_roundtrip(self):
        p = crs.from_epsg(5070)
        assert crs.epsg_of(p) == 5070
        q = crs.from_wkt(crs.wkt_for_epsg(5070))
        assert crs.epsg_of(q) == 5070
        np.testing.assert_allclose(p.forward(-104.99, 39.74),
                                   q.forward(-104.99, 39.74), atol=1e-6)
        # a WGS84 UTM is NOT mislabelled as 5070
        assert crs.epsg_of(crs.from_epsg(32613)) == 32613

    def test_unknown_datum_without_towgs84_still_raises(self):
        wkt = self.ALBERS_5070.replace("North_American_Datum_1983",
                                       "Pulkovo_1942")
        with pytest.raises(ValueError, match="datum"):
            crs.from_wkt(wkt)
