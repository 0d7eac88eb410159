"""CRS engine (data/crs.py): exact anchors, round-trips, WKT parsing.

Anchors chosen so no external geodesy library is needed:
* the central meridian maps to (false_easting, 0) exactly;
* the WGS84 quarter-meridian arc is 10001965.7293 m (published constant),
  so TM northing at the pole must be k0 times that;
* the UTM grid reference of the CN Tower (43d38'33.24"N 79d23'13.7"W ->
  17N 630084 E, 4833438 N) is the textbook worked example;
* forward/inverse must be mutually inverse to ~1e-9 degrees.
"""
import numpy as np
import pytest

from srbh_tpu.data import crs

WKT_UTM17N = (
    'PROJCS["WGS 84 / UTM zone 17N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-81],'
    'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1]]')
WKT_GEO = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
           '298.257223563]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]]')


def test_central_meridian_anchor():
    p = crs.utm(31)  # lon0 = 3E
    x, y = p.forward(3.0, 0.0)
    assert abs(float(x) - 500000.0) < 1e-6
    assert abs(float(y)) < 1e-6


def test_quarter_meridian_pole_anchor():
    p = crs.utm(31)
    _, y = p.forward(3.0, 90.0)
    assert abs(float(y) - 0.9996 * 10001965.7293) < 1e-3


def test_cn_tower_worked_example():
    lat = 43.0 + 38.0 / 60 + 33.24 / 3600
    lon = -(79.0 + 23.0 / 60 + 13.7 / 3600)
    x, y = crs.utm(17).forward(lon, lat)
    assert abs(float(x) - 630084.0) < 1.5
    assert abs(float(y) - 4833438.0) < 1.5


def test_roundtrip_vectorised():
    rng = np.random.RandomState(0)
    lat = rng.uniform(-80.0, 84.0, 256)
    lon = -81.0 + rng.uniform(-3.0, 3.0, 256)  # inside zone 17
    p = crs.from_wkt(WKT_UTM17N)
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_south_false_northing():
    x, y = crs.utm(56, south=True).forward(151.2093, -33.8688)  # Sydney
    assert 0.0 < float(y) < 10000000.0
    lon, lat = crs.utm(56, south=True).inverse(x, y)
    assert abs(float(lat) + 33.8688) < 1e-9


def test_wkt_parsing_and_transform():
    p = crs.from_wkt(WKT_UTM17N)
    assert isinstance(p, crs.TransverseMercator)
    assert p.lon0 == -81.0 and p.k0 == 0.9996
    g = crs.from_wkt(WKT_GEO)
    assert g.is_geographic
    x, y = crs.transform(WKT_GEO, WKT_UTM17N, -79.3871, 43.6426)
    x2, y2 = p.forward(-79.3871, 43.6426)
    assert float(x) == float(x2) and float(y) == float(y2)
    with pytest.raises(ValueError):
        crs.from_wkt('PROJCS["x",PROJECTION["Lambert_Conformal_Conic_2SP"]]')
    with pytest.raises(ValueError):
        crs.from_wkt("")


def test_latitude_of_origin_offsets_northing():
    p0 = crs.TransverseMercator(lon0=9.0)
    p1 = crs.TransverseMercator(lon0=9.0, lat0=40.0)
    _, y0 = p0.forward(9.5, 45.0)
    _, y1 = p1.forward(9.5, 45.0)
    _, yb = p0.forward(9.0, 40.0)
    assert abs((float(y0) - float(y1)) - float(yb)) < 1e-6
    lon, lat = p1.inverse(*p1.forward(9.5, 45.0))
    assert abs(float(lat) - 45.0) < 1e-9 and abs(float(lon) - 9.5) < 1e-9


def test_transform_bounds_envelope_contains_corners():
    b = (-80.0, 43.0, -79.0, 44.0)
    out = crs.transform_bounds(WKT_GEO, WKT_UTM17N, b)
    for lon in (b[0], b[2]):
        for lat in (b[1], b[3]):
            x, y = crs.from_wkt(WKT_UTM17N).forward(lon, lat)
            assert out[0] <= float(x) <= out[2] + 1e-6
            assert out[1] <= float(y) <= out[3] + 1e-6


def test_utm_zone_of():
    assert crs.utm_zone_of(-79.4, 43.6) == (17, False)
    assert crs.utm_zone_of(151.2, -33.9) == (56, True)
    assert crs.utm_zone_of(-180.0, 0.0) == (1, False)
