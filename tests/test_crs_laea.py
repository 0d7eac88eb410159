"""Lambert Azimuthal Equal-Area (EPSG 9820) + ESRI-WKT spellings.

Anchored on the EPSG Guidance Note 7-2 worked example for ETRS89-LAEA
(lat0 52N, lon0 10E, FE 4321000, FN 3210000, GRS80): point 50N 5E maps
to E 3962799.45, N 2999718.85. The polar aspect covers the EASE-Grid 2.0
products (EPSG:6931/6932). Reference parity: gdal.Warp(dstSRS=...)
accepts any SRS (demo_preprocess_height_v2.py:608-655); these grids are
the pan-European / polar product CRSs main_proc_product must survive.
"""
import numpy as np
import pytest

from srbh_tpu.data import crs


class TestLaeaOblique:
    def test_gn72_worked_example(self):
        p = crs.from_epsg(3035)
        x, y = p.forward(5.0, 50.0)
        assert float(x) == pytest.approx(3962799.45, abs=0.01)
        assert float(y) == pytest.approx(2999718.85, abs=0.01)

    def test_inverse_roundtrip_grid(self):
        p = crs.from_epsg(3035)
        lon = np.linspace(-10.0, 30.0, 9)
        lat = np.linspace(35.0, 70.0, 8)
        LON, LAT = np.meshgrid(lon, lat)
        x, y = p.forward(LON, LAT)
        lon2, lat2 = p.inverse(x, y)
        np.testing.assert_allclose(lon2, LON, atol=1e-8)
        np.testing.assert_allclose(lat2, LAT, atol=1e-7)

    def test_centre_point_is_false_origin(self):
        p = crs.from_epsg(3035)
        x, y = p.forward(10.0, 52.0)
        assert float(x) == pytest.approx(4321000.0, abs=1e-6)
        assert float(y) == pytest.approx(3210000.0, abs=1e-6)

    def test_equal_area_property(self):
        """A small quad keeps its ellipsoidal area through the map — the
        defining property (checked against the authalic-sphere area)."""
        p = crs.from_epsg(3035)
        d = 0.01
        lons = np.array([10.0, 10.0 + d, 10.0 + d, 10.0])
        lats = np.array([52.0, 52.0, 52.0 + d, 52.0 + d])
        x, y = p.forward(lons, lats)
        map_area = 0.5 * abs(np.dot(x, np.roll(y, -1))
                             - np.dot(y, np.roll(x, -1)))
        # ellipsoidal quad area via the authalic q function
        e = p._e
        q1 = crs._conic_q(np.radians(52.0), e)
        q2 = crs._conic_q(np.radians(52.0 + d), e)
        ell_area = (p.a ** 2 / 2.0) * (q2 - q1) * np.radians(d)
        assert map_area == pytest.approx(float(ell_area), rel=1e-6)


class TestLaeaPolar:
    @pytest.mark.parametrize("code,sign", [(6931, 1.0), (6932, -1.0)])
    def test_polar_roundtrip(self, code, sign):
        p = crs.from_epsg(code)
        lon = np.linspace(-170.0, 170.0, 7)
        lat = sign * np.linspace(55.0, 89.0, 7)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-7)

    def test_north_orientation(self):
        """EASE2-North: +y points toward lon 180, +x toward lon 90."""
        p = crs.from_epsg(6931)
        x, y = p.forward(0.0, 80.0)
        assert float(x) == pytest.approx(0.0, abs=1e-6) and float(y) < 0
        x, y = p.forward(90.0, 80.0)
        assert float(y) == pytest.approx(0.0, abs=1e-6) and float(x) > 0

    def test_pole_maps_to_origin(self):
        p = crs.from_epsg(6931)
        x, y = p.forward(123.0, 90.0)
        assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6


class TestLaeaWkt:
    def test_epsg_wkt_roundtrip(self):
        for code in (3035, 6931, 6932):
            p = crs.from_wkt(crs.wkt_for_epsg(code))
            assert isinstance(p, crs.LambertAzimuthalEqualArea)
            assert crs.epsg_of(p) == code

    def test_esri_spelling_parses(self):
        """ESRI-authored .prj: D_-prefixed datum, GCS_ name,
        Latitude_Of_Origin instead of latitude_of_center."""
        wkt = ('PROJCS["Europe_Lambert_Azimuthal_Equal_Area",'
               'GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",'
               'SPHEROID["GRS_1980",6378137,298.257222101]],'
               'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
               'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
               'PARAMETER["False_Easting",4321000],'
               'PARAMETER["False_Northing",3210000],'
               'PARAMETER["Central_Meridian",10],'
               'PARAMETER["Latitude_Of_Origin",52],UNIT["Meter",1]]')
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.LambertAzimuthalEqualArea)
        x, y = p.forward(5.0, 50.0)
        assert float(x) == pytest.approx(3962799.45, abs=0.01)
        assert float(y) == pytest.approx(2999718.85, abs=0.01)

    def test_esri_wgs84_gcs_spelling(self):
        wkt = ('PROJCS["EASE2_N",GEOGCS["GCS_WGS_1984",'
               'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137,'
               '298.257223563]],PRIMEM["Greenwich",0],'
               'UNIT["Degree",0.0174532925199433]],'
               'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
               'PARAMETER["False_Easting",0],'
               'PARAMETER["False_Northing",0],'
               'PARAMETER["Central_Meridian",0],'
               'PARAMETER["Latitude_Of_Origin",90],UNIT["Meter",1]]')
        p = crs.from_wkt(wkt)
        assert crs.epsg_of(p) == 6931

    def test_laea_product_tile_warps(self, tmp_path):
        """An EPSG:3035-stamped product tile goes through warp_raster to
        geographic — the gdal.Warp(dstSRS) path for pan-EU products
        (demo_preprocess_height_v2.py:608-655)."""
        from srbh_tpu.data.tiff import TiffReader, write_tiff
        from srbh_tpu.tools import products as prod

        p = crs.from_epsg(3035)
        x0, y0 = p.forward(9.0, 48.0)
        src = str(tmp_path / "eu.tif")
        write_tiff(src, np.full((80, 80), 7.0, np.float32),
                   geotransform=(float(x0), 100.0, 0, float(y0), 0, -100.0),
                   geo_keys=crs.geokeys_for_epsg(3035))
        out = str(tmp_path / "eu_geo.tif")
        prod.warp_raster(src, out, 4326, resolution=0.001)
        r = TiffReader(out)
        assert prod.raster_crs(r).is_geographic
        d = r.read()[..., 0]
        assert d[d.shape[0] // 2, d.shape[1] // 2] == 7.0
        assert (d == 7.0).mean() > 0.9

    def test_transform_through_hub(self):
        """3035 -> 4326 -> 32632 composes with the geographic hub."""
        x, y = crs.transform(4326, 3035, np.array([9.0]), np.array([48.0]))
        lon, lat = crs.transform(3035, 4326, x, y)
        assert abs(np.ravel(lon)[0] - 9.0) < 1e-7
        assert abs(np.ravel(lat)[0] - 48.0) < 1e-7
        ex, ny = crs.transform(3035, 32632, x, y)
        ex2, ny2 = crs.from_epsg(32632).forward(9.0, 48.0)
        # sub-mm: the authalic-latitude series truncates at e^6
        assert abs(np.ravel(ex)[0] - float(ex2)) < 1e-3
        assert abs(np.ravel(ny)[0] - float(ny2)) < 1e-3
