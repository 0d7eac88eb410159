"""Coordinate reference systems: geographic <-> Transverse Mercator (UTM).

The reference leans on GDAL/OGR for every cross-projection step of the
height-product workflows — ``osr.CoordinateTransformation`` in ``clip_vrt``
(demo_preprocess_height_v2.py:608-655), ``gdal.Warp(dstSRS=…)`` in
``clip_tiff_whole`` (:1317-1386) and ``Raster_extent_prj`` (:362-427).
This module is the self-contained equivalent: an exact-ellipsoid
Transverse Mercator (Karney/Krüger n-series, order n^4 — sub-millimetre
inside a UTM zone) plus a minimal WKT1 reader covering the PROJCS/GEOGCS
strings that GeoTIFF ``.prj`` sidecars carry.

Everything is vectorised numpy over degrees; no GDAL, no pyproj.
"""
from __future__ import annotations

import math
import re
import struct
from typing import Optional, Tuple, Union

import numpy as np

# WGS84 defaults
_A = 6378137.0
_F = 1.0 / 298.257223563

ArrayLike = Union[float, np.ndarray]


def _taupf(tau: np.ndarray, e: float) -> np.ndarray:
    """tan(conformal latitude) from tan(latitude) on the ellipsoid."""
    tau1 = np.hypot(1.0, tau)
    sig = np.sinh(e * np.arctanh(e * tau / tau1))
    return np.hypot(1.0, sig) * tau - sig * tau1


def _tauf(taup: np.ndarray, e: float) -> np.ndarray:
    """Inverse of :func:`_taupf` by Newton iteration (GeographicLib recipe)."""
    e2m = 1.0 - e * e
    tau = taup / e2m
    stol = 0.1 * np.sqrt(np.finfo(float).eps) * np.maximum(1.0, np.abs(taup))
    for _ in range(5):
        taupa = _taupf(tau, e)
        dtau = ((taup - taupa) * (1.0 + e2m * tau * tau)
                / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa)))
        tau = tau + dtau
        if np.all(np.abs(dtau) < stol):
            break
    return tau


class Geographic:
    """Identity projection: coordinates are (lon, lat) degrees."""

    is_geographic = True

    def __init__(self, a: float = _A, f: float = _F):
        self.a, self.f = a, f

    def forward(self, lon: ArrayLike, lat: ArrayLike):
        return np.asarray(lon, float), np.asarray(lat, float)

    def inverse(self, x: ArrayLike, y: ArrayLike):
        return np.asarray(x, float), np.asarray(y, float)

    def __repr__(self):
        return f"Geographic(a={self.a}, 1/f={1 / self.f:.9f})"


class TransverseMercator:
    """Ellipsoidal Transverse Mercator (Krüger series, order n^4).

    ``forward`` maps (lon, lat) degrees to (easting, northing) metres;
    ``inverse`` maps back. ``lat0`` shifts the northing origin by the
    rectifying arc to the latitude of origin, matching the WKT1
    ``latitude_of_origin`` parameter.
    """

    is_geographic = False

    def __init__(self, lon0: float, k0: float = 0.9996,
                 false_easting: float = 500000.0,
                 false_northing: float = 0.0, lat0: float = 0.0,
                 a: float = _A, f: float = _F):
        self.lon0, self.k0 = float(lon0), float(k0)
        self.false_easting = float(false_easting)
        self.false_northing = float(false_northing)
        self.lat0 = float(lat0)
        self.a, self.f = a, f
        n = f / (2.0 - f)
        self._e = math.sqrt(f * (2.0 - f))
        self._A1 = a / (1.0 + n) * (1.0 + n * n / 4.0 + n ** 4 / 64.0)
        self._alpha = (
            n / 2.0 - 2.0 * n ** 2 / 3.0 + 5.0 * n ** 3 / 16.0
            + 41.0 * n ** 4 / 180.0,
            13.0 * n ** 2 / 48.0 - 3.0 * n ** 3 / 5.0 + 557.0 * n ** 4 / 1440.0,
            61.0 * n ** 3 / 240.0 - 103.0 * n ** 4 / 140.0,
            49561.0 * n ** 4 / 161280.0,
        )
        self._beta = (
            n / 2.0 - 2.0 * n ** 2 / 3.0 + 37.0 * n ** 3 / 96.0
            - n ** 4 / 360.0,
            n ** 2 / 48.0 + n ** 3 / 15.0 - 437.0 * n ** 4 / 1440.0,
            17.0 * n ** 3 / 480.0 - 37.0 * n ** 4 / 840.0,
            4397.0 * n ** 4 / 161280.0,
        )
        self._xi0 = 0.0
        if self.lat0 != 0.0:
            self._xi0 = float(self._xi_eta(np.asarray(self.lat0),
                                           np.asarray(self.lat0) * 0.0)[0])

    def _xi_eta(self, lat_deg: np.ndarray, dlon_deg: np.ndarray):
        phi = np.radians(lat_deg)
        lam = np.radians(dlon_deg)
        taup = _taupf(np.tan(phi), self._e)
        h = np.hypot(taup, np.cos(lam))
        xip = np.arctan2(taup, np.cos(lam))
        etap = np.arcsinh(np.sin(lam) / h)
        xi, eta = xip, etap
        for j, aj in enumerate(self._alpha, start=1):
            xi = xi + aj * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
            eta = eta + aj * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
        return xi, eta

    def forward(self, lon: ArrayLike, lat: ArrayLike):
        lon = np.asarray(lon, float)
        lat = np.asarray(lat, float)
        dlon = (lon - self.lon0 + 180.0) % 360.0 - 180.0
        xi, eta = self._xi_eta(lat, dlon)
        x = self.false_easting + self.k0 * self._A1 * eta
        y = self.false_northing + self.k0 * self._A1 * (xi - self._xi0)
        return x, y

    def inverse(self, x: ArrayLike, y: ArrayLike):
        x = np.asarray(x, float)
        y = np.asarray(y, float)
        eta = (x - self.false_easting) / (self.k0 * self._A1)
        xi = (y - self.false_northing) / (self.k0 * self._A1) + self._xi0
        xip, etap = xi, eta
        for j, bj in enumerate(self._beta, start=1):
            xip = xip - bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            etap = etap - bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        s, c = np.sinh(etap), np.cos(xip)
        taup = np.sin(xip) / np.hypot(s, c)
        tau = _tauf(taup, self._e)
        lat = np.degrees(np.arctan(tau))
        lon = self.lon0 + np.degrees(np.arctan2(s, c))
        return lon, lat

    def __repr__(self):
        return (f"TransverseMercator(lon0={self.lon0}, k0={self.k0}, "
                f"E0={self.false_easting}, N0={self.false_northing})")


def utm(zone: int, south: bool = False, a: float = _A,
        f: float = _F) -> TransverseMercator:
    """The UTM zone projection (central meridian 6*zone - 183)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"bad UTM zone {zone}")
    return TransverseMercator(lon0=6.0 * zone - 183.0, k0=0.9996,
                              false_easting=500000.0,
                              false_northing=10000000.0 if south else 0.0,
                              a=a, f=f)


def utm_zone_of(lon: float, lat: float) -> Tuple[int, bool]:
    """(zone, south) for a geographic point (standard 6-degree zones)."""
    zone = int((float(lon) + 180.0) // 6.0) + 1
    return min(max(zone, 1), 60), float(lat) < 0.0


_PARAM_RE = re.compile(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)',
                       re.IGNORECASE)
_SPHEROID_RE = re.compile(
    r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)',
    re.IGNORECASE)
_UTM_RE = re.compile(r'UTM\s+zone\s+(\d+)\s*([NS])', re.IGNORECASE)


def from_wkt(wkt: str):
    """Parse a WKT1 ``.prj`` string into a projection object.

    Supports GEOGCS (geographic degrees) and PROJCS with
    ``Transverse_Mercator`` (which covers every UTM zone the products
    ship in). Raises ValueError on other projections so callers fail
    loudly rather than silently mis-locating rasters.
    """
    if wkt is None or not str(wkt).strip():
        raise ValueError("empty WKT")
    wkt = str(wkt)
    a, f = _A, _F
    m = _SPHEROID_RE.search(wkt)
    if m:
        a = float(m.group(1))
        invf = float(m.group(2))
        f = 1.0 / invf if invf else 0.0
    # fail-loud guards: a non-Greenwich prime meridian or a non-metre /
    # non-degree UNIT (e.g. US state-plane feet) would parse "successfully"
    # and then silently mis-locate every transformed coordinate
    pm = re.search(r'PRIMEM\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)', wkt)
    if pm and abs(float(pm.group(1))) > 1e-9:
        raise ValueError(f"unsupported prime meridian {pm.group(1)} "
                         "(only Greenwich)")
    is_projected = "PROJCS" in wkt.upper()
    # the LAST top-level UNIT clause governs the CRS's coordinate unit
    # (earlier ones inside GEOGCS of a PROJCS are the angular unit).
    # Checked BEFORE the datum guard: a feet-unit WKT is wrong regardless
    # of its datum name, and the unit error is the actionable one.
    units = re.findall(r'UNIT\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)', wkt)
    if units:
        u = float(units[-1])
        want = 1.0 if is_projected else 0.0174532925199433
        if not math.isclose(u, want, rel_tol=1e-6):
            kind = "metre" if is_projected else "degree"
            raise ValueError(
                f"unsupported UNIT factor {u} (only {kind}-based CRS; "
                "got e.g. feet?) — reproject the raster first")
    # a non-WGS84 datum (e.g. Beijing 1954 on Krassowsky) or a nonzero
    # TOWGS84 shift would parse "successfully" here and then transform()
    # would relabel its coordinates as WGS84 — a silent ~100 m error.
    # Accepted spellings: "WGS_1984"/"WGS 84" (wgs1984/wgs84), GDAL's
    # "D_WGS_1984" (dwgs1984, contains wgs1984), and WKT2's spelled-out
    # "World Geodetic System 1984".
    dm = re.search(r'DATUM\s*\[\s*"([^"]*)"', wkt)
    if dm:
        dname = re.sub(r"[^a-z0-9]", "", dm.group(1).lower())
        if not any(t in dname for t in
                   ("wgs1984", "wgs84", "worldgeodeticsystem1984")):
            raise ValueError(
                f"unsupported datum {dm.group(1)!r} (only WGS84-family) — "
                "reproject the raster first")
    tw = re.search(r"TOWGS84\s*\[([^\]]*)\]", wkt)
    if tw and any(abs(float(v)) > 1e-9 for v in tw.group(1).split(",") if
                  v.strip()):
        raise ValueError("unsupported nonzero TOWGS84 datum shift — "
                         "reproject the raster first")
    if not is_projected:
        return Geographic(a, f)
    params = {k.lower(): float(v) for k, v in _PARAM_RE.findall(wkt)}
    proj_m = re.search(r'PROJECTION\s*\[\s*"([^"]+)"', wkt, re.IGNORECASE)
    name = (proj_m.group(1) if proj_m else "").lower()
    if name.replace(" ", "_") != "transverse_mercator":
        um = _UTM_RE.search(wkt)
        if um and not name:
            return utm(int(um.group(1)), um.group(2).upper() == "S", a, f)
        raise ValueError(f"unsupported projection {name!r}")
    return TransverseMercator(
        lon0=params.get("central_meridian", 0.0),
        k0=params.get("scale_factor", 1.0),
        false_easting=params.get("false_easting", 0.0),
        false_northing=params.get("false_northing", 0.0),
        lat0=params.get("latitude_of_origin", 0.0),
        a=a, f=f)


def from_epsg(code: int):
    """Projection for the EPSG codes the height products ship in:
    4326 (WGS84 geographic) and the 326xx/327xx WGS84 UTM zones."""
    code = int(code)
    if code == 4326:
        return Geographic()
    if 32601 <= code <= 32660:
        return utm(code - 32600)
    if 32701 <= code <= 32760:
        return utm(code - 32700, south=True)
    raise ValueError(f"unsupported EPSG:{code}")


def epsg_from_geokeys(geo_keys: bytes, endian: str = "<") -> Optional[int]:
    """EPSG CRS code from a GeoTIFF GeoKeyDirectory (tag 34735) payload:
    ProjectedCSTypeGeoKey (3072) wins over GeographicTypeGeoKey (2048)."""
    if not geo_keys or len(geo_keys) < 8:
        return None
    vals = struct.unpack(endian + "H" * (len(geo_keys) // 2),
                         geo_keys[: (len(geo_keys) // 2) * 2])
    nkeys = vals[3]
    code = None
    for i in range(min(nkeys, (len(vals) - 4) // 4)):
        kid, loc, _cnt, val = vals[4 + 4 * i: 8 + 4 * i]
        if loc != 0:
            continue
        if val in (0, 32767):
            # 32767 is the GeoTIFF "user-defined" sentinel, not an EPSG
            # code (GeoTIFF spec §6.3.1.1); returning it would send
            # callers into from_epsg(32767)
            continue
        if kid == 3072:
            return int(val)
        if kid == 2048:
            code = int(val)
    return code


def geokeys_for_epsg(code: int) -> bytes:
    """GeoTIFF GeoKeyDirectory (tag 34735) payload declaring an EPSG CRS —
    the writer-side twin of :func:`epsg_from_geokeys` (little-endian, like
    every TIFF the codec writes)."""
    code = int(code)
    geographic = 4000 <= code < 5000
    keys = [(1024, 0, 1, 2 if geographic else 1),  # GTModelType
            (1025, 0, 1, 1),                       # GTRasterType: PixelIsArea
            (2048 if geographic else 3072, 0, 1, code)]
    vals = [1, 1, 0, len(keys)]
    for k in keys:
        vals.extend(k)
    return struct.pack("<" + "H" * len(vals), *vals)


_WKT_GEO_4326 = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
                 '6378137,298.257223563]],PRIMEM["Greenwich",0],'
                 'UNIT["degree",0.0174532925199433]]')


def wkt_for_epsg(code: int) -> str:
    """Canonical WKT1 for the supported EPSG codes (4326 and WGS84 UTM) —
    enough for ``.prj`` sidecars that :func:`from_wkt` round-trips."""
    code = int(code)
    if code == 4326:
        return _WKT_GEO_4326
    if 32601 <= code <= 32660 or 32701 <= code <= 32760:
        south = code > 32700
        zone = code - (32700 if south else 32600)
        return (
            f'PROJCS["WGS 84 / UTM zone {zone}{"S" if south else "N"}",'
            f'{_WKT_GEO_4326},PROJECTION["Transverse_Mercator"],'
            f'PARAMETER["latitude_of_origin",0],'
            f'PARAMETER["central_meridian",{6 * zone - 183}],'
            f'PARAMETER["scale_factor",0.9996],'
            f'PARAMETER["false_easting",500000],'
            f'PARAMETER["false_northing",{10000000 if south else 0}],'
            f'UNIT["metre",1]]')
    raise ValueError(f"unsupported EPSG:{code}")


def epsg_of(p) -> Optional[int]:
    """Best-effort inverse of :func:`from_epsg`: the EPSG code of a
    projection object (or WKT string), None when it is not one of the
    supported canonical forms (WGS84 geographic / WGS84 UTM zones)."""
    p = as_projection(p)
    if abs(p.a - _A) > 1e-3 or abs(p.f - _F) > 1e-12:
        return None
    if getattr(p, "is_geographic", False):
        return 4326
    if (isinstance(p, TransverseMercator) and p.k0 == 0.9996
            and p.false_easting == 500000.0 and p.lat0 == 0.0):
        zone = (p.lon0 + 183.0) / 6.0
        if zone == int(zone) and 1 <= int(zone) <= 60:
            if p.false_northing == 0.0:
                return 32600 + int(zone)
            if p.false_northing == 10000000.0:
                return 32700 + int(zone)
    return None


def as_projection(p):
    """Coerce WKT strings, EPSG ints, or projection objects to an object."""
    if isinstance(p, str):
        return from_wkt(p)
    if isinstance(p, (int, np.integer)):
        return from_epsg(p)
    return p


def transform(src, dst, x: ArrayLike, y: ArrayLike):
    """Map coordinates from ``src`` to ``dst`` (objects, WKT, or EPSG)."""
    src = as_projection(src)
    dst = as_projection(dst)
    lon, lat = src.inverse(x, y)
    return dst.forward(lon, lat)


def transform_bounds(src, dst, bounds: Tuple[float, float, float, float],
                     densify: int = 21) -> Tuple[float, float, float, float]:
    """Transform a bbox by densifying its edges (a reprojected rectangle's
    envelope is larger than its reprojected corners)."""
    minx, miny, maxx, maxy = bounds
    t = np.linspace(0.0, 1.0, densify)
    xs = np.concatenate([minx + (maxx - minx) * t, np.full(densify, maxx),
                         maxx + (minx - maxx) * t, np.full(densify, minx)])
    ys = np.concatenate([np.full(densify, miny), miny + (maxy - miny) * t,
                         np.full(densify, maxy), maxy + (miny - maxy) * t])
    tx, ty = transform(src, dst, xs, ys)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())
