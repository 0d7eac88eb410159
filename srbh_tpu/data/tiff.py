"""Minimal GeoTIFF reader/writer (pure numpy + zlib).

The reference does all raster I/O through GDAL/rasterio/tifffile C++ bindings
(BH_loader.py:878-885,968-977; utils/preprocess.py:106-195). None of those
ship in this image, so the framework carries its own codec with exactly the
capabilities the pipeline needs:

* read: uint8/uint16/int16/uint32/float32/float64; strip + tile layouts;
  None/PackBits/Deflate/LZW compression; horizontal-differencing predictor;
  chunky and planar configs; **windowed reads** (xoff, yoff, xsize, ysize)
  touching only the strips/tiles that intersect — the gridimgLoader access
  pattern (BH_loader.py:968-977).
* write: strip layout, chunky, None/PackBits/Deflate; GeoTIFF geotransform
  (ModelPixelScale + ModelTiepoint), verbatim GeoKey/projection passthrough
  from a source file, 256-entry RGBA colormap (utils/preprocess.py:167-195),
  GDAL nodata.

A C++ fast path for batch strip decode can be layered underneath without
changing this API (``srbh_tpu/native``).
"""
from __future__ import annotations

import mmap
import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# TIFF tag ids
T_WIDTH, T_LENGTH, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR, T_COLORMAP, T_SAMPLE_FORMAT = 284, 317, 320, 339
T_TILE_W, T_TILE_L, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT, T_MODEL_TRANSFORM = 33550, 33922, 34264
T_GEO_KEYS, T_GEO_DOUBLES, T_GEO_ASCII = 34735, 34736, 34737
T_GDAL_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 2: "s", 7: "s"}


def _sample_dtype(bits: int, fmt: int, endian: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    return np.dtype(f"{endian}{kind}{bits // 8}")


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i: i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i: i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a run
        run = 1
        while i + run < n and run < 127 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            # literal stretch until next run of >=3
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavour LZW (MSB-first codes, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    dictionary: List[bytes] = []

    def reset():
        nonlocal dictionary
        dictionary = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bitbuf, bitcnt, codesize = 0, 0, 9
    prev: Optional[bytes] = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= codesize:
            code = (bitbuf >> (bitcnt - codesize)) & ((1 << codesize) - 1)
            bitcnt -= codesize
            if code == CLEAR:
                reset()
                codesize = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = dictionary[code]
            elif code < len(dictionary):
                entry = dictionary[code]
                dictionary.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                dictionary.append(entry)
            out += entry
            prev = entry
            if len(dictionary) >= (1 << codesize) - 1 and codesize < 12:
                codesize += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _decompress(data: bytes, method: int, expected: int) -> bytes:
    if method == 1:
        return data[:expected]
    if method in (8, 32946):
        return zlib.decompress(data)[:expected]
    if method == 32773:
        from srbh_tpu import native

        out = native.packbits_decode(data, expected)
        return out if out is not None else _packbits_decode(data, expected)
    if method == 5:
        from srbh_tpu import native

        out = native.lzw_decode(data, expected)
        return out if out is not None else _lzw_decode(data, expected)
    raise ValueError(f"unsupported TIFF compression {method}")


@dataclass
class TiffInfo:
    width: int
    height: int
    count: int  # bands
    dtype: np.dtype
    compression: int
    geotransform: Tuple[float, float, float, float, float, float]
    nodata: Optional[float] = None
    colormap: Optional[Dict[int, Tuple[int, int, int, int]]] = None
    # verbatim projection payloads for lossless passthrough
    geo_keys: Optional[bytes] = None
    geo_doubles: Optional[bytes] = None
    geo_ascii: Optional[bytes] = None


class TiffReader:
    """Single-IFD TIFF reader with windowed access.

    Decoded strips/tiles are cached up to ``max_cache_bytes`` (insert-only,
    GIL-atomic — safe under the threaded loader) — the fishnet
    predictor reads overlapping 64-px windows with a 56-px stride, so every
    strip is touched by several windows; caching turns the city sweep from
    O(windows x strip) decompressions into one pass.
    """

    def __init__(self, path: str, max_cache_bytes: int = 512 << 20):
        self.path = path
        self._cache: dict = {}
        self._cache_bytes = 0
        self._max_cache_bytes = max_cache_bytes
        # mmap instead of slurping: GridImageDataset/VirtualMosaic keep many
        # city-scale mosaics open at once but touch only small windows; a
        # memory map keeps residency at the touched pages while preserving
        # the bytes-slicing API (slices copy, so downstream np.frombuffer
        # and struct.unpack are unaffected).
        self._file = open(path, "rb")
        try:
            self._buf = mmap.mmap(self._file.fileno(), 0,
                                  access=mmap.ACCESS_READ)
        except (ValueError, OSError):  # zero-length or unmappable file
            self._buf = self._file.read()
            self._file.close()
            self._file = None
        b = self._buf
        if b[:2] == b"II":
            self._e = "<"
        elif b[:2] == b"MM":
            self._e = ">"
        else:
            raise ValueError(f"{path}: not a TIFF")
        if len(b) < 8:
            raise ValueError(f"{path}: truncated TIFF header")
        magic, off = struct.unpack(self._e + "HI", b[2:8])
        if magic != 42:
            raise ValueError(f"{path}: bad TIFF magic {magic}")
        try:
            self.tags = self._read_ifd(off)
            self._parse()
        except ValueError:
            raise
        except Exception as e:  # uniform error surface for corrupt headers
            raise ValueError(f"{path}: corrupt TIFF header: "
                             f"{type(e).__name__}: {e}") from e

    def close(self) -> None:
        """Release the memory map / file handle (idempotent)."""
        buf, self._buf = self._buf, b""
        if isinstance(buf, mmap.mmap):
            buf.close()
        f, self._file = getattr(self, "_file", None), None
        if f is not None:
            f.close()
        self._cache.clear()
        self._cache_bytes = 0

    def __del__(self):  # pragma: no cover - best-effort cleanup
        try:
            self.close()
        except Exception:
            pass

    def _read_ifd(self, off: int) -> Dict[int, tuple]:
        e, b = self._e, self._buf
        (n,) = struct.unpack(e + "H", b[off: off + 2])
        tags = {}
        for i in range(n):
            ent = b[off + 2 + 12 * i: off + 14 + 12 * i]
            tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
            size = _TYPE_SIZES.get(typ, 1) * cnt
            raw = ent[8:12] if size <= 4 else None
            if raw is None:
                (ptr,) = struct.unpack(e + "I", ent[8:12])
                raw = b[ptr: ptr + size]
            else:
                raw = raw[:size]
            tags[tag] = (typ, cnt, raw)
        return tags

    def _values(self, tag: int):
        typ, cnt, raw = self.tags[tag]
        if typ in (2, 7):
            return raw
        # clamp the declared count to the bytes actually present: a fuzzed
        # 2^32 count otherwise builds a 4-billion-char struct format string
        # (observed as a multi-minute stall)
        cnt = min(cnt, len(raw) // _TYPE_SIZES.get(typ, 1))
        if typ == 5 or typ == 10:  # rationals (8 B: numerator, denominator)
            fmt = self._e + ("II" if typ == 5 else "ii") * cnt
            vals = struct.unpack(fmt, raw[: 8 * cnt])
            # true division with negative SRATIONAL denominators honoured;
            # an (invalid) zero denominator reads as 0.0 rather than
            # silently pretending the denominator was 1
            return [vals[2 * i] / vals[2 * i + 1] if vals[2 * i + 1] else 0.0
                    for i in range(cnt)]
        if typ not in _TYPE_FMT:
            raise ValueError(f"{self.path}: corrupt TIFF: tag {tag} has "
                             f"unknown type {typ}")
        fmt = self._e + _TYPE_FMT[typ] * cnt
        return list(struct.unpack(fmt, raw[: _TYPE_SIZES[typ] * cnt]))

    def _tag1(self, tag: int, default=None):
        if tag not in self.tags:
            return default
        v = self._values(tag)
        return v[0] if isinstance(v, list) else v

    def _parse(self):
        self.width = int(self._tag1(T_WIDTH))
        self.height = int(self._tag1(T_LENGTH))
        self.spp = int(self._tag1(T_SPP, 1))
        bits = self._values(T_BITS) if T_BITS in self.tags else [8]
        self.bits = int(bits[0])
        fmt = self._values(T_SAMPLE_FORMAT) if T_SAMPLE_FORMAT in self.tags else [1]
        self.dtype = _sample_dtype(self.bits, int(fmt[0]), self._e)
        self.compression = int(self._tag1(T_COMPRESSION, 1))
        self.planar = int(self._tag1(T_PLANAR, 1))
        self.predictor = int(self._tag1(T_PREDICTOR, 1))
        self.tiled = T_TILE_OFFSETS in self.tags
        if self.tiled:
            self.tile_w = int(self._tag1(T_TILE_W))
            self.tile_l = int(self._tag1(T_TILE_L))
            self.chunk_offsets = [int(v) for v in self._values(T_TILE_OFFSETS)]
            self.chunk_counts = [int(v) for v in self._values(T_TILE_COUNTS)]
        else:
            self.rows_per_strip = int(self._tag1(T_ROWS_PER_STRIP, self.height))
            self.chunk_offsets = [int(v) for v in self._values(T_STRIP_OFFSETS)]
            self.chunk_counts = [int(v) for v in self._values(T_STRIP_COUNTS)]
        self._validate()

    def _validate(self):
        """Reject corrupt headers with a uniform ValueError before any
        decode work: dimension sanity, chunk table consistency, and every
        chunk inside the file (a fuzzed offset/count otherwise surfaces as
        struct.error / KeyError / MemoryError deep in the decode path)."""
        size = len(self._buf)
        if not (0 < self.width <= 1 << 28 and 0 < self.height <= 1 << 28):
            raise ValueError(f"{self.path}: corrupt TIFF: bad dimensions "
                             f"{self.width}x{self.height}")
        if not (1 <= self.spp <= 1024):
            raise ValueError(f"{self.path}: corrupt TIFF: samples/pixel {self.spp}")
        if self.width * self.height * self.spp > 1 << 34:
            # 17 G-samples (a 130k x 130k band) — far above any city mosaic;
            # a fuzzed dimension otherwise turns read() into a page-zeroing
            # stall on a petabyte np.zeros
            raise ValueError(f"{self.path}: corrupt TIFF: implausible size "
                             f"{self.width}x{self.height}x{self.spp}")
        if self.planar not in (1, 2):
            raise ValueError(f"{self.path}: corrupt TIFF: planar {self.planar}")
        if len(self.chunk_offsets) != len(self.chunk_counts) or \
                not self.chunk_offsets:
            raise ValueError(f"{self.path}: corrupt TIFF: chunk tables "
                             f"{len(self.chunk_offsets)}/{len(self.chunk_counts)}")
        if self.tiled:
            if not (0 < self.tile_w <= 1 << 20 and 0 < self.tile_l <= 1 << 20):
                raise ValueError(f"{self.path}: corrupt TIFF: tile size")
        elif not (0 < self.rows_per_strip):
            raise ValueError(f"{self.path}: corrupt TIFF: rows/strip "
                             f"{self.rows_per_strip}")
        for off, cnt in zip(self.chunk_offsets, self.chunk_counts):
            if off < 0 or cnt < 0 or off + cnt > size:
                raise ValueError(f"{self.path}: corrupt TIFF: chunk "
                                 f"[{off}, +{cnt}] outside file of {size} B")
        # a fuzzed dimension word can claim a multi-GB raster backed by a
        # few KB of chunks; reading it would stall in np.zeros. Even an
        # all-constant deflate strip tops out near 1100:1, so 10000:1 only
        # rejects the impossible.
        declared = self.width * self.height * self.spp * self.dtype.itemsize
        if sum(self.chunk_counts) * 10000 < declared:
            raise ValueError(
                f"{self.path}: corrupt TIFF: {declared} B declared but only "
                f"{sum(self.chunk_counts)} B of chunk data")

    # ------------------------------------------------------------- metadata
    @property
    def geotransform(self) -> Tuple[float, ...]:
        """GDAL-style (x0, dx, rx, y0, ry, dy)."""
        if T_MODEL_TRANSFORM in self.tags:
            m = self._values(T_MODEL_TRANSFORM)
            return (m[3], m[0], m[1], m[7], m[4], m[5])
        if T_MODEL_PIXEL_SCALE in self.tags and T_MODEL_TIEPOINT in self.tags:
            sx, sy = self._values(T_MODEL_PIXEL_SCALE)[:2]
            tp = self._values(T_MODEL_TIEPOINT)
            i, j, _, x, y, _ = tp[:6]
            return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
        return (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)

    @property
    def nodata(self) -> Optional[float]:
        if T_GDAL_NODATA not in self.tags:
            return None
        try:
            return float(self._values(T_GDAL_NODATA).rstrip(b"\x00").decode())
        except Exception:
            return None

    def info(self) -> TiffInfo:
        cmap = None
        if T_COLORMAP in self.tags:
            v = self._values(T_COLORMAP)
            n = len(v) // 3
            cmap = {i: (v[i] >> 8, v[n + i] >> 8, v[2 * n + i] >> 8, 255)
                    for i in range(n)}
        def _geo(tag, itemsize):
            """Geo payload normalised to LITTLE-endian bytes: write_tiff
            always emits 'II' files, so raw big-endian payloads stamped
            verbatim would carry byte-swapped (wrong-CRS) geokeys."""
            if tag not in self.tags:
                return None
            raw = self.tags[tag][2]
            if self._e == ">" and itemsize > 1:
                kind = {2: "u2", 8: "f8"}[itemsize]
                raw = np.frombuffer(raw[: len(raw) - len(raw) % itemsize],
                                    ">" + kind).astype("<" + kind).tobytes()
            return raw

        return TiffInfo(
            width=self.width, height=self.height, count=self.spp,
            dtype=self.dtype, compression=self.compression,
            geotransform=self.geotransform, nodata=self.nodata, colormap=cmap,
            geo_keys=_geo(T_GEO_KEYS, 2),
            geo_doubles=_geo(T_GEO_DOUBLES, 8),
            geo_ascii=_geo(T_GEO_ASCII, 1),
        )

    # ----------------------------------------------------------------- data
    def _decode_chunk(self, idx: int, shape: Tuple[int, ...]) -> np.ndarray:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        if idx >= len(self.chunk_offsets):
            raise ValueError(f"{self.path}: corrupt TIFF: chunk index {idx} "
                             f"beyond table of {len(self.chunk_offsets)}")
        raw = self._buf[self.chunk_offsets[idx]:
                        self.chunk_offsets[idx] + self.chunk_counts[idx]]
        expected = int(np.prod(shape)) * self.dtype.itemsize
        try:
            data = _decompress(raw, self.compression, expected)
            n = int(np.prod(shape))
            if len(data) < expected:
                # short chunk (corrupt stream): zero-fill the tail so the
                # error surface stays ValueError-or-data, never frombuffer's
                data = data + b"\x00" * (expected - len(data))
            arr = np.frombuffer(data, self.dtype, count=n).reshape(shape)
        except ValueError:
            raise
        except Exception as e:
            raise ValueError(f"{self.path}: corrupt TIFF chunk {idx}: "
                             f"{type(e).__name__}: {e}") from e
        if self.predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=self.dtype)
        if self._cache_bytes + arr.nbytes <= self._max_cache_bytes:
            self._cache[idx] = arr
            self._cache_bytes += arr.nbytes
        return arr

    def read(self, window: Optional[Tuple[int, int, int, int]] = None) -> np.ndarray:
        """Read (H, W, C) array; ``window=(xoff, yoff, xsize, ysize)``."""
        if window is None:
            window = (0, 0, self.width, self.height)
        xoff, yoff, xs, ys = window
        out = np.zeros((ys, xs, self.spp), self.dtype)
        planes = self.spp if self.planar == 2 else 1
        chans = 1 if self.planar == 2 else self.spp
        if self.tiled:
            tiles_x = (self.width + self.tile_w - 1) // self.tile_w
            tiles_y = (self.height + self.tile_l - 1) // self.tile_l
            # clamp to the tile grid: windows crossing the right/bottom edge
            # zero-fill (same contract as the strip path below)
            last_ty = min((yoff + ys - 1) // self.tile_l, tiles_y - 1)
            last_tx = min((xoff + xs - 1) // self.tile_w, tiles_x - 1)
            for p in range(planes):
                for ty in range(yoff // self.tile_l, last_ty + 1):
                    for tx in range(xoff // self.tile_w, last_tx + 1):
                        idx = p * tiles_x * tiles_y + ty * tiles_x + tx
                        tile = self._decode_chunk(idx, (self.tile_l, self.tile_w, chans))
                        y0 = max(ty * self.tile_l, yoff)
                        y1 = min((ty + 1) * self.tile_l, yoff + ys, self.height)
                        x0 = max(tx * self.tile_w, xoff)
                        x1 = min((tx + 1) * self.tile_w, xoff + xs, self.width)
                        sub = tile[y0 - ty * self.tile_l: y1 - ty * self.tile_l,
                                   x0 - tx * self.tile_w: x1 - tx * self.tile_w]
                        if self.planar == 2:
                            out[y0 - yoff: y1 - yoff, x0 - xoff: x1 - xoff, p] = sub[..., 0]
                        else:
                            out[y0 - yoff: y1 - yoff, x0 - xoff: x1 - xoff] = sub
        else:
            rps = self.rows_per_strip
            strips_per_plane = (self.height + rps - 1) // rps
            # clamp to the image extent like the tile path: windows crossing
            # the right/bottom edge zero-fill instead of raising
            x1_img = min(xoff + xs, self.width)
            xspan = max(x1_img - xoff, 0)  # xoff >= width: zero-fill window
            last_strip = min((yoff + ys - 1) // rps, strips_per_plane - 1)
            for p in range(planes if xspan else 0):
                for s in range(yoff // rps, last_strip + 1):
                    rows = min(rps, self.height - s * rps)
                    strip = self._decode_chunk(p * strips_per_plane + s,
                                               (rows, self.width, chans))
                    y0 = max(s * rps, yoff)
                    y1 = min(s * rps + rows, yoff + ys)
                    sub = strip[y0 - s * rps: y1 - s * rps, xoff: x1_img]
                    if self.planar == 2:
                        out[y0 - yoff: y1 - yoff, : xspan, p] = sub[..., 0]
                    else:
                        out[y0 - yoff: y1 - yoff, : xspan] = sub
        return out


def read_tiff(path: str, window=None) -> np.ndarray:
    """Convenience: (H, W, C) array (C kept even when 1)."""
    return TiffReader(path).read(window)


def _compress(data: bytes, method: str) -> Tuple[bytes, int]:
    if method in (None, "none", "NONE"):
        return data, 1
    if method.upper() == "DEFLATE":
        return zlib.compress(data, 6), 8
    if method.upper() == "PACKBITS":
        from srbh_tpu import native

        out = native.packbits_encode(data)
        return (out if out is not None else _packbits_encode(data)), 32773
    raise ValueError(f"unsupported write compression {method!r}")


def write_tiff(
    path: str,
    array: np.ndarray,
    geotransform: Tuple[float, ...] = (0, 1, 0, 0, 0, -1),
    compress: Optional[str] = None,
    colormap: Optional[Dict[int, Tuple[int, int, int, int]]] = None,
    nodata: Optional[float] = None,
    like: Optional[TiffInfo] = None,
    rows_per_strip: int = 256,
    geo_keys: Optional[bytes] = None,
):
    """Write an (H, W) or (H, W, C) array as a striped chunky GeoTIFF.

    ``like`` carries projection GeoKeys verbatim from a source file
    (the array2raster pattern, utils/preprocess.py:106-133); ``geo_keys``
    stamps an explicit GeoKeyDirectory instead (see
    srbh_tpu.data.crs.geokeys_for_epsg) and wins over ``like``.
    """
    if array.ndim == 2:
        array = array[..., None]
    h, w, c = array.shape
    dt = array.dtype
    fmt_code = {"u": 1, "i": 2, "f": 3}[dt.kind]

    entries: List[Tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag, typ, values):
        if isinstance(values, bytes):
            payload, cnt = values, len(values)
        else:
            if not isinstance(values, (list, tuple)):
                values = [values]
            payload = struct.pack("<" + _TYPE_FMT[typ] * len(values), *values)
            cnt = len(values)
        entries.append((tag, typ, cnt, payload))

    # pixel data as strips
    strips, counts = [], []
    comp_id = 1
    for y0 in range(0, h, rows_per_strip):
        chunk = np.ascontiguousarray(array[y0: y0 + rows_per_strip]).astype(
            dt.newbyteorder("<")).tobytes()
        comp, comp_id = _compress(chunk, compress)
        strips.append(comp)
        counts.append(len(comp))

    add(T_WIDTH, 4, w)
    add(T_LENGTH, 4, h)
    add(T_BITS, 3, [dt.itemsize * 8] * c)
    add(T_COMPRESSION, 3, comp_id)
    add(T_PHOTOMETRIC, 3, 3 if colormap else (2 if c >= 3 else 1))
    add(T_SPP, 3, c)
    add(T_ROWS_PER_STRIP, 4, rows_per_strip)
    add(T_STRIP_COUNTS, 4, counts)
    add(T_PLANAR, 3, 1)
    add(T_SAMPLE_FORMAT, 3, [fmt_code] * c)
    if colormap:
        n = 1 << (dt.itemsize * 8)
        r = [0] * n
        g = [0] * n
        b = [0] * n
        for k, (cr, cg, cb, _a) in colormap.items():
            r[k], g[k], b[k] = int(cr) * 257, int(cg) * 257, int(cb) * 257
        add(T_COLORMAP, 3, r + g + b)
    gt = geotransform
    if gt[2] == 0 and gt[4] == 0:
        add(T_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
        add(T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    else:
        add(T_MODEL_TRANSFORM, 12, [gt[1], gt[2], 0, gt[0],
                                    gt[4], gt[5], 0, gt[3],
                                    0, 0, 0, 0, 0, 0, 0, 1])
    if geo_keys is not None:
        entries.append((T_GEO_KEYS, 3, len(geo_keys) // 2, geo_keys))
    if like is not None:
        if like.geo_keys and geo_keys is None:
            entries.append((T_GEO_KEYS, 3, len(like.geo_keys) // 2, like.geo_keys))
        if like.geo_doubles:
            entries.append((T_GEO_DOUBLES, 12, len(like.geo_doubles) // 8, like.geo_doubles))
        if like.geo_ascii:
            entries.append((T_GEO_ASCII, 2, len(like.geo_ascii), like.geo_ascii))
    if nodata is not None:
        s = (repr(nodata).encode() + b"\x00")
        entries.append((T_GDAL_NODATA, 2, len(s), s))

    # layout: header(8) + IFD + out-of-line payloads + strip data
    # IFD needs strip offsets entry too -> compute after sizing
    n_entries = len(entries) + 1  # + strip offsets
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    # out-of-line payload area
    payload_off = ifd_off + ifd_size
    oversized = []
    for tag, typ, cnt, payload in entries:
        if len(payload) > 4:
            oversized.append(len(payload) + (len(payload) & 1))
    strip_off_payload = 4 * len(strips) if len(strips) > 1 else 0
    data_off = payload_off + sum(oversized) + (strip_off_payload if strip_off_payload > 4 else 0)
    strip_offsets = []
    pos = data_off
    for cnt in counts:
        strip_offsets.append(pos)
        pos += cnt + (cnt & 1)

    entries.append((T_STRIP_OFFSETS, 4,
                    len(strip_offsets),
                    struct.pack("<" + "I" * len(strip_offsets), *strip_offsets)))
    entries.sort(key=lambda t: t[0])

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    ifd = bytearray(struct.pack("<H", len(entries)))
    payloads = bytearray()
    ppos = payload_off
    for tag, typ, cnt, payload in entries:
        if len(payload) <= 4:
            ifd += struct.pack("<HHI", tag, typ, cnt) + payload.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, ppos)
            pad = payload + (b"\x00" if len(payload) & 1 else b"")
            payloads += pad
            ppos += len(pad)
    ifd += struct.pack("<I", 0)  # no next IFD
    out += ifd + payloads
    assert len(out) == data_off, (len(out), data_off)
    for s in strips:
        out += s + (b"\x00" if len(s) & 1 else b"")
    with open(path, "wb") as f:
        f.write(out)
