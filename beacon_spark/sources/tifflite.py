"""GeoTIFF source — pure-Python classic-TIFF parser → GridDataset.

The reference reads TIFF/COG through ``async-tiff``
(``beacon-db/beacon-file-formats/beacon-arrow-tiff/src/reader.rs``) and
exposes the raster as an nd dataset: ``band.<i>`` variables over (y, x),
1-D ``geo.lon``/``geo.lat`` coordinate arrays derived from the
tiepoint/pixel-scale tags (reader.rs:200-224 — lon[x] = tie_wx +
(x-tie_px)·scale_x, lat[y] = tie_wy − (y-tie_py)·scale_y), and scalar
metadata variables (``image.width``, ``geo.epsg``, ``geo.nodata``, …,
reader.rs:80-150). We produce the same dataset shape and feed it through
the shared nd flattening (sources/nd.py), so grid selection, chunked
Spark tasks, and coordinate-range pruning all apply unchanged.

Supported: classic TIFF *and* BigTIFF (magic 43, 8-byte offsets), either
endianness, strip or tile layout, chunky or planar configuration,
compression none(1)/LZW(5)/deflate(8,32946), horizontal predictor(2),
sample formats uint/int/float 8-64 bit, GDAL_NODATA → NULL, and COG
overview chains (reduced-resolution IFDs selectable via
``open_tiff(path, overview=k)`` — a whole-extent visualization/decimation
query reads the small IFD, not the full raster, which is the COG
contract). JPEG/packbits compression raise loudly.

No rasterio/PIL in this container — this parser is the real read path,
not a stub, and the writer exists so tests can build fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from beacon_spark.sources import bytesource as _bs

from beacon_spark.sources.nd import GridDataset

__all__ = ["open_tiff", "write_tiff", "tiff_overviews"]

_TYPE_FMT = {
    1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8),
    # BigTIFF additions: LONG8 / SLONG8 / IFD8
    16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8),
}

_TAGS = {
    254: "subfile_type",
    256: "width", 257: "height", 258: "bits_per_sample", 259: "compression",
    273: "strip_offsets", 277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_byte_counts", 284: "planar_config", 317: "predictor",
    322: "tile_width", 323: "tile_length", 324: "tile_offsets",
    325: "tile_byte_counts", 339: "sample_format",
    33550: "model_pixel_scale", 33922: "model_tiepoint",
    34264: "model_transformation", 34735: "geo_key_directory",
    42112: "gdal_metadata", 42113: "gdal_nodata",
}


def _read_ifd(buf: bytes, bo: str, off: int, big: bool) -> tuple[dict, int]:
    """Parse one IFD → (tags, next_ifd_offset). Classic: 2-byte entry
    count, 12-byte entries, 4-byte value slot. BigTIFF: 8-byte count,
    20-byte entries, 8-byte value slot."""
    if big:
        (n,) = _bs.unpack_from(bo + "Q", buf, off)
        off += 8
        esize, slot, cfmt = 20, 8, "HHQ"
    else:
        (n,) = _bs.unpack_from(bo + "H", buf, off)
        off += 2
        esize, slot, cfmt = 12, 4, "HHI"
    tags: dict[str, object] = {}
    if off + (8 if big else 2) + n * esize > len(buf):
        raise ValueError(
            f"TIFF IFD at {off} declares {n} entries past end of file")
    for _ in range(n):
        tag, typ, count = _bs.unpack_from(bo + cfmt, buf, off)
        name = _TAGS.get(tag)
        if name is None or typ not in _TYPE_FMT:
            off += esize
            continue
        fmt, size = _TYPE_FMT[typ]
        nbytes = size * count
        if nbytes <= slot:
            data_off = off + esize - slot
        else:
            (data_off,) = _bs.unpack_from(bo + ("Q" if big else "I"), buf, off + esize - slot)
        if data_off + nbytes > len(buf):
            # a flipped count field can claim gigabytes (and the struct
            # format string `fmt * count` would try to BUILD them) — a
            # tag's value must lie inside the file
            raise ValueError(
                f"TIFF tag {tag} claims {nbytes} value bytes past end "
                f"of file")
        if typ == 2:  # ascii
            raw = buf[data_off : data_off + count]
            tags[name] = raw.split(b"\x00", 1)[0].decode("latin-1")
        elif typ in (5, 10):  # rational / SIGNED rational
            rfmt = "ii" if typ == 10 else "II"
            vals = _bs.unpack_from(bo + rfmt * count, buf, data_off)
            tags[name] = [
                vals[i] / (vals[i + 1] if vals[i + 1] else 1)
                for i in range(0, 2 * count, 2)
            ]
        else:
            vals = _bs.unpack_from(bo + fmt * count, buf, data_off)
            tags[name] = list(vals) if count > 1 else vals[0]
        off += esize
    (nxt,) = _bs.unpack_from(bo + ("Q" if big else "I"), buf, off)
    return tags, nxt


def _read_header(buf: bytes) -> tuple[str, bool, int]:
    """→ (byte_order, is_bigtiff, first_ifd_offset)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = _bs.unpack_from(bo + "H", buf, 2)
    if magic == 42:
        (ifd_off,) = _bs.unpack_from(bo + "I", buf, 4)
        return bo, False, ifd_off
    if magic == 43:
        osize, zero = _bs.unpack_from(bo + "HH", buf, 4)
        if osize != 8 or zero != 0:
            raise ValueError(f"bad BigTIFF header (offset size {osize})")
        (ifd_off,) = _bs.unpack_from(bo + "Q", buf, 8)
        return bo, True, ifd_off
    raise ValueError(f"not a TIFF (magic {magic})")


# ---------------------------------------------------------------- LZW codec

_CLEAR, _EOI = 256, 257


def _lzw_decode(raw: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit order, early code-width change —
    the libtiff convention)."""
    out = bytearray()
    nbits = len(raw) * 8
    bitpos = 0
    code_bits = 9
    table: list[bytes] = []
    prev = b""

    while bitpos + code_bits <= nbits:
        byte0 = bitpos >> 3
        window = int.from_bytes(raw[byte0 : byte0 + 4].ljust(4, b"\x00"), "big")
        code = (window >> (32 - (bitpos & 7) - code_bits)) & ((1 << code_bits) - 1)
        bitpos += code_bits
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_bits = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream must start with CLEAR")
        if not prev:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # TIFF early change (libtiff convention): the decoder widens ONE
        # entry before the table is full — at 2^n - 1 (511/1023/2047).
        # The old threshold of 2^n - 2 was self-consistent with our own
        # encoder but rejected every real libtiff/GDAL stream as
        # "corrupt" — caught by decoding the reference's
        # synthetic_lzw_stripped_f32.tif fixture, which a matching-pair
        # roundtrip test can never catch.
        if len(table) == (1 << code_bits) - 1 and code_bits < 12:
            code_bits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Matching TIFF-variant encoder (fixture writer)."""
    out = bytearray()
    acc = 0
    acc_bits = 0
    code_bits = 9

    def emit(code: int):
        nonlocal acc, acc_bits
        acc = (acc << code_bits) | code
        acc_bits += code_bits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = c
        # pairs with the decoder's 2^n - 1 early change: the decoder's
        # table lags one entry behind next_code, so the encoder widens
        # when next_code hits 2^n (512/1024/2048)
        if next_code == (1 << code_bits) and code_bits < 12:
            code_bits += 1
        if next_code == 4094:  # reset before the 12-bit table fills
            emit(table[w])
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_bits = 9
            w = b""
    if w:
        emit(table[w])
    emit(_EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _dtype(bo: str, sample_format: int, bits: int) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format)
    if kind is None or bits % 8:
        raise NotImplementedError(
            f"unsupported TIFF sample format {sample_format}/{bits}bit"
        )
    return np.dtype(("<" if bo == "<" else ">") + kind + str(bits // 8))


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression == 5:
        return _lzw_decode(raw)
    if compression in (8, 32946):
        return zlib.decompress(raw)
    raise NotImplementedError(f"unsupported TIFF compression {compression}")


def _ifd_chain(buf: bytes, bo: str, big: bool, first: int) -> list[dict]:
    chain = []
    off = first
    while off:
        t, off = _read_ifd(buf, bo, off, big)
        chain.append(t)
        if len(chain) > 64:
            raise ValueError("IFD chain too long (cyclic?)")
    return chain


def tiff_overviews(path: str) -> list[tuple[int, int]]:
    """(width, height) of each reduced-resolution IFD, COG order
    (largest first). Empty when the file has no overviews."""
    buf = _bs.open_buffer(path)
    bo, big, first = _read_header(buf)
    chain = _ifd_chain(buf, bo, big, first)
    return [
        (int(t["width"]), int(t["height"]))
        for t in chain
        if int(t.get("subfile_type", 0)) & 1
    ]


#: strip/tile decode counter (cache misses) — tests pin chunk-pruning
#: behavior on it, like zarrlite.CHUNK_READS
CHUNK_DECODES = 0


class _TiffImage:
    """Shared strip/tile decoder for one IFD: bands hold a reference and
    pull decoded chunks on demand. A small FIFO cache means a chunky
    multi-sample image decodes each strip once even when several bands
    read the same region; a contiguous row walk never re-decodes.
    Opening a TIFF therefore touches ONLY the header/IFD bytes — data
    chunks are ranged reads at slice time (the COG read contract,
    reference beacon-arrow-tiff reader.rs)."""

    _CACHE_CAP = 64

    def __init__(self, buf, h, w, spp, planar, comp, dt, undiff,
                 offs, cnts, tiled, tw=0, th=0, rps=0):
        self.buf, self.h, self.w, self.spp = buf, h, w, spp
        self.planar, self.comp, self.dt, self.undiff = planar, comp, dt, undiff
        self.offs, self.cnts, self.tiled = offs, cnts, tiled
        self.tw, self.th, self.rps = tw, th, rps
        self.chunk_samples = spp if planar == 1 else 1
        if tiled:
            self.tiles_x = (w + tw - 1) // tw
            self.tiles_y = (h + th - 1) // th
        else:
            self.strips_per_plane = (h + (rps or h) - 1) // (rps or h)
        self.out_dtype = dt.newbyteorder("=")
        self._cache: dict[int, np.ndarray] = {}

    def _chunk(self, i: int, rows: int, cols: int) -> np.ndarray:
        """Decoded chunk ``i`` shaped (rows, cols, chunk_samples)."""
        got = self._cache.get(i)
        if got is not None:
            return got
        global CHUNK_DECODES
        CHUNK_DECODES += 1
        o, c = self.offs[i], self.cnts[i]
        raw = _decompress(self.buf[o:o + c], self.comp)
        arr = np.frombuffer(raw, dtype=self.dt)[: rows * cols * self.chunk_samples]
        arr = self.undiff(arr.reshape(rows, cols, self.chunk_samples))
        if len(self._cache) >= self._CACHE_CAP:
            self._cache.pop(next(iter(self._cache)))
        self._cache[i] = arr
        return arr

    def read_band(self, s: int, ys: slice, xs: slice) -> np.ndarray:
        """Band ``s`` over the (y, x) box — decodes only intersecting
        strips/tiles."""
        y0, y1 = ys.start, ys.stop
        x0, x1 = xs.start, xs.stop
        out = np.empty((y1 - y0, x1 - x0), dtype=self.out_dtype)
        if y1 <= y0 or x1 <= x0:
            return out
        if self.tiled:
            plane_base = (s * self.tiles_x * self.tiles_y
                          if self.planar == 2 else 0)
            samp = s if self.planar == 1 else 0
            for ty in range(y0 // self.th, -(-y1 // self.th)):
                cy0 = ty * self.th
                rows = min(self.th, self.h - cy0)
                for tx in range(x0 // self.tw, -(-x1 // self.tw)):
                    cx0 = tx * self.tw
                    cols = min(self.tw, self.w - cx0)
                    # tiles are padded to full (th, tw); decode full,
                    # then clip to the image and the requested box
                    arr = self._chunk(
                        plane_base + ty * self.tiles_x + tx, self.th, self.tw)
                    gy0, gy1 = max(y0, cy0), min(y1, cy0 + rows)
                    gx0, gx1 = max(x0, cx0), min(x1, cx0 + cols)
                    if gy0 >= gy1 or gx0 >= gx1:
                        continue
                    out[gy0 - y0:gy1 - y0, gx0 - x0:gx1 - x0] = arr[
                        gy0 - cy0:gy1 - cy0, gx0 - cx0:gx1 - cx0, samp]
        else:
            rps = self.rps or self.h
            plane_base = (s * self.strips_per_plane
                          if self.planar == 2 else 0)
            samp = s if self.planar == 1 else 0
            for si in range(y0 // rps, -(-y1 // rps)):
                cy0 = si * rps
                rows = min(rps, self.h - cy0)
                arr = self._chunk(plane_base + si, rows, self.w)
                gy0, gy1 = max(y0, cy0), min(y1, cy0 + rows)
                out[gy0 - y0:gy1 - y0, :] = arr[
                    gy0 - cy0:gy1 - cy0, x0:x1, samp]
        return out


class _TiffLazyBand:
    """Chunk-on-demand TIFF band (the nd model's lazy-array protocol,
    like ZarrLazyArray / hdf5's _H5Lazy): basic-slice ``__getitem__``
    decodes only the strips/tiles intersecting the selection;
    ``np.asarray`` reads everything."""

    def __init__(self, img: _TiffImage, sample: int):
        self.img, self.sample = img, sample
        self.shape = (img.h, img.w)
        self.dtype = img.out_dtype
        self.ndim = 2

    def __len__(self) -> int:
        return self.shape[0]

    def _norm(self, idx) -> tuple[slice, slice]:
        if not isinstance(idx, tuple):
            idx = (idx,)
        if idx == (Ellipsis,):
            idx = ()
        out = []
        for i, s in enumerate(self.shape):
            if i < len(idx):
                it = idx[i]
                if isinstance(it, int):
                    if it < 0:
                        it += s
                    if not 0 <= it < s:
                        raise IndexError(
                            f"index {idx[i]} out of range for axis {i} "
                            f"(size {s})")
                    out.append(slice(it, it + 1))
                else:
                    lo, hi, step = it.indices(s)
                    if step != 1:
                        raise NotImplementedError(
                            "tiff lazy bands support step-1 slices only")
                    out.append(slice(lo, hi))
            else:
                out.append(slice(0, s))
        return tuple(out)

    def __getitem__(self, idx) -> np.ndarray:
        ys, xs = self._norm(idx)
        return self.img.read_band(self.sample, ys, xs)

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        full = self[(slice(None), slice(None))]
        return full.astype(dtype) if dtype is not None else full


def open_tiff(path: str, overview: int | None = None) -> GridDataset:
    """Parse a (Geo)TIFF into the shared nd model: dims (y, x), variables
    ``band.<i>`` (+ ``geo.lon``/``geo.lat`` when georeferenced) and scalar
    metadata variables matching the reference's names.

    ``overview=k`` selects the k-th reduced-resolution IFD (0-based, COG
    overview chain) instead of the full-resolution image — the COG read
    contract: a decimated query touches only the small IFD's strips or
    tiles. Georeferencing is rescaled from the full-resolution tags when
    the overview IFD carries none of its own."""
    # byte-source abstraction: local mmap / object-store range reads —
    # IFD walks hit the 64 KiB block cache; strip/tile reads are single
    # ranged GETs (the COG read contract end to end)
    buf = _bs.open_buffer(path)
    bo, big, first = _read_header(buf)
    chain = _ifd_chain(buf, bo, big, first)
    full = [t for t in chain if not (int(t.get("subfile_type", 0)) & 1)]
    ovrs = [t for t in chain if int(t.get("subfile_type", 0)) & 1]
    base = full[0] if full else chain[0]
    if overview is None:
        t = base
    else:
        if overview >= len(ovrs):
            raise IndexError(f"overview {overview} of {len(ovrs)} in {path}")
        t = dict(ovrs[overview])
        # inherit georeferencing, rescaled by the decimation factor
        if "model_pixel_scale" not in t and "model_pixel_scale" in base:
            fx = int(base["width"]) / int(t["width"])
            fy = int(base["height"]) / int(t["height"])
            ps = base["model_pixel_scale"]
            t["model_pixel_scale"] = [ps[0] * fx, ps[1] * fy] + list(ps[2:])
            if "model_tiepoint" in base:
                t["model_tiepoint"] = list(base["model_tiepoint"])
        for key in ("geo_key_directory", "gdal_nodata"):
            if key not in t and key in base:
                t[key] = base[key]
    n_overviews = len(ovrs)

    w, h = int(t["width"]), int(t["height"])
    spp = int(t.get("samples_per_pixel", 1))
    bits = t.get("bits_per_sample", 8)
    bits = int(bits[0] if isinstance(bits, list) else bits)
    sfmt = t.get("sample_format", 1)
    sfmt = int(sfmt[0] if isinstance(sfmt, list) else sfmt)
    comp = int(t.get("compression", 1))
    planar = int(t.get("planar_config", 1))
    predictor = int(t.get("predictor", 1))
    if predictor not in (1, 2):
        raise NotImplementedError(f"unsupported TIFF predictor {predictor}")
    dt = _dtype(bo, sfmt, bits)

    def undiff(a: np.ndarray) -> np.ndarray:
        """Predictor-2 horizontal differencing undo on a chunk shaped
        (rows, width, samples): per TIFF 6.0 the delta is PER COMPONENT
        (out[i] = in[i] - in[i-spp]), so the cumsum runs along the
        width axis — a flat cumsum across the interleaved row mixed
        channels on every multi-sample chunky image."""
        return np.cumsum(a, axis=1, dtype=a.dtype) if predictor == 2 else a

    def as_list(v):
        return v if isinstance(v, list) else [v]

    if "tile_offsets" in t:
        tw, th = int(t["tile_width"]), int(t["tile_length"])
        offs, cnts = as_list(t["tile_offsets"]), as_list(t["tile_byte_counts"])
        img = _TiffImage(buf, h, w, spp, planar, comp, dt, undiff,
                         offs, cnts, tiled=True, tw=tw, th=th)
    else:
        rps = int(t.get("rows_per_strip", h))
        offs, cnts = as_list(t["strip_offsets"]), as_list(t["strip_byte_counts"])
        img = _TiffImage(buf, h, w, spp, planar, comp, dt, undiff,
                         offs, cnts, tiled=False, rps=rps)

    nodata = None
    if "gdal_nodata" in t:
        try:
            nodata = float(str(t["gdal_nodata"]).strip())
        except ValueError:
            nodata = None

    dims = {"y": h, "x": w}
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]] = {}
    var_attrs: dict[str, dict] = {}
    for s in range(spp):
        variables[f"band.{s}"] = (("y", "x"), _TiffLazyBand(img, s))
        if nodata is not None:
            # GDAL_NODATA → NULL via the shared CF fill handling (a mask
            # here would be stripped by broadcast_to in flatten)
            var_attrs[f"band.{s}"] = {
                "_FillValue": np.array(nodata).astype(img.out_dtype).item()
            }

    def scalar(name, value):
        variables[name] = ((), np.array(value))

    scalar("image.width", w)
    scalar("image.height", h)
    scalar("image.samples_per_pixel", spp)
    scalar("image.bits_per_sample", bits)
    scalar("image.overview_count", n_overviews)
    if "tile_offsets" in t:
        scalar("image.tile_width", int(t["tile_width"]))
        scalar("image.tile_height", int(t["tile_length"]))

    # geo keys → epsg (ProjectedCSType 3072 wins over GeographicType 2048)
    gk = t.get("geo_key_directory")
    if gk and len(gk) >= 4:
        keys = {}
        for i in range(4, 4 * (gk[3] + 1), 4):
            kid, loc, _cnt, val = gk[i : i + 4]
            if loc == 0:
                keys[kid] = val
        epsg = keys.get(3072) or keys.get(2048)
        if epsg:
            scalar("geo.epsg", int(epsg))
            scalar("geo.crs", f"EPSG:{epsg}")
    if nodata is not None:
        scalar("geo.nodata", str(t["gdal_nodata"]).strip())
    if "model_pixel_scale" in t:
        scalar(
            "geo.model_pixel_scale",
            ",".join(str(v) for v in t["model_pixel_scale"]),
        )
    if "model_tiepoint" in t:
        scalar(
            "geo.model_tiepoint", ",".join(str(v) for v in t["model_tiepoint"])
        )

    # 1-D coordinate axes (reader.rs:208-224)
    tp, ps = t.get("model_tiepoint"), t.get("model_pixel_scale")
    tr = t.get("model_transformation")
    if tp and ps and len(tp) >= 6 and len(ps) >= 2:
        lon = tp[3] + (np.arange(w) - tp[0]) * ps[0]
        lat = tp[4] - (np.arange(h) - tp[1]) * ps[1]
        variables["geo.lon"] = (("x",), lon)
        variables["geo.lat"] = (("y",), lat)
    elif tr and len(tr) >= 16 and tr[1] == 0 and tr[4] == 0:
        variables["geo.lon"] = (("x",), tr[3] + np.arange(w) * tr[0])
        variables["geo.lat"] = (("y",), tr[7] + np.arange(h) * tr[5])

    return GridDataset(dims=dims, variables=variables, var_attrs=var_attrs)


# ---------------------------------------------------------------- writer


def _tag_bytes(typ: int, vals: list) -> bytes:
    fmt, _ = _TYPE_FMT[typ]
    if typ == 2:
        return bytes(vals)
    return struct.pack("<" + fmt * len(vals), *vals)


def _compress_strips(arr: np.ndarray, rps: int, comp: int) -> list[bytes]:
    strips = []
    for y0 in range(0, arr.shape[0], rps):
        raw = arr[y0 : y0 + rps].tobytes()
        if comp == 8:
            strips.append(zlib.compress(raw))
        elif comp == 5:
            strips.append(_lzw_encode(raw))
        else:
            strips.append(raw)
    return strips


def write_tiff(
    path: str,
    bands: list[np.ndarray],
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float, float, float] | None = None,
    epsg: int | None = None,
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int | None = None,
    bigtiff: bool = False,
    overviews: list[list[np.ndarray]] | None = None,
) -> None:
    """Striped chunky little-endian GeoTIFF writer (fixtures).
    ``tiepoint`` = (px, py, wx, wy); ``compression`` none|deflate|lzw;
    ``bigtiff=True`` writes the magic-43 8-byte-offset layout;
    ``overviews`` appends reduced-resolution IFDs (SubfileType=1) in a
    COG-style chain."""
    comp = {"none": 1, "deflate": 8, "lzw": 5}[compression]

    def image(levels_bands: list[np.ndarray], is_ovr: bool):
        h, w = levels_bands[0].shape
        spp = len(levels_bands)
        arr = np.stack([np.asarray(b) for b in levels_bands], axis=-1)
        dt = arr.dtype.newbyteorder("<")
        arr = arr.astype(dt)
        sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
        rps = rows_per_strip or h
        strips = _compress_strips(arr, rps, comp)
        tags: list[tuple[int, int, list]] = [
            (256, 4, [w]), (257, 4, [h]),
            (258, 3, [dt.itemsize * 8] * spp),
            (259, 3, [comp]), (277, 3, [spp]), (278, 4, [rps]),
            (284, 3, [1]), (339, 3, [sfmt] * spp),
        ]
        if is_ovr:
            tags.append((254, 4, [1]))  # NewSubfileType: reduced resolution
        else:
            if pixel_scale:
                tags.append((33550, 12, [pixel_scale[0], pixel_scale[1], 0.0]))
            if tiepoint:
                tags.append(
                    (33922, 12,
                     [tiepoint[0], tiepoint[1], 0.0, tiepoint[2], tiepoint[3], 0.0])
                )
            if epsg:
                # minimal geokey directory: version 1.1.0, one key
                tags.append((34735, 3, [1, 1, 0, 1, 2048, 0, 1, int(epsg)]))
            if nodata is not None:
                s = (f"{nodata:g}" + "\x00").encode()
                tags.append((42113, 2, list(s)))
        return tags, strips

    images = [image(bands, False)]
    for ov in overviews or []:
        images.append(image(ov, True))

    big = bigtiff
    slot = 8 if big else 4
    esize = 20 if big else 12
    cnt_size = 8 if big else 2
    off_size = 8 if big else 4
    header = 16 if big else 8
    off_type = 16 if big else 4  # LONG8 vs LONG for strip offsets

    out = bytearray()
    if big:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, header)
    else:
        out += b"II" + struct.pack("<HI", 42, header)
    cursor = header

    for idx, (tags, strips) in enumerate(images):
        n_entries = len(tags) + 2  # + strip offsets/counts
        ifd_size = cnt_size + n_entries * esize + off_size
        data_start = cursor + ifd_size
        blobs: dict[int, bytes] = {}
        offsets: dict[int, int] = {}
        c = data_start
        for tag, typ, vals in tags:
            b = _tag_bytes(typ, vals)
            if len(b) > slot:
                blobs[tag] = b
                offsets[tag] = c
                c += len(b) + (len(b) % 2)
        strip_offs = []
        for sdata in strips:
            strip_offs.append(c)
            c += len(sdata) + (len(sdata) % 2)
        all_tags = tags + [(273, off_type, strip_offs), (279, 4, [len(s) for s in strips])]
        for tag, typ, vals in all_tags[-2:]:
            b = _tag_bytes(typ, vals)
            if len(b) > slot:
                blobs[tag] = b
                offsets[tag] = c
                c += len(b) + (len(b) % 2)
        next_ifd = c if idx + 1 < len(images) else 0

        out += struct.pack("<Q" if big else "<H", n_entries)
        for tag, typ, vals in sorted(all_tags):
            b = _tag_bytes(typ, vals)
            count = len(vals)
            if big:
                if len(b) <= slot:
                    out += struct.pack("<HHQ", tag, typ, count) + b.ljust(8, b"\x00")
                else:
                    out += struct.pack("<HHQQ", tag, typ, count, offsets[tag])
            else:
                if len(b) <= slot:
                    out += struct.pack("<HHI", tag, typ, count) + b.ljust(4, b"\x00")
                else:
                    out += struct.pack("<HHII", tag, typ, count, offsets[tag])
        out += struct.pack("<Q" if big else "<I", next_ifd)
        assert len(out) == data_start
        for tag, typ, vals in tags:
            if tag in blobs:
                b = blobs[tag]
                out += b + b"\x00" * (len(b) % 2)
        for i, sdata in enumerate(strips):
            assert len(out) == strip_offs[i]
            out += sdata + b"\x00" * (len(sdata) % 2)
        for tag, typ, vals in all_tags[-2:]:
            if tag in blobs:
                assert len(out) == offsets[tag]
                b = blobs[tag]
                out += b + b"\x00" * (len(b) % 2)
        cursor = c
        assert len(out) == cursor

    with open(path, "wb") as f:
        f.write(bytes(out))
