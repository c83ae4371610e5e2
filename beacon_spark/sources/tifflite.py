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

Supported: classic TIFF (little/big endian), strip or tile layout, chunky
or planar configuration, compression none(1)/deflate(8,32946), horizontal
predictor(2), sample formats uint/int/float 8-64 bit, GDAL_NODATA → NULL.
BigTIFF and JPEG/LZW/packbits compression raise loudly.

No rasterio/PIL in this container — this parser is the real read path,
not a stub, and the writer exists so tests can build fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from beacon_spark.sources.nd import GridDataset

__all__ = ["open_tiff", "write_tiff"]

_TYPE_FMT = {
    1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8),
}

_TAGS = {
    256: "width", 257: "height", 258: "bits_per_sample", 259: "compression",
    273: "strip_offsets", 277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_byte_counts", 284: "planar_config", 317: "predictor",
    322: "tile_width", 323: "tile_length", 324: "tile_offsets",
    325: "tile_byte_counts", 339: "sample_format",
    33550: "model_pixel_scale", 33922: "model_tiepoint",
    34264: "model_transformation", 34735: "geo_key_directory",
    42112: "gdal_metadata", 42113: "gdal_nodata",
}


def _read_ifd(buf: bytes, bo: str, off: int) -> dict:
    (n,) = struct.unpack_from(bo + "H", buf, off)
    off += 2
    tags: dict[str, object] = {}
    for _ in range(n):
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, off)
        name = _TAGS.get(tag)
        if name is None or typ not in _TYPE_FMT:
            off += 12
            continue
        fmt, size = _TYPE_FMT[typ]
        nbytes = size * count
        if nbytes <= 4:
            data_off = off + 8
        else:
            (data_off,) = struct.unpack_from(bo + "I", buf, off + 8)
        if typ == 2:  # ascii
            raw = buf[data_off : data_off + count]
            tags[name] = raw.split(b"\x00", 1)[0].decode("latin-1")
        elif typ in (5, 10):  # rational
            vals = struct.unpack_from(bo + "II" * count, buf, data_off)
            tags[name] = [vals[i] / max(vals[i + 1], 1) for i in range(0, 2 * count, 2)]
        else:
            vals = struct.unpack_from(bo + fmt * count, buf, data_off)
            tags[name] = list(vals) if count > 1 else vals[0]
        off += 12
    return tags


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
    if compression in (8, 32946):
        return zlib.decompress(raw)
    raise NotImplementedError(f"unsupported TIFF compression {compression}")


def open_tiff(path: str) -> GridDataset:
    """Parse a (Geo)TIFF into the shared nd model: dims (y, x), variables
    ``band.<i>`` (+ ``geo.lon``/``geo.lat`` when georeferenced) and scalar
    metadata variables matching the reference's names."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: {path}")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported")
    if magic != 42:
        raise ValueError(f"not a TIFF: {path}")
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    t = _read_ifd(buf, bo, ifd_off)

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
        return np.cumsum(a, axis=-1, dtype=a.dtype) if predictor == 2 else a

    def as_list(v):
        return v if isinstance(v, list) else [v]

    planes = spp if planar == 2 else 1
    chunk_samples = spp if planar == 1 else 1
    if "tile_offsets" in t:
        tw, th = int(t["tile_width"]), int(t["tile_length"])
        offs, cnts = as_list(t["tile_offsets"]), as_list(t["tile_byte_counts"])
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        data = np.zeros((spp, h, w), dtype=dt.newbyteorder("="))
        for i, (o, c) in enumerate(zip(offs, cnts)):
            plane, rest = divmod(i, tiles_x * tiles_y)
            ty, tx = divmod(rest, tiles_x)
            raw = _decompress(buf[o : o + c], comp)
            arr = np.frombuffer(raw, dtype=dt)[: th * tw * chunk_samples]
            arr = undiff(arr.reshape(th, tw * chunk_samples)).reshape(
                th, tw, chunk_samples
            )
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, h - y0), min(tw, w - x0)
            if planar == 1:
                for s in range(spp):
                    data[s, y0 : y0 + ys, x0 : x0 + xs] = arr[:ys, :xs, s]
            else:
                data[plane, y0 : y0 + ys, x0 : x0 + xs] = arr[:ys, :xs, 0]
    else:
        rps = int(t.get("rows_per_strip", h))
        offs, cnts = as_list(t["strip_offsets"]), as_list(t["strip_byte_counts"])
        strips_per_plane = (h + rps - 1) // rps
        data = np.zeros((spp, h, w), dtype=dt.newbyteorder("="))
        for i, (o, c) in enumerate(zip(offs, cnts)):
            plane, si = divmod(i, strips_per_plane)
            y0 = si * rps
            ys = min(rps, h - y0)
            raw = _decompress(buf[o : o + c], comp)
            arr = np.frombuffer(raw, dtype=dt)[: ys * w * chunk_samples]
            arr = undiff(arr.reshape(ys, w * chunk_samples)).reshape(
                ys, w, chunk_samples
            )
            if planar == 1:
                for s in range(spp):
                    data[s, y0 : y0 + ys, :] = arr[:, :, s]
            else:
                data[plane, y0 : y0 + ys, :] = arr[:, :, 0]

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
        variables[f"band.{s}"] = (("y", "x"), data[s])
        if nodata is not None:
            # GDAL_NODATA → NULL via the shared CF fill handling (a mask
            # here would be stripped by broadcast_to in flatten)
            var_attrs[f"band.{s}"] = {
                "_FillValue": np.array(nodata).astype(data.dtype).item()
            }

    def scalar(name, value):
        variables[name] = ((), np.array(value))

    scalar("image.width", w)
    scalar("image.height", h)
    scalar("image.samples_per_pixel", spp)
    scalar("image.bits_per_sample", bits)
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


def write_tiff(
    path: str,
    bands: list[np.ndarray],
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float, float, float] | None = None,
    epsg: int | None = None,
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int | None = None,
) -> None:
    """Minimal striped chunky little-endian GeoTIFF writer (fixtures).
    ``tiepoint`` = (px, py, wx, wy)."""
    h, w = bands[0].shape
    spp = len(bands)
    arr = np.stack([np.asarray(b) for b in bands], axis=-1)
    dt = arr.dtype.newbyteorder("<")
    arr = arr.astype(dt)
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    comp = 8 if compression == "deflate" else 1
    rps = rows_per_strip or h

    strips = []
    for y0 in range(0, h, rps):
        raw = arr[y0 : y0 + rps].tobytes()
        strips.append(zlib.compress(raw) if comp == 8 else raw)

    entries: list[tuple[int, int, list]] = [
        (256, 4, [w]), (257, 4, [h]),
        (258, 3, [dt.itemsize * 8] * spp),
        (259, 3, [comp]), (277, 3, [spp]), (278, 4, [rps]),
        (284, 3, [1]), (339, 3, [sfmt] * spp),
    ]
    extra: list[tuple[int, int, list]] = []
    if pixel_scale:
        extra.append((33550, 12, [pixel_scale[0], pixel_scale[1], 0.0]))
    if tiepoint:
        extra.append(
            (33922, 12, [tiepoint[0], tiepoint[1], 0.0, tiepoint[2], tiepoint[3], 0.0])
        )
    if epsg:
        # minimal geokey directory: version 1.1.0, one key (2048 geographic)
        extra.append((34735, 3, [1, 1, 0, 1, 2048, 0, 1, int(epsg)]))
    if nodata is not None:
        s = (f"{nodata:g}" + "\x00").encode()
        extra.append((42113, 2, list(s)))

    n_entries = len(entries) + len(extra) + 2  # + strip offsets/counts
    header = 8
    ifd_off = header
    ifd_size = 2 + n_entries * 12 + 4
    data_off = ifd_off + ifd_size

    # lay out out-of-line tag data, then strip data
    blobs: dict[int, bytes] = {}

    def tag_bytes(typ: int, vals: list) -> bytes:
        fmt, _ = _TYPE_FMT[typ]
        if typ == 2:
            return bytes(vals)
        return struct.pack("<" + fmt * len(vals), *vals)

    all_tags = entries + extra
    offsets: dict[int, int] = {}
    cursor = data_off
    for tag, typ, vals in all_tags:
        b = tag_bytes(typ, vals)
        if len(b) > 4:
            blobs[tag] = b
            offsets[tag] = cursor
            cursor += len(b) + (len(b) % 2)
    strip_offs = []
    for sdata in strips:
        strip_offs.append(cursor)
        cursor += len(sdata) + (len(sdata) % 2)
    all_tags.append((273, 4, strip_offs))
    all_tags.append((279, 4, [len(s) for s in strips]))
    for tag, typ, vals in all_tags[-2:]:
        b = tag_bytes(typ, vals)
        if len(b) > 4:
            blobs[tag] = b
            offsets[tag] = cursor
            cursor += len(b) + (len(b) % 2)

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, vals in sorted(all_tags):
        fmt, size = _TYPE_FMT[typ]
        b = tag_bytes(typ, vals)
        count = len(vals)
        if len(b) <= 4:
            out += struct.pack("<HHI", tag, typ, count) + b.ljust(4, b"\x00")
        else:
            out += struct.pack("<HHII", tag, typ, count, offsets[tag])
    out += struct.pack("<I", 0)  # no next IFD
    assert len(out) == data_off
    for tag, typ, vals in all_tags:
        if tag in blobs and tag not in (273, 279):
            b = blobs[tag]
            out += b + b"\x00" * (len(b) % 2)
    for i, sdata in enumerate(strips):
        assert len(out) == strip_offs[i]
        out += sdata + b"\x00" * (len(sdata) % 2)
    for tag in (273, 279):
        if tag in blobs:
            assert len(out) == offsets[tag]
            b = blobs[tag]
            out += b + b"\x00" * (len(b) % 2)
    with open(path, "wb") as f:
        f.write(bytes(out))
