"""Geo predicates without native geo libraries.

The container has no shapely/Sedona, so the two functions the reference's
GeoJSON filter needs (``st_geojson_as_wkt`` + ``st_within_point``,
``beacon-functions/src/geo/*.rs``) are implemented as:

  - a pure-Python GeoJSON→WKT converter (driver- or executor-side, trivial)
  - a vectorized numpy point-in-polygon (ray casting, even-odd rule with
    holes) inside an Arrow-batched pandas UDF, with a per-executor parsed-
    geometry LRU cache and a bbox prefilter — the same two optimizations the
    reference applies (st_within_point.rs: bbox pre-filter + LRU cache for
    constant geometry; NULL coords → false).

At scale the predicate is embarrassingly parallel (per-batch numpy); the
geometry string is a plan constant so each executor parses it once.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import types as T


# ---------------------------------------------------------------- geojson → wkt


def geojson_to_wkt(geojson: str | dict) -> str:
    g = json.loads(geojson) if isinstance(geojson, str) else geojson
    t = g["type"]
    c = g.get("coordinates")

    def ring(r):
        return "(" + ", ".join(f"{x} {y}" for x, y, *_ in r) + ")"

    if t == "Point":
        x, y, *_ = c
        return f"POINT ({x} {y})"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({x} {y})" for x, y, *_ in c) + ")"
    if t == "LineString":
        return "LINESTRING " + ring(c)
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(ring(r) for r in c) + ")"
    if t == "Polygon":
        return "POLYGON (" + ", ".join(ring(r) for r in c) + ")"
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(ring(r) for r in poly) + ")" for poly in c)
            + ")"
        )
    if t == "GeometryCollection":
        return (
            "GEOMETRYCOLLECTION ("
            + ", ".join(geojson_to_wkt(x) for x in g["geometries"])
            + ")"
        )
    raise ValueError(f"unsupported GeoJSON type {t}")


# ---------------------------------------------------------------- wkt parsing
#
# ONE parser for both geometry modules: functions/_wkt.py (the r10
# duplicate stacks drifted — the Z/M phantom-vertex fix had to be
# applied twice; this wrapper keeps st_within_point's polygon-list
# currency while the text handling lives in the shared leaf).


def parse_wkt_polygons(wkt: str) -> list[list[np.ndarray]]:
    """WKT → list of polygons, each a list of rings (first = shell, rest =
    holes). Supports POLYGON and MULTIPOLYGON; POINT degenerates to a
    zero-area polygon (point-equality)."""
    from beacon_spark.functions._wkt import parse_wkt

    g = parse_wkt(wkt)
    if g.polys is not None:
        if g.polys or g.empty:
            return list(g.polys)
    if g.kind == "POINT" and g.pts is not None and len(g.pts):
        return [[g.pts[:1]]]
    raise ValueError(f"unsupported WKT geometry: {wkt[:40]}...")


# ---------------------------------------------------------------- containment


def _points_in_ring(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized ray casting: for each (x, y), crossing-count parity
    against one ring. O(vertices × points) numpy ops, no Python loop over
    points."""
    x1, y1 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
    x2, y2 = ring[1:, 0][:, None], ring[1:, 1][:, None]
    cond = (y1 <= y[None, :]) != (y2 <= y[None, :])
    # explicit mask: horizontal segments (dy == 0) never satisfy cond,
    # so their quotient is dead — masking the denominator keeps REAL
    # overflow warnings audible instead of blanket-silencing the op
    dy = y2 - y1
    denom = np.where(dy == 0.0, np.inf, dy)
    # extreme-coordinate arithmetic may still saturate to inf (over) or
    # produce inf/inf (invalid) — both land only in cond-masked cells
    with np.errstate(over="ignore", invalid="ignore"):
        xin = x1 + (y[None, :] - y1) * (x2 - x1) / denom
    crossings = (cond & (x[None, :] < xin)).sum(axis=0)
    return (crossings % 2).astype(bool)


class _Geometry:
    def __init__(self, wkt: str):
        self.polys = parse_wkt_polygons(wkt)
        allpts = np.vstack([r for p in self.polys for r in p])
        self.bbox = (
            allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max(),
        )
        self.is_point = len(self.polys) == 1 and len(self.polys[0][0]) == 1

    def contains(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        out = np.zeros(len(x), dtype=bool)
        minx, miny, maxx, maxy = self.bbox
        cand = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
        if not cand.any():
            return out
        cx, cy = x[cand], y[cand]
        if self.is_point:
            px, py = self.polys[0][0][0]
            res = (cx == px) & (cy == py)
        else:
            res = np.zeros(len(cx), dtype=bool)
            for rings in self.polys:
                shell = _points_in_ring(_closed(rings[0]), cx, cy)
                for hole in rings[1:]:
                    shell &= ~_points_in_ring(_closed(hole), cx, cy)
                res |= shell
        out[cand] = res
        return out


def _closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


_GEOM_CACHE: dict[str, _Geometry] = {}


def _geometry(wkt: str) -> _Geometry:
    g = _GEOM_CACHE.get(wkt)
    if g is None:
        if len(_GEOM_CACHE) > 64:
            _GEOM_CACHE.clear()
        g = _GEOM_CACHE[wkt] = _Geometry(wkt)
    return g


# ---------------------------------------------------------------- python API


def st_geojson_as_wkt_py(geojson: str) -> str:
    return geojson_to_wkt(geojson)


def st_within_point_py(wkt: str, lon, lat):
    """Vectorized containment; NULL lon/lat → false (st_within_point.rs)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    valid = ~(np.isnan(lon) | np.isnan(lat))
    out = np.zeros(len(lon), dtype=bool)
    if valid.any():
        out[valid] = _geometry(wkt).contains(lon[valid], lat[valid])
    return out


# ---------------------------------------------------------------- pandas UDFs


def st_geojson_as_wkt_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else geojson_to_wkt(v))

    return _udf


def st_within_point_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BooleanType())
    def _udf(wkt: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        if wkt.empty:
            return pd.Series([], dtype=bool)
        # geometry is a plan constant in the GeoJSON-filter rewrite; the
        # cache makes the parse once-per-executor, as the reference's LRU does
        w = wkt.iloc[0]
        lo = pd.to_numeric(lon, errors="coerce").to_numpy(dtype=np.float64, na_value=np.nan)
        la = pd.to_numeric(lat, errors="coerce").to_numpy(dtype=np.float64, na_value=np.nan)
        if wkt.nunique(dropna=False) == 1:
            # a NULL geometry contains nothing — the constant path used
            # to hand None to the parser and crash the whole query
            if w is None:
                return pd.Series(np.zeros(len(wkt), dtype=bool))
            return pd.Series(st_within_point_py(w, lo, la))
        out = np.zeros(len(wkt), dtype=bool)
        for g, idx in wkt.dropna().groupby(wkt).groups.items():
            ii = np.asarray(idx)
            out[ii] = st_within_point_py(g, lo[ii], la[ii])
        return pd.Series(out)

    return _udf


# ---------------------------------------------------------------- wkb → wkt


_WKB_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def fmt_coord(v: float) -> str:
    """Shortest value-exact coordinate text: the compact ``%g`` form
    when it round-trips, else the full ``repr``. ``%g`` alone (6
    significant digits) corrupted every decoded geometry coordinate
    with more precision — a lon of -122.419416 came back -122.419,
    ~40 m off (r10 sweep, caught by the WKB round-trip property test)."""
    s = f"{v:g}"
    return s if float(s) == v else repr(v)


def wkb_to_wkt(buf: bytes) -> str:
    """ISO/OGC WKB → WKT for the 7 standard 2-D geometry types (+ Z/M
    flags, both byte orders). Pure Python — used by read_geoparquet to
    decode geometry columns into the engine's WKT currency
    (beacon-arrow-geoparquet decodes to GeoArrow; we have no geometry
    type in Spark, so WKT strings are the documented mapping)."""
    import struct

    def parse(off: int) -> tuple[str, int]:
        bo = "<" if buf[off] == 1 else ">"
        (code,) = struct.unpack_from(bo + "I", buf, off + 1)
        off += 5
        ndim = 2
        base = code % 1000
        flags = code // 1000
        if flags in (1, 2):      # Z or M
            ndim = 3
        elif flags == 3:         # ZM
            ndim = 4
        name = _WKB_NAMES.get(base)
        if name is None:
            raise ValueError(f"unsupported WKB geometry code {code}")
        # carry the dimensionality designator: emitting Z/M values
        # inline WITHOUT it made every downstream parse see phantom
        # 2-D vertices at the (z, m) coordinates
        if flags == 1:
            name += " Z"
        elif flags == 2:
            name += " M"
        elif flags == 3:
            name += " ZM"

        def coords(o: int) -> tuple[str, int]:
            vals = struct.unpack_from(bo + f"{ndim}d", buf, o)
            return " ".join(fmt_coord(v) for v in vals), o + 8 * ndim

        def ring(o: int) -> tuple[str, int]:
            (n,) = struct.unpack_from(bo + "I", buf, o)
            o += 4
            pts = []
            for _ in range(n):
                p, o = coords(o)
                pts.append(p)
            return "(" + ", ".join(pts) + ")", o

        if base == 1:
            p, off = coords(off)
            return f"{name} ({p})", off
        if base == 2:
            r, off = ring(off)
            return f"{name} {r}", off
        if base == 3:
            (n,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            rings = []
            for _ in range(n):
                r, off = ring(off)
                rings.append(r)
            return f"{name} ({', '.join(rings)})", off
        # multi/collection: n child geometries, each with its own header
        (n,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            child, off = parse(off)
            if base in (4, 5, 6):
                # strip the child's "TYPE [ZM ]" prefix per WKT multi
                # syntax (the parent already carries the designator)
                parts.append(re.sub(
                    r"^[A-Z]+\s+(?:ZM\s+|Z\s+|M\s+)?", "", child, count=1))
            else:
                parts.append(child)
        return f"{name} ({', '.join(parts)})", off

    wkt, _ = parse(0)
    return wkt


def wkb_to_wkt_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _udf(b: pd.Series) -> pd.Series:
        return b.map(lambda v: None if v is None else wkb_to_wkt(bytes(v)))

    return _udf
