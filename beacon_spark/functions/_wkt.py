"""Shared WKT parser — the ONE place geometry text becomes arrays.

Both geometry modules consume this leaf (``st.py`` for the full ST_*
suite, ``geo.py`` for the st_within_point/GeoJSON-filter hot path).
They used to carry separate parser stacks, and the stacks drifted: the
Z/M phantom-vertex fix had to be applied twice in round 10. A leaf
module (numpy + re only, no intra-package imports) breaks the circular-
import knot that motivated the duplication.

Reference currency contract: geometry values are WKT strings
(docs/docs/2.0.0-rc2 geodatafusion mapping; geo/st_within_point.rs).
"""

from __future__ import annotations

import math
import re

import numpy as np

_NUM = r"[-+]?(?:\d*\.\d+|\d+\.?)(?:[eE][-+]?\d+)?"
_COORD_RE = re.compile(rf"({_NUM})\s+({_NUM})")
_NUM_RE = re.compile(_NUM)


class Geom:
    """Parsed WKT: ``kind`` + list of parts.

    POINT/MULTIPOINT          -> pts: (n,2) array
    LINESTRING/MULTILINESTRING-> lines: list[(n,2)]
    POLYGON/MULTIPOLYGON      -> polys: list[list[(n,2)]] (shell+holes)
    GEOMETRYCOLLECTION        -> geoms: list[Geom]
    """

    __slots__ = ("kind", "pts", "lines", "polys", "geoms", "empty")

    def __init__(self, kind):
        self.kind = kind
        self.pts = None
        self.lines = None
        self.polys = None
        self.geoms = None
        self.empty = False

    # -- derived -------------------------------------------------------
    def all_coords(self) -> np.ndarray:
        if self.empty:
            return np.zeros((0, 2))
        if self.pts is not None:
            return self.pts
        if self.lines is not None:
            return np.vstack(self.lines) if self.lines else np.zeros((0, 2))
        if self.polys is not None:
            rings = [r for p in self.polys for r in p]
            return np.vstack(rings) if rings else np.zeros((0, 2))
        return (
            np.vstack([g.all_coords() for g in self.geoms])
            if self.geoms
            else np.zeros((0, 2))
        )

    def bounds(self):
        c = self.all_coords()
        if not len(c):
            return (math.nan,) * 4
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    def segments(self) -> np.ndarray:
        """All boundary segments as (m, 4) [x1 y1 x2 y2] — polygons use
        closed rings, linestrings their runs, points contribute none."""
        segs = []
        if self.lines:
            for ln in self.lines:
                if len(ln) > 1:
                    segs.append(np.hstack([ln[:-1], ln[1:]]))
        if self.polys:
            for rings in self.polys:
                for r in rings:
                    rc = _close(r)
                    if len(rc) > 1:
                        segs.append(np.hstack([rc[:-1], rc[1:]]))
        if self.geoms:
            for g in self.geoms:
                s = g.segments()
                if len(s):
                    segs.append(s)
        return np.vstack(segs) if segs else np.zeros((0, 4))


def _close(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.array_equal(r[0], r[-1]):
        return np.vstack([r, r[:1]])
    return r


def _coords(text: str) -> np.ndarray:
    """Comma-separated point list → (n, 2) XY. Each point contributes
    its FIRST TWO numbers: pairing the flat number list turned every
    Z/M/ZM point into phantom 2-D vertices at the (z, m) values."""
    pts = []
    for part in text.split(","):
        nums = _NUM_RE.findall(part)
        if len(nums) >= 2:
            pts.append((float(nums[0]), float(nums[1])))
    return np.array(pts, dtype=np.float64).reshape(-1, 2)


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized body at top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return parts


def _inner(s: str) -> str:
    return s[s.index("(") + 1 : s.rindex(")")]


def parse_wkt(wkt: str) -> Geom:
    s = wkt.strip()
    m = re.match(r"([A-Za-z]+)\s*(ZM|Z|M)?\s*(.*)", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    kind = m.group(1).upper()
    rest = m.group(3).strip()
    g = Geom(kind)
    if rest.upper() == "EMPTY" or not rest:
        g.empty = True
        if kind in ("POINT", "MULTIPOINT"):
            g.pts = np.zeros((0, 2))
        elif kind in ("LINESTRING", "MULTILINESTRING"):
            g.lines = []
        elif kind in ("POLYGON", "MULTIPOLYGON"):
            g.polys = []
        else:
            g.geoms = []
        return g
    body = _inner(rest)
    if kind == "POINT":
        g.pts = _coords(body)
    elif kind == "MULTIPOINT":
        g.pts = _coords(body)
    elif kind == "LINESTRING":
        g.lines = [_coords(body)]
    elif kind == "MULTILINESTRING":
        g.lines = [_coords(p) for p in _split_groups(body)]
    elif kind == "POLYGON":
        g.polys = [[_coords(p) for p in _split_groups(body)]]
    elif kind == "MULTIPOLYGON":
        g.polys = [
            [_coords(r) for r in _split_groups(_inner(p.strip()))]
            for p in _split_groups(body)
        ]
    elif kind == "GEOMETRYCOLLECTION":
        g.geoms = [parse_wkt(p.strip()) for p in _split_groups(body)]
    else:
        raise ValueError(f"unsupported WKT type {kind}")
    return g


_PARSE_CACHE: dict[str, Geom] = {}


def _parsed(wkt: str) -> Geom:
    g = _PARSE_CACHE.get(wkt)
    if g is None:
        if len(_PARSE_CACHE) > 4096:
            _PARSE_CACHE.clear()
        g = _PARSE_CACHE[wkt] = parse_wkt(wkt)
    return g
