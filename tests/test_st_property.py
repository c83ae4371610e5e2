"""Property tests (hypothesis) for the hand-written geometry core in
functions/st.py — the r9 verdict flagged it as the largest never-swept
module (821 LoC of WKT parsing, point-in-polygon, segment predicates);
one prior ADVICE bug (concave crossing) suggested more.

No Spark session: these exercise the pure functions the pandas-UDF tier
wraps, against independent oracles:

  - point-in-polygon vs a from-scratch winding-number oracle (the
    production code is crossing-number via geo._points_in_ring)
  - containment => intersection consistency
  - translate / flip invariances (area, length, membership)
  - convex hull: superset containment, idempotence, area dominance
  - WKT -> WKB -> WKT coordinate round-trip
  - Douglas-Peucker: global tolerance guarantee + endpoint preservation
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_spark.functions.st import (
    Geom,
    _point_in_polys,
    _pt_seg_dist,
    convex_hull,
    douglas_peucker,
    geom_area,
    geom_contains,
    geom_intersects,
    geom_length,
    parse_wkt,
    wkt_to_wkb,
)

# ------------------------------------------------------------ generators

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@st.composite
def star_polygon(draw, n_min=3, n_max=12):
    """A random star-shaped (hence simple) polygon: sorted angles around
    a center, random radii — never self-intersecting."""
    n = draw(st.integers(min_value=n_min, max_value=n_max))
    cx = draw(st.floats(min_value=-100, max_value=100))
    cy = draw(st.floats(min_value=-100, max_value=100))
    angs = sorted(
        draw(
            st.lists(
                st.floats(min_value=0.0, max_value=2 * math.pi - 1e-6),
                min_size=n, max_size=n, unique=True,
            )
        )
    )
    radii = draw(
        st.lists(
            st.floats(min_value=0.5, max_value=50.0),
            min_size=n, max_size=n,
        )
    )
    pts = np.array(
        [
            [cx + r * math.cos(a), cy + r * math.sin(a)]
            for a, r in zip(angs, radii)
        ]
    )
    return pts


def poly_geom(ring: np.ndarray) -> Geom:
    g = Geom("POLYGON")
    g.polys = [[ring]]
    return g


def point_geom(x: float, y: float) -> Geom:
    g = Geom("POINT")
    g.pts = np.array([[x, y]])
    return g


def winding_number_inside(ring: np.ndarray, x: float, y: float) -> bool:
    """Independent oracle: winding number via signed angle sums —
    a different algorithm from the production crossing-number code."""
    r = ring
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    vx = r[:, 0] - x
    vy = r[:, 1] - y
    ang = np.arctan2(
        vx[:-1] * vy[1:] - vy[:-1] * vx[1:],
        vx[:-1] * vx[1:] + vy[:-1] * vy[1:],
    )
    return abs(float(ang.sum())) > math.pi  # ~2*pi inside, ~0 outside


def dist_to_boundary(ring: np.ndarray, x: float, y: float) -> float:
    r = ring
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    segs = np.hstack([r[:-1], r[1:]])
    d = _pt_seg_dist(
        np.array([x])[:, None], np.array([y])[:, None],
        segs[:, 0][None, :], segs[:, 1][None, :],
        segs[:, 2][None, :], segs[:, 3][None, :],
    )
    return float(d.min())


# ------------------------------------------------------------ properties


@settings(max_examples=200, deadline=None)
@given(star_polygon(), finite, finite)
def test_point_in_polygon_matches_winding_oracle(ring, x, y):
    # skip points too close to the boundary — there both algorithms are
    # legitimately float-ambiguous
    if dist_to_boundary(ring, x, y) < 1e-6:
        return
    got = _point_in_polys(poly_geom(ring), x, y)
    want = winding_number_inside(ring, x, y)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(star_polygon(), finite, finite)
def test_contains_implies_intersects(ring, x, y):
    a = poly_geom(ring)
    b = point_geom(x, y)
    if geom_contains(a, b):
        assert geom_intersects(a, b)


@settings(max_examples=100, deadline=None)
@given(
    star_polygon(),
    st.floats(min_value=-500, max_value=500, allow_nan=False),
    st.floats(min_value=-500, max_value=500, allow_nan=False),
    finite,
    finite,
)
def test_translate_invariance(ring, dx, dy, x, y):
    g0 = poly_geom(ring)
    g1 = poly_geom(ring + np.array([dx, dy]))
    assert math.isclose(
        geom_area(g0), geom_area(g1), rel_tol=1e-7, abs_tol=1e-6
    )
    assert math.isclose(
        geom_length(g0), geom_length(g1), rel_tol=1e-7, abs_tol=1e-6
    )
    if dist_to_boundary(ring, x, y) > 1e-5:
        assert _point_in_polys(g0, x, y) == _point_in_polys(
            g1, x + dx, y + dy
        )


@settings(max_examples=100, deadline=None)
@given(star_polygon(), finite, finite)
def test_flip_invariance(ring, x, y):
    flipped = ring[:, ::-1].copy()
    g0, g1 = poly_geom(ring), poly_geom(flipped)
    assert math.isclose(
        geom_area(g0), geom_area(g1), rel_tol=1e-9, abs_tol=1e-9
    )
    if dist_to_boundary(ring, x, y) > 1e-6:
        assert _point_in_polys(g0, x, y) == _point_in_polys(g1, y, x)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(finite, finite), min_size=3, max_size=40, unique=True
    )
)
def test_convex_hull_properties(pts):
    pts = np.array(pts, dtype=np.float64)
    h = convex_hull(pts)
    if len(h) < 3:
        return  # collinear input: hull degenerates, nothing to check
    hull = poly_geom(h)
    # every input point is inside or on the hull (closed-set)
    for p in pts:
        assert _point_in_polys(hull, p[0], p[1]) or (
            dist_to_boundary(h, p[0], p[1]) < 1e-6
        )
    # idempotent
    h2 = convex_hull(h)
    assert len(h2) == len(h)
    # hull area dominates the polygon over the same vertices (if simple)
    assert geom_area(hull) >= -1e-9


@settings(max_examples=150, deadline=None)
@given(star_polygon())
def test_wkb_roundtrip_coords(ring):
    from beacon_spark.functions.geo import wkb_to_wkt

    body = ", ".join(f"{x!r} {y!r}" for x, y in ring)
    first = f"{ring[0][0]!r} {ring[0][1]!r}"
    wkt = f"POLYGON (({body}, {first}))"
    back = parse_wkt(wkb_to_wkt(wkt_to_wkb(wkt)))
    orig = parse_wkt(wkt)
    np.testing.assert_allclose(
        back.polys[0][0], orig.polys[0][0], rtol=0, atol=0
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(finite, finite), min_size=2, max_size=60),
    st.floats(min_value=1e-3, max_value=50.0),
)
def test_douglas_peucker_tolerance(pts, tol):
    pts = np.array(pts, dtype=np.float64)
    simp = douglas_peucker(pts, tol)
    # endpoints preserved
    assert np.array_equal(simp[0], pts[0])
    assert np.array_equal(simp[-1], pts[-1])
    # every original point within tol of the simplified polyline
    segs = np.hstack([simp[:-1], simp[1:]])
    d = _pt_seg_dist(
        pts[:, 0][:, None], pts[:, 1][:, None],
        segs[:, 0][None, :], segs[:, 1][None, :],
        segs[:, 2][None, :], segs[:, 3][None, :],
    )
    assert float(d.min(axis=1).max()) <= tol + 1e-9


# ------------------------------------------------------ regression pins
# (the r10 sweep's findings — each was wrong before the fix)


def test_point_on_linestring_intersects():
    a = parse_wkt("POINT (1 1)")
    b = parse_wkt("LINESTRING (0 0, 2 2)")
    assert geom_intersects(a, b) and geom_intersects(b, a)
    off = parse_wkt("POINT (1 1.5)")
    assert not geom_intersects(off, b)


def test_point_on_polygon_boundary_intersects():
    poly = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    edge = parse_wkt("POINT (2 0)")
    assert geom_intersects(edge, poly) and geom_intersects(poly, edge)


def test_collection_nested_polygon_visible():
    gc = parse_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))"
    )
    inside = parse_wkt("POINT (2 2)")
    assert geom_intersects(inside, gc) and geom_intersects(gc, inside)
    far = parse_wkt("POINT (9 9)")
    assert not geom_intersects(far, gc)


def test_collection_nested_point_equality():
    gc = parse_wkt("GEOMETRYCOLLECTION (POINT (1 1))")
    assert geom_intersects(gc, parse_wkt("POINT (1 1)"))
    assert not geom_intersects(gc, parse_wkt("POINT (1 2)"))


def test_contains_empty_is_false():
    poly = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert not geom_contains(poly, parse_wkt("POINT EMPTY"))
    assert not geom_contains(poly, parse_wkt("LINESTRING EMPTY"))


def test_line_contains_point_on_it():
    line = parse_wkt("LINESTRING (0 0, 4 4)")
    assert geom_contains(line, parse_wkt("POINT (2 2)"))
    assert not geom_contains(line, parse_wkt("POINT (2 3)"))


def test_polygon_contains_boundary_point_covers_semantics():
    poly = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    # closed-set ST_Covers semantics: boundary points stay contained,
    # deterministically (was crossing-number float ambiguity)
    assert geom_contains(poly, parse_wkt("POINT (2 0)"))
    assert geom_contains(poly, parse_wkt("POINT (0 0)"))
    assert not geom_contains(poly, parse_wkt("POINT (5 0)"))


def test_st_x_null_on_non_point(spark):
    """st_x/st_y on a non-POINT: NULL, not a thrown ANSI cast (the
    unmatched regexp_extract yields '' — CAST('' AS DOUBLE) threw the
    whole query under Spark 4 ANSI mode) and not MULTIPOINT's first
    coordinate (the unanchored pattern matched the 'POINT (' substring
    of 'MULTIPOINT (')."""
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    r = spark.sql(
        "SELECT st_x('MULTIPOINT (3 4, 5 6)') AS mx, "
        "st_y('LINESTRING (0 0, 2 2)') AS ly, st_x('POINT (3.5 4)') AS px"
    ).collect()[0]
    assert r.mx is None and r.ly is None and r.px == 3.5


# r10 functions-review regression pins


def test_line_contains_line_and_chord_rejected():
    a = parse_wkt("LINESTRING (0 0, 10 0)")
    assert geom_contains(a, parse_wkt("LINESTRING (1 0, 2 0)"))
    bent = parse_wkt("LINESTRING (0 0, 5 5, 10 0)")
    # a chord between two on-line points is NOT contained
    assert not geom_contains(bent, parse_wkt("LINESTRING (0 0, 10 0)"))


def test_collection_container_contains():
    gc = parse_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))")
    assert geom_contains(gc, parse_wkt("POINT (5 5)"))
    assert not geom_contains(gc, parse_wkt("POINT (50 5)"))


def test_zm_coordinates_no_phantom_vertices():
    import numpy as np

    g = parse_wkt("POINT ZM (1 2 3 4)")
    np.testing.assert_array_equal(g.pts, [[1.0, 2.0]])
    g = parse_wkt("LINESTRING Z (1 2 9, 4 5 9)")
    np.testing.assert_array_equal(g.lines[0], [[1.0, 2.0], [4.0, 5.0]])


def test_zm_wkb_roundtrip_designator():
    import struct

    from beacon_spark.functions.geo import wkb_to_wkt

    wkb = struct.pack("<BI4d", 1, 3001, 1.0, 2.0, 3.0, 4.0)  # ZM point
    w = wkb_to_wkt(wkb)
    assert w.startswith("POINT ZM")
    assert parse_wkt(w).pts.tolist() == [[1.0, 2.0]]


def test_collection_centroid_area_weighted():
    from beacon_spark.functions.st import geom_centroid

    gc = parse_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
        "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10)))")
    cx, cy = geom_centroid(gc)
    # areas 4 and 1 -> (4*1 + 1*10.5)/5 = 2.9
    assert abs(cx - 2.9) < 1e-9 and abs(cy - 2.9) < 1e-9


def test_st_within_point_null_geometry(spark):
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    r = spark.sql(
        "SELECT st_within_point(CAST(NULL AS STRING), 1.0, 2.0) AS a, "
        "cast_int8_as_char(CAST(-1 AS TINYINT)) AS c, "
        "map_units(CAST(NULL AS STRING), CAST(NULL AS STRING), 5.0) AS m, "
        "to_char(TIMESTAMP '2020-01-02 03:04:05', '%Y %%f') AS f, "
        "string_to_array('abc', CAST(NULL AS STRING)) AS s1, "
        "string_to_array('abc', '') AS s2"
    ).collect()[0]
    assert r.a is False and r.c == "" and r.m is None
    assert r.f == "2020 %f"
    assert r.s1 == ["a", "b", "c"] and r.s2 == ["abc"]
