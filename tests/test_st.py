"""ST_* suite (functions/st.py) — parity with PostGIS/geodatafusion
semantics (reference registers geodatafusion wholesale,
beacon-db/beacon-functions/src/lib.rs:31)."""

import math

import numpy as np
import pytest

from beacon_spark.functions.st import (
    geom_area,
    geom_centroid,
    geom_contains,
    geom_distance,
    geom_intersects,
    geom_length,
    geom_to_geojson,
    haversine_m,
    parse_wkt,
    wkt_to_wkb,
)
from beacon_spark.functions.geo import wkb_to_wkt


def test_parse_point():
    g = parse_wkt("POINT (1.5 -2.5)")
    assert g.kind == "POINT"
    assert np.allclose(g.pts, [[1.5, -2.5]])


def test_parse_multipolygon_holes():
    g = parse_wkt(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)),"
        " ((10 10, 11 10, 11 11, 10 10)))"
    )
    assert g.kind == "MULTIPOLYGON"
    assert len(g.polys) == 2
    assert len(g.polys[0]) == 2  # shell + hole
    assert geom_area(g) == pytest.approx(16 - 1 + 0.5)


def test_parse_geometrycollection():
    g = parse_wkt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 0))")
    assert len(g.geoms) == 2
    assert geom_length(g) == pytest.approx(1.0)


def test_empty():
    g = parse_wkt("POINT EMPTY")
    assert g.empty
    assert geom_area(g) == 0.0


def test_area_orientation_insensitive():
    cw = parse_wkt("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")
    ccw = parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert geom_area(cw) == geom_area(ccw) == 1.0


def test_centroid_polygon_with_hole():
    # symmetric hole keeps the centroid at the shell centre
    g = parse_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))"
    )
    cx, cy = geom_centroid(g)
    assert (cx, cy) == pytest.approx((2.0, 2.0))


def test_centroid_linestring_length_weighted():
    g = parse_wkt("LINESTRING (0 0, 2 0, 2 1)")
    cx, cy = geom_centroid(g)
    # segments: (1,0) w=2 and (2,0.5) w=1
    assert (cx, cy) == pytest.approx((4 / 3, 1 / 6))


def test_distance_point_segment():
    d = geom_distance(parse_wkt("POINT (5 3)"), parse_wkt("LINESTRING (0 0, 10 0)"))
    assert d == pytest.approx(3.0)


def test_distance_clamps_to_endpoint():
    d = geom_distance(parse_wkt("POINT (13 4)"), parse_wkt("LINESTRING (0 0, 10 0)"))
    assert d == pytest.approx(5.0)


def test_distance_intersecting_zero():
    a = parse_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = parse_wkt("LINESTRING (1 1, 9 9)")
    assert geom_distance(a, b) == 0.0


def test_distance_point_point():
    assert geom_distance(parse_wkt("POINT (0 0)"), parse_wkt("POINT (3 4)")) == 5.0


def test_intersects_edge_cross():
    a = parse_wkt("LINESTRING (0 0, 2 2)")
    b = parse_wkt("LINESTRING (0 2, 2 0)")
    assert geom_intersects(a, b)


def test_intersects_touch():
    a = parse_wkt("LINESTRING (0 0, 1 1)")
    b = parse_wkt("LINESTRING (1 1, 2 0)")
    assert geom_intersects(a, b)


def test_intersects_disjoint_bbox_overlap():
    # bboxes overlap but geometries don't touch
    a = parse_wkt("LINESTRING (0 0, 1 1)")
    b = parse_wkt("LINESTRING (0 0.9, 0.05 1.0)")
    assert not geom_intersects(a, b)


def test_contains_point_in_hole_false():
    g = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert not geom_contains(g, parse_wkt("POINT (2 2)"))
    assert geom_contains(g, parse_wkt("POINT (0.5 0.5)"))


def test_contains_polygon_in_polygon():
    outer = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    inner = parse_wkt("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")
    assert geom_contains(outer, inner)
    assert not geom_contains(inner, outer)


def test_haversine_equator_degree():
    # 1 degree of longitude at the equator ≈ 111.195 km with R=6371008.8
    d = haversine_m(0.0, 0.0, 1.0, 0.0)
    assert d == pytest.approx(111195.08, abs=1.0)


def test_wkb_roundtrip():
    for wkt in [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 0))",
    ]:
        rt = wkb_to_wkt(wkt_to_wkb(wkt))
        assert geom_area(parse_wkt(rt)) == pytest.approx(geom_area(parse_wkt(wkt)))
        assert np.allclose(
            parse_wkt(rt).all_coords(), parse_wkt(wkt).all_coords()
        )


def test_geojson_roundtrip():
    import json

    gj = geom_to_geojson(parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    d = json.loads(gj)
    assert d["type"] == "Polygon"
    assert d["coordinates"][0][0] == [0.0, 0.0]


@pytest.fixture(scope="module")
def spark():
    from beacon_spark.functions.core import register_functions
    from beacon_spark.session import get_spark

    s = get_spark(shuffle_partitions=4, extra_conf={"spark.driver.memory": "8g"})
    register_functions(s)
    yield s


def test_sql_surface(spark):
    row = spark.sql(
        """SELECT st_point(1.0, 2.0) AS p,
                  st_x(st_point(3.5, 4.5)) AS x,
                  st_y(st_point(3.5, 4.5)) AS y,
                  st_point_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)) AS d,
                  st_geometrytype('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))') AS t,
                  st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a,
                  st_contains('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT (1 1)') AS c,
                  st_dwithin('POINT (0 0)', 'POINT (3 4)', 4.9) AS dw"""
    ).collect()[0]
    assert row.p == "POINT (1.0 2.0)"
    assert row.x == 3.5 and row.y == 4.5
    assert row.d == 5.0
    assert row.t == "ST_MultiPolygon"
    assert row.a == 4.0
    assert row.c is True
    assert row.dw is False


def test_sql_tier_stays_jvm(spark):
    """The point tier must not appear as a Python UDF in the plan —
    pushdown/codegen depends on it."""
    df = spark.sql("SELECT st_x(st_point(1.0, 2.0)) AS x")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_convex_hull_and_simplify_units():
    from beacon_spark.functions.st import convex_hull, douglas_peucker

    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    h = convex_hull(pts)
    assert len(h) == 4 and {tuple(p) for p in h} == {(0, 0), (2, 0), (2, 2), (0, 2)}

    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 2], [4, 0]], dtype=float)
    s = douglas_peucker(line, 0.1)
    assert [tuple(p) for p in s] == [(0, 0), (2, 0), (3, 2), (4, 0)]


def test_hull_simplify_buffer_sql(spark):
    row = spark.sql(
        """SELECT st_convexhull('MULTIPOINT ((0 0), (2 0), (2 2), (0 2), (1 1))') AS h,
                  st_simplify('LINESTRING (0 0, 1 0.01, 2 0)', 0.1) AS s,
                  round(st_area(st_buffer('POINT (0 0)', 1.0)), 2) AS ba"""
    ).collect()[0]
    assert row.h.startswith("POLYGON")
    assert "1 1" not in row.h  # interior point dropped
    assert row.s == "LINESTRING (0 0, 2 0)"
    # 32-gon area approximates pi (n/2 sin(2pi/n) = 3.1214)
    assert row.ba == pytest.approx(3.12, abs=0.01)


def test_contains_concave_edge_exit():
    """All of b's vertices inside a concave a, but an edge of b crosses
    the notch — not contained (the proper-crossing check)."""
    # U-shaped polygon: notch cut into the top between x=2..4
    u = parse_wkt(
        "POLYGON ((0 0, 6 0, 6 5, 4 5, 4 2, 2 2, 2 5, 0 5, 0 0))"
    )
    # both endpoints in the arms of the U (y<2 is solid), segment spans the notch
    bar = parse_wkt("POLYGON ((1 3, 5 3, 5 4, 1 4, 1 3))")
    assert not geom_contains(u, bar)
    # fully inside the solid base — contained
    base = parse_wkt("POLYGON ((1 0.5, 5 0.5, 5 1.5, 1 1.5, 1 0.5))")
    assert geom_contains(u, base)
    # touching the boundary (shared edge) still counts: closed-set semantics
    touch = parse_wkt("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")
    assert geom_contains(u, touch)


# -------------------------------------------- r11 bulk point fast path


def test_bulk_point_predicate_matches_scalar():
    """r11 verdict #2: the bulk numpy point-in-geometry kernel must
    agree with the scalar geom_contains/geom_intersects on every point,
    across polygon-with-hole, multipolygon, line, multipoint, and
    collection containers — interiors, boundaries, holes, outside."""
    import numpy as np

    from beacon_spark.functions.st import (
        bulk_point_predicate,
        geom_contains,
        geom_intersects,
        parse_wkt,
    )

    containers = [
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
        "MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((7 7, 9 7, 9 9, 7 9, 7 7)))",
        "LINESTRING (0 0, 5 5, 10 0)",
        "MULTIPOINT ((1 1), (2 2))",
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
        "POINT (8 8), LINESTRING (3 3, 4 4))",
    ]
    rng = np.random.default_rng(11)
    xs = np.concatenate([rng.uniform(-1, 11, 200),
                         np.array([0.0, 5.0, 4.0, 1.0, 2.0, 8.0, 3.5])])
    ys = np.concatenate([rng.uniform(-1, 11, 200),
                         np.array([0.0, 5.0, 4.0, 1.0, 2.0, 8.0, 3.5])])
    for wkt in containers:
        g = parse_wkt(wkt)
        bulk = bulk_point_predicate(g, xs, ys)
        for i in range(len(xs)):
            pt = parse_wkt(f"POINT ({xs[i]} {ys[i]})")
            want_c = geom_contains(g, pt)
            want_i = geom_intersects(g, pt)
            assert want_c == want_i, (wkt, xs[i], ys[i])  # point operand
            assert bool(bulk[i]) == want_c, (wkt, xs[i], ys[i])


def test_st_contains_fast_path_e2e(spark):
    """The constant-geometry + POINT-column shape (every region filter)
    rides the bulk kernel; results must equal the per-row path, nulls
    stay null."""
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    df = spark.sql(
        "SELECT id, CASE WHEN id = 7 THEN NULL "
        "ELSE concat('POINT (', id, ' ', id, ')') END AS p FROM range(12)")
    df.createOrReplaceTempView("pts_fast")
    poly = "POLYGON ((2 2, 9 2, 9 9, 2 9, 2 2), (5 5, 6 5, 6 6, 5 5))"
    rows = spark.sql(
        f"SELECT id, st_contains('{poly}', p) AS c, "
        f"st_within(p, '{poly}') AS w, st_intersects(p, '{poly}') AS i "
        f"FROM pts_fast ORDER BY id").collect()
    for r in rows:
        if r.id == 7:
            assert r.c is None and r.w is None and r.i is None
        else:
            want = 2 <= r.id <= 9 and not (5 < r.id < 6)
            assert r.c == want and r.w == want and r.i == want, r
    # mixed-geometry column (not all points) falls back and still works
    mixed = spark.sql(
        "SELECT st_contains('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', g) AS c "
        "FROM VALUES ('POINT (1 1)'), ('LINESTRING (1 1, 2 2)'), "
        "(CAST(NULL AS STRING)) AS t(g)").collect()
    assert [r.c for r in mixed] == [True, True, None]
