"""Geo function tests (st_geojson_as_wkt / st_within_point semantics from
beacon-functions/src/geo/*.rs: NULL→false, bbox prefilter, holes)."""

import json

import numpy as np

from beacon_spark.functions.geo import (
    geojson_to_wkt,
    parse_wkt_polygons,
    st_within_point_py,
)


def test_geojson_point_to_wkt():
    assert geojson_to_wkt({"type": "Point", "coordinates": [1.5, 2.5]}) == "POINT (1.5 2.5)"


def test_geojson_polygon_to_wkt():
    g = {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}
    assert geojson_to_wkt(json.dumps(g)) == "POLYGON ((0 0, 1 0, 1 1, 0 0))"


def test_geojson_multipolygon_to_wkt():
    g = {"type": "MultiPolygon", "coordinates": [
        [[[0, 0], [1, 0], [1, 1], [0, 0]]],
        [[[5, 5], [6, 5], [6, 6], [5, 5]]],
    ]}
    wkt = geojson_to_wkt(g)
    assert wkt.startswith("MULTIPOLYGON (((0 0")


def test_square_contains():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    x = np.array([5.0, 15.0, -1.0])
    y = np.array([5.0, 5.0, 5.0])
    assert st_within_point_py(wkt, x, y).tolist() == [True, False, False]


def test_polygon_with_hole():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    x = np.array([5.0, 2.0])
    y = np.array([5.0, 2.0])
    # center is inside the hole → excluded
    assert st_within_point_py(wkt, x, y).tolist() == [False, True]


def test_multipolygon_either():
    wkt = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"
    x = np.array([1.0, 11.0, 5.0])
    y = np.array([1.0, 11.0, 5.0])
    assert st_within_point_py(wkt, x, y).tolist() == [True, True, False]


def test_null_coords_false():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    x = np.array([np.nan, 5.0])
    y = np.array([5.0, np.nan])
    assert st_within_point_py(wkt, x, y).tolist() == [False, False]


def test_parse_multipolygon_rings():
    polys = parse_wkt_polygons(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.8 5.2, 5.5 5.8, 5.2 5.2)))"
    )
    assert len(polys) == 2
    assert len(polys[1]) == 2  # shell + hole


def test_sql_geo_udfs(spark):
    from beacon_spark.functions.core import register_functions

    register_functions(spark)
    got = spark.sql(
        """SELECT st_within_point(st_geojson_as_wkt(
             '{"type": "Polygon", "coordinates": [[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'),
             5.0D, 5.0D) AS inside"""
    ).collect()
    assert got[0].inside is True
