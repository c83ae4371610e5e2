from beacon_spark.functions.core import (
    beacon_version,
    cast_int8_as_char,
    coalesce_label,
    register_functions,
    try_arrow_cast,
)
from beacon_spark.functions.geo import st_geojson_as_wkt_py, st_within_point_py

__all__ = [
    "register_functions",
    "try_arrow_cast",
    "coalesce_label",
    "cast_int8_as_char",
    "beacon_version",
    "st_geojson_as_wkt_py",
    "st_within_point_py",
]
