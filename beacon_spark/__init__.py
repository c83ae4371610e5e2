"""beacon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of maris-development/beacon (reference:
github.com/maris-development/beacon, surveyed in SURVEY.md).

Architecture (Spark-first, not a port):
  - All execution is Spark DataFrames / Spark SQL; Catalyst + AQE do the
    physical planning. We add only what Spark lacks:
      * supertype schema harmonization across files (schema.py)
      * the JSON query DSL compiler (dsl.py)
      * UNION [ALL] BY NAME with supertype widening (operators/union_by_name.py)
      * SUMMARIZE (operators/summarize.py)
      * DISTINCT ON (operators/distinct_on.py)
      * geo / domain scalar functions (functions/)
      * nd sources: NetCDF/Zarr grid flattening (sources/nd.py, gated imports)
      * LLM-data-pipeline operators: dedup, similarity search, text analysis,
        multimodal plumbing (pipeline/)

Entry point: ``Engine(spark, datasets_root)`` — see engine.py.
"""

from beacon_spark.engine import Engine
from beacon_spark.version import VERSION

__all__ = ["Engine", "VERSION"]
