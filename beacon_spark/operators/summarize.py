"""SUMMARIZE — one-pass per-column profiling.

Reference: ``SUMMARIZE <table|query>`` lowers to a generated single-pass
aggregate (one CTE computing min/max/distinct/avg/std/count/null% per
column, re-projected to one row per column) — Beacon
``beacon-core/src/statement_plan/mod.rs:330-430``, output contract
``docs/docs/2.0.0-rc2/sql/summarize.md``:

    column_name | column_type | min | max | distinct | avg | std | count | null_percentage

min/max for orderable types (as text), distinct = exact non-null distinct
count, avg/std numeric-only, count = non-null count, null_percentage 0-100.
Rows come out in source column order.

Spark strategy: ONE distributed ``df.agg(...)`` pass (6 aggregate
expressions per column — all JVM-side, partial-aggregated map-side), whose
single result row is collected and melted driver-side. Driver traffic is
one row regardless of input size, so this holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERABLE = _NUMERIC + (
    T.StringType, T.BooleanType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.DayTimeIntervalType,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType(), False),
        T.StructField("column_type", T.StringType(), False),
        T.StructField("min", T.StringType(), True),
        T.StructField("max", T.StringType(), True),
        T.StructField("distinct", T.LongType(), True),
        T.StructField("avg", T.DoubleType(), True),
        T.StructField("std", T.DoubleType(), True),
        T.StructField("count", T.LongType(), False),
        T.StructField("null_percentage", T.DoubleType(), False),
    ]
)


def summarize(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, field in enumerate(df.schema.fields):
        col = F.col(field.name)
        orderable = isinstance(field.dataType, _ORDERABLE)
        numeric = isinstance(field.dataType, _NUMERIC)
        aggs.append(
            (F.min(col).cast("string") if orderable else F.lit(None).cast("string"))
            .alias(f"c{i}_min")
        )
        aggs.append(
            (F.max(col).cast("string") if orderable else F.lit(None).cast("string"))
            .alias(f"c{i}_max")
        )
        aggs.append(
            (F.countDistinct(col).cast("long") if orderable else F.lit(None).cast("long"))
            .alias(f"c{i}_uniq")
        )
        aggs.append(
            (F.avg(col.cast("double")) if numeric else F.lit(None).cast("double"))
            .alias(f"c{i}_avg")
        )
        aggs.append(
            (F.stddev(col.cast("double")) if numeric else F.lit(None).cast("double"))
            .alias(f"c{i}_std")
        )
        aggs.append(F.count(col).cast("long").alias(f"c{i}_cnt"))

    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = []
    for i, field in enumerate(df.schema.fields):
        cnt = row[f"c{i}_cnt"]
        null_pct = 0.0 if n == 0 else 100.0 * (n - cnt) / n
        out.append(
            (
                field.name,
                field.dataType.simpleString(),
                row[f"c{i}_min"],
                row[f"c{i}_max"],
                row[f"c{i}_uniq"],
                row[f"c{i}_avg"],
                row[f"c{i}_std"],
                cnt,
                null_pct,
            )
        )
    return spark.createDataFrame(out, _OUT_SCHEMA)
