"""DataFusion-name compatibility functions Spark SQL spells differently.

The reference engine is DataFusion, so every function in its SQL docs
(``docs/docs/2.0.0-rc2/sql/function-reference.md``) is callable there.
Spark's builtin library covers almost all of them under the same names;
this module closes the residual NAME gaps so a reference query runs
unchanged:

  expression tier (Spark SQL UDFs — inlined into the plan, codegen'd):
    today, to_local_time, datetrunc, strpos, substr_index, to_hex,
    to_unixtime, to_timestamp_seconds / _millis / _micros / _nanos
  pandas tier (Arrow-batched; semantics need a real regex/bigint lib):
    regexp_match (Postgres first-match capture-group semantics),
    gcd, lcm (exact big-int arithmetic; numpy would silently wrap
    an int64 lcm overflow where DataFusion errors)
  builtins unlocked by config:
    to_time / make_time / CAST(… AS TIME) exist in Spark 4.1 behind
    ``spark.sql.timeType.enabled``; registration flips it on so the
    TIME surface matches the reference.

Known divergence (documented, not papered over): DataFusion's numeric
``trunc(x[, d])`` collides with Spark's builtin date ``trunc(date,
fmt)`` — builtins shadow session functions and CREATE TEMPORARY
FUNCTION refuses the replacement, so numeric truncation stays spelled
``double(bigint(x))`` / ``floor``/``ceil`` here.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SQL_UDFS = [
    """CREATE OR REPLACE TEMPORARY FUNCTION today()
       RETURNS DATE RETURN current_date()""",
    # Timestamp(tz) -> wall-clock Timestamp(no tz) in the session zone
    """CREATE OR REPLACE TEMPORARY FUNCTION to_local_time(ts TIMESTAMP)
       RETURNS TIMESTAMP_NTZ RETURN CAST(ts AS TIMESTAMP_NTZ)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION datetrunc(part STRING, ts TIMESTAMP)
       RETURNS TIMESTAMP RETURN date_trunc(part, ts)""",
    # 1-based, 0 when absent — exactly instr
    """CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING)
       RETURNS INT RETURN instr(s, sub)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION substr_index(s STRING, delim STRING, n INT)
       RETURNS STRING RETURN substring_index(s, delim, n)""",
    # DataFusion renders {:x} — lowercase, no padding
    """CREATE OR REPLACE TEMPORARY FUNCTION to_hex(n BIGINT)
       RETURNS STRING RETURN lower(hex(n))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(ts TIMESTAMP)
       RETURNS BIGINT RETURN unix_timestamp(ts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_seconds(n BIGINT)
       RETURNS TIMESTAMP RETURN timestamp_seconds(n)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_millis(n BIGINT)
       RETURNS TIMESTAMP RETURN timestamp_millis(n)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_micros(n BIGINT)
       RETURNS TIMESTAMP RETURN timestamp_micros(n)""",
    # Spark tops out at microseconds: floor epoch-nanos to micros
    # exactly (pmod keeps the division overflow-free and floor-true
    # for pre-1970 instants; float division would lose precision past
    # 2^53 ns ≈ 1970-04-16)
    """CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_nanos(n BIGINT)
       RETURNS TIMESTAMP RETURN timestamp_micros((n - pmod(n, 1000)) div 1000)""",
]


def _regexp_match_udf():
    @pandas_udf(T.ArrayType(T.StringType()))
    def regexp_match(
        s: pd.Series, pattern: pd.Series, flags: pd.Series
    ) -> pd.Series:
        cache: dict[tuple, re.Pattern] = {}

        def one(text, pat, fl):
            if text is None or pat is None:
                return None
            key = (pat, fl)
            rx = cache.get(key)
            if rx is None:
                # Postgres/DataFusion flag chars map onto inline regex
                # flags ('i' case-insensitive, 'm' multiline, 's'
                # dot-matches-newline, 'x' verbose, 'U' swap-greed —
                # python has no U; reject unknowns loudly)
                eff = pat
                if fl:
                    bad = set(fl) - set("imsx")
                    if bad:
                        raise ValueError(
                            f"regexp_match: unsupported flag(s) "
                            f"{''.join(sorted(bad))!r}")
                    eff = f"(?{fl})" + pat
                rx = cache[key] = re.compile(eff)
            m = rx.search(text)
            if m is None:
                return None
            # Postgres/DataFusion: capture groups when present, else
            # the whole match — always as a list
            return list(m.groups()) if rx.groups else [m.group(0)]

        return pd.Series(
            [one(t, p, f) for t, p, f in zip(s, pattern, flags)])

    return regexp_match


def _gcd_udf():
    @pandas_udf(T.LongType())
    def gcd(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(x) or pd.isna(y) else math.gcd(int(x), int(y))
             for x, y in zip(a, b)],
            dtype="Int64",
        )

    return gcd


def _lcm_udf():
    @pandas_udf(T.LongType())
    def lcm(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if pd.isna(x) or pd.isna(y):
                return None
            v = math.lcm(int(x), int(y))
            if v > 2**63 - 1:
                # DataFusion errors on int64 overflow; numpy would wrap
                raise OverflowError(f"lcm({x}, {y}) overflows BIGINT")
            return v

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="Int64")

    return lcm


def register_compat_functions(spark: SparkSession) -> None:
    # TIME type (to_time / make_time / CAST AS TIME) ships disabled in
    # this Spark build; the reference serves Time64 values, so turn the
    # builtins on for the session
    spark.conf.set("spark.sql.timeType.enabled", "true")
    for s in _SQL_UDFS:
        spark.sql(s)
    # the documented DataFusion signature is regexp_match(str, regexp
    # [, flags]) — the optional arg rides a SQL-UDF DEFAULT over the
    # 3-arg pandas implementation
    spark.udf.register("__regexp_match_impl", _regexp_match_udf())
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION regexp_match(
               s STRING, pattern STRING, flags STRING DEFAULT '')
           RETURNS ARRAY<STRING>
           RETURN __regexp_match_impl(s, pattern, flags)"""
    )
    spark.udf.register("gcd", _gcd_udf())
    spark.udf.register("lcm", _lcm_udf())
