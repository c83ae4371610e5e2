"""DataFusion-name compatibility functions Spark SQL spells differently.

The reference engine is DataFusion, so every function in its SQL docs
(``docs/docs/2.0.0-rc2/sql/function-reference.md``) is callable there.
Spark's builtin library covers almost all of them under the same names;
this module closes the residual NAME gaps so a reference query runs
unchanged:

  expression tier (Spark SQL UDFs — inlined into the plan, codegen'd):
    today, to_local_time, datetrunc, strpos, substr_index, to_hex,
    to_unixtime, to_timestamp_seconds / _millis / _micros / _nanos,
    iszero
  pandas tier (Arrow-batched; semantics need a real regex/bigint lib):
    regexp_match (Postgres first-match capture-group semantics),
    gcd, lcm (exact big-int arithmetic; numpy would silently wrap
    an int64 lcm overflow where DataFusion errors)
  builtin OVERRIDES (variadic python UDFs — same Spark name, DIFFERENT
  contract in DataFusion, reference semantics win):
    encode/decode (binary hex|base64|escape, not charsets),
    to_char + date_format (chrono strftime patterns, not Java),
    regexp_like (optional flags), regexp_instr (n-th OCCURRENCE from a
    start offset, not a capture-group index)
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

import functools
import math
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SQL_UDFS = [
    # bare niladic form: works in BOTH keyword modes (under
    # ansi.enforceReservedKeywords, `current_date()` with parens is a
    # parse error), so a user session with stricter confs still loads
    """CREATE OR REPLACE TEMPORARY FUNCTION today()
       RETURNS DATE RETURN current_date""",
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
    # DataFusion iszero: true for +0.0/-0.0, false otherwise (NaN -> false)
    """CREATE OR REPLACE TEMPORARY FUNCTION iszero(x DOUBLE)
       RETURNS BOOLEAN RETURN x = CAST(0.0 AS DOUBLE)""",
    # Postgres/DataFusion string_to_array: LITERAL delimiter (Spark's
    # split takes a regex — \Q..\E quotes it); optional 3rd arg maps
    # matching elements to NULL
    """CREATE OR REPLACE TEMPORARY FUNCTION string_to_array(
           s STRING, d STRING, n STRING DEFAULT NULL)
       RETURNS ARRAY<STRING>
       RETURN transform(
           CASE
             -- Postgres: NULL delimiter splits into single characters,
             -- empty delimiter returns the whole string as one element
             WHEN d IS NULL THEN split(s, '')
             WHEN d = '' THEN array(s)
             ELSE split(s, concat('\\\\Q', d, '\\\\E'))
           END,
           x -> CASE WHEN n IS NOT NULL AND x = n THEN NULL ELSE x END)""",
    # spark typeof() names -> Arrow names, for the arrow_typeof macro
    """CREATE OR REPLACE TEMPORARY FUNCTION __arrow_typename(t STRING)
       RETURNS STRING RETURN CASE
           WHEN t = 'bigint' THEN 'Int64'
           WHEN t = 'int' THEN 'Int32'
           WHEN t = 'smallint' THEN 'Int16'
           WHEN t = 'tinyint' THEN 'Int8'
           WHEN t = 'double' THEN 'Float64'
           WHEN t = 'float' THEN 'Float32'
           WHEN t = 'string' THEN 'Utf8'
           WHEN t = 'boolean' THEN 'Boolean'
           WHEN t = 'date' THEN 'Date32'
           WHEN t = 'binary' THEN 'Binary'
           WHEN t = 'timestamp' THEN 'Timestamp(Microsecond, Some("UTC"))'
           WHEN t = 'timestamp_ntz' THEN 'Timestamp(Microsecond, None)'
           WHEN t LIKE 'decimal%' THEN concat('Decimal128', substr(t, 8))
           ELSE t END""",
]


@functools.lru_cache(maxsize=256)
def _compile_df_regex(pattern: str, flags: str) -> re.Pattern:
    """Postgres/DataFusion flag chars → inline python flags ('g' is a
    caller concern — it selects all-matches, not a regex mode)."""
    fl = (flags or "").replace("g", "")
    bad = set(fl) - set("imsx")
    if bad:
        raise ValueError(
            f"unsupported regexp flag(s) {''.join(sorted(bad))!r}")
    return re.compile((f"(?{fl})" if fl else "") + pattern)


def _df_encode(data, fmt=None):
    """DataFusion/Postgres binary encode: hex | base64 | escape.
    OVERRIDES Spark's charset encode — the reference inherits
    DataFusion, where encode IS the binary-to-text function."""
    if data is None or fmt is None:
        return None
    if isinstance(data, str):
        data = data.encode("utf-8")
    f = str(fmt).lower()
    if f == "hex":
        return data.hex()
    if f == "base64":
        import base64

        return base64.b64encode(data).decode("ascii")
    if f == "escape":
        out = []
        for b in data:
            if b == 0x5C:
                out.append("\\\\")
            elif 0x20 <= b <= 0x7E:
                out.append(chr(b))
            else:
                out.append(f"\\{b:03o}")
        return "".join(out)
    raise ValueError(
        f"encode: format must be 'hex', 'base64' or 'escape', got {fmt!r}")


def _df_decode(text, fmt=None):
    if text is None or fmt is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("ascii")
    f = str(fmt).lower()
    if f == "hex":
        return bytes.fromhex(text)
    if f == "base64":
        import base64

        return base64.b64decode(text)
    if f == "escape":
        out = bytearray()
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            if ch == "\\":
                if text[i:i + 2] == "\\\\":
                    out.append(0x5C)
                    i += 2
                else:
                    out.append(int(text[i + 1:i + 4], 8))
                    i += 4
            else:
                out.append(ord(ch))
                i += 1
        return bytes(out)
    raise ValueError(
        f"decode: format must be 'hex', 'base64' or 'escape', got {fmt!r}")


def _df_to_char(value, fmt=None):
    """DataFusion to_char / date_format: chrono strftime patterns
    (%Y-%m-%d …). OVERRIDES Spark's Java-pattern date_format — the
    reference treats date_format as an alias for to_char. Chrono's %f
    is 9-digit nanoseconds (python's is 6-digit micro), translated
    explicitly; other directives are C-strftime-compatible."""
    import datetime as _dt

    if value is None or fmt is None:
        return None
    f = str(fmt)
    # protect literal %% BEFORE the %f substitution: '%%f' means a
    # literal '%f', and naive replace minted an invalid directive that
    # made strftime silently return ''
    f = f.replace("%%", "\x00")
    if isinstance(value, (_dt.datetime, _dt.time)):
        nanos = f"{value.microsecond * 1000:09d}"
    else:
        nanos = "0" * 9  # chrono renders 9-digit nanos for dates too
    f = f.replace("%.f", "." + nanos).replace("%f", nanos)
    f = f.replace("\x00", "%%")
    if isinstance(value, (_dt.datetime, _dt.date, _dt.time)):
        return value.strftime(f)
    raise ValueError(
        f"to_char: unsupported value type {type(value).__name__}")


def _df_regexp_like(s, pattern=None, flags=None):
    if s is None or pattern is None:
        return None
    return _compile_df_regex(pattern, flags or "").search(s) is not None


def _df_regexp_instr(s, pattern=None, start=None, n=None, flags=None,
                     subexpr=None):
    """DataFusion regexp_instr: 1-based position of the n-th MATCH of
    ``pattern`` in ``s`` searching from ``start`` (Spark's builtin third
    argument is a capture-group index — different contract). 0 when
    absent; ``subexpr`` selects a capture group's position."""
    if s is None or pattern is None:
        return None
    start = 1 if start is None else int(start)
    n = 1 if n is None else int(n)
    if start < 1 or n < 1:
        raise ValueError("regexp_instr: start and n must be >= 1")
    rx = _compile_df_regex(pattern, flags or "")
    seen = 0
    for m in rx.finditer(s, start - 1):
        seen += 1
        if seen == n:
            if subexpr:
                g = m.start(int(subexpr))
                return 0 if g < 0 else g + 1
            return m.start() + 1
    return 0


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
    # DataFusion-semantics overrides of same-named Spark builtins
    # (udf.register CAN replace builtins; CREATE TEMPORARY FUNCTION
    # refuses). Python UDFs are deliberately VARIADIC so the optional
    # trailing arguments keep working; these are cold-path scalar
    # compat functions, not the relational hot path (which is pinned
    # Python-free in tests/test_plans.py).
    spark.udf.register("encode", _df_encode, "string")
    spark.udf.register("decode", _df_decode, "binary")
    spark.udf.register("to_char", _df_to_char, "string")
    spark.udf.register("date_format", _df_to_char, "string")
    spark.udf.register("regexp_like", _df_regexp_like, "boolean")
    spark.udf.register("regexp_instr", _df_regexp_instr, "long")
