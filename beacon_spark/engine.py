"""Engine — the embedded entry point (the Spark analog of Beacon's
``Database::open`` embedded mode, ``beacon-core/src/embedded.rs``).

    engine = Engine(spark, datasets_root="/data")
    engine.sql("SELECT ... FROM read_parquet('obs/*.parquet')")
    engine.query({"select": [...], "filter": {...}, "from": ...})
    engine.read_parquet("obs/*.parquet")

Both the SQL and the JSON interfaces compile to the same DataFrame plans
(the reference's unified statement pipeline, ``statement_plan/mod.rs:1-13``).
The SQL path is ``spark.sql`` with a thin pre-parser for the dialect
extensions Spark lacks (SUMMARIZE, read_* table functions, try_arrow_cast
with Arrow type names), mirroring how Beacon splits "Beacon statements"
from DataFusion statements (``parser/beacon_parser.rs:33-115``).
"""

from __future__ import annotations

import json
import posixpath
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from beacon_spark import dsl
from beacon_spark.functions.core import _arrow_name_to_spark, register_functions
from beacon_spark.operators.summarize import summarize
from beacon_spark.sources import paths as _paths
from beacon_spark.sources import tabular
from beacon_spark.sources.nd import read_nd

_READ_FN_RE = re.compile(
    r"\bread_(geoparquet|parquet|csv|arrow|netcdf|zarr|hdf5|odv_ascii|odv|delta|iceberg|tiff|atlas)\s*\("
    # bare 'a', 'b' argument lists AND the reference's bracketed form
    # read_parquet(['a', 'b']) (integration-tests/test_etl_pipeline.py);
    # a trailing option tail — quoted strings, bare ints, or a bracketed
    # list — carries read_csv's (delimiter, infer_records) and the nd
    # readers' dimensions list
    r"\s*(?:\[\s*('[^']*'(?:\s*,\s*'[^']*')*)\s*\]|('[^']*'(?:\s*,\s*'[^']*')*))"
    r"((?:\s*,\s*(?:'[^']*'|\d+|\[\s*'[^']*'(?:\s*,\s*'[^']*')*\s*\]))*)\s*\)",
    re.IGNORECASE,
)
_TRY_ARROW_CAST_RE = re.compile(
    r"\btry_arrow_cast\s*\(", re.IGNORECASE
)
_SUMMARIZE_RE = re.compile(r"^\s*SUMMARIZE\s+(.*?);?\s*$", re.IGNORECASE | re.DOTALL)
_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_EXPLAIN_ANALYZE_RE = re.compile(
    r"^\s*EXPLAIN\s+ANALYZE\s+(.*?);?\s*$", re.IGNORECASE | re.DOTALL
)
_COPY_RE = re.compile(
    r"^\s*COPY\s+(.*?)\s+TO\s+'([^']+)'"
    r"(?:\s+(?:STORED\s+AS|FORMAT)\s+(\w+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ANALYZE_RE = re.compile(
    r"^\s*ANALYZE\s+FILES(?:\s+'([^']*)')?(\s+FORCE)?;?\s*$", re.IGNORECASE
)
_EXCLUDE_RE = re.compile(
    r"(\*\s+)EXCLUDE\s*(\(([^)]*)\)|(\w+))", re.IGNORECASE
)
# `FROM t WHERE (flag)`: Spark's non-reserved-keyword mode parses this
# as table alias `WHERE` with column list `(flag)` — the WHERE clause
# is SILENTLY swallowed and the query returns unfiltered rows (arity
# permitting; otherwise a baffling ASSIGNMENT_ARITY_MISMATCH). The
# reference's DataFusion dialect filters. Parens around a lone
# identifier never change expression semantics, so dropping them
# (`WHERE flag`) is a safe disambiguation — the alias parse needs the
# paren list. Multi-identifier lists are left alone: `(a, b) IN (…)`
# is a row-value predicate. Found by the DSL↔SQL↔DuckDB differential.
_WHERE_PAREN_IDENT_RE = re.compile(
    r"(?i)\b(WHERE\s*)\(\s*([A-Za-z_]\w*)\s*\)"
)


_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


_DOUBLE_EXACT = 1 << 53


def _bitmap_key(v, dt) -> str | None:
    """DSL eq value → the bitmap index's token string, or None when the
    combination can't be matched exactly (see _pruned_managed_read).

    Two traps this must refuse: (a) strings the DSL coerces into
    timestamp literals (compile_filter then compares cast-to-timestamp,
    not exact strings); (b) integers beyond 2^53, where Spark's
    string-vs-long comparison goes through double and distinct longs
    collide — exact-string posting matches would falsely prune both."""
    if isinstance(dt, T.StringType) and isinstance(v, str):
        from beacon_spark.dsl import _parse_iso_timestamp

        if ("T" in v or " " in v) and _parse_iso_timestamp(v) is not None:
            return None  # DSL renders this as a timestamp literal
        return v
    if isinstance(dt, _INTEGRAL_TYPES):
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            # python int → long literal: exact long comparison, any size
            return str(v)
        if isinstance(v, str) and re.fullmatch(r"-?[1-9]\d*|0", v):
            # string literal vs long column: Spark compares via DOUBLE,
            # so only double-exact magnitudes match exact-string postings
            return v if abs(int(v)) <= _DOUBLE_EXACT else None
    return None


def _bind_placeholders(statement: str, params: list) -> tuple[str, dict]:
    """Rewrite DataFusion-style positional placeholders ``$1..$n``
    (bound via ``with_param_values``, runtime.rs:107-116) to Spark named
    parameter markers. Non-code text (string literals honoring ``\\``
    escapes and ``''`` doubling, comments, quoted identifiers) is
    located with the ONE shared lexer (server/guard.py), exactly like
    client._qmark_to_dollar — a private quote toggle here would desync
    from the gates on ``'\\''`` and rewrite $n inside literal data."""
    args = {f"__p{i + 1}": v for i, v in enumerate(params)}
    spans = _literal_spans(statement)
    out: list[str] = []
    i, n = 0, len(statement)
    while i < n:
        ch = statement[i]
        if (
            ch == "$"
            and i + 1 < n
            and statement[i + 1].isdigit()
            and not _in_literal(spans, i + 1)
        ):
            j = i + 1
            while j < n and statement[j].isdigit():
                j += 1
            out.append(f":__p{statement[i + 1:j]}")
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out), args


def _literal_spans(statement: str) -> list[tuple[int, int]]:
    """(start, end) spans of NON-CODE text: string literals (single- and
    double-quoted, honoring Spark's ``\\x`` backslash escapes and the SQL
    ``''`` doubling), comments, and backtick identifiers — the ONE
    lexer-accurate scan (server/guard.py) shared with the auth gates, so
    dialect rewrites never fire on text that is merely *quoted* and the
    two layers can never desync on where a literal ends."""
    from beacon_spark.server.guard import sql_noncode_spans

    return sql_noncode_spans(statement)


def _in_literal(spans: list[tuple[int, int]], pos: int) -> bool:
    return any(a < pos < b for a, b in spans)


def _sub_outside_literals(pattern: re.Pattern, repl, statement: str) -> str:
    """``pattern.sub(repl, statement)`` but skipping matches that *start*
    inside a single-quoted string literal."""
    spans = _literal_spans(statement)
    out: list[str] = []
    last = 0
    for m in pattern.finditer(statement):
        if _in_literal(spans, m.start()):
            continue
        out.append(statement[last:m.start()])
        out.append(repl(m) if callable(repl) else m.expand(repl))
        last = m.end()
    out.append(statement[last:])
    return "".join(out)


def _noncode_blanked(s: str) -> str:
    """LENGTH-PRESERVING scrub: every character the shared lexer marks
    as non-code (string literals, comments, backtick identifiers)
    becomes a space. Keyword/paren position scans run on the scrub and
    slice the ORIGINAL text by the same offsets — the ONE lexer decides
    what is code, so these scans can never desync from Spark on
    ``\\'`` escapes or comments the way private quote-toggles did."""
    out = list(s)
    for a, b in _literal_spans(s):
        for i in range(a, min(b, len(s))):
            out[i] = " "
    return "".join(out)


def _top_level_blanked(s: str) -> str:
    """:func:`_noncode_blanked` plus the INTERIOR of every parenthesized
    group → spaces (the parens themselves survive). Scans for TOP-LEVEL
    keywords and commas (ORDER BY / LIMIT / WHERE splits, SET-list
    commas) run here: anything nested — a subquery's LIMIT, a function
    argument's comma — is invisible by construction."""
    out = list(_noncode_blanked(s))
    depth = 0
    for i, ch in enumerate(out):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth > 0 and ch != " ":
            out[i] = " "
    return "".join(out)


def _matching_paren_end(blanked: str, start: int) -> int:
    """``start`` = index just after an opening '(' in ``blanked`` (a
    :func:`_noncode_blanked` scrub, so literal/comment parens are
    already spaces). Returns the index just after the matching ')', or
    -1 when unbalanced."""
    depth, i, n = 1, start, len(blanked)
    while i < n and depth:
        if blanked[i] == "(":
            depth += 1
        elif blanked[i] == ")":
            depth -= 1
        i += 1
    return i if depth == 0 else -1


#: words that terminate a FROM-list (so a table alias is never confused
#: with the next clause keyword)
_SQL_CLAUSE_WORDS = frozenset(
    "on where group order having qualify window limit union intersect except "
    "join inner left right full cross natural anti semi lateral using as "
    "select values tablesample distribute cluster sort offset fetch "
    "pivot unpivot for when then else end and or not asc desc nulls".split()
)

_FROM_JOIN_RE = re.compile(r"\b(from|join)\b", re.IGNORECASE)
_IDENT_RE = re.compile(r"[A-Za-z_][\w.]*")


def _table_position_idents(
    statement: str, spans
) -> list[tuple[str, int, int]] | None:
    """``(identifier, start, end)`` triples in table position (after
    FROM/JOIN, including comma-separated FROM lists), skipping string
    literals, subqueries (their inner FROMs are scanned by the same
    pass) and ``IS [NOT] DISTINCT FROM``. Returns ``None`` when a table
    position holds something this conservative scan can't classify
    (``VALUES``, a table-function call, odd syntax) — callers must
    treat that as "may reference a local table" and fall back. The
    spans let ``_federated_pushdown`` substitute remote names ONLY at
    table positions, never at a column/alias that merely shares the
    name."""
    out: list[tuple[str, int, int]] = []
    n = len(statement)
    for m in _FROM_JOIN_RE.finditer(statement):
        if _in_literal(spans, m.start()):
            continue
        if m.group(1).lower() == "from":
            before = statement[: m.start()].rstrip()
            if re.search(r"\bdistinct$", before, re.IGNORECASE):
                continue  # IS [NOT] DISTINCT FROM — an expression, not a scan
        i = m.end()
        while True:  # one table ref, then any comma-joined siblings
            while i < n and statement[i].isspace():
                i += 1
            if i >= n:
                return None
            if statement[i] == "(":
                # subquery / parenthesized join: inner FROMs are scanned
                # by the same outer pass — but a comma-joined sibling
                # AFTER the closing paren must still be scanned
                depth, j = 0, i
                while j < n:
                    if not _in_literal(spans, j):
                        if statement[j] == "(":
                            depth += 1
                        elif statement[j] == ")":
                            depth -= 1
                            if depth == 0:
                                break
                    j += 1
                if j >= n:
                    return None  # unbalanced — don't guess
                j += 1
                while j < n and statement[j].isspace():
                    j += 1
                am = _IDENT_RE.match(statement, j)
                if am is not None and am.group(0).lower() == "as":
                    j = am.end()
                    while j < n and statement[j].isspace():
                        j += 1
                    am = _IDENT_RE.match(statement, j)
                    if am is None:
                        return None
                    j = am.end()
                elif am is not None and am.group(0).lower() not in _SQL_CLAUSE_WORDS:
                    j = am.end()
                while j < n and statement[j].isspace():
                    j += 1
                if j < n and statement[j] == ",":
                    i = j + 1
                    continue
                break
            im = _IDENT_RE.match(statement, i)
            if im is None:
                return None
            ident = im.group(0)
            if ident.lower() in _SQL_CLAUSE_WORDS or ident.lower() == "values":
                return None  # FROM VALUES …, or syntax we don't model
            i = im.end()
            j = i
            while j < n and statement[j].isspace():
                j += 1
            if j < n and statement[j] == "(":
                return None  # table function in table position — local
            out.append((ident, im.start(), im.end()))
            # optional [AS] alias
            am = _IDENT_RE.match(statement, j)
            if am is not None and am.group(0).lower() == "as":
                j = am.end()
                while j < n and statement[j].isspace():
                    j += 1
                am = _IDENT_RE.match(statement, j)
                if am is None:
                    return None
                j = am.end()
            elif am is not None and am.group(0).lower() not in _SQL_CLAUSE_WORDS:
                j = am.end()
            while j < n and statement[j].isspace():
                j += 1
            if j < n and statement[j] == ",":
                i = j + 1
                continue
            break
    return out


def _extract_star_replace(statement: str) -> tuple[str, list[tuple[str, str]]]:
    """``SELECT * REPLACE (expr AS col, ...)`` (DataFusion star options,
    docs/.../sql/index.md:46-48): strip the REPLACE clause and return the
    replacement list, applied post-projection via ``withColumn`` (which
    keeps each replaced column's position, matching DataFusion)."""
    m = re.match(
        r"(?is)^(\s*SELECT\s+(?:\w+\.)?\*(?:\s+EXCEPT\s*\([^)]*\))?\s+)REPLACE\s*\(",
        statement,
    )
    if not m:
        return statement, []
    # find the matching close paren on the shared-lexer scrub (a ')'
    # inside a replacement expression's string literal must not end
    # the REPLACE list early)
    blanked = _noncode_blanked(statement)
    i = _matching_paren_end(blanked, m.end())
    if i < 0:
        return statement, []
    inner = statement[m.end():i - 1]
    replaces: list[tuple[str, str]] = []
    for item in _split_top_level(inner):
        im = re.match(r"(?is)^(.*?)\s+AS\s+(\w+)\s*$", item)
        if not im:
            raise ValueError(f"bad REPLACE item (want 'expr AS col'): {item!r}")
        replaces.append((im.group(1).strip(), im.group(2)))
    return m.group(1) + statement[i:], replaces
def _split_order_limit(statement: str) -> tuple[str, str | None, str | None, str | None]:
    """Peel a TOP-LEVEL trailing ``ORDER BY … [LIMIT n] [OFFSET n]`` off a
    statement. Positions come from the :func:`_top_level_blanked` scrub
    (shared lexer + paren interiors blanked), so subquery ORDER BYs,
    literals containing ``order by``/``LIMIT``, comments, and backslash
    escapes can never mislead the split; extraction slices the original
    text by the scrub's offsets. Returns (core, order_clause, limit,
    offset)."""
    s = statement.rstrip().rstrip(";")
    blanked = _top_level_blanked(s)
    order_at = -1
    for m in re.finditer(r"\border\s+by\b", blanked, re.IGNORECASE):
        order_at = m.start()
    if order_at < 0:
        return statement, None, None, None
    m = re.match(
        r"(?is)^ORDER\s+BY\s+(.*?)(?:\s+LIMIT\s+(\d+))?(?:\s+OFFSET\s+(\d+))?\s*$",
        blanked[order_at:],
    )
    if not m:
        return statement, None, None, None
    a, b = m.span(1)
    order_clause = s[order_at + a:order_at + b].strip()
    return s[:order_at].rstrip(), order_clause, m.group(2), m.group(3)


def _split_top_level_where(rest: str) -> tuple[str, str | None]:
    """Split ``<body> [WHERE <pred>]`` at the first TOP-LEVEL WHERE —
    one inside a string literal (``SET msg = ' WHERE …'``) or a
    subquery (``SET a = (SELECT … WHERE …)``) never splits. Returns
    (body, pred-or-None)."""
    m = re.search(r"\bWHERE\b", _top_level_blanked(rest), re.IGNORECASE)
    if m is None:
        return rest, None
    return rest[: m.start()].rstrip(), rest[m.end():]


def _order_columns(order_clause: str):
    """'a DESC, b, c ASC NULLS LAST' → Column sort expressions."""
    from pyspark.sql import functions as F

    cols = []
    for item in _split_top_level(order_clause):
        m = re.match(
            r"(?is)^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$", item
        )
        expr_s, direction, nulls = m.group(1).strip(), m.group(2), m.group(3)
        c = F.expr(expr_s)
        desc = direction is not None and direction.upper() == "DESC"
        if nulls is None:
            c = c.desc() if desc else c.asc()
        elif nulls.upper() == "FIRST":
            c = c.desc_nulls_first() if desc else c.asc_nulls_first()
        else:
            c = c.desc_nulls_last() if desc else c.asc_nulls_last()
        cols.append(c)
    return cols


# DDL/DML dialect statements (parser/statement.rs:8-30), dispatched ahead
# of spark.sql exactly as BeaconParser tries custom statements first
_DDL_RES: list[tuple[str, re.Pattern]] = [
    ("create_external", re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?EXTERNAL\s+TABLE\s+"
        r"(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+STORED\s+AS\s+(\w+)\s+"
        r"LOCATION\s+'([^']+)'"
        r"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?"
        r"(?:\s+OPTIONS\s*\(([^)]*)\))?;?\s*$",
        re.IGNORECASE)),
    ("create_index", re.compile(
        r"^\s*CREATE\s+INDEX\s+(?:(\w+)\s+)?ON\s+(\w+)\s*"
        r"\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)"
        r"(?:\s+USING\s+(\w+))?;?\s*$", re.IGNORECASE)),
    ("drop_index", re.compile(
        r"^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("show_indexes", re.compile(r"^\s*SHOW\s+INDEXES;?\s*$", re.IGNORECASE)),
    ("create_crawler", re.compile(
        r"^\s*CREATE\s+CRAWLER\s+(\w+)(?:\s+ON\s+'([^']*)')?"
        r"(?:\s+WITH\s*\(([^)]*)\))?;?\s*$", re.IGNORECASE)),
    ("run_crawler", re.compile(
        r"^\s*RUN\s+CRAWLER\s+(\w+);?\s*$", re.IGNORECASE)),
    ("drop_crawler", re.compile(
        r"^\s*DROP\s+CRAWLER\s+(?:IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("show_crawlers", re.compile(r"^\s*SHOW\s+CRAWLERS;?\s*$", re.IGNORECASE)),
    ("create_stream", re.compile(
        r"^\s*CREATE\s+STREAM\s+(\w+)\s+ON\s+'([^']*)'\s+INTO\s+(\w+)"
        r"(?:\s+WITH\s*\(([^)]*)\))?;?\s*$", re.IGNORECASE)),
    ("run_stream", re.compile(
        r"^\s*RUN\s+STREAM\s+(\w+);?\s*$", re.IGNORECASE)),
    ("drop_stream", re.compile(
        r"^\s*DROP\s+STREAM\s+(IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("show_streams", re.compile(r"^\s*SHOW\s+STREAMS;?\s*$", re.IGNORECASE)),
    ("describe_history", re.compile(
        r"^\s*DESCRIBE\s+HISTORY\s+(\w+);?\s*$", re.IGNORECASE)),
    ("show_tables", re.compile(r"^\s*SHOW\s+(TABLES|VIEWS);?\s*$", re.IGNORECASE)),
    ("attach", re.compile(
        r"^\s*ATTACH\s+'([^']+)'\s+AS\s+(\w+)(?:\s+WITH\s*\(([^)]*)\))?;?\s*$",
        re.IGNORECASE)),
    ("detach", re.compile(r"^\s*DETACH\s+(\w+);?\s*$", re.IGNORECASE)),
    ("create_secret", re.compile(
        r"^\s*CREATE\s+(PERSISTENT\s+|TEMPORARY\s+)?SECRET\s+(\w+)\s*\((.*)\)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("drop_secret", re.compile(
        r"^\s*DROP\s+SECRET\s+(IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("show_secrets", re.compile(r"^\s*SHOW\s+SECRETS;?\s*$", re.IGNORECASE)),
    ("set_extension", re.compile(
        r"^\s*SET\s+EXTENSION\s+'([^']+)'\s+FOR\s+([\w.]+)\s+TO\s+'((?:[^']|'')*)'\s*;?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("drop_extension", re.compile(
        r"^\s*DROP\s+EXTENSION\s+'([^']+)'\s+FOR\s+([\w.]+);?\s*$", re.IGNORECASE)),
    ("show_extensions", re.compile(
        r"^\s*SHOW\s+EXTENSIONS\s+FOR\s+([\w.]+);?\s*$", re.IGNORECASE)),
    ("create_table_as", re.compile(
        r"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(.*?);?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("create_table_schema", re.compile(
        r"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.+)\)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("drop_table", re.compile(r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("vacuum", re.compile(
        r"^\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?;?\s*$", re.IGNORECASE)),
    ("optimize", re.compile(
        r"^\s*OPTIMIZE\s+(\w+)(?:\s+TARGET\s+SIZE\s+(\d+))?;?\s*$",
        re.IGNORECASE)),
    ("insert_into", re.compile(
        r"^\s*INSERT\s+INTO\s+(\w+)\s+(.*?);?\s*$", re.IGNORECASE | re.DOTALL)),
    ("delete_from", re.compile(
        r"^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?;?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("update", re.compile(
        # SET-list/WHERE split happens lexer-aware in the handler — a
        # regex-lazy "(?:\s+WHERE…)?" here bound the first WHERE even
        # inside a SET string literal
        r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?);?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("alter_add", re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?);?\s*$",
        re.IGNORECASE)),
    ("alter_drop", re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+);?\s*$", re.IGNORECASE)),
    ("alter_rename", re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+);?\s*$",
        re.IGNORECASE)),
    ("create_mview", re.compile(
        r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(.*?);?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("create_view", re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*?);?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("refresh", re.compile(
        r"^\s*REFRESH\s+(?:MATERIALIZED\s+VIEW\s+|TABLE\s+)?(\w+);?\s*$", re.IGNORECASE)),
    ("drop_view", re.compile(
        r"^\s*DROP\s+(?:MATERIALIZED\s+)?VIEW\s+(IF\s+EXISTS\s+)?(\w+);?\s*$",
        re.IGNORECASE)),
]


def _split_top_level(s: str) -> list[str]:
    """Split on TOP-LEVEL commas (UPDATE SET lists, macro/secret
    argument lists): commas inside parens, string literals, comments,
    or backtick identifiers never split — positions come from the
    :func:`_top_level_blanked` scrub of the shared lexer, so a
    ``\\'``-escaped quote can't desync the split the way the old
    private quote-toggle could."""
    blanked = _top_level_blanked(s)
    parts, last = [], 0
    for i, ch in enumerate(blanked):
        if ch == ",":
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p for p in (p.strip() for p in parts) if p]


def _parse_crawler_schedule(with_opts: str | None) -> int | None:
    """``WITH (schedule = '15m')`` → seconds (units s/m/h/d, bare number
    = seconds; the reference's definition.rs:116-171 parse)."""
    if not with_opts:
        return None
    m = re.search(
        r"['\"]?schedule['\"]?\s*[=,]?\s*['\"]([0-9]+)\s*([smhd]?)['\"]",
        with_opts,
        re.IGNORECASE,
    )
    if not m:
        return None
    n, unit = int(m.group(1)), m.group(2).lower()
    return n * {"": 1, "s": 1, "m": 60, "h": 3600, "d": 86400}[unit]


def _parse_crawler_opts(with_opts: str | None) -> dict:
    """The crawler's WITH options: schedule (as above) plus the
    reference CrawlerDefinition's ``format_filter`` and ``table_naming``
    (crawler/definition.rs; exercised by test_crawlers_advanced.py):

      WITH ('schedule' '15m', 'formats' 'parquet,csv',
            'table_naming' 'leaf_prefix')
    """
    out: dict = {"schedule_secs": _parse_crawler_schedule(with_opts)}
    if not with_opts:
        return out
    kv = dict(re.findall(r"'(\w+)'\s*[= ]\s*'([^']*)'", with_opts))
    kv = {k.lower(): v for k, v in kv.items()}
    if "schedule" in kv and out["schedule_secs"] is None:
        raise ValueError(
            f"bad crawler schedule {kv['schedule']!r} (want e.g. '15m')")
    if "formats" in kv or "format_filter" in kv:
        raw = kv.get("formats") or kv.get("format_filter", "")
        out["format_filter"] = [f.strip().lower()
                                for f in raw.split(",") if f.strip()]
    naming = kv.get("table_naming", "file").lower()
    if naming not in ("file", "leaf_prefix"):
        raise ValueError(
            f"table_naming must be 'file' or 'leaf_prefix', got {naming!r}")
    out["table_naming"] = naming
    known = {"schedule", "formats", "format_filter", "table_naming"}
    unknown = set(kv) - known
    if unknown:
        raise ValueError(f"bad crawler WITH options: {sorted(unknown)}")
    return out


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        datasets_root: str | None = None,
        default_table: str | None = None,
    ):
        self.spark = spark
        self.datasets_root = datasets_root
        self.default_table = default_table
        register_functions(spark)
        try:
            from beacon_spark.sources.nd_datasource import register_nd_datasource

            register_nd_datasource(spark)
        except Exception:
            # idiomatic spark.read.format("beacon_nd") surface is optional;
            # Engine read_netcdf/read_zarr/... remain the primary path
            pass
        import threading as _threading

        self.catalog = None
        self._session_secrets: dict[str, dict] = {}
        self._metrics = None
        self._reg_lock = _threading.RLock()
        if datasets_root is not None:
            from beacon_spark.managed import Catalog

            self.catalog = Catalog(spark, datasets_root)

    @property
    def metrics(self):
        """Per-query metrics persistence (``beacon.system.query_metrics``,
        the reference's query_metrics_store.rs). Lazy — an engine with no
        catalog root records nothing."""
        if self._metrics is None:
            if self.catalog is None:
                raise ValueError("query metrics need a datasets_root")
            from beacon_spark.system_tables import QueryMetricsStore

            self._metrics = QueryMetricsStore(self)
        return self._metrics

    def record_query_metrics(self, **kw) -> None:
        """Best-effort transport hook: engines without a catalog (or with
        a broken store) must never fail the query they are recording."""
        if self.catalog is None:
            return
        try:
            self.metrics.record(**kw)
        except Exception:
            pass

    # ------------------------------------------------------------ sources

    def read_parquet(self, paths, merge: str = "supertype") -> DataFrame:
        return tabular.read_parquet(self.spark, paths, self.datasets_root, merge)

    def read_csv(self, paths, delimiter: str | None = None,
                 infer_records: int | None = None) -> DataFrame:
        return tabular.read_csv(self.spark, paths, self.datasets_root,
                                delimiter, infer_records)

    def read_arrow(self, paths) -> DataFrame:
        return tabular.read_arrow(self.spark, paths, self.datasets_root)

    def read_odv(self, paths) -> DataFrame:
        from beacon_spark.sources.odv import read_odv

        return read_odv(self.spark, paths, self.datasets_root)

    def read_netcdf(self, paths, dimensions=None, ranges=None,
                    columns=None) -> DataFrame:
        return read_nd(
            self.spark, "netcdf", paths, self.datasets_root, dimensions,
            ranges=ranges, columns=columns
        )

    def read_zarr(self, paths, dimensions=None, ranges=None,
                  columns=None) -> DataFrame:
        return read_nd(
            self.spark, "zarr", paths, self.datasets_root, dimensions,
            ranges=ranges, columns=columns
        )

    def read_geoparquet(self, paths, keep_wkb: bool = False) -> DataFrame:
        from beacon_spark.sources.geoparquet import read_geoparquet

        return read_geoparquet(self.spark, paths, self.datasets_root, keep_wkb)

    def read_geoparquet_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.geoparquet import read_geoparquet_schema

        return read_geoparquet_schema(self.spark, paths, self.datasets_root)

    def read_delta(self, location, version_as_of: int | None = None,
                   timestamp_as_of: str | None = None) -> DataFrame:
        from beacon_spark.sources.delta import read_delta

        return read_delta(self.spark, location, self.datasets_root,
                          version_as_of, timestamp_as_of)

    def read_iceberg(self, location, snapshot_id: int | None = None) -> DataFrame:
        from beacon_spark.sources.iceberg import read_iceberg

        return read_iceberg(self.spark, location, self.datasets_root, snapshot_id)

    def read_iceberg_schema(self, location) -> DataFrame:
        from beacon_spark.sources.iceberg import read_iceberg_schema

        return read_iceberg_schema(self.spark, location, self.datasets_root)

    def read_tiff(self, paths, dimensions=None, ranges=None,
                  columns=None) -> DataFrame:
        return read_nd(
            self.spark, "tiff", paths, self.datasets_root, dimensions,
            ranges=ranges, columns=columns
        )

    def read_tiff_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.tabular import _schema_df

        return _schema_df(self.spark, self.read_tiff(paths).schema)

    def read_atlas(self, paths, dimensions=None, ranges=None,
                   columns=None) -> DataFrame:
        """Atlas array stores (read_atlas table function,
        beacon-arrow-atlas/): paths address ``atlas.json`` markers (exact
        or glob). Each marker's datasets expand to per-dataset scan units
        AFTER stats pruning — datasets whose column stats cannot match
        the query's ranges are dropped before any array data is read
        (the format's headline capability, pruning.rs)."""
        from beacon_spark.sources import atlaslite
        from beacon_spark.sources.atlaslite import DATASET_SEP, prune_datasets
        from beacon_spark.sources.paths import resolve_globs

        markers = resolve_globs(paths, self.datasets_root)
        units: list[str] = []
        for mk in markers:
            for name in prune_datasets(mk, ranges):
                units.append(f"{mk}{DATASET_SEP}{name}")
        if not units:
            # all datasets pruned: empty frame with the full-store schema
            units = [
                f"{mk}{DATASET_SEP}{n}"
                for mk in markers
                for n in atlaslite.list_datasets(mk)
            ]
            df = read_nd(self.spark, "atlas", units, None, dimensions,
                         ranges=ranges, columns=columns)
            return df.limit(0)
        return read_nd(self.spark, "atlas", units, None, dimensions,
                       ranges=ranges, columns=columns)

    def read_atlas_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.tabular import _schema_df

        return _schema_df(self.spark, self.read_atlas(paths).schema)

    def read_parquet_schema(self, paths) -> DataFrame:
        return tabular.read_parquet_schema(self.spark, paths, self.datasets_root)

    def read_csv_schema(self, paths, delimiter=None) -> DataFrame:
        return tabular.read_csv_schema(self.spark, paths, self.datasets_root, delimiter)

    def read_arrow_schema(self, paths) -> DataFrame:
        return tabular.read_arrow_schema(self.spark, paths, self.datasets_root)

    def read_netcdf_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.tabular import _schema_df

        return _schema_df(self.spark, self.read_netcdf(paths).schema)

    def read_zarr_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.tabular import _schema_df

        return _schema_df(self.spark, self.read_zarr(paths).schema)

    def read_delta_schema(self, location) -> DataFrame:
        from beacon_spark.sources.delta import read_delta_schema

        return read_delta_schema(self.spark, location, self.datasets_root)

    def read_odv_schema(self, paths) -> DataFrame:
        from beacon_spark.sources.tabular import _schema_df

        return _schema_df(self.spark, self.read_odv(paths).schema)

    def table_names(self) -> list[str]:
        """All catalog-addressable table names (managed + external +
        views + MVs), sorted — the enumeration every server transport
        serves (Flight list_tables, HTTP /api/tables, MCP)."""
        if self.catalog is None:
            return []
        cat = self.catalog._load()
        return sorted(
            list(cat.get("tables", {}))
            + list(cat.get("external_tables", {}))
            + list(cat.get("views", {}))
            + list(cat.get("materialized_views", {}))
        )

    def list_datasets(self) -> DataFrame:
        """Every file under the datasets root + detected format
        (beacon-functions/src/file_formats/list_datasets.rs)."""
        if self.datasets_root is None:
            raise ValueError("Engine has no datasets_root configured")
        rows = _paths.list_datasets(self.datasets_root)
        return self.spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("dataset", T.StringType(), False),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
        )

    # ------------------------------------------------------------ sql

    def sql(self, statement: str, params: list | dict | None = None,
            user: str | None = None) -> DataFrame:
        """Spark SQL with the dialect extensions pre-compiled away.

        - ``SUMMARIZE <table|query>`` → one-pass profiling aggregate
        - ``read_parquet('glob')`` etc. in FROM → temp views over our readers
        - ``try_arrow_cast(e, 'Int32')`` → ``try_cast`` with Spark type names
        - ``params``: positional values bound to ``$1..$n`` placeholders
          (runtime.rs:107-116) or a dict for ``:name`` markers
        - ``SELECT * EXCLUDE (...)`` / ``* REPLACE (expr AS col)`` star
          options rewritten onto Spark's ``* EXCEPT`` / ``withColumn``
        - ``user``: caller identity for RBAC (auth.py). ``None`` = the
          embedded super-user (the reference's default identity); a
          named non-super user is gated to read-only statements and,
          with enforcement on, to its roles' SELECT grants (deny-wins,
          default-deny — authz.rs:25-41, mod.rs:58-78)
        """
        if self.catalog is not None:
            from beacon_spark import auth as _auth

            handled = _auth.run_auth_statement(self, statement, user)
            if handled is not None:
                return handled
            _auth.authorize(self, statement, user)
            for kind, rx in _DDL_RES:
                m = rx.match(statement)
                if m:
                    return self._run_ddl(kind, m)
            self._register_catalog()

        m = _EXPLAIN_ANALYZE_RE.match(statement)
        if m:
            # EXPLAIN ANALYZE <q> (runtime.rs:444-509): execute fully, then
            # surface the executed plan with its runtime metrics. params
            # ride through — the reference binds placeholders before the
            # analyze wrapper, so `EXPLAIN ANALYZE … WHERE x = $1` works
            inner = self.sql(m.group(1), params=params)
            inner.count()
            plan = inner._jdf.queryExecution().executedPlan().toString()
            return self.spark.createDataFrame(
                [(line,) for line in plan.splitlines()],
                T.StructType([T.StructField("plan", T.StringType())]),
            )

        m = _COPY_RE.match(statement)
        if m:
            # COPY <table|(query)> TO '<path>' [STORED AS fmt] — the
            # reference wraps the plan in a DataFusion CopyTo and rewrites
            # the target into the datasets store (statement_plan/lower.rs:
            # 12-13, output.rs). Format defaults from the path extension.
            import os as _os

            from beacon_spark.outputs import write_output
            from beacon_spark.sources.paths import detect_format

            src, target, fmt = m.group(1).strip(), m.group(2), m.group(3)
            if src.startswith("(") and src.endswith(")"):
                src = src[1:-1]
            df = self.sql(src) if re.search(r"(?i)\bSELECT\b", src) else self.sql(
                f"SELECT * FROM {src}"
            )
            fmt = (fmt or detect_format(target) or "parquet").lower()
            from beacon_spark.sources import bytesource as _bs

            if (
                self.datasets_root is not None
                and not _os.path.isabs(target)
                and not _bs.is_uri(target)
            ):
                target = (
                    _bs.join(self.datasets_root, target)
                    if _bs.is_uri(self.datasets_root)
                    else _os.path.join(self.datasets_root, target)
                )
            write_output(df, fmt, target)
            return self._status(status="ok", op="copy_to", name=target)

        m = _ANALYZE_RE.match(statement)
        if m:
            # ANALYZE FILES ['prefix'] [FORCE] (parser/statement.rs:305-318)
            from beacon_spark.stats import analyze_files

            if self.datasets_root is None:
                raise ValueError("ANALYZE FILES needs a datasets_root")
            prefix, force = m.group(1), bool(m.group(2))
            files = None
            if prefix:
                from beacon_spark.sources.paths import resolve_globs

                files = resolve_globs(f"{prefix}*.parquet", self.datasets_root)
            n = analyze_files(self.datasets_root, files, force=force)
            return self.spark.createDataFrame(
                [(n,)], T.StructType([T.StructField("files_analyzed", T.IntegerType())])
            )

        m = _SUMMARIZE_RE.match(statement)
        if m:
            src = m.group(1).strip()
            if src.startswith("(") and src.endswith(")"):
                src = src[1:-1]
            if re.match(r"^\s*SELECT\b", src, re.IGNORECASE) or _READ_FN_RE.search(src):
                return summarize(self.sql(src))
            return summarize(self.spark.table(src))

        statement = self._resolve_remote(statement, has_params=params is not None)
        statement = self._rewrite_system_tables(statement)
        statement = self._rewrite_information_schema(statement)
        statement = self._rewrite_time_travel(statement)
        statement = self._rewrite_read_fns(statement)
        statement = self._rewrite_metadata_fns(statement)
        statement = self._rewrite_try_arrow_cast(statement)
        statement = self._rewrite_macros(statement)
        statement = self._rewrite_extract_fields(statement)
        statement = self._rewrite_numeric_trunc(statement)
        statement = self._rewrite_qualify(statement)
        # Explicit spaces in the replacement: `WHERE(flag)` (no space —
        # \s* matches empty) must become `WHERE flag`, not the fused
        # token `WHEREflag` (an alias parse again); and `WHERE (a)IN(…)`
        # must become `WHERE a IN(…)`, not `WHERE aIN(…)`.
        statement = _sub_outside_literals(
            _WHERE_PAREN_IDENT_RE,
            lambda m: f"{m.group(1).rstrip()} {m.group(2)} ",
            statement,
        )
        statement = _sub_outside_literals(
            _EXCLUDE_RE,
            lambda m: f"{m.group(1)}EXCEPT ({m.group(3) or m.group(4)})",
            statement,
        )
        statement, replaces = _extract_star_replace(statement)
        order_clause = limit_clause = offset_clause = None
        if replaces:
            # ORDER BY must resolve to the REPLACED output column
            # (DataFusion/DuckDB semantics), so the trailing ORDER BY /
            # LIMIT / OFFSET are peeled off, replacements applied
            # position-preserving, then ordering applied on the output.
            statement, order_clause, limit_clause, offset_clause = _split_order_limit(
                statement
            )
        args: dict | None = None
        if isinstance(params, dict):
            args = params
        elif params is not None:
            statement, args = _bind_placeholders(statement, params)
        df = self.spark.sql(statement, args=args) if args else self.spark.sql(statement)
        if replaces:
            from pyspark.sql import functions as F

            have = {c.lower() for c in df.columns}
            for expr_s, name in replaces:
                # REPLACE is a binder-checked rewrite of an EXISTING
                # output column (DataFusion/DuckDB error on an unknown
                # name); withColumn would silently APPEND a new column
                if name.lower() not in have:
                    raise ValueError(
                        f"* REPLACE: column {name!r} is not in the "
                        f"result (have: {sorted(df.columns)})"
                    )
                df = df.withColumn(name, F.expr(expr_s))
            if order_clause:
                df = df.orderBy(*_order_columns(order_clause))
            if offset_clause is not None:
                df = df.offset(int(offset_clause))
            if limit_clause is not None:
                df = df.limit(int(limit_clause))
        return df

    _VERSION_AS_OF_RE = re.compile(
        r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)\b", re.IGNORECASE
    )
    _TIMESTAMP_AS_OF_RE = re.compile(
        r"\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", re.IGNORECASE
    )

    # (?<![\w.]) so a qualified reference like myattach.system.tbl is
    # not mistaken for the metadata schema
    _SYSTEM_TBL_RE = re.compile(
        r"(?<![\w.])(?:beacon\s*\.\s*)?system\s*\.\s*(\w+)\b", re.IGNORECASE
    )


    @property
    def _view_tag(self) -> str:
        """Short per-root tag appended to engine-scoped temp-view names:
        temp views are SESSION-global, so two engines with different
        roots on one SparkSession must not share a name (the same race
        the read_* rewrite closes by hashing the root)."""
        return f"{abs(hash(self.datasets_root)) % 10**8}"

    def _rewrite_system_tables(self, statement: str) -> str:
        """``beacon.system.<t>`` / ``system.<t>`` → a temp view refreshed
        at reference time (system_schema/mod.rs:44-66: users, roles,
        file_stats, query_metrics). Super-user-only — the gate is in
        auth.authorize, unconditional like the reference's
        is_metadata_schema (mod.rs:50-66)."""
        if self.catalog is None or "system" not in statement.lower():
            return statement
        from beacon_spark.system_tables import SYSTEM_TABLES

        names: list[str] = []

        def sub(m: re.Match) -> str:
            name = m.group(1).lower()
            if name not in SYSTEM_TABLES:
                raise ValueError(
                    f"unknown system table {name!r}; available: "
                    + ", ".join(sorted(SYSTEM_TABLES))
                )
            names.append(name)
            return f"__beacon_system_{name}_{self._view_tag}"

        out = _sub_outside_literals(self._SYSTEM_TBL_RE, sub, statement)
        for name in names:
            SYSTEM_TABLES[name](self).createOrReplaceTempView(
                f"__beacon_system_{name}_{self._view_tag}"
            )
        return out

    _INFO_SCHEMA_RE = re.compile(
        r"\binformation_schema\s*\.\s*(tables|columns)\b", re.IGNORECASE
    )

    def _rewrite_information_schema(self, statement: str) -> str:
        """``information_schema.tables`` / ``.columns`` → temp views
        snapshotted at reference time — the reference engine exposes
        DataFusion's information_schema and its Python dialect reflects
        through it (beacon-db-py/sqlalchemy.py:143-193). Spark has no
        session information_schema, so the views are built from the
        catalog: every managed/external table and (materialized) view,
        schema 'public' / catalog 'beacon' like the reference's
        defaults. Super-user-only — the same unconditional
        auth.authorize gate that covers beacon.system.*."""
        if self.catalog is None or "information_schema" not in statement.lower():
            return statement
        spans = _literal_spans(statement)
        wanted = {
            m.group(1).lower()
            for m in self._INFO_SCHEMA_RE.finditer(statement)
            if not _in_literal(spans, m.start())
        }
        if not wanted:
            return statement
        self._register_catalog()
        cat = self.catalog._load()
        entries = (
            [(n, "BASE TABLE") for n in cat["tables"]]
            + [(n, "BASE TABLE") for n in cat["external_tables"]]
            + [(n, "VIEW") for n in cat["views"]]
            + [(n, "VIEW") for n in cat["materialized_views"]]
        )
        if "tables" in wanted:
            self.spark.createDataFrame(
                [("beacon", "public", n, t) for n, t in sorted(entries)],
                "table_catalog string, table_schema string, "
                "table_name string, table_type string",
            ).createOrReplaceTempView("__beacon_infoschema_tables")
        if "columns" in wanted:
            rows = []
            for n, _t in sorted(entries):
                try:
                    fields = self.spark.table(n).schema.fields
                except Exception:
                    continue  # e.g. an external table whose lib is absent
                rows.extend(
                    ("beacon", "public", n, f.name, i + 1,
                     f.dataType.simpleString(),
                     "YES" if f.nullable else "NO")
                    for i, f in enumerate(fields)
                )
            self.spark.createDataFrame(
                rows,
                "table_catalog string, table_schema string, "
                "table_name string, column_name string, "
                "ordinal_position int, data_type string, "
                "is_nullable string",
            ).createOrReplaceTempView("__beacon_infoschema_columns")
        return _sub_outside_literals(
            self._INFO_SCHEMA_RE,
            lambda m: f"__beacon_infoschema_{m.group(1).lower()}",
            statement,
        )

    def _rewrite_time_travel(self, statement: str) -> str:
        """``FROM <managed_table> VERSION AS OF <n>`` (and ``TIMESTAMP
        AS OF '<ts>'``) → a snapshot temp view pinned to that manifest.

        The reference's managed tables are versioned Lance datasets
        (actions.rs:509-795 operate on dataset versions); ours keep
        every committed COW manifest until VACUUM (managed.py), so any
        still-retained version is readable. Delta-style spelling, same
        as our ``read_delta`` time travel. TIMESTAMP AS OF resolves to
        the newest manifest committed at-or-before the timestamp
        (manifest mtime — Delta uses the log entry's timestamp the same
        way). Non-managed names pass through untouched (Spark reports
        them)."""
        low = statement.lower()
        if self.catalog is None or (
            "version" not in low and "timestamp" not in low
        ):
            return statement
        tables = self.catalog._load()["tables"]

        def _pin(name: str, ver: int) -> str:
            from beacon_spark.managed import ManagedTable

            view = f"{name}__v{ver}_{self._view_tag}"
            ManagedTable(self.spark, tables[name]).read(
                version=ver
            ).createOrReplaceTempView(view)
            return view

        def repl_version(m: re.Match) -> str:
            name = m.group(1)
            if name not in tables:
                return m.group(0)
            return _pin(name, int(m.group(2)))

        def repl_timestamp(m: re.Match) -> str:
            name, ts_text = m.group(1), m.group(2)
            if name not in tables:
                return m.group(0)
            import datetime as _dt

            from beacon_spark.managed import ManagedTable
            from beacon_spark.sources import bytesource as bs

            ts = _dt.datetime.fromisoformat(ts_text)
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            t = ManagedTable(self.spark, tables[name])
            best = None
            for ver, committed in t.versions():
                if committed <= ts.timestamp():
                    best = ver
            if best is None:
                raise ValueError(
                    f"no version of {name!r} existed at {ts_text!r} "
                    "(earliest retained commit is later)"
                )
            return _pin(name, best)

        statement = _sub_outside_literals(
            self._VERSION_AS_OF_RE, repl_version, statement
        )
        return _sub_outside_literals(
            self._TIMESTAMP_AS_OF_RE, repl_timestamp, statement
        )

    def _rewrite_metadata_fns(self, statement: str) -> str:
        """Metadata table functions → temp views:
        ``list_datasets()`` (file_formats/list_datasets.rs),
        ``view_statistics_cache()`` / bare ``view_dataset_statistics()``
        (the whole index), ``view_dataset_statistics('<path>')``
        (per-column stats of one file, computed on demand when
        uncached) and ``view_external_table_statistics('<table>')``
        (cache coverage per file) — beacon-functions/src/metadata/* and
        table-functions-utility.md:52-117."""

        def repl(m: re.Match) -> str:
            fn, arg = m.group(1).lower(), m.group(2)
            if fn == "list_datasets":
                df = self.list_datasets()
            elif fn == "view_external_table_statistics":
                from beacon_spark.stats import external_table_statistics_df

                if arg is None:
                    raise ValueError(
                        "view_external_table_statistics takes a table name")
                df = external_table_statistics_df(self.spark, self, arg)
            elif fn == "view_dataset_statistics" and arg is not None:
                from beacon_spark.stats import dataset_statistics_df

                df = dataset_statistics_df(self.spark, self, arg)
            else:
                df = self.view_statistics()
            name = f"__beacon_meta_{fn}_{self._view_tag}" + (
                f"_{abs(hash(arg)) % 10**8}" if arg else "")
            df.createOrReplaceTempView(name)
            return name

        return _sub_outside_literals(
            re.compile(
                r"\b(list_datasets|view_statistics_cache"
                r"|view_dataset_statistics|view_external_table_statistics)"
                r"\s*\(\s*(?:'([^']*)')?\s*\)",
                re.IGNORECASE,
            ),
            repl,
            statement,
        )

    # ------------------------------------------------------------ ddl/dml

    def _status(self, **cols) -> DataFrame:
        names = list(cols)
        return self.spark.createDataFrame(
            [tuple(cols[k] for k in names)],
            T.StructType([T.StructField(k, T.StringType()) for k in names]),
        )

    def _register_catalog(self) -> None:
        """Expose managed tables / views / MVs as temp views so plain
        ``spark.sql`` references resolve — the reference resolves catalog
        objects at plan time (``table_ext.rs:517-631``). Cached on a catalog
        change token; DML bumps table versions, so stale pins re-register.

        Thread-safe: concurrent requests (the threaded HTTP server) WAIT
        on the lock while one registers, then see the fresh signature
        and return — the reentrancy flag alone would let them skip ahead
        and resolve against missing views. The flag (checked under the
        RLock, so only the owning thread can observe it True) still
        short-circuits the recursive ``self.sql`` calls registration
        itself makes for views."""
        with self._reg_lock:
            self._register_catalog_locked()

    def _register_catalog_locked(self) -> None:
        if getattr(self, "_registering", False):
            return
        from beacon_spark.managed import ManagedTable

        # a failed/structural statement explicitly demanded the FULL
        # pass (_force_full): the dirty fast path must not adopt a later
        # successful DML's _noted_sig over that demand, or a partially-
        # mutated table that never entered the dirty set keeps serving a
        # stale pinned file list (ADVICE r7). Cleared only when the full
        # pass below actually completes.
        force_full = getattr(self, "_force_full", False)
        dirty = getattr(self, "_dirty_tables", None)
        if dirty:
            # manifest-only DML through THIS engine: refresh just the
            # mutated tables/MVs (plus a cheap re-plan of plain views,
            # which may pin pre-mutation file lists) — never the
            # O(tables) full pass
            self._registering = True
            try:
                c = self.catalog._load()
                snapshot = sorted(dirty)
                for name in snapshot:
                    if name in c["tables"]:
                        ManagedTable(self.spark, c["tables"][name]).read() \
                            .createOrReplaceTempView(name)
                    elif name in c["materialized_views"]:
                        ManagedTable(
                            self.spark, c["materialized_views"][name]["path"]
                        ).read().createOrReplaceTempView(name)
                # only what we registered: a concurrent DML's mark between
                # the snapshot and here must survive for the next pass
                dirty.difference_update(snapshot)
                for vname, view_sql in c["views"].items():
                    self.sql(view_sql).createOrReplaceTempView(vname)
                # adopt only OUR OWN note's post-write signature — the
                # current live signature may already include a concurrent
                # writer's change, and adopting it here would silently
                # swallow that change (the check below must still see a
                # mismatch and run the full pass for it). Never adopt
                # over a pending force-full demand.
                if not force_full:
                    self._cat_sig = getattr(self, "_noted_sig", None)
            finally:
                self._registering = False
        sig = self.catalog.signature()
        if sig is None or (not force_full
                           and sig == getattr(self, "_cat_sig", object())):
            return

        self._registering = True
        try:
            cat = self.catalog._load()
            for name, path in cat["tables"].items():
                ManagedTable(self.spark, path).read().createOrReplaceTempView(name)
            self._ext_cache = getattr(self, "_ext_cache", {})
            remote_ext: dict[str, tuple] = {}
            for name, ext in cat["external_tables"].items():
                try:
                    opts = dict(ext.get("options") or {})
                    sname = ext.get("password_secret")
                    if sname:
                        from beacon_spark.secretbox import default_box

                        raw = cat.get("secrets", {}).get(sname, {}) \
                                 .get("options", {}).get("password")
                        if raw:
                            opts["password"] = default_box().decrypt(raw)
                    if ext["format"] in ("postgres", "mysql"):
                        # remote-DB tables are LIVE lazy scans (the
                        # reference's federated provider): a beacon_sqldb
                        # DataSource whose filters push into the remote
                        # WHERE and whose fetch runs on an executor at
                        # query time. Only the SCHEMA is probed+cached
                        # per catalog entry — data is never snapshotted.
                        import json as _json

                        key = _json.dumps(ext, sort_keys=True)
                        cached = self._ext_cache.get(name)
                        if cached is not None and cached[0] == key:
                            schema = cached[1]
                        else:
                            if ext["format"] == "postgres":
                                from beacon_spark.sources.pglite import (
                                    postgres_table_schema as _probe,
                                )
                            else:
                                from beacon_spark.sources.mysqllite import (
                                    mysql_table_schema as _probe,
                                )
                            schema = _probe(ext["paths"][0], opts)
                            self._ext_cache[name] = (key, schema)
                        self._register_remote_datasource()
                        (
                            self.spark.read.format("beacon_sqldb")
                            .schema(schema)
                            .options(
                                engine=ext["format"],
                                table=ext["paths"][0],
                                **{k: str(v) for k, v in opts.items()},
                            )
                            .load()
                            .createOrReplaceTempView(name)
                        )
                        continue
                    if ext["format"] == "remote":
                        # registry for the federation pushdown: a join
                        # of same-endpoint STORED AS REMOTE tables ships
                        # whole (token decrypted above)
                        remote_ext[name] = (
                            ext["paths"][0],
                            opts.get("token") or opts.get("password")
                            or None,
                            str(opts.get("tls", "")).lower() == "true",
                        )
                    self.resolve_from(
                        {ext["format"]: {"paths": ext["paths"],
                                         "options": opts}}
                    ).createOrReplaceTempView(name)
                except Exception as e:
                    # fail-open: a missing optional reader lib (netcdf/zarr)
                    # must not break unrelated statements — but say so
                    import sys

                    print(
                        f"warning: external table {name!r} not registered: {e}",
                        file=sys.stderr,
                    )
            self._remote_ext = remote_ext
            for name, mv in cat["materialized_views"].items():
                ManagedTable(self.spark, mv["path"]).read().createOrReplaceTempView(name)
            for name, view_sql in cat["views"].items():
                # plain views stay logical: re-planned at registration
                self.sql(view_sql).createOrReplaceTempView(name)
            for aname, aroot in cat.get("attachments", {}).items():
                if isinstance(aroot, dict):
                    # remote attachment: reconnect lazily (no data fetched
                    # here — table views materialize on first reference)
                    self._remotes = getattr(self, "_remotes", {})
                    if aname not in self._remotes:
                        try:
                            from beacon_spark.server.remote import RemoteBeacon

                            # token via the secret store (token_secret
                            # reference); plain "token" accepted for
                            # catalogs written before that change
                            token = aroot.get("token")
                            sname = aroot.get("token_secret")
                            if sname:
                                from beacon_spark.secretbox import (
                                    default_box,
                                )

                                sec = cat.get("secrets", {}).get(sname, {})
                                raw = sec.get("options", {}).get("token")
                                if raw:
                                    token = default_box().decrypt(raw)
                            self._remotes[aname] = RemoteBeacon(
                                aroot["url"],
                                token=token,
                                tls=aroot.get("tls", False),
                            )
                        except Exception as e:
                            import sys

                            print(
                                f"warning: remote attachment {aname!r}: {e}",
                                file=sys.stderr,
                            )
                    continue
                try:
                    sub = Engine(self.spark, datasets_root=aroot)
                    subcat = sub.catalog._load()
                    from beacon_spark.managed import ManagedTable as _MT

                    for t, p in subcat["tables"].items():
                        _MT(self.spark, p).read().createOrReplaceTempView(f"{aname}_{t}")
                    for t, mv in subcat["materialized_views"].items():
                        _MT(self.spark, mv["path"]).read().createOrReplaceTempView(
                            f"{aname}_{t}"
                        )
                    for t, ext in subcat["external_tables"].items():
                        sub.resolve_from(
                            {ext["format"]: {"paths": ext["paths"]}}
                        ).createOrReplaceTempView(f"{aname}_{t}")
                except Exception as e:
                    import sys

                    print(f"warning: attachment {aname!r}: {e}", file=sys.stderr)
            from beacon_spark.secretbox import default_box

            for s in cat.get("secrets", {}).values():
                box = default_box()
                self._apply_secret(
                    s,
                    {
                        k: box.decrypt(v)
                        for k, v in s.get("options", {}).items()
                    },
                )
            self._cat_sig = sig
            self._force_full = False  # the demanded full pass ran
        finally:
            self._registering = False

    def _apply_secret(self, entry: dict, params: dict[str, str]) -> None:
        """Wire an s3-type secret onto the Hadoop connector config (the
        reference hands credentials to object_store per URL scope). A
        `s3://bucket` scope becomes per-bucket fs.s3a config; empty scope
        is global."""
        if entry.get("type") != "s3":
            return
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        scope = entry.get("scope") or ""
        bm = re.match(r"s3a?://([^/]+)", scope)
        prefix = f"fs.s3a.bucket.{bm.group(1)}." if bm else "fs.s3a."
        keymap = {
            "key_id": "access.key",
            "secret": "secret.key",
            "region": "endpoint.region",
            "endpoint": "endpoint",
            "session_token": "session.token",
        }
        for k, v in params.items():
            if k in keymap:
                conf.set(prefix + keymap[k], v)

    #: statement kinds that mutate MANIFESTS, not the catalog structure —
    #: these record themselves via note_table_version (one small catalog
    #: write) and re-register only their own temp view, instead of
    #: invalidating the whole catalog registration (O(tables) at scale)
    _MANIFEST_ONLY_KINDS = frozenset({
        "vacuum", "optimize", "insert_into", "delete_from", "update",
        "alter_add", "alter_drop", "alter_rename", "refresh",
    })

    def _table_columns_for_extension(self, table: str) -> list[str]:
        """The table's live column names for extension validation
        (extensions.rs table_schema: errors ``table '<name>' not
        found`` when the name is not a registered table)."""
        try:
            return [
                f.name
                for f in self.sql(f"SELECT * FROM {table} LIMIT 0").schema
            ]
        except Exception as e:
            # only rewrite genuine name-resolution failures; a registered
            # view whose underlying SQL is broken (or an external table
            # whose credentials fail) must surface its REAL error, not a
            # misleading "not found"
            msg = str(e)
            unresolved = ("TABLE_OR_VIEW_NOT_FOUND" in msg
                          or "cannot be found" in msg)
            if (unresolved and f"`{table}`" in msg) or (
                    "PARSE_SYNTAX_ERROR" in msg):
                raise ValueError(f"table '{table}' not found") from None
            raise

    def _run_ddl(self, kind: str, m: re.Match) -> DataFrame:
        """Dialect DDL/DML → Catalog ops (statement enum parser/statement.rs:8-30,
        lowering actions.rs:221-795). Always returns a small status frame."""
        cat = self.catalog
        try:
            out = self._run_ddl_inner(kind, m)
        except BaseException:
            # failed statement: state unknown — force the full re-check,
            # but never note a version (a failed DELETE on a missing
            # table must not write phantom catalog entries or make every
            # other engine re-register for nothing). _force_full makes
            # the demand survive a later successful DML's dirty-path
            # signature adoption (ADVICE r7).
            self._cat_sig = None
            self._force_full = True
            raise
        # invalidate AFTER the mutation: nested self.sql() calls during
        # the DDL re-register and would otherwise cache a pre-mutation pin
        if kind in self._MANIFEST_ONLY_KINDS:
            name = m.group(1)
            try:
                self._noted_sig = cat.note_table_version(name)
                self._dirty_tables = getattr(self, "_dirty_tables", set())
                self._dirty_tables.add(name)
            except Exception:
                self._cat_sig = None  # fall back to the full pass
                self._force_full = True
        else:
            self._cat_sig = None
            self._force_full = True
        return out

    def _run_ddl_inner(self, kind: str, m: re.Match) -> DataFrame:
        cat = self.catalog
        if kind == "create_external":
            replace, if_not_exists, name, fmt, loc, partby, optstr = m.groups()
            if replace and if_not_exists:
                raise ValueError(
                    "CREATE EXTERNAL TABLE: OR REPLACE and IF NOT EXISTS "
                    "cannot be combined")
            if if_not_exists and name in cat._load()["external_tables"]:
                # reference contract (create-table.md): skip, no error
                return self._status(
                    status="noop", op="create_external_table", name=name)
            fmt_l = fmt.lower()
            opts = dict(
                re.findall(r"'?(\w+)'?\s+'((?:[^']|'')*)'", optstr or "")
            )
            opts = {k.lower(): v.replace("''", "'") for k, v in opts.items()}
            # options are format-scoped and FAIL LOUDLY when a format
            # would ignore them — a silently-dropped csv delimiter
            # means silently mis-parsed data
            allowed = {
                "postgres": {"host", "port", "user", "password",
                             "database", "sslmode"},
                "mysql": {"host", "port", "user", "password", "database"},
                "csv": {"delimiter"},
                "remote": {"token", "tls"},
            }.get(fmt_l, set())
            bad = set(opts) - allowed
            if bad:
                raise ValueError(
                    f"OPTIONS not supported for STORED AS {fmt}: "
                    f"{sorted(bad)} (supported: {sorted(allowed) or 'none'})"
                )
            password = opts.pop("password", None)
            if fmt_l == "remote":
                # the bearer token is a credential: it rides the same
                # encrypted password-secret slot the DB formats use
                password = opts.pop("token", None) or password
            # validate format + location/connection eagerly (the
            # reference plans the listing at CREATE time,
            # actions.rs:221-492; sql-databases connects at CREATE).
            # DB formats probe with LIMIT 0 — connect + schema, never a
            # full download of the remote table just to validate it
            probe_loc = (
                f"SELECT * FROM {loc} LIMIT 0"
                if fmt_l in ("postgres", "mysql")
                else loc
            )
            probe_df = self.resolve_from(
                {fmt_l: {"paths": [probe_loc], "options":
                         {**opts, **({"password": password}
                                     if password else {})}}}
            )
            part_cols = None
            if partby:
                # PARTITIONED BY (create-table.md): declared hive-style
                # partition columns. Spark's directory scan discovers
                # and prunes them natively; the declaration is VALIDATED
                # against the probed schema so a typo'd column errors at
                # CREATE, not silently never-prunes at query time.
                part_cols = [c.strip() for c in partby.split(",") if c.strip()]
                have = {c.lower() for c in probe_df.columns}
                missing = [c for c in part_cols if c.lower() not in have]
                if missing:
                    raise ValueError(
                        f"PARTITIONED BY column(s) {missing} not present "
                        f"in the table (have: {sorted(have)})")
            # one atomic catalog commit: entry + credential secret
            # together (reference EncryptedSecret, sql-databases/secret.rs)
            cat.create_external_table(name, fmt, [loc], opts,
                                      password=password,
                                      partitioned_by=part_cols,
                                      replace=bool(replace))
            return self._status(status="ok", op="create_external_table", name=name)
        if kind == "create_index":
            idx, table, column, using = m.groups()
            cols = [c.strip() for c in column.split(",")]
            column = ",".join(cols)
            idx = idx or f"{table}_{column.replace(',', '_')}_idx"
            using = (using or "btree").lower()
            if len(cols) > 1 and using != "btree":
                raise ValueError(
                    f"multi-column CREATE INDEX is btree/Z-order only, not {using}"
                )
            cat.create_index(idx, table, column, using)
            if using == "btree" and self.datasets_root is not None:
                # the btree role (range pruning) is served by physical
                # clustering + the file-stats min/max index
                c = cat._load()
                ext = c["external_tables"].get(table)
                if ext and ext["format"] == "parquet":
                    from beacon_spark.sources.paths import resolve_globs
                    from beacon_spark.stats import analyze_files

                    files = resolve_globs(ext["paths"], self.datasets_root)
                    analyze_files(self.datasets_root, files)
                elif table in c["tables"]:
                    # managed table: rewrite clustered on the index
                    # column(s) — range for one column, Morton/Z-order
                    # for several (each file a value hyper-rectangle) —
                    # then index the new files' min/max: scans skip
                    # files via the stats index and row groups via
                    # parquet footers
                    from beacon_spark.managed import ManagedTable
                    from beacon_spark.stats import analyze_files

                    mt = ManagedTable(self.spark, c["tables"][table])
                    mt.cluster_by(cols)
                    analyze_files(self.datasets_root, mt.files())
            elif using in ("inverted", "bitmap") and self.datasets_root is not None:
                # real posting-file indexes (managed tables): built here,
                # consulted by _pruned_managed_read — inverted for
                # contains/LIKE predicates, bitmap for eq/IN on
                # low-cardinality columns
                c = cat._load()
                if table in c["tables"]:
                    from beacon_spark.managed import ManagedTable

                    mt = ManagedTable(self.spark, c["tables"][table])
                    if using == "inverted":
                        mt.build_inverted_index(column, idx)
                    else:
                        mt.build_bitmap_index(column, idx)
            return self._status(status="ok", op="create_index", name=idx)
        if kind == "drop_index":
            cat.drop_index(m.group(1))
            return self._status(status="ok", op="drop_index", name=m.group(1))
        if kind == "show_indexes":
            rows = [
                (n, d["table"], d["column"], d["using"])
                for n, d in sorted(cat._load()["indexes"].items())
            ]
            return self.spark.createDataFrame(
                rows, "index_name string, table_name string, column_name string, using string"
            )
        if kind == "create_crawler":
            name, prefix, with_opts = m.groups()
            opts = _parse_crawler_opts(with_opts)
            cat.create_crawler(
                name, prefix, opts.get("schedule_secs"),
                format_filter=opts.get("format_filter"),
                table_naming=opts.get("table_naming", "file"),
            )
            return self._status(status="ok", op="create_crawler", name=name)
        if kind == "run_crawler":
            return self._run_crawler(m.group(1))
        if kind == "drop_crawler":
            cat.drop_crawler(m.group(1))
            return self._status(status="ok", op="drop_crawler", name=m.group(1))
        if kind == "create_stream":
            # CREATE STREAM s ON 'prefix' INTO table [WITH(...)] — a
            # streaming-ingestion extension (the reference has no
            # streaming engine, SURVEY §2.12): exactly-once file→table
            # ingestion with a Structured Streaming checkpoint
            from beacon_spark.streaming.ingest import create_stream

            name, prefix, table, optstr = m.groups()
            opts = dict(
                re.findall(r"'(\w+)'\s+'((?:[^']|'')*)'", optstr or "")
            )
            create_stream(
                self, name, prefix, table,
                {k.lower(): v.replace("''", "'") for k, v in opts.items()},
            )
            return self._status(status="ok", op="create_stream", name=name)
        if kind == "run_stream":
            from beacon_spark.streaming.ingest import run_stream

            return run_stream(self, m.group(1))
        if kind == "drop_stream":
            from beacon_spark.streaming.ingest import drop_stream

            dropped = drop_stream(self, m.group(2),
                                  if_exists=bool(m.group(1)))
            return self._status(
                status="ok" if dropped else "noop", op="drop_stream",
                name=m.group(2),
            )
        if kind == "show_streams":
            from beacon_spark.streaming.ingest import stream_rows

            return self.spark.createDataFrame(
                stream_rows(self),
                "stream_name string, prefix string, target_table string, "
                "format string",
            )
        if kind == "describe_history":
            # DESCRIBE HISTORY t — the version log behind VERSION AS OF
            # (Delta's DESCRIBE HISTORY shape; the reference's Lance
            # datasets carry the same per-version metadata)
            from beacon_spark.managed import ManagedTable
            from beacon_spark.sources import bytesource as bs

            name = m.group(1)
            path = cat._load()["tables"].get(name)
            if path is None:
                raise ValueError(f"{name!r} is not a managed table")
            t = ManagedTable(self.spark, path)
            import datetime as _dt

            rows = []
            for ver, committed in t.versions():
                mani = t._read_manifest(ver)
                ts = _dt.datetime.fromtimestamp(
                    committed, tz=_dt.timezone.utc,
                )
                rows.append((ver, ts, len(mani["files"])))
            return self.spark.createDataFrame(
                sorted(rows, reverse=True),
                "version long, committed_at timestamp, num_files long",
            )
        if kind == "show_crawlers":
            rows = [
                (n, d["prefix"], d.get("schedule_secs"))
                for n, d in sorted(cat._load()["crawlers"].items())
            ]
            return self.spark.createDataFrame(
                rows, "crawler_name string, prefix string, schedule_secs long"
            )
        if kind == "show_tables":
            c = cat._load()
            rows = (
                [(n, "managed") for n in c["tables"]]
                + [(n, "external") for n in c["external_tables"]]
                + [(n, "view") for n in c["views"]]
                + [(n, "materialized_view") for n in c["materialized_views"]]
            )
            return self.spark.createDataFrame(
                sorted(rows), "table_name string, table_type string"
            )
        if kind == "attach":
            # ATTACH '<target>' AS name [WITH ('token' 't', 'tls' 'true')]
            # (parser/statement.rs:60-76). Two forms:
            #   - a remote engine URL (beacon://host:port or grpc://…):
            #     connect over Arrow Flight and enumerate its tables once
            #     (remote/catalog.rs:1-11; validated eagerly like
            #     connection.rs:57). Queried via remote_query('name', sql)
            #     pushdown or name__table references (server/remote.py).
            #   - a local lake root: mount its catalog; tables resolve as
            #     <name>_<table> (plain views are not re-planned
            #     cross-catalog — documented divergence).
            path, name, optstr = m.group(1), m.group(2), m.group(3)
            from beacon_spark.server.remote import RemoteBeacon, parse_remote_url

            if parse_remote_url(path):
                opts = dict(
                    re.findall(r"'([^']*)'\s+'((?:[^']|'')*)'", optstr or "")
                )
                rb = RemoteBeacon(
                    path,
                    token=opts.get("token"),
                    tls=opts.get("tls", "").lower() == "true",
                )
                rb.list_tables()  # eager validation, like the reference
                self._remotes = getattr(self, "_remotes", {})
                self._remotes[name] = rb
                att_entry = {
                    "url": path,
                    "tls": opts.get("tls", "").lower() == "true",
                }
                att_secret = None
                if opts.get("token"):
                    # the bearer token rides the SECRET store, never the
                    # attachment entry itself — the reference routes
                    # remote credentials through its secrets mechanism
                    # (remote/connection.rs, secrets.rs) as
                    # EncryptedSecret values; ours are ChaCha20+HMAC
                    # encrypted under a key held OUTSIDE the lake root
                    # (secretbox.py), so catalog.json alone is useless
                    # to a reader with data-directory access
                    from beacon_spark.secretbox import default_box

                    sname = f"__attach_{name}"
                    att_secret = (sname, {
                        "type": "bearer",
                        "scope": path,
                        "persistent": True,
                        "options": {
                            "token": default_box().encrypt(opts["token"])
                        },
                    })
                    att_entry["token_secret"] = sname

                def apply_attach(doc: dict) -> None:
                    # rides _mutate: a raw load->save raced concurrent
                    # catalog commits last-writer-wins
                    doc.setdefault("attachments", {})[name] = att_entry
                    if att_secret is not None:
                        doc.setdefault("secrets", {})[att_secret[0]] = \
                            att_secret[1]

                cat._mutate(apply_attach)
                return self._status(
                    status="ok", op="attach", name=name, remote="true"
                )
            # local lake root: validate eagerly like the remote branch
            # (the reference connects/enumerates at ATTACH time,
            # remote/connection.rs:57) — a typo'd path otherwise lands
            # in the catalog and every later registration just warns
            import os as _os

            from beacon_spark.sources import bytesource as _bs

            if not (_os.path.isdir(path) if not _bs.is_uri(path)
                    else _bs.exists(path)):
                raise ValueError(
                    f"ATTACH: lake root {path!r} does not exist")
            cat._mutate(
                lambda doc: doc.setdefault("attachments", {})
                .__setitem__(name, path))
            return self._status(status="ok", op="attach", name=name)
        if kind == "detach":
            name = m.group(1)
            if name not in cat._load().get("attachments", {}):
                raise ValueError(f"no attachment {name!r}")

            def apply_detach(doc: dict) -> None:
                entry = doc.setdefault("attachments", {}).pop(name, None)
                if isinstance(entry, dict) and entry.get("token_secret"):
                    doc.get("secrets", {}).pop(entry["token_secret"], None)

            cat._mutate(apply_detach)
            rb = getattr(self, "_remotes", {}).pop(name, None)
            if rb is not None:
                rb.close()
            # drop materialized remote views — a stale temp view would
            # keep serving data from a connection the user detached
            # (federated-pushdown views too: they may reference this
            # endpoint, and re-running the statement re-derives them)
            views = getattr(self, "_remote_views", {})
            for v in views.pop(name, set()) | views.pop("__federated__", set()):
                try:
                    self.spark.catalog.dropTempView(v)
                except Exception:
                    pass
            return self._status(status="ok", op="detach", name=name)
        if kind == "create_secret":
            # CREATE [PERSISTENT|TEMPORARY] SECRET n (TYPE t, k 'v', …,
            # SCOPE 's') — actions.rs:110-220. Persistent secrets go to
            # the catalog encrypted (ChaCha20 + HMAC-SHA256, key from
            # env/keyfile outside the lake root — secretbox.py; the
            # reference stores EncryptedSecret in its db file);
            # TEMPORARY/default live only in this Engine.
            from beacon_spark.secretbox import default_box

            modifier = (m.group(1) or "").strip().lower()
            name, body = m.group(2), m.group(3)
            params: dict[str, str] = {}
            stype = scope = None
            for item in _split_top_level(body):
                item = item.strip()
                tm = re.match(r"(?i)^TYPE\s+'?(\w+)'?$", item)
                sm = re.match(r"(?i)^SCOPE\s+'([^']*)'$", item)
                km = re.match(r"^(\w+)\s+'([^']*)'$", item)
                if tm:
                    stype = tm.group(1).lower()
                elif sm:
                    scope = sm.group(1)
                elif km:
                    params[km.group(1).lower()] = km.group(2)
                elif item:
                    raise ValueError(f"bad secret parameter: {item!r}")
            entry = {"type": stype, "scope": scope, "persistent": modifier == "persistent"}
            self._apply_secret(entry, params)
            if modifier == "persistent":
                box = default_box()
                sec_doc = {
                    **entry,
                    "options": {
                        k: box.encrypt(v) for k, v in params.items()
                    },
                }
                cat._mutate(
                    lambda d: d.setdefault("secrets", {})
                    .__setitem__(name, sec_doc))
            else:
                self._session_secrets[name] = {**entry, "options": params}
            return self._status(status="ok", op="create_secret", name=name)
        if kind == "drop_secret":
            if_exists, name = bool(m.group(1)), m.group(2)
            found = (name in self._session_secrets
                     or name in cat._load().get("secrets", {}))
            if not found and not if_exists:
                raise ValueError(f"secret {name!r} does not exist")
            self._session_secrets.pop(name, None)
            cat._mutate(
                lambda d: d.setdefault("secrets", {}).pop(name, None))
            return self._status(status="ok", op="drop_secret", name=name)
        if kind == "show_secrets":
            # values never shown (the reference stores them encrypted)
            rows = []
            c = cat._load()
            for name, s in sorted(
                {**c.get("secrets", {}), **self._session_secrets}.items()
            ):
                rows.append(
                    (name, s.get("type"), s.get("scope"),
                     bool(s.get("persistent")),
                     ",".join(sorted(s.get("options", {}))))
                )
            return self.spark.createDataFrame(
                rows,
                "name string, type string, scope string, persistent boolean, option_keys string",
            )
        if kind == "set_extension":
            # SET EXTENSION '<kind>' FOR <table> TO '<json>' (statement.rs;
            # typed contract + strict validation = extensions.rs:1-460:
            # unknown kind/key/ill-shaped value/missing column REJECTED)
            from beacon_spark import extensions as _ext

            ext_kind, table, payload = m.group(1), m.group(2), m.group(3)
            doc = _ext.parse_kind(
                ext_kind, payload.replace("''", "'"),
                self._table_columns_for_extension(table))
            payload_json = json.dumps(doc)
            cat._mutate(
                lambda d: d.setdefault("extensions", {})
                .setdefault(table, {})
                .__setitem__(ext_kind.lower(), payload_json))
            return self._status(status="ok", op="set_extension", name=table)
        if kind == "drop_extension":
            from beacon_spark import extensions as _ext

            ext_kind, table = m.group(1), m.group(2)
            self._table_columns_for_extension(table)  # table must exist
            k = ext_kind.lower()

            def apply_dropext(d: dict) -> None:
                stored = d.setdefault("extensions", {}).get(table, {})
                if k in stored:
                    # a stored entry always drops — including legacy
                    # free-form kinds written before the typed contract,
                    # which SHOW keeps readable and must stay removable
                    stored.pop(k)
                else:
                    _ext.drop_kind_name(ext_kind)  # unknown + absent → error

            cat._mutate(apply_dropext)
            return self._status(status="ok", op="drop_extension", name=table)
        if kind == "show_extensions":
            # ONE row, one Utf8 'extensions' column holding the whole
            # JSON document (show_extensions_arrow_schema, pinned by the
            # reference's table_extensions_sql_round_trip test)
            table = m.group(1)
            self._table_columns_for_extension(table)  # table must exist
            c = cat._load()
            doc = {}
            for k, v in sorted(c.get("extensions", {}).get(table, {}).items()):
                try:
                    doc[k] = json.loads(v)
                except Exception:
                    doc[k] = v  # legacy free-form payloads stay readable
            return self.spark.createDataFrame(
                [(json.dumps(doc),)], "extensions string")
        if kind == "create_table_as":
            if_not_exists, name, src = m.groups()
            if if_not_exists and name in cat._load()["tables"]:
                # managed-tables.md: IF NOT EXISTS does nothing, no error
                return self._status(status="noop", op="create_table",
                                    name=name)
            cat.create_table(name, self.sql(src))
            return self._status(status="ok", op="create_table", name=name)
        if kind == "create_table_schema":
            # CREATE TABLE t (id BIGINT, name VARCHAR) — an EMPTY managed
            # table with an explicit schema (the reference's default
            # Lance-backed CREATE, actions.rs:221-360; contract:
            # integration-tests/test_lance_tables.py). Dialect types the
            # reference accepts bare (VARCHAR/TEXT) map to Spark string.
            from beacon_spark.managed import _parse_type as _managed_parse_type

            if_not_exists, name, collist = m.groups()
            if if_not_exists and name in cat._load()["tables"]:
                return self._status(status="noop", op="create_table",
                                    name=name)
            fields = []
            for item in _split_top_level(collist):
                cm = re.match(
                    r"^\s*(\w+)\s+(.+?)(?:\s+NOT\s+NULL)?\s*$",
                    item, re.IGNORECASE | re.DOTALL)
                if not cm:
                    raise ValueError(f"bad column definition: {item!r}")
                cname, ctype = cm.group(1), cm.group(2).strip()
                fields.append(
                    T.StructField(cname, _managed_parse_type(ctype), True))
            cat.create_table(
                name,
                self.spark.createDataFrame([], T.StructType(fields)),
            )
            return self._status(status="ok", op="create_table", name=name)
        if kind == "drop_table":
            # DROP TABLE removes an external table, a managed table, OR
            # a view/MV — the reference has no separate DROP VIEW
            # (docs server/view.md; actions.rs:37-43 deregisters any
            # provider) and errors on a missing name unless IF EXISTS
            if_exists, name = bool(m.group(1)), m.group(2)
            names = cat.names()
            if not cat.drop_external_table(name):
                if name in names["tables"]:
                    cat.drop_table(name)
                elif (name in names["views"]
                      or name in names["materialized_views"]):
                    cat.drop_view(name)
                elif not if_exists:
                    raise ValueError(f"Table '{name}' does not exist")
            self.spark.catalog.dropTempView(name)
            return self._status(status="ok", op="drop_table", name=name)
        if kind == "vacuum":
            name, retain = m.group(1), int(m.group(2) or 1)
            n_manifests, n_files = cat.table(name).vacuum(retain)
            return self._status(
                status="ok", op="vacuum", name=name,
                manifests_removed=str(n_manifests), files_removed=str(n_files),
            )
        if kind == "optimize":
            # OPTIMIZE t [TARGET SIZE <bytes>] — fold the small-file
            # tail (streaming micro-batches, tiny INSERTs) into
            # target-sized files; COW, so time travel still crosses the
            # compaction boundary and VACUUM reclaims the old files
            name = m.group(1)
            target = int(m.group(2)) if m.group(2) else 128 << 20
            before, after = cat.table(name).compact(target)
            self.spark.catalog.dropTempView(name)  # re-register next use
            # postings/stats reference file NAMES and inverted/bitmap
            # pruning is fail-closed — compacted files with no postings
            # would be falsely pruned (rows silently missing) without
            # the same refresh every other DML statement does
            self._refresh_index_stats(name)
            return self._status(
                status="ok", op="optimize", name=name,
                files_before=str(before), files_after=str(after),
            )
        if kind == "insert_into":
            name, rest = m.group(1), m.group(2).strip()
            cols = None
            # a leading paren group is a COLUMN LIST only when it is not
            # itself a query ("INSERT INTO t (SELECT …)" is a
            # parenthesized source, Postgres-style) and a source follows
            mcols = re.match(
                r"^\(\s*(?!(?:SELECT|VALUES|WITH|TABLE)\b)([\w\s,]+?)\s*\)\s*(.+)$",
                rest, re.DOTALL | re.IGNORECASE)
            if mcols:
                cols = [c.strip() for c in mcols.group(1).split(",")]
                rest = mcols.group(2)
            df = self.sql(rest)
            # positional → named: INSERT binds by position (actions.rs:604-652)
            names = cols or [f.name for f in cat.table(name).schema().fields]
            version = cat.table(name).insert(df.toDF(*names[: len(df.columns)]))
            self._refresh_index_stats(name)
            return self._status(status="ok", op="insert", name=name, version=str(version))
        if kind == "delete_from":
            # no WHERE = delete every row (test_lance_tables.py:89-91);
            # a present-but-empty predicate ("DELETE FROM t WHERE ") is
            # an error, not delete-all — only a truly absent clause
            # defaults
            name, pred = m.group(1), m.group(2)
            if pred is None:
                pred = "true"
            elif not pred.strip():
                raise ValueError("DELETE: empty WHERE predicate")
            version = cat.table(name).delete(pred)
            self._refresh_index_stats(name)
            return self._status(status="ok", op="delete", name=name, version=str(version))
        if kind == "update":
            name = m.group(1)
            sets, pred = _split_top_level_where(m.group(2))
            if pred is not None and not pred.strip():
                raise ValueError("UPDATE: empty WHERE predicate")
            assignments = {}
            for part in _split_top_level(sets):
                lhs, _, rhs = part.partition("=")
                assignments[lhs.strip()] = rhs.strip()
            version = cat.table(name).update(assignments, pred)
            self._refresh_index_stats(name)
            return self._status(status="ok", op="update", name=name, version=str(version))
        if kind == "alter_add":
            name, col, typ = m.group(1), m.group(2), m.group(3)
            cat.table(name).alter_add_column(col, typ.strip())
            return self._status(status="ok", op="alter_add", name=name)
        if kind == "alter_drop":
            name, col = m.group(1), m.group(2)
            cat.table(name).alter_drop_column(col)
            return self._status(status="ok", op="alter_drop", name=name)
        if kind == "alter_rename":
            name, old, new = m.group(1), m.group(2), m.group(3)
            cat.table(name).alter_rename_column(old, new)
            return self._status(status="ok", op="alter_rename", name=name)
        if kind == "create_view":
            replace, name, src = bool(m.group(1)), m.group(2), m.group(3)
            self.sql(src)  # validate eagerly, as the reference plans the view body
            cat.create_view(name, src, replace=replace)
            return self._status(status="ok", op="create_view", name=name)
        if kind == "create_mview":
            name, src = m.group(1), m.group(2)
            cat.create_materialized_view(name, src, self.sql(src))
            return self._status(status="ok", op="create_mview", name=name)
        if kind == "refresh":
            # the reference's REFRESH error contract
            # (create-materialized-view.md): unknown name vs
            # known-but-not-an-MV give distinct, clear errors
            name = m.group(1)
            mv_sql = cat.mv_sql(name)
            if mv_sql is None:
                names = cat.names()
                if any(name in names[k] for k in
                       ("tables", "external_tables", "views")):
                    raise ValueError(
                        f"Object '{name}' is not a materialized view")
                raise ValueError(
                    f"Materialized view '{name}' does not exist")
            cat.refresh_materialized_view(name, self.sql(mv_sql))
            return self._status(status="ok", op="refresh", name=name)
        if kind == "drop_view":
            # errors on a missing name unless IF EXISTS — mirroring
            # drop_table (silent success hid typos before)
            if_exists, name = bool(m.group(1)), m.group(2)
            names = cat.names()
            if (name not in names["views"]
                    and name not in names["materialized_views"]):
                if not if_exists:
                    raise ValueError(f"View '{name}' does not exist")
                return self._status(status="noop", op="drop_view", name=name)
            cat.drop_view(name)
            self.spark.catalog.dropTempView(name)
            return self._status(status="ok", op="drop_view", name=name)
        raise ValueError(f"unhandled ddl kind {kind}")

    def run_due_crawlers(self, now: float | None = None) -> list[tuple]:
        """One scheduler sweep (the reference's periodic re-discovery,
        ``beacon-core/src/crawler/discovery.rs:1-6`` + manager timer):
        run every crawler whose schedule interval has elapsed since its
        last run (never-run crawlers with a schedule are due
        immediately; crawlers without a schedule only run via RUN
        CRAWLER). Returns the combined discovery report rows."""
        import time as _time

        now = _time.time() if now is None else now
        out: list[tuple] = []
        for name, d in sorted(self.catalog._load()["crawlers"].items()):
            secs = d.get("schedule_secs")
            if secs is None:
                continue
            last = d.get("last_run")
            if last is not None and now - last < secs:
                continue
            out.extend(tuple(r) for r in self._run_crawler(name).collect())
        return out

    def start_crawler_scheduler(self, poll_secs: float = 30.0) -> None:
        """Background re-discovery: a daemon thread sweeping
        :meth:`run_due_crawlers` every ``poll_secs``. Embedded-mode analog
        of the reference's crawler manager timer. Idempotent."""
        import threading

        if getattr(self, "_crawler_thread", None) is not None:
            return
        self._crawler_stop = threading.Event()

        def _loop():
            while not self._crawler_stop.wait(poll_secs):
                try:
                    self.run_due_crawlers()
                except Exception:  # never kill the host app from a sweep
                    pass
                try:
                    from beacon_spark.streaming.ingest import run_due_streams

                    run_due_streams(self)
                except Exception:
                    pass

        self._crawler_thread = threading.Thread(
            target=_loop, name="beacon-crawler-scheduler", daemon=True
        )
        self._crawler_thread.start()

    def stop_crawler_scheduler(self) -> None:
        t = getattr(self, "_crawler_thread", None)
        if t is not None:
            self._crawler_stop.set()
            t.join(timeout=5)
            self._crawler_thread = None

    def _run_crawler(self, name: str) -> DataFrame:
        """RUN CRAWLER: discover files under the crawler's prefix and
        auto-register recognized ones as external tables (discovery loop,
        beacon-core/src/crawler/discovery.rs). Also the unit of work for
        the run_due_crawlers() scheduler sweep. Returns the report."""
        crawlers = self.catalog._load()["crawlers"]
        if name not in crawlers:
            raise ValueError(f"unknown crawler {name!r}")
        if self.datasets_root is None:
            raise ValueError("crawler needs a datasets_root")
        spec = crawlers[name]
        prefix = spec["prefix"]
        fmt_filter = spec.get("format_filter")
        naming = spec.get("table_naming", "file")
        known = self.catalog._load()
        # every catalog category: a crawler must never auto-register a
        # name that would shadow (or be shadowed by) a view/MV
        taken = (set(known["external_tables"]) | set(known["tables"])
                 | set(known["views"]) | set(known["materialized_views"]))
        report = []
        groups: dict[tuple[str, str], list[str]] = {}
        for rel, fmt in _paths.list_datasets(self.datasets_root):
            if prefix and not rel.startswith(prefix):
                continue
            if rel.startswith(".beacon"):
                continue
            if fmt_filter is not None and (fmt or "") not in fmt_filter:
                # dropped BEFORE the extension check, so filtered files
                # are not counted as skipped (test_crawlers_advanced.py:
                # skipped_files tracks only format mismatches)
                continue
            if fmt not in ("parquet", "csv", "arrow", "netcdf", "zarr", "odv"):
                report.append((rel, fmt or "unknown", "skipped"))
                continue
            if naming == "leaf_prefix":
                # one table per (full) leaf DIRECTORY, holding every
                # file of that format in it (the reference's leaf_prefix
                # naming: mixed/part1.parquet + part2.parquet -> table
                # "mixed"). Grouping keys on the whole dirname so
                # 2023/obs and 2024/obs never merge; ROOT-level files
                # have no directory to group by and keep per-file
                # naming (falling through below).
                parent = posixpath.dirname(rel)
                if parent:
                    groups.setdefault((parent, fmt), []).append(rel)
                    continue
            tname = re.sub(r"\W+", "_", rel.rsplit(".", 1)[0]).strip("_")
            if tname in taken:
                report.append((rel, fmt, "exists"))
                continue
            self.catalog.create_external_table(tname, fmt, [rel])
            taken.add(tname)
            report.append((rel, fmt, f"registered as {tname}"))
        # a leaf name qualifies with its full path only when two
        # distinct DIRECTORIES share it (a dir holding two formats is
        # still one directory)
        leaf_counts: dict[str, int] = {}
        for parent in {p for (p, _f) in groups}:
            leaf_counts[posixpath.basename(parent)] = (
                leaf_counts.get(posixpath.basename(parent), 0) + 1
            )
        for (parent, fmt), rels in sorted(groups.items()):
            leaf = posixpath.basename(parent)
            base_name = leaf if leaf_counts[leaf] == 1 else parent
            tname = re.sub(r"\W+", "_", base_name).strip("_")
            if tname in taken:
                report.append((";".join(sorted(rels)), fmt, "exists"))
                continue
            self.catalog.create_external_table(tname, fmt, sorted(rels))
            taken.add(tname)
            report.append(
                (";".join(sorted(rels)), fmt, f"registered as {tname}"))
        import time as _time

        self.catalog.touch_crawler(name, _time.time())
        return self.spark.createDataFrame(
            report, "path string, format string, action string"
        )

    _REMOTE_QUERY_RE = re.compile(
        r"\bremote_query\s*\(\s*'(\w+)'\s*,\s*'((?:[^']|'')*)'\s*\)",
        re.IGNORECASE,
    )

    def remote_query(self, alias: str, sql: str) -> DataFrame:
        """Push ``sql`` to the attached remote engine ``alias`` and return
        the result as a DataFrame — explicit-statement federation
        (remote/catalog.rs:1-11; see server/remote.py for the pushdown
        contract)."""
        self._register_catalog()
        rb = getattr(self, "_remotes", {}).get(alias)
        if rb is None:
            raise ValueError(f"no attached remote engine {alias!r}")
        return rb.query(self.spark, sql)

    def _register_remote_datasource(self) -> None:
        """One-time session setup for the federated-scan DataSource
        (server/remote_datasource.py): register the format + enable the
        Python-DS filter-pushdown planner hook."""
        if getattr(self, "_remote_ds_ready", False):
            return
        from beacon_spark.server.remote_datasource import RemoteTableDataSource
        from beacon_spark.sources.sqldb_datasource import SqlDbDataSource

        for ds in (RemoteTableDataSource, SqlDbDataSource):
            try:
                self.spark.dataSource.register(ds)
            except Exception:
                pass  # already registered by another Engine on this session
        self.spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        self._remote_ds_ready = True

    def _remote_scan_df(self, rb, tbl: str, statement: str) -> DataFrame:
        """Lazy federated scan of ``alias__tbl`` with pushdown:

        - projection: the DataSource schema is narrowed to the columns
          the statement's identifiers reference (safe over-approximation
          — ``*`` or an unparseable statement keeps the full schema), so
          the remote SELECT lists exactly those columns.
        - filters: Catalyst pushes supported predicates into the scan
          via ``pushFilters``; they execute in the remote's WHERE.

        The reference's FederationOptimizerRule does both rewrites at
        plan time (runtime_builder.rs:814-827); here Spark's own planner
        does the filter half and statement-time narrowing the column
        half."""
        from beacon_spark.server.guard import scrub_sql

        schema = rb.table_schema(tbl)
        blanked = scrub_sql(statement)
        if "*" not in blanked:
            idents = {w.lower() for w in re.findall(r"\w+", blanked)}
            narrowed = [f for f in schema.fields if f.name.lower() in idents]
            if narrowed:
                from pyspark.sql import types as _T

                schema = _T.StructType(narrowed)
        return (
            self.spark.read.format("beacon_remote")
            .schema(schema)
            .options(url=rb.location, table=tbl, token=rb._token or "")
            .load()
        )

    def _remote_table_df(self, url: str, opts: dict) -> DataFrame:
        """One remote table as a lazy federated scan — the STORED AS
        REMOTE external-table body (resolve_from). The connection is
        cached per (endpoint, token) so catalog re-registration doesn't
        reconnect; the token may arrive as ``token`` (CREATE-time
        probe) or ``password`` (the encrypted secret slot it is stored
        in)."""
        from beacon_spark.server.remote import RemoteBeacon, parse_remote_url

        base, _, tbl = url.rpartition("/")
        if parse_remote_url(base) is None or not tbl:
            raise ValueError(
                "STORED AS REMOTE location must be "
                "'beacon://host:port/<table>'"
            )
        token = opts.get("token") or opts.get("password") or None
        tls = str(opts.get("tls", "")).lower() == "true"
        cache = self._remote_tbl_conns = getattr(
            self, "_remote_tbl_conns", {})
        key = (base, token, tls)
        rb = cache.get(key)
        if rb is None:
            rb = cache[key] = RemoteBeacon(base, token=token, tls=tls)
        if tbl not in rb.list_tables():
            raise ValueError(f"remote engine has no table {tbl!r}")
        self._register_remote_datasource()
        return (
            self.spark.read.format("beacon_remote")
            .schema(rb.table_schema(tbl))
            .options(url=rb.location, table=tbl, token=token or "")
            .load()
        )

    def _resolve_remote(self, statement: str, has_params: bool = False) -> str:
        """SQL surface for attached remotes: ``remote_query('alias',
        'sql')`` pushes the statement down; a bare ``alias__table``
        reference becomes a LAZY federated scan (temp view over the
        beacon_remote DataSource) whose filters/projection push to the
        remote — never an eager SELECT * fetch. A read-only statement
        whose table references are ALL tables of ONE attached remote is
        pushed WHOLE as a single remote statement (the
        FederationOptimizerRule analog — see _federated_pushdown)."""
        remotes = getattr(self, "_remotes", {})
        if not remotes and not getattr(self, "_remote_ext", None):
            return statement

        def repl(m: re.Match) -> str:
            alias, rsql = m.group(1), m.group(2).replace("''", "'")
            rb = remotes.get(alias)
            if rb is None:
                raise ValueError(f"no attached remote engine {alias!r}")
            name = f"__remote_{alias}_{abs(hash(rsql)) % 10**10}"
            rb.query(self.spark, rsql).createOrReplaceTempView(name)
            self._remote_views = getattr(self, "_remote_views", {})
            self._remote_views.setdefault(alias, set()).add(name)
            return name

        statement = _sub_outside_literals(self._REMOTE_QUERY_RE, repl, statement)
        if not has_params:
            pushed = self._federated_pushdown(statement, remotes)
            if pushed is not None:
                return pushed
        # a BACKTICKED `alias__tbl` is still a reference that needs its
        # lazy view registered — skip only literals/comments here
        from beacon_spark.server.guard import sql_noncode_spans

        spans = sql_noncode_spans(statement, include_idents=False)
        for alias, rb in remotes.items():
            pat = re.compile(rf"\b{re.escape(alias)}__(\w+)\b")
            seen: set[str] = set()
            for m in pat.finditer(statement):
                tbl = m.group(1)
                if _in_literal(spans, m.start()) or tbl in seen:
                    continue
                seen.add(tbl)
                if tbl in rb.list_tables():
                    self._register_remote_datasource()
                    self._remote_scan_df(rb, tbl, statement).createOrReplaceTempView(
                        f"{alias}__{tbl}"
                    )
                    self._remote_views = getattr(self, "_remote_views", {})
                    self._remote_views.setdefault(alias, set()).add(
                        f"{alias}__{tbl}"
                    )
        return statement

    #: clauses that REDUCE rows remotely — worth pushing even a
    #: single-table statement whole (the per-table scan path already
    #: pushes filters/projection, but not aggregation or top-k); a
    #: global aggregate with no GROUP BY is the maximal reducer
    _FED_REDUCE_RE = re.compile(
        r"\b(group\s+by|order\s+by|limit|distinct)\b"
        r"|\b(count|sum|avg|min|max|approx_count_distinct|stddev|"
        r"variance|corr|first|last|percentile(?:_approx)?)\s*\(",
        re.IGNORECASE,
    )

    def _federated_pushdown(self, statement: str, remotes) -> str | None:
        """FederationOptimizerRule analog (reference
        beacon-core/src/runtime_builder.rs:814-827,
        statement_plan/query_planner.rs:38-45): when a read-only
        SELECT/WITH statement's table references are ALL tables of ONE
        attached remote (or statement-local CTE names), ship the WHOLE
        statement to that remote as a single lazy ``beacon_remote``
        scan — the join/aggregation executes remotely and only RESULT
        rows cross the wire, instead of two full table scans joined
        locally.

        Applies when the statement references ≥2 distinct remote tables
        (a cross-table join) or contains a row-reducing clause
        (GROUP BY / ORDER BY / LIMIT / DISTINCT); plain single-table
        filter/projection statements keep the existing per-table
        pushFilters path (plan-pinned in tests/test_plans.py).

        Remote references group by ENDPOINT (grpc location + token):
        ATTACH aliases and STORED AS REMOTE external tables of the same
        server+principal push together — including two aliases of one
        endpoint, and ext-table joins with no ATTACH at all. Returns
        the rewritten statement, or ``None`` to fall back — any mixed
        local/remote reference, multi-endpoint reference, unparseable
        table position, or remote planning failure falls back safely.
        """
        from beacon_spark.server.guard import is_readonly_sql

        if not re.match(r"^\s*(select|with)\b", statement, re.IGNORECASE):
            return None
        if not is_readonly_sql(statement):
            return None
        spans = _literal_spans(statement)
        idents = _table_position_idents(statement, spans)
        if idents is None:
            return None
        # names a WITH clause (or window list) defines inside the
        # statement travel with it — they are not local references
        ctes = {
            m.group(1).lower()
            for m in re.finditer(
                # NB: a plain \b before ',' never matches after ')', so
                # the comma alternative is spelled without it — second
                # and later CTEs (`), b AS (`) must be recognized too
                r"(?:\bwith\s+|,\s*)(\w+)\s+as\s*\(",
                statement, re.IGNORECASE,
            )
            if not _in_literal(spans, m.start())
        }
        # endpoint key = (grpc location, token): ATTACH aliases and
        # STORED AS REMOTE external tables of the SAME server+principal
        # group together — two aliases to one endpoint still push
        rext = self._remote_ext_endpoints()
        refs: list[tuple[tuple, str]] = []  # (endpoint_key, remote table)
        for ident, _s, _e in idents:
            if ident.lower() in ctes:
                continue
            hit = None
            if ident in rext:
                key, tbl = rext[ident]
                hit = (key, tbl)
            else:
                for alias, rb in remotes.items():
                    pre = alias + "__"
                    if ident.startswith(pre) and \
                            ident[len(pre):] in rb.list_tables():
                        hit = ((rb.location, rb._token), ident[len(pre):])
                        break
            if hit is None:
                return None  # a local (or unknown-remote) table — bail
            refs.append(hit)
        if not refs:
            return None
        keys = {k for k, _ in refs}
        if len(keys) != 1:
            return None  # two different endpoints/principals — join locally
        key = keys.pop()
        rb = next(
            (r for r in remotes.values() if (r.location, r._token) == key),
            None,
        )
        if rb is None:
            rb = self._remote_conn(*key)
        if any(tbl not in rb.list_tables() for _, tbl in refs):
            return None
        if len({t for _, t in refs}) < 2:
            from beacon_spark.server.guard import scrub_sql

            if not self._FED_REDUCE_RE.search(scrub_sql(statement)):
                return None
        # Span-based substitution over the ORIGINAL statement: remote
        # names are swapped in ONLY at the table-position spans the
        # scanner identified, plus qualified column prefixes
        # (``lake__t.col`` → ``t.col``). A column or SELECT alias that
        # merely shares an ext-table's name is left untouched — a
        # statement-wide \b-regex used to rename those too, and when the
        # renamed text was coincidentally valid on the remote the query
        # silently returned wrong data. All edits are computed against
        # the original text, so per-name passes can never chain
        # (x→y then y→z).
        alias_names = sorted(a for a, r in remotes.items()
                             if (r.location, r._token) == key)
        ext_map = {n: t for n, (k, t) in rext.items() if k == key}
        remote_tables = rb.list_tables()

        def _remote_name(ident: str) -> str | None:
            if ident in ext_map:
                return ext_map[ident]
            for a in alias_names:
                pre = a + "__"
                if ident.startswith(pre) and ident[len(pre):] in remote_tables:
                    return ident[len(pre):]
            return None

        edits: list[tuple[int, int, str]] = []
        renamed: set[str] = set()
        for ident, s, e in idents:
            if ident.lower() in ctes:
                # a statement-local CTE shadows any same-named remote
                # table; renaming its FROM reference (but not its WITH
                # definition) would silently read the wrong table
                continue
            t = _remote_name(ident)
            if t is not None and t != ident:
                if t.lower() in ctes:
                    # the rename TARGET collides with a statement-local
                    # CTE name: on the remote, `FROM <t>` would resolve
                    # to the shipped CTE instead of the remote table —
                    # silently wrong results. Join locally instead.
                    return None
                edits.append((s, e, t))
                renamed.add(ident)
        if renamed:
            qpat = re.compile(
                r"\b(" + "|".join(map(re.escape, sorted(renamed)))
                + r")(?=\s*\.)")
            taken = [(s, e) for s, e, _ in edits]
            for m in qpat.finditer(statement):
                if _in_literal(spans, m.start()):
                    continue
                if any(s <= m.start() < e for s, e in taken):
                    continue
                edits.append((m.start(), m.end(), _remote_name(m.group(1))))
        remote_sql = statement
        for s, e, t in sorted(edits, reverse=True):
            remote_sql = remote_sql[:s] + t + remote_sql[e:]
        try:
            schema = rb.query_schema(remote_sql)  # LIMIT-0 plan, no data
        except Exception:
            return None  # the remote can't plan it — per-table fallback
        self._register_remote_datasource()
        name = f"__fed_{abs(hash((key, remote_sql))) % 10**10}"
        (
            self.spark.read.format("beacon_remote")
            .schema(schema)
            .options(url=rb.location, sql=remote_sql, token=rb._token or "")
            .load()
            .createOrReplaceTempView(name)
        )
        self._remote_views = getattr(self, "_remote_views", {})
        self._remote_views.setdefault("__federated__", set()).add(name)
        return f"SELECT * FROM {name}"

    def _remote_ext_endpoints(self) -> dict:
        """STORED AS REMOTE external tables → {name: ((location, token),
        remote_table)} — populated from the registry _register_catalog
        maintains (tokens already decrypted there)."""
        from beacon_spark.server.remote import parse_remote_url

        out = {}
        for name, (url, token, tls) in getattr(
                self, "_remote_ext", {}).items():
            base, _, tbl = url.rpartition("/")
            loc = parse_remote_url(base)
            if loc is None or not tbl:
                continue
            if tls and loc.startswith("grpc://"):
                loc = "grpc+tls://" + loc[len("grpc://"):]
            out[name] = ((loc, token), tbl)
        return out

    def _remote_conn(self, location: str, token: str | None):
        """Cached RemoteBeacon per (endpoint, principal) for federated
        pushdown over STORED AS REMOTE tables with no ATTACH."""
        cache = self._fed_conns = getattr(self, "_fed_conns", {})
        rb = cache.get((location, token))
        if rb is None:
            from beacon_spark.server.remote import RemoteBeacon

            rb = cache[(location, token)] = RemoteBeacon(
                location, token=token)
        return rb

    def _nd_sql_columns(self, fmt, globs, dims, statement) -> list | None:
        """Referenced-variable set for SQL nd projection, FAIL-OPEN.

        Spark's Python DataSource has no column-pruning hook (the
        reader receives the full schema even under a narrow SELECT —
        verified on 4.1), so decode projection must be derived from
        the statement itself. A store variable is droppable only when
        its name appears NOWHERE in the statement as an identifier
        token — over-inclusion merely decodes extra columns, and any
        shape that could reference columns namelessly (``*`` anywhere,
        NATURAL joins) disables projection outright. Dotted tokens
        split into parts so an alias-qualified ``t.time`` keeps
        ``time`` and a backquoted ``\\`geo.lat\\``` keeps itself AND
        its variable; attribute columns (``var.attr``) ride flatten's
        variable-level filter the same way."""
        blanked = _noncode_blanked(statement)
        if "*" in blanked or re.search(r"\bnatural\b", blanked, re.I):
            return None
        tokens: set[str] = set()

        def add(tok: str) -> None:
            tokens.add(tok.lower())
            for part in tok.split("."):
                if part:
                    tokens.add(part.lower())

        for t in re.findall(r"[A-Za-z_]\w*(?:\.\w+)*", blanked):
            add(t)
        # backtick identifiers are non-code to the lexer scrub — pull
        # them from the ORIGINAL text (`` = an escaped backtick)
        for bq in re.findall(r"`((?:[^`]|``)+)`", statement):
            add(bq.replace("``", "`"))
        # under spark.sql.ansi.doubleQuotedIdentifiers=true, "var" is an
        # identifier the scrub blanked as a string literal — harvest
        # double-quoted spans too; over-inclusion only keeps an extra
        # variable decoded, so this is safe when they really are strings
        for dq in re.findall(r'"((?:[^"]|"")+)"', statement):
            add(dq.replace('""', '"'))
        from beacon_spark.sources.nd import _OPENERS
        from beacon_spark.sources.paths import resolve_globs

        sample = resolve_globs(globs, self.datasets_root)[0]
        if fmt == "atlas":
            from beacon_spark.sources.atlaslite import (
                DATASET_SEP,
                list_datasets,
            )

            if DATASET_SEP not in sample:
                names = list_datasets(sample)
                if not names:
                    return None
                sample = f"{sample}{DATASET_SEP}{names[0]}"
        variables = list(_OPENERS[fmt](sample).variables)
        cols = [v for v in variables if v.lower() in tokens]
        if not cols or len(cols) == len(variables):
            # nothing referenced (count(1)-style) or everything is —
            # either way the full flatten is the right plan
            return None
        return cols

    def _register_nd_view(self, fmt, globs, dims, statement) -> str:
        """Temp view over ``spark.read.format("beacon_nd")`` for a SQL
        ``read_netcdf/zarr/tiff/atlas/hdf5`` call: WHERE comparisons
        reach NDReader.pushFilters (chunk-grid pruning + atlas dataset
        stats pruning at plan time) and the statement's referenced
        variables bound what decodes — the same pruned plan the DSL
        and DataFrame surfaces already get."""
        from beacon_spark.sources.nd_datasource import register_nd_datasource

        register_nd_datasource(self.spark)
        try:
            cols = self._nd_sql_columns(fmt, globs, dims, statement)
        except Exception:
            cols = None  # projection is an optimization, never a gate
        reader = (
            self.spark.read.format("beacon_nd")
            .option("fmt", fmt)
            .option("paths", json.dumps(list(globs)))
            # partitions() runs in a plan-time Python worker without a
            # SparkSession — ship the cluster parallelism for the
            # scale-adaptive task sizing (nd_datasource.NDReader)
            .option("parallelism",
                    str(self.spark.sparkContext.defaultParallelism))
        )
        if self.datasets_root:
            reader = reader.option("datasets_root", self.datasets_root)
        if dims:
            reader = reader.option("dimensions", ",".join(dims))
        if cols is not None:
            reader = reader.option("columns", json.dumps(cols))
        rpt = self.spark.conf.get("spark.beacon.nd.rowsPerTask", None)
        if rpt:
            reader = reader.option("rows_per_task", rpt)
        # compute the schema DRIVER-SIDE and hand it to the reader:
        # without it Spark spawns a plan-time Python worker just to call
        # DataSource.schema() (worker spawn + imports + metadata open +
        # 1-row flatten) — a measured ~0.15s fixed cost per SQL nd query
        # (r14 verdict #8); the IDENTICAL code path runs in-process at
        # the DSL planner's ~0.01s. Fail-open: any error falls back to
        # worker-side inference (schema is an optimization, never a gate).
        try:
            from beacon_spark.sources.nd_datasource import BeaconNDDataSource

            opts = {"fmt": fmt, "paths": json.dumps(list(globs))}
            if self.datasets_root:
                opts["datasets_root"] = self.datasets_root
            if dims:
                opts["dimensions"] = ",".join(dims)
            if cols is not None:
                opts["columns"] = json.dumps(cols)
            reader = reader.schema(BeaconNDDataSource(opts).schema())
        except Exception:
            pass
        df = reader.load()
        name = (
            f"__beacon_read_"
            f"{abs(hash((self.datasets_root, fmt, tuple(globs), tuple(dims or ()), tuple(cols or ()), rpt))) % 10**10}"
        )
        df.createOrReplaceTempView(name)
        return name

    def _rewrite_read_fns(self, statement: str) -> str:
        """Replace ``read_*('glob' [, 'glob'...])`` table functions with
        temp views backed by the matching reader (the reference registers
        these as UDTFs — beacon-functions/src/file_formats/mod.rs:21-107)."""

        def repl(m: re.Match) -> str:
            fmt = m.group(1).lower()
            bracketed = m.group(2) is not None
            arglist = m.group(2) if bracketed else m.group(3)
            tail = m.group(4) or ""
            # each glob is one quoted string — a comma INSIDE a quoted
            # path (a legal filename character) must not split it
            globs = re.findall(r"'([^']*)'", arglist)
            # a bracketed tail list = the nd readers' DIMENSIONS
            # (read_netcdf(['…'], ['time', 'pressure']))
            dims_m = re.search(r"\[(.*?)\]", tail)
            dims = (re.findall(r"'([^']*)'", dims_m.group(1))
                    if dims_m else None)
            if dims_m:
                tail = tail[:dims_m.start()] + tail[dims_m.end():]
            extras = re.findall(r"'([^']*)'|(\d+)", tail)
            if dims is not None and fmt not in (
                    "netcdf", "hdf5", "zarr", "tiff", "atlas"):
                raise ValueError(
                    f"read_{fmt} takes no dimensions list")
            if fmt == "csv":
                # read_csv(paths[, delimiter[, infer_records]])
                # (table-functions.md): in the BARE form only the first
                # string is the path list; trailing strings/ints are the
                # options
                if not bracketed and len(globs) > 1:
                    extras = [(g, "") for g in globs[1:]] + extras
                    globs = globs[:1]
                delimiter = None
                infer_records = None
                for s, n in extras:
                    if n:
                        infer_records = int(n)
                    elif delimiter is None:
                        # the raw SQL text of '\t' is backslash+t — decode
                        # the common escapes the way Spark's lexer would
                        delimiter = {"\\t": "\t", "\\n": "\n",
                                     "\\r": "\r", "\\\\": "\\"}.get(s, s)
                    else:
                        raise ValueError(
                            f"read_csv: unexpected argument {s!r}")
                df = self.read_csv(globs, delimiter,
                                   infer_records=infer_records)
                name = (f"__beacon_read_{abs(hash((self.datasets_root, fmt, tuple(globs), delimiter, infer_records))) % 10**10}")
                df.createOrReplaceTempView(name)
                return name
            if fmt in ("delta", "iceberg"):
                # read_delta(location[, version_or_timestamp]) /
                # read_iceberg(location[, snapshot_id]) — the second
                # argument used to be silently DROPPED (quoted form) so
                # time travel read the latest version instead
                tt = globs[1] if len(globs) > 1 else None
                for s, n_ in extras:
                    tt = n_ or s
                if fmt == "delta":
                    if tt is None:
                        df = self.read_delta(globs[0])
                    elif re.fullmatch(r"\d+", str(tt)):
                        df = self.read_delta(globs[0], int(tt))
                    else:
                        df = self.read_delta(globs[0], timestamp_as_of=tt)
                else:
                    df = self.read_iceberg(
                        globs[0], int(tt) if tt is not None else None)
                name = (f"__beacon_read_"
                        f"{abs(hash((self.datasets_root, fmt, tuple(globs), str(tt)))) % 10**10}")
                df.createOrReplaceTempView(name)
                return name
            if extras:
                raise ValueError(
                    f"read_{fmt} takes only path arguments, got extras: "
                    f"{tail.strip()!r}")
            if fmt in ("netcdf", "hdf5", "zarr", "tiff", "atlas"):
                # SQL surface of the nd readers rides the beacon_nd
                # DataSource so a WHERE on a coordinate variable drives
                # chunk-grid pruning at plan time (pushFilters →
                # coord_region) and the statement's referenced-variable
                # set drives decode projection — the reference's
                # 'predicate pushdown is automatic' SQL contract
                # (docs/docs/2.0.0-rc2/sql/table-functions.md:79-83,
                # beacon-arrow-zarr/src/datafusion/source.rs:165-305).
                # Any failure falls back to the eager read_nd plan
                # (full-store scan, residual Spark filter — correct,
                # just unpruned).
                try:
                    return self._register_nd_view(
                        fmt, globs, dims, statement)
                except Exception:
                    pass
            if dims is not None:
                df = {
                    "netcdf": self.read_netcdf,
                    "hdf5": self.read_netcdf,
                    "zarr": self.read_zarr,
                    "tiff": self.read_tiff,
                    "atlas": self.read_atlas,
                }[fmt](globs, dims)
            else:
                df = {
                    "parquet": self.read_parquet,
                    "csv": self.read_csv,
                    "arrow": self.read_arrow,
                    "netcdf": self.read_netcdf,
                    "zarr": self.read_zarr,
                    "hdf5": self.read_netcdf,
                    "odv": self.read_odv,
                    "odv_ascii": self.read_odv,
                    "delta": lambda gs: self.read_delta(gs[0]),
                    "iceberg": lambda gs: self.read_iceberg(gs[0]),
                    "tiff": self.read_tiff,
                    "atlas": self.read_atlas,
                    "geoparquet": self.read_geoparquet,
                }[fmt](globs)
            name = (f"__beacon_read_"
                    f"{abs(hash((self.datasets_root, fmt, tuple(globs), tuple(dims or ())))) % 10**10}")
            df.createOrReplaceTempView(name)
            return name

        return _sub_outside_literals(_READ_FN_RE, repl, statement)

    def _rewrite_try_arrow_cast(self, statement: str) -> str:
        """try_arrow_cast(expr, 'ArrowType') → try_cast(expr AS sparktype).

        Paren matching and the expr/type split run on the shared-lexer
        scrub: a ``)`` inside a string literal can't end the argument
        list early, and a comma inside the expr (or a parametrized type
        like ``Decimal128(10, 2)``) can't split in the wrong place —
        the TYPE is the last top-level argument, whole."""
        if "try_arrow_cast" not in statement.lower():
            return statement
        out = []
        pos = 0
        blanked = _noncode_blanked(statement)
        for m in _TRY_ARROW_CAST_RE.finditer(blanked):
            if m.start() < pos:
                continue  # nested inside an already-consumed call
            start = m.end()  # after the open paren
            i = _matching_paren_end(blanked, start)
            if i < 0:
                raise ValueError("try_arrow_cast: unbalanced parentheses")
            inner = statement[start:i - 1]
            args = _split_top_level(inner)
            if len(args) < 2:
                raise ValueError(
                    f"try_arrow_cast takes (expr, 'ArrowType'): {inner!r}")
            # a nested try_arrow_cast inside the expr rewrites too
            expr = self._rewrite_try_arrow_cast(", ".join(args[:-1]))
            type_name = args[-1].strip().strip("'\"")
            spark_type = _arrow_name_to_spark(type_name)
            out.append(statement[pos:m.start()])
            out.append(f"try_cast({expr} AS {spark_type})")
            pos = i
        out.append(statement[pos:])
        return "".join(out)

    def _rewrite_macros(self, statement: str) -> str:
        """Inline SQL macros for functions that would otherwise need a
        python UDF in the SQL path — each expands to plain arithmetic and
        stays in whole-stage codegen:

        - ``pressure_to_depth_teos_10(p, lat)``
        - ``date_bin(INTERVAL 'n unit', ts[, origin])`` (DataFusion's
          temporal binning, function-reference.md — Spark has no date_bin)
        """
        from beacon_spark.functions.domain import pressure_to_depth_sql

        def expand(name: str, render) -> None:
            nonlocal statement
            if name not in statement.lower():
                return  # cheap guard: skip the lexer pass entirely
            rx = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
            while True:
                # search + paren-match on the shared-lexer scrub: a
                # macro name or a ')' inside a string literal can
                # neither trigger an expansion nor end one early
                blanked = _noncode_blanked(statement)
                m = rx.search(blanked)
                if not m:
                    return
                start = m.end()
                i = _matching_paren_end(blanked, start)
                if i < 0:
                    raise ValueError(f"{name}: unbalanced parentheses")
                args = _split_top_level(statement[start:i - 1])
                statement = statement[: m.start()] + render(args) + statement[i:]

        def render_depth(args: list[str]) -> str:
            if len(args) != 2:
                raise ValueError("pressure_to_depth_teos_10 takes (pressure, latitude)")
            return pressure_to_depth_sql(args[0], args[1])

        def render_date_bin(args: list[str]) -> str:
            if len(args) not in (2, 3):
                raise ValueError("date_bin takes (stride, ts[, origin])")
            mi = re.match(
                r"(?i)^\s*INTERVAL\s+'(\d+)\s*(\w+?)s?'\s*$", args[0]
            )
            if not mi:
                raise ValueError(f"date_bin stride must be INTERVAL 'n unit': {args[0]}")
            n, unit = int(mi.group(1)), mi.group(2).lower()
            us_per = {
                "microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
                "minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000,
                "week": 7 * 86_400_000_000,
            }
            if unit not in us_per:
                raise ValueError(f"date_bin: unsupported unit {unit!r}")
            stride = n * us_per[unit]
            origin = (
                f"unix_micros(CAST({args[2]} AS TIMESTAMP))"
                if len(args) == 3
                else "0"
            )
            t = f"unix_micros(CAST({args[1]} AS TIMESTAMP))"
            return (
                f"timestamp_micros(CAST(floor(({t} - {origin}) / {stride}) AS BIGINT)"
                f" * {stride} + {origin})"
            )

        def rename_agg(spark_name: str, arity=(1,)):
            # DataFusion aggregate names Spark spells differently —
            # aggregates can't be SQL UDFs, so the SQL path renames at
            # macro time (function-reference.md inherits all DataFusion
            # aggregates: APPROX_PERCENTILE_CONT / APPROX_DISTINCT /
            # APPROX_MEDIAN)
            def render(args: list[str]) -> str:
                if len(args) not in arity:
                    raise ValueError(
                        f"{spark_name}: got {len(args)} args, want {arity}")
                return f"{spark_name}({', '.join(a.strip() for a in args)})"

            return render

        expand("pressure_to_depth_teos_10", render_depth)
        expand("date_bin", render_date_bin)
        # approx_percentile_cont's optional 3rd arg is the t-digest
        # centroid count — Spark's approx_percentile 3rd arg (accuracy)
        # plays the same precision-knob role, so it passes through
        expand("approx_percentile_cont",
               rename_agg("approx_percentile", (2, 3)))
        expand("approx_distinct", rename_agg("approx_count_distinct"))

        def render_approx_median(args: list[str]) -> str:
            if len(args) != 1:
                raise ValueError(
                    f"approx_median: got {len(args)} args, want (1,)")
            return f"approx_percentile({args[0].strip()}, 0.5)"

        expand("approx_median", render_approx_median)

        # DataFusion array functions are POLYMORPHIC (the element type
        # rides through), so they rename at macro time rather than as
        # typed SQL UDFs. array_element/list_extract map onto
        # try_element_at — DataFusion returns NULL out of bounds, and
        # Spark 4's ANSI-default element_at would error instead.
        # (DataFusion's end-exclusive range() is NOT renamed: Spark's
        # range() table function owns the name in FROM position —
        # generate_series covers the documented inclusive form.)
        def render_array_length(args: list[str]) -> str:
            if len(args) == 1:
                return f"size({args[0].strip()})"
            if len(args) == 2:
                # dimension argument: 1-D arrays only — other dims NULL
                return (f"(CASE WHEN ({args[1].strip()}) = 1 "
                        f"THEN size({args[0].strip()}) END)")
            raise ValueError(
                f"array_length: got {len(args)} args, want 1 or 2")

        def render_array_concat(args: list[str]) -> str:
            if len(args) < 2:
                raise ValueError("array_concat takes 2+ arrays")
            return f"concat({', '.join(a.strip() for a in args)})"

        expand("array_length", render_array_length)
        expand("array_has", rename_agg("array_contains", (2,)))
        expand("array_element", rename_agg("try_element_at", (2,)))
        expand("list_extract", rename_agg("try_element_at", (2,)))
        expand("array_dims",
               lambda args: f"array(size({args[0].strip()}))")
        expand("generate_series", rename_agg("sequence", (2, 3)))
        expand("array_to_string", rename_agg("array_join", (2, 3)))
        expand("array_concat", render_array_concat)
        expand("arrow_typeof",
               lambda args: f"__arrow_typename(typeof({args[0].strip()}))")
        return statement

    def _rewrite_extract_fields(self, statement: str) -> str:
        """DataFusion/Postgres EXTRACT fields Spark numbers differently
        or lacks (DIVERGENCES #15/#16, closed r14):

        - ``EXTRACT(DOW FROM x)`` / ``date_part('dow', x)`` /
          ``datepart('dow', x)`` (the reference's documented alias) —
          the reference numbers Sunday=0..Saturday=6 (Postgres),
          Spark's native DOW is Sunday=1..7 → ``dayofweek(x) - 1``;
        - ``EXTRACT(EPOCH FROM x)`` / ``date_part('epoch', x)`` /
          ``datepart('epoch', x)`` — fractional seconds since the
          epoch; not a Spark extract field →
          ``unix_micros(CAST(x AS TIMESTAMP)) / 1e6``.

        Every other field passes through to Spark's native
        EXTRACT/date_part/datepart (Spark accepts the 2-arg quoted
        form for all three spellings). Paren matching and
        string-literal blanking ride the shared lexer scrub, same as
        the macro expander."""
        low = statement.lower()
        if ("extract" not in low and "date_part" not in low
                and "datepart" not in low):
            return statement
        rx = re.compile(r"\b(extract|date_part|datepart)\s*\(",
                        re.IGNORECASE)
        pos = 0
        while True:
            blanked = _noncode_blanked(statement)
            m = rx.search(blanked, pos)
            if not m:
                return statement
            start = m.end()
            end = _matching_paren_end(blanked, start)
            if end < 0:
                return statement  # malformed — let Spark's parser raise
            inner = statement[start:end - 1]
            field = expr = None
            if m.group(1).lower() == "extract":
                fm = re.match(r"(?is)^\s*(\w+)\s+FROM\s+(.*)$", inner)
                if fm:
                    field, expr = fm.group(1).lower(), fm.group(2)
            else:
                args = _split_top_level(inner)
                if len(args) == 2:
                    am = re.match(r"(?i)^\s*'(\w+)'\s*$", args[0])
                    if am:
                        field, expr = am.group(1).lower(), args[1]
            if field == "dow":
                repl = f"(dayofweek({expr}) - 1)"
            elif field == "epoch":
                # CAST to DOUBLE first: bigint / decimal-literal would
                # yield DECIMAL where the reference returns Float64
                repl = (f"(CAST(unix_micros(CAST(({expr}) AS TIMESTAMP))"
                        f" AS DOUBLE) / 1000000.0)")
            else:
                pos = m.end()  # native Spark field (or not a field call)
                continue
            statement = statement[:m.start()] + repl + statement[end:]
            # rescan from the splice: expr itself may contain another
            # extract/date_part; the replacement text never re-matches
            pos = m.start()

    def _rewrite_numeric_trunc(self, statement: str) -> str:
        """DataFusion's numeric ``trunc(x[, d])`` (DIVERGENCES #3):
        Spark's builtin ``trunc(date, fmt)`` shadows the name, so the
        numeric form was simply unavailable. The rewrite is strictly
        ADDITIVE: it only fires on shapes Spark's trunc would REJECT
        anyway (one argument, or a non-string-literal second argument —
        Spark requires a string format), so no working query changes.
        Truncation toward zero via ``x - x % 1`` (magnitude-safe where
        a BIGINT cast would overflow ANSI-style); ``nanvl`` restores
        ±inf (inf % 1 is NaN)."""
        if "trunc" not in statement.lower():
            return statement
        rx = re.compile(r"(?<![\w.])trunc\s*\(", re.IGNORECASE)
        pos = 0
        while True:
            blanked = _noncode_blanked(statement)
            m = rx.search(blanked, pos)
            if not m:
                return statement
            start = m.end()
            end = _matching_paren_end(blanked, start)
            if end < 0:
                return statement
            args = _split_top_level(statement[start:end - 1])
            if len(args) == 2 and re.match(r"^\s*'", args[1]):
                pos = m.end()  # Spark's native trunc(date, 'fmt')
                continue
            if len(args) not in (1, 2):
                pos = m.end()
                continue
            a = f"CAST(({args[0]}) AS DOUBLE)"
            if len(args) == 1:
                repl = f"nanvl({a} - ({a} % 1), {a})"
            else:
                s = f"power(10, CAST(({args[1]}) AS INT))"
                repl = (f"nanvl(({a} * {s} - (({a} * {s}) % 1)) / {s}, "
                        f"{a})")
            statement = statement[:m.start()] + repl + statement[end:]
            pos = m.start()

    def _rewrite_qualify(self, statement: str) -> str:
        """``QUALIFY <pred>`` (docs sql/index.md:46-48 — DataFusion dialect)
        → filter over a computed window column. The predicate (which may be
        a window expression or reference select aliases) becomes an extra
        select item on the inner query, filtered then dropped:

          SELECT ... FROM t QUALIFY p [ORDER BY/LIMIT tail]
          ⇒ SELECT * EXCEPT (__q) FROM
              (SELECT __orig.*, (p) AS __q FROM (SELECT ...) __orig) __f
            WHERE __q [tail]

        A QUALIFY nested in a CTE body or subquery rewrites too: the
        enclosing paren group's body is rewritten recursively (innermost
        first), so ``WITH a AS (… QUALIFY rn=1) SELECT …`` works.

        Limitation: a window in the predicate may only reference columns
        the inner select exposes (true for alias-style and self-contained
        QUALIFY, the documented uses)."""
        blanked = _noncode_blanked(statement)
        m = _QUALIFY_RE.search(blanked)
        if not m:
            return statement
        depth = blanked[:m.start()].count("(") - blanked[:m.start()].count(")")
        if depth > 0:
            # rewrite the ENCLOSING paren group's body on its own, then
            # re-scan the whole statement (each pass consumes one
            # QUALIFY keyword, so this terminates)
            bal = 0
            open_idx = -1
            for i in range(m.start() - 1, -1, -1):
                ch = blanked[i]
                if ch == ")":
                    bal += 1
                elif ch == "(":
                    if bal == 0:
                        open_idx = i
                        break
                    bal -= 1
            if open_idx < 0:
                return statement  # unbalanced — don't guess
            end = _matching_paren_end(blanked, open_idx + 1)
            if end < 0:
                return statement
            inner_sql = self._rewrite_qualify(statement[open_idx + 1:end - 1])
            return self._rewrite_qualify(
                statement[:open_idx + 1] + inner_sql + statement[end - 1:]
            )
        inner = statement[: m.start()].rstrip()
        rest = statement[m.end():].strip().rstrip(";")
        # predicate runs until an ORDER BY / LIMIT / OFFSET at paren
        # depth 0 — found on the shared-lexer scrub, so an ORDER BY
        # inside OVER(...) and a 'LIMIT' inside a string literal both
        # belong to the predicate
        km = re.search(
            r"\b(ORDER\s+BY|LIMIT|OFFSET)\b",
            _top_level_blanked(rest), re.IGNORECASE,
        )
        split_at = km.start() if km else None
        pred = rest[:split_at].strip() if split_at is not None else rest
        tail = " " + rest[split_at:] if split_at is not None else ""
        return (
            f"SELECT * EXCEPT (__q) FROM "
            f"(SELECT __orig.*, ({pred}) AS __q FROM ({inner}) __orig) __f "
            f"WHERE __q{tail}"
        )

    # ------------------------------------------------------------ json dsl

    def query(self, body: dict[str, Any], output_path: str | None = None,
              user: str | None = None) -> DataFrame:
        """JSON query DSL (or ``{"sql": ...}``) → DataFrame — the two forms
        compile to the same plans (README.md:117-119). An ``output`` block
        (``{"format": ..., ...options}``) plus ``output_path`` writes the
        result in the requested format (query/output.rs). ``user`` gates
        the query through RBAC (auth.authorize_dsl — exact target
        checks: the DSL's ``from`` names its tables/paths)."""
        body = dict(body)
        if user is not None and self.catalog is not None:
            from beacon_spark import auth as _auth

            if "sql" not in body:
                _auth.authorize_dsl(self, body, user)
            elif body.get("output") or output_path:
                # the sql branch must gate output blocks exactly like
                # the DSL branch: file output is a write
                _auth.require_super(
                    self, user,
                    "operation not permitted: query file output requires "
                    "super-user privileges",
                )
        output = body.pop("output", None)
        df = (
            self.sql(body["sql"], user=user)
            if "sql" in body
            else dsl.compile_query(self, body)
        )
        if output is not None and output_path is not None:
            from beacon_spark.outputs import write_output

            opts = {k: v for k, v in output.items() if k != "format"}
            write_output(df, output["format"], output_path, **opts)
        return df

    def _pruned_managed_read(
        self, name: str, ranges, terms=None, eqs=None
    ) -> "DataFrame | None":
        """Index-backed file pruning for managed tables, fail-open:

        - btree index + numeric value ranges -> file-stats min/max pruning
        - inverted index + ``contains``/LIKE terms -> token-posting
          pruning (substring-of-token match: every query piece must have
          a posted token containing it for a file to survive;
          managed.py:inverted_prune)
        - bitmap index + eq / OR-of-eq clauses -> value-posting pruning
          (type-gated: string values against string columns, int values
          against integral columns — representation mismatches would
          falsely prune; managed.py:bitmap_prune)

        All prune the FILE LIST before the scan opens; when several
        apply the survivor set is the intersection. Returns None when no
        index narrows anything — caller falls back to the registered
        view."""
        if (
            (not ranges and not terms and not eqs)
            or self.datasets_root is None
            or self.catalog is None
        ):
            return None
        try:
            c = self.catalog._load()
        except Exception:
            return None
        path = c.get("tables", {}).get(name)
        if not path:
            return None
        from beacon_spark.managed import ManagedTable
        from beacon_spark.schema import align_to_schema
        from beacon_spark.stats import prune_files

        mt = ManagedTable(self.spark, path)
        files = mt.files()
        survivors = files
        if ranges and any(
            d["table"] == name
            and d["using"] == "btree"
            # multi-column (Z-order) indexes: any member column's range
            # prunes — files are value hyper-rectangles on all of them
            and any(col in ranges for col in d["column"].split(","))
            for d in c.get("indexes", {}).values()
        ):
            survivors = prune_files(self.datasets_root, survivors, ranges)
        if terms:
            for iname, d in c.get("indexes", {}).items():
                if (
                    d["table"] == name
                    and d["using"] == "inverted"
                    and d["column"] in terms
                ):
                    hit = mt.inverted_prune(iname, terms[d["column"]])
                    if hit is not None:
                        keep = set(hit)
                        survivors = [f for f in survivors if f in keep]
        if eqs:
            schema = {f.name: f.dataType for f in mt.schema().fields}
            for iname, d in c.get("indexes", {}).items():
                if (
                    d["table"] == name
                    and d["using"] == "bitmap"
                    and d["column"] in eqs
                ):
                    dt = schema.get(d["column"])
                    # type gate: only (value, column-type) combinations
                    # whose stringification matches Spark's
                    # cast-to-string exactly may prune — anything else
                    # is dropped (fail-open, never falsely prunes)
                    clauses = []
                    for cl in eqs[d["column"]]:
                        conv = [_bitmap_key(v, dt) for v in cl]
                        if all(x is not None for x in conv):
                            clauses.append(conv)
                    if not clauses:
                        continue
                    hit = mt.bitmap_prune(iname, clauses)
                    if hit is not None:
                        keep = set(hit)
                        survivors = [f for f in survivors if f in keep]
        if survivors == files:
            return None
        if not survivors:
            return self.spark.createDataFrame([], mt.schema())
        from beacon_spark.sources import bytesource as _bs

        # schema pinned: survivors can mix pre-/post-ALTER files (see
        # ManagedTable._read_files — footer inference would null newer
        # columns)
        return align_to_schema(
            self.spark.read.schema(mt.schema()).parquet(
                *_bs.spark_paths(survivors)
            ),
            mt.schema(),
        )

    def _refresh_index_stats(self, table: str) -> None:
        """After DML on an indexed managed table, re-analyze its (new)
        files so the stats index tracks the live version. Incremental by
        mtime — cost ∝ rewritten files."""
        if self.datasets_root is None or self.catalog is None:
            return
        c = self.catalog._load()
        if table not in c.get("tables", {}) or not any(
            d["table"] == table for d in c.get("indexes", {}).values()
        ):
            return
        from beacon_spark.managed import ManagedTable
        from beacon_spark.stats import analyze_files

        mt = ManagedTable(self.spark, c["tables"][table])
        analyze_files(self.datasets_root, mt.files())
        for iname, d in c.get("indexes", {}).items():
            if d["table"] == table and d["using"] == "inverted":
                # incremental: only files new since the last build are
                # tokenized (build_inverted_index keys postings by file)
                mt.build_inverted_index(d["column"], iname)
            elif d["table"] == table and d["using"] == "bitmap":
                mt.build_bitmap_index(d["column"], iname)

    def resolve_from(
        self,
        spec: Any,
        projection: list[str] | None = None,
        ranges: dict | None = None,
        terms: dict | None = None,
        eqs: dict | None = None,
    ) -> DataFrame:
        """Resolve a DSL ``from`` (query/from.rs:23-131): named table, or
        ``{"<format>": {"paths": [...], ...}}``. ``projection`` is the
        DSL compiler's pushdown column set — Catalyst prunes scans on its
        own, so it only gates nd readers (which prune variables).
        ``ranges`` (column → [lo, hi] from the filter) drives stats-index
        file pruning for parquet collections (fail-open)."""
        if spec is None:
            if self.default_table is None:
                raise ValueError("query has no 'from' and engine has no default table")
            spec = self.default_table
        if isinstance(spec, str):
            if self.catalog is not None:
                # the DSL path must see catalog tables too (sql() does
                # this in its own preamble)
                self._register_catalog()
            pruned = self._pruned_managed_read(spec, ranges, terms, eqs)
            if pruned is not None:
                return pruned
            return self.spark.table(spec)
        if isinstance(spec, dict):
            if len(spec) != 1 or not isinstance(next(iter(spec)), str):
                raise ValueError(
                    "from spec must be one {'<format>': {...}} entry, "
                    f"got: {spec!r}")
            ((fmt, cfg),) = spec.items()
            fmt = fmt.lower()
            if fmt == "parquet":
                if ranges and self.datasets_root:
                    from beacon_spark.sources.paths import resolve_globs
                    from beacon_spark.stats import prune_files

                    files = resolve_globs(cfg["paths"], self.datasets_root)
                    pruned = prune_files(self.datasets_root, files, ranges)
                    if not pruned:
                        # every file provably dead → empty frame, full schema
                        full = self.read_parquet(files)
                        return self.spark.createDataFrame([], full.schema)
                    if pruned != files:
                        return self.read_parquet(pruned)
                return self.read_parquet(cfg["paths"])
            if fmt == "csv" and isinstance(cfg.get("options"), dict) \
                    and "delimiter" in cfg["options"]:
                cfg = {**cfg, "delimiter": cfg["options"]["delimiter"]}
            if fmt == "csv":
                return self.read_csv(cfg["paths"], cfg.get("delimiter"))
            if fmt == "arrow":
                return self.read_arrow(cfg["paths"])
            # nd projection pushdown: the scan flattens and ships ONLY
            # the select+filter column set (None = all). Range/term/eq
            # keys join the set (they are source columns by
            # construction), and every dotted name also contributes its
            # prefixes — "temperature.units" needs variable
            # "temperature"'s attrs, and tiff's "geo.lat" IS a variable.
            nd_cols = None
            if projection is not None:
                cols = set(projection)
                for extra in (ranges or {}), (terms or {}), (eqs or {}):
                    cols |= set(extra)
                for c in list(cols):
                    parts = c.split(".")
                    for i in range(1, len(parts)):
                        cols.add(".".join(parts[:i]))
                nd_cols = sorted(cols)
            if fmt in ("netcdf", "hdf5"):
                return self.read_netcdf(
                    cfg["paths"], cfg.get("dimensions"), ranges=ranges,
                    columns=nd_cols,
                )
            if fmt == "zarr":
                return self.read_zarr(
                    cfg["paths"], cfg.get("dimensions"), ranges=ranges,
                    columns=nd_cols,
                )
            if fmt == "tiff":
                return self.read_tiff(
                    cfg["paths"], cfg.get("dimensions"), ranges=ranges,
                    columns=nd_cols,
                )
            if fmt == "atlas":
                return self.read_atlas(
                    cfg["paths"], cfg.get("dimensions"), ranges=ranges,
                    columns=nd_cols,
                )
            if fmt == "odv":
                return self.read_odv(cfg["paths"])
            if fmt == "delta":
                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return self.read_delta(loc, cfg.get("version_as_of"),
                                       cfg.get("timestamp_as_of"))
            if fmt == "geoparquet":
                return self.read_geoparquet(cfg["paths"])
            if fmt == "iceberg":
                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return self.read_iceberg(loc, cfg.get("snapshot_id"))
            if fmt == "icechunk":
                # repository detection + refs/version resolution are
                # real (sources/icechunklite.py, mirroring the
                # reference's repository.rs); array decode gates at the
                # FlatBuffers layer with a documented finding
                from beacon_spark.sources.icechunklite import open_icechunk
                from beacon_spark.sources.paths import resolve_dir

                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return open_icechunk(
                    resolve_dir(loc, self.datasets_root),
                    branch=cfg.get("branch"), tag=cfg.get("tag"),
                    snapshot=cfg.get("snapshot"),
                )
            if fmt == "bbf":
                # bbf is Beacon's proprietary container (SURVEY.md §2.1:
                # documented out of scope)
                raise NotImplementedError(
                    f"format {fmt!r} is recognized but not supported in this build"
                )
            if fmt == "remote":
                # one-table Beacon-to-Beacon federation: CREATE EXTERNAL
                # TABLE … STORED AS REMOTE LOCATION
                # 'beacon://host:port/<table>' (the reference's remote
                # provider; contract: integration-tests/
                # test_remote_federation.py). A lazy beacon_remote
                # DataSource scan: filters push into the remote WHERE,
                # Arrow batches stream to an executor.
                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return self._remote_table_df(loc, cfg.get("options") or {})
            if fmt == "postgres":
                # from-spec v3 wire-protocol client (sources/pglite.py;
                # the reference federates via beacon-sql-databases)
                from beacon_spark.sources.pglite import read_postgres

                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return read_postgres(self.spark, loc, cfg.get("options") or {})
            if fmt == "mysql":
                # from-spec client/server-protocol client
                # (sources/mysqllite.py) — same contract as postgres
                from beacon_spark.sources.mysqllite import read_mysql

                loc = cfg["paths"][0] if "paths" in cfg else cfg["location"]
                return read_mysql(self.spark, loc, cfg.get("options") or {})
            raise ValueError(f"unsupported from format: {fmt}")
        raise ValueError(f"bad from spec: {spec!r}")

    # ------------------------------------------------------------ stats

    def analyze_files(self, force: bool = False) -> int:
        from beacon_spark.stats import analyze_files

        if self.datasets_root is None:
            raise ValueError("Engine has no datasets_root configured")
        return analyze_files(self.datasets_root, force=force)

    def view_statistics(self) -> DataFrame:
        from beacon_spark.stats import statistics_df

        return statistics_df(self.spark, self.datasets_root)

    # ------------------------------------------------------------ operators

    def summarize(self, df_or_name) -> DataFrame:
        df = (
            df_or_name
            if isinstance(df_or_name, DataFrame)
            else self.spark.table(df_or_name)
        )
        return summarize(df)
