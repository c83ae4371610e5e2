"""DSL↔SQL↔DuckDB differential over random filter trees.

The JSON DSL and the SQL surface compile to the same plans
(reference README.md:117-119; our dsl.py mirrors filter/mod.rs's
pinned semantics). This property test generates random filter trees,
renders each one BOTH as a DSL body and as the equivalent SQL WHERE
(replicating the pinned coercions: fractionals truncate into integer
columns, ISO strings with a time part become timestamp literals,
empty and ⇒ TRUE, empty or ⇒ FALSE), and requires all three
evaluators to agree row-for-row:

  1. engine.query({...})           — the DSL compiler
  2. engine.sql("SELECT ... WHERE") — the SQL path (read_fn rewrite)
  3. DuckDB on the same parquet     — an independent engine

A disagreement localizes a bug in dsl.compile_filter, the SQL rewrite
machinery, or the rendering contract itself.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_spark.engine import Engine

ORDERS = "orders.parquet"

INT_COLS = ["o_orderkey", "o_custkey"]
FLOAT_COLS = ["o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
TS_COL = "o_orderdate"

_OPS = ["eq", "neq", "gt", "gt_eq", "lt", "lt_eq"]
_SQL_OP = {"eq": "=", "neq": "<>", "gt": ">", "gt_eq": ">=",
           "lt": "<", "lt_eq": "<="}

# value pools chosen to straddle the sf0.001 data (o_orderkey 1..6000,
# o_custkey 1..150, o_totalprice ~1k..500k) so filters select real rows
_INT_VALS = st.one_of(
    st.integers(min_value=-5, max_value=6000),
    st.floats(min_value=0.2, max_value=5999.7,
              allow_nan=False, allow_infinity=False),
)
_FLOAT_VALS = st.floats(min_value=500.0, max_value=400000.0,
                        allow_nan=False, allow_infinity=False)
_STR_VALS = st.sampled_from(
    ["O", "F", "P", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
     "5-LOW", "x'y", "", "URGENT"])
_TS_VALS = st.sampled_from(
    ["2023-03-01T00:00:00", "2023-06-15T12:30:00", "2024-01-01T00:00:00"])


def _num_leaf(draw):
    col = draw(st.sampled_from(INT_COLS + FLOAT_COLS))
    op = draw(st.sampled_from(_OPS))
    v = draw(_INT_VALS if col in INT_COLS else _FLOAT_VALS)
    return {"column": col, op: v}


def _between_leaf(draw):
    col = draw(st.sampled_from(INT_COLS + FLOAT_COLS))
    pool = _INT_VALS if col in INT_COLS else _FLOAT_VALS
    a, b = draw(pool), draw(pool)
    return {"column": col, "gt_eq": a, "lt_eq": b}


def _str_leaf(draw):
    col = draw(st.sampled_from(STR_COLS))
    kind = draw(st.sampled_from(["eq", "neq", "contains", "like"]))
    if kind == "like":
        pat = draw(st.sampled_from(["%URGENT%", "_-%", "%GH", "O", "%'%"]))
        return {"column": col, "like": pat}
    return {"column": col, kind: draw(_STR_VALS)}


def _ts_leaf(draw):
    op = draw(st.sampled_from(_OPS))
    return {"column": TS_COL, op: draw(_TS_VALS)}


def _null_leaf(draw):
    col = draw(st.sampled_from(INT_COLS + STR_COLS))
    key = draw(st.sampled_from(["is_null", "is_not_null"]))
    return {key: {"column": col}}


@st.composite
def filter_trees(draw, depth: int = 0):
    if depth >= 2 or draw(st.integers(0, 3)) > 0:
        kind = draw(st.sampled_from(
            ["num", "num", "between", "str", "ts", "null"]))
        return {
            "num": _num_leaf, "between": _between_leaf, "str": _str_leaf,
            "ts": _ts_leaf, "null": _null_leaf,
        }[kind](draw)
    key = draw(st.sampled_from(["and", "or"]))
    n = draw(st.integers(0, 3))
    return {key: [draw(filter_trees(depth=depth + 1)) for _ in range(n)]}


def _is_iso_ts(v: str) -> bool:
    """Mirror dsl._comparison_value: a string is a timestamp literal
    only when fromisoformat parses it AND it carries a time part."""
    import datetime as _dt

    try:
        _dt.datetime.fromisoformat(v)
    except ValueError:
        return False
    return "T" in v or " " in v


def _sql_lit_str(v: str) -> str:
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_of(node) -> str:
    """Render a filter tree to SQL with the DSL's pinned semantics."""
    if "and" in node:
        kids = [_sql_of(c) for c in node["and"]]
        return "(" + (" AND ".join(kids) if kids else "true") + ")"
    if "or" in node:
        kids = [_sql_of(c) for c in node["or"]]
        return "(" + (" OR ".join(kids) if kids else "false") + ")"
    if "is_null" in node:
        return f"({node['is_null']['column']} IS NULL)"
    if "is_not_null" in node:
        return f"({node['is_not_null']['column']} IS NOT NULL)"
    col = node["column"]
    if "contains" in node:
        return f"(contains({col}, {_sql_lit_str(node['contains'])}))"
    if "like" in node:
        return f"({col} LIKE {_sql_lit_str(node['like'])})"
    parts = []
    for op, sql_op in _SQL_OP.items():
        if op not in node:
            continue
        v = node[op]
        if isinstance(v, str) and _is_iso_ts(v):
            lit = f"TIMESTAMP '{v.replace('T', ' ')}'"
        elif isinstance(v, str):
            lit = _sql_lit_str(v)
        elif isinstance(v, bool):
            lit = "true" if v else "false"
        elif col in INT_COLS:
            # the DSL truncates fractionals into integer columns
            # (filter/mod.rs:94-113, dsl._coerce_number)
            lit = str(math.trunc(v))
        else:
            lit = repr(float(v))
        parts.append(f"{col} {sql_op} {lit}")
    return "(" + " AND ".join(parts) + ")"


def _duck_sql(where: str, path: str) -> list:
    # Spark lexes backslash escapes in literals; DuckDB is standard-
    # conforming (backslash literal) — double the backslashes back out
    dsql = where.replace("\\\\", "\x00").replace("\\'", "''") \
                .replace("\x00", "\\")
    con = duckdb.connect()
    try:
        return sorted(r[0] for r in con.execute(
            f"SELECT o_orderkey FROM read_parquet('{path}') "
            f"WHERE {dsql}").fetchall())
    finally:
        con.close()


@pytest.fixture(scope="module")
def deng(spark, sf_small):
    return Engine(spark, datasets_root=sf_small)


@settings(max_examples=20, deadline=None)
@given(tree=filter_trees())
def test_dsl_sql_duckdb_agree_on_random_filters(deng, sf_small, tree):
    where = _sql_of(tree)
    dsl_rows = sorted(
        r.o_orderkey
        for r in deng.query({
            "select": ["o_orderkey"],
            "from": {"parquet": {"paths": [ORDERS]}},
            "filter": tree,
        }).collect()
    )
    sql_rows = sorted(
        r.o_orderkey
        for r in deng.sql(
            f"SELECT o_orderkey FROM read_parquet('{ORDERS}') "
            f"WHERE {where}"
        ).collect()
    )
    duck_rows = _duck_sql(where, f"{sf_small}/{ORDERS}")
    assert dsl_rows == sql_rows, f"DSL != SQL for {tree!r} / {where}"
    assert sql_rows == duck_rows, f"Spark != DuckDB for {where}"


_SORT_COLS = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"]


@st.composite
def order_bodies(draw):
    keys = draw(st.lists(
        st.tuples(st.sampled_from(["asc", "desc"]),
                  st.sampled_from(_SORT_COLS)),
        min_size=0, max_size=2, unique_by=lambda t: t[1]))
    offset = draw(st.integers(0, 40))
    limit = draw(st.integers(1, 60))
    flt = draw(filter_trees())
    return keys, offset, limit, flt


@settings(max_examples=15, deadline=None)
@given(body=order_bodies())
def test_dsl_sql_duckdb_agree_on_sort_and_pagination(deng, sf_small, body):
    """sort_by (nulls-last both directions, the DSL pin) + offset/limit
    must paginate identically through the DSL, the SQL surface, and
    DuckDB. o_orderkey is appended as the final key so the total order
    is unique and the page is deterministic."""
    keys, offset, limit, flt = body
    where = _sql_of(flt)
    order_sql = ", ".join(
        [f"{c} {d.upper()} NULLS LAST" for d, c in keys]
        + ["o_orderkey ASC NULLS LAST"])
    sql = (f"SELECT o_orderkey FROM read_parquet('{ORDERS}') "
           f"WHERE {where} ORDER BY {order_sql} "
           f"LIMIT {limit} OFFSET {offset}")
    sql_rows = [r.o_orderkey for r in deng.sql(sql).collect()]
    dsl_rows = [
        r.o_orderkey
        for r in deng.query({
            "select": ["o_orderkey"] + sorted({c for _d, c in keys}),
            "from": {"parquet": {"paths": [ORDERS]}},
            "filter": flt,
            "sort_by": [{d: c} for d, c in keys] + [{"asc": "o_orderkey"}],
            "offset": offset,
            "limit": limit,
        }).collect()
    ]
    dsql = (f"SELECT o_orderkey FROM read_parquet('{sf_small}/{ORDERS}') "
            f"WHERE {where} ORDER BY {order_sql} "
            f"LIMIT {limit} OFFSET {offset}")
    con = duckdb.connect()
    try:
        duck_rows = [r[0] for r in con.execute(
            dsql.replace("\\\\", "\x00").replace("\\'", "''")
                .replace("\x00", "\\")).fetchall()]
    finally:
        con.close()
    assert dsl_rows == sql_rows, f"DSL != SQL for {keys} {flt!r}"
    assert sql_rows == duck_rows, f"Spark != DuckDB for {sql}"


# =====================================================================
# DSL select FUNCTION TREES: the same random expression tree rendered
# as a DSL select item (compiled via F.call_function) and as SQL text
# (engine + DuckDB) must project identical values. Functions drawn from
# the surface all three agree on. round() is integer-only: Spark
# rounds doubles via their shortest decimal repr (123.45 → 123.5)
# while DuckDB rounds the binary double (→ 123.4) — a real semantic
# hazard at round(x, d>0), but .5-to-integer boundaries are dyadic and
# exact, so round(x) compares safely.
# =====================================================================


@st.composite
def select_fn_trees(draw, depth: int = 0, want: str = "any"):
    if want == "any":
        want = draw(st.sampled_from(["str", "num"]))
    if depth >= 2 or draw(st.integers(0, 2)) == 0:  # leaf
        if want == "str":
            return want, draw(st.sampled_from(
                ["o_orderstatus", "o_orderpriority",
                 {"value": "lit-x"}, {"value": ""}]))
        return want, draw(st.sampled_from(
            ["o_custkey", "o_totalprice", {"value": 3}, {"value": -7.5}]))
    if want == "str":
        fn = draw(st.sampled_from(["upper", "lower", "trim", "concat"]))
        nargs = 2 if fn == "concat" else 1
    else:
        fn = draw(st.sampled_from(
            ["abs", "round", "floor", "ceil", "least", "greatest",
             "coalesce", "length"]))
        nargs = {"abs": 1, "round": 1, "floor": 1, "ceil": 1,
                 "length": 1, "least": 2, "greatest": 2, "coalesce": 2}[fn]
    argw = "str" if fn in ("upper", "lower", "trim", "concat", "length") \
        else "num"
    args = [draw(select_fn_trees(depth=depth + 1, want=argw))[1]
            for _ in range(nargs)]
    return want, {"function": fn, "args": args}


def _item_sql(item) -> str:
    if isinstance(item, str):
        return item
    if "value" in item:
        v = item["value"]
        return f"'{v}'" if isinstance(v, str) else repr(v)
    args = ", ".join(_item_sql(a) for a in item.get("args", []))
    return f"{item['function']}({args})"


@settings(max_examples=15, deadline=None)
@given(tree=select_fn_trees())
def test_dsl_function_selects_match_sql_and_duckdb(deng, sf_small, tree):
    _want, item = tree
    body = {
        "select": ["o_orderkey", dict(item, alias="e") if isinstance(
            item, dict) else {"column": item, "alias": "e"}],
        "from": {"parquet": {"paths": [ORDERS]}},
        "sort_by": [{"asc": "o_orderkey"}],
        "limit": 100,
    }
    dsl_rows = [(r.o_orderkey, r.e) for r in deng.query(body).collect()]
    sql = (f"SELECT o_orderkey, {_item_sql(item)} AS e "
           f"FROM read_parquet('{ORDERS}') ORDER BY o_orderkey LIMIT 100")
    sql_rows = [(r.o_orderkey, r.e) for r in deng.sql(sql).collect()]
    con = duckdb.connect()
    try:
        duck_rows = con.execute(
            f"SELECT o_orderkey, {_item_sql(item)} AS e "
            f"FROM read_parquet('{sf_small}/{ORDERS}') "
            f"ORDER BY o_orderkey LIMIT 100").fetchall()
    finally:
        con.close()

    # Rows are keyed/positional (ORDER BY o_orderkey) so compare
    # pairwise; floats via isclose — fixed-decimal rounding flips on
    # values that sit exactly on a rounding boundary (r12 verdict #1).
    import math

    def rows_close(xs, ys, msg):
        assert len(xs) == len(ys), msg
        for (ka, va), (kb, vb) in zip(xs, ys):
            assert ka == kb, msg
            if isinstance(va, float) or isinstance(vb, float):
                if va is None or vb is None:
                    assert va is vb, msg
                else:
                    assert math.isclose(float(va), float(vb),
                                        rel_tol=1e-9, abs_tol=1e-9), \
                        f"{msg}: {va!r} != {vb!r} @ key {ka!r}"
            else:
                assert va == vb, f"{msg}: {va!r} != {vb!r} @ key {ka!r}"

    rows_close(dsl_rows, sql_rows, f"DSL != SQL for {item!r}")
    rows_close(sql_rows, duck_rows, f"Spark != DuckDB: {sql}")


# =====================================================================
# date_bin macro differential vs DuckDB's time_bucket: same floor
# semantics, including PRE-ORIGIN timestamps where a truncate-vs-floor
# confusion in the macro arithmetic would bin to the wrong side.
# =====================================================================

_BIN_UNITS = [("minute", 1), ("minute", 15), ("hour", 1), ("hour", 6),
              ("day", 1), ("day", 7), ("second", 30)]
_BIN_TS = st.datetimes(
    min_value=__import__("datetime").datetime(1965, 1, 1),
    max_value=__import__("datetime").datetime(2030, 12, 31),
)
_BIN_ORIGINS = st.sampled_from(
    ["1970-01-01 00:00:00", "2000-01-03 00:30:00", "1969-12-25 06:00:00"])


@settings(max_examples=20, deadline=None)
@given(
    unit=st.sampled_from(_BIN_UNITS),
    ts=_BIN_TS,
    origin=_BIN_ORIGINS,
)
def test_date_bin_matches_duckdb_time_bucket(deng, unit, ts, origin):
    uname, n = unit
    ts_s = ts.replace(microsecond=0).isoformat(sep=" ")
    ours = deng.sql(
        f"SELECT date_bin(INTERVAL '{n} {uname}s', "
        f"TIMESTAMP '{ts_s}', TIMESTAMP '{origin}') AS b"
    ).collect()[0].b
    con = duckdb.connect()
    try:
        want = con.execute(
            f"SELECT time_bucket(INTERVAL '{n} {uname}s', "
            f"TIMESTAMP '{ts_s}', TIMESTAMP '{origin}')"
        ).fetchone()[0]
    finally:
        con.close()
    assert ours == want, f"date_bin({n} {uname}, {ts_s}, {origin})"
