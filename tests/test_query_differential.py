"""Grammar-based random-query differential vs DuckDB: joins, GROUP
BY/HAVING (+ ROLLUP), window functions (+ QUALIFY), and set ops.

Extends the filter/pagination net (test_dsl_differential.py) to the
highest-traffic relational shapes, mirroring the reference's own
equivalence method (integration-tests/test_queries_parquet.py:31 and
test_sql_features.py:13-61 window/CTE/HAVING shapes): hypothesis
generates a query spec, renders it to ONE ANSI-SQL text executed by
BOTH the engine's SQL surface (read_parquet rewrite → Spark) and
DuckDB on the same parquet, and the result multisets must agree.

These shapes are pure-Catalyst on our side, so a disagreement
localizes to the engine's rewrite machinery (read_fn views, QUALIFY
rewrite, WHERE disambiguation) or to a semantics divergence worth
pinning — exactly where r11's three silent-wrong-results bugs lived.

Floats compare with relative tolerance (sum/avg accumulate in a
different order on each engine; the values differ in low-order bits
only). Rounding to a fixed number of decimals is NOT sufficient: an
aggregate whose true value sits exactly on a rounding boundary (e.g.
avg(c_acctbal) = 6346.1345 — the r12 judge's falsifying example)
lands on opposite sides of round(_, 3) depending on which engine's
ulp noise wins, so the comparator is math.isclose per float cell on
rows sorted by a full-precision key.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_spark.engine import Engine

pytestmark = pytest.mark.usefixtures("sf_small")


@pytest.fixture(scope="module")
def qeng(spark, sf_small):
    return Engine(spark, datasets_root=sf_small)


def _canon(rows):
    """Order-insensitive canonical form: tuples sorted by a type-tagged
    full-precision key (None last). Values are NOT rounded — the
    comparison happens in _rows_close with per-cell tolerance, so a
    value on a rounding boundary can't flip sides. Two rows whose sort
    order differs across engines due to ulp noise are, by definition,
    within tolerance of each other, so pairwise isclose still passes."""

    def key(row):
        return tuple(
            (2, 0) if v is None else (1, float(v))
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            else (0, str(v))
            for v in row
        )

    return sorted((tuple(r) for r in rows), key=key)


def _rows_close(ours, duck):
    """Multiset equality with float tolerance: exact on non-floats,
    math.isclose(rel_tol=1e-9, abs_tol=1e-9) when either cell is a
    float (covers float-vs-int aggregates of identical value)."""
    if len(ours) != len(duck):
        return False
    for a_row, b_row in zip(ours, duck):
        if len(a_row) != len(b_row):
            return False
        for a, b in zip(a_row, b_row):
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None:
                    if a is not b:
                        return False
                elif not math.isclose(float(a), float(b),
                                      rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif a != b:
                return False
    return True


def _run_both(qeng, sf_small, template: str):
    """Execute one SQL template on the engine and on DuckDB; return the
    canonicalized row lists."""
    import duckdb

    esql = template.format(
        orders="read_parquet('orders.parquet')",
        customer="read_parquet('customer.parquet')",
        nation="read_parquet('nation.parquet')",
        lineitem="read_parquet('lineitem.parquet')",
    )
    dsql = template.format(
        orders=f"read_parquet('{sf_small}/orders.parquet')",
        customer=f"read_parquet('{sf_small}/customer.parquet')",
        nation=f"read_parquet('{sf_small}/nation.parquet')",
        lineitem=f"read_parquet('{sf_small}/lineitem.parquet')",
    )
    spark_rows = [tuple(r) for r in qeng.sql(esql).collect()]
    con = duckdb.connect()
    try:
        duck_rows = con.execute(dsql).fetchall()
    finally:
        con.close()
    return _canon(spark_rows), _canon(duck_rows)


# ---------------------------------------------------------------------
# WHERE leaves — simple, shared text on both engines (no backslashes)
# ---------------------------------------------------------------------

_ORDER_LEAVES = st.sampled_from([
    None,
    "o_totalprice > 150000",
    "o_totalprice <= 80000.5",
    "o_orderstatus = 'O'",
    "o_orderstatus <> 'F'",
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'",
    "o_orderdate < TIMESTAMP '1996-01-01 00:00:00'",
    "o_orderdate >= TIMESTAMP '2023-06-01 00:00:00'",  # selects nothing
    "o_custkey % 7 = 3",
])
_CUST_LEAVES = st.sampled_from([
    None,
    "c_acctbal > 0",
    "c_acctbal BETWEEN -500 AND 5000",
    "c_mktsegment = 'BUILDING'",
    "c_nationkey < 12",
])


# ---------------------------------------------------------------------
# Shape A: 2-3 table join + GROUP BY [ROLLUP] + aggregates + HAVING
# ---------------------------------------------------------------------

_DIMS = ["c_mktsegment", "o_orderstatus", "c_nationkey"]
_AGGS = [
    "count(*) AS cnt",
    "count(o_orderkey) AS cnt_o",
    "count(DISTINCT o_custkey) AS ucust",
    "sum(o_totalprice) AS sum_price",
    "avg(c_acctbal) AS avg_bal",
    "min(o_orderdate) AS min_dt",
    "max(o_orderkey) AS max_key",
]
_HAVINGS = [None, "count(*) >= 3", "count(*) > 10", "max(o_orderkey) > 3000"]


@st.composite
def join_agg_specs(draw):
    jt = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    three = draw(st.booleans())
    dims = draw(st.lists(st.sampled_from(
        _DIMS + (["n_name"] if three else [])),
        min_size=1, max_size=2, unique=True))
    aggs = draw(st.lists(st.sampled_from(_AGGS),
                         min_size=1, max_size=3, unique=True))
    rollup = draw(st.booleans())
    where = draw(st.one_of(_ORDER_LEAVES, _CUST_LEAVES))
    having = draw(st.sampled_from(_HAVINGS))
    return jt, three, dims, aggs, rollup, where, having


@settings(max_examples=14, deadline=None)
@given(spec=join_agg_specs())
def test_join_groupby_having_agree_with_duckdb(qeng, sf_small, spec):
    jt, three, dims, aggs, rollup, where, having = spec
    # customer LEFT JOIN orders keeps customers with no orders → NULL
    # aggregate inputs, the shape where a silent semantics drift hurts
    frm = "{customer} c " + jt + " {orders} o ON c.c_custkey = o.o_custkey"
    if three:
        frm += " JOIN {nation} n ON c.c_nationkey = n.n_nationkey"
    group = ", ".join(dims)
    sql = (
        f"SELECT {group}, {', '.join(aggs)} FROM {frm}"
        + (f" WHERE {where}" if where else "")
        + " GROUP BY " + (f"ROLLUP({group})" if rollup else group)
        + (f" HAVING {having}" if having else "")
    )
    ours, duck = _run_both(qeng, sf_small, sql)
    if rollup and not ours and len(duck) == 1 \
            and all(duck[0][i] is None for i in range(len(dims))):
        # Pinned divergence (docs/DIVERGENCES.md): over EMPTY input,
        # Spark's expand-based ROLLUP emits zero rows while DuckDB /
        # the SQL standard emit the grand-total () grouping-set row.
        # See test_rollup_over_empty_input_divergence_pinned.
        return
    assert _rows_close(ours, duck), f"join/agg mismatch for: {sql}"


def test_rollup_over_empty_input_divergence_pinned(qeng, sf_small):
    """Spark GROUP BY ROLLUP/GROUPING SETS over an EMPTY input returns
    ZERO rows; the SQL standard (and DuckDB, and DataFusion — what the
    reference would return) emits the () grouping-set grand-total row.
    Pinned so the shape is visible and a future Spark behavior change
    is caught; recorded in docs/DIVERGENCES.md."""
    import duckdb

    sql = ("SELECT o_orderstatus, count(*) AS cnt FROM {orders} "
           "WHERE o_totalprice < 0 GROUP BY ROLLUP(o_orderstatus)")
    ours = qeng.sql(sql.format(
        orders="read_parquet('orders.parquet')")).collect()
    con = duckdb.connect()
    try:
        duck = con.execute(sql.format(
            orders=f"read_parquet('{sf_small}/orders.parquet')")).fetchall()
    finally:
        con.close()
    assert ours == []           # Spark: no rows
    assert duck == [(None, 0)]  # standard: grand-total row


def test_avg_on_rounding_boundary_pinned(qeng, sf_small):
    """r12 judge's falsifying example, pinned deterministically: at
    sf0.001 the true avg(c_acctbal) for one (c_mktsegment,
    o_orderstatus) group is EXACTLY 6346.1345 — on the round(_, 3)
    boundary. Spark's double summation lands a few ulps below, DuckDB's
    a few ulps above, so a fixed-decimal comparator flips on which side
    the noise falls. The tolerance comparator must pass this shape on
    every run; both engines are correct to within ~4 ulps."""
    sql = ("SELECT c_mktsegment, o_orderstatus, avg(c_acctbal) AS avg_bal "
           "FROM {customer} c LEFT JOIN {orders} o "
           "ON c.c_custkey = o.o_custkey "
           "GROUP BY c_mktsegment, o_orderstatus")
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), "boundary-avg shape must compare close"
    # And the knife-edge is real: verify fixed-3dp rounding is NOT a
    # sound comparator in general (documents why _rows_close exists) —
    # ulp-adjacent doubles straddling a .0005 boundary round apart.
    lo, hi = 6346.1344999999965, 6346.134500000002
    assert math.isclose(lo, hi, rel_tol=1e-9)
    assert round(lo, 3) != round(hi, 3)


# ---------------------------------------------------------------------
# Shape B: window functions — ranking + QUALIFY, and framed analytics
# ---------------------------------------------------------------------

_RANK_FNS = ["row_number()", "rank()", "dense_rank()"]
_PARTS = ["o_orderstatus", "o_orderpriority"]
_ORDS = ["o_totalprice", "o_orderdate", "o_custkey"]


@st.composite
def window_specs(draw):
    kind = draw(st.sampled_from(["qualify", "frame"]))
    part = draw(st.sampled_from(_PARTS))
    ordc = draw(st.sampled_from(_ORDS))
    direc = draw(st.sampled_from(["ASC", "DESC"]))
    where = draw(_ORDER_LEAVES)
    if kind == "qualify":
        fn = draw(st.sampled_from(_RANK_FNS))
        k = draw(st.integers(1, 5))
        return kind, (part, ordc, direc, where, fn, k)
    lo = draw(st.integers(0, 3))
    return kind, (part, ordc, direc, where, lo)


@settings(max_examples=12, deadline=None)
@given(spec=window_specs())
def test_windows_and_qualify_agree_with_duckdb(qeng, sf_small, spec):
    kind, s = spec
    if kind == "qualify":
        part, ordc, direc, where, fn, k = s
        # tie-break on o_orderkey so row_number is deterministic; rank/
        # dense_rank are value-determined either way. QUALIFY runs
        # natively on DuckDB and through the engine's rewrite
        # (engine.py _rewrite_qualify — docs sql/index.md:46-48).
        sql = (
            f"SELECT o_orderkey, {fn} OVER (PARTITION BY {part} "
            f"ORDER BY {ordc} {direc}, o_orderkey) AS rnk FROM {{orders}}"
            + (f" WHERE {where}" if where else "")
            + f" QUALIFY rnk <= {k}"
        )
    else:
        part, ordc, direc, where, lo = s
        sql = (
            f"SELECT o_orderkey, sum(o_totalprice) OVER ("
            f"PARTITION BY {part} ORDER BY {ordc} {direc}, o_orderkey "
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW) AS w "
            f"FROM {{orders}}"
            + (f" WHERE {where}" if where else "")
        )
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"window mismatch for: {sql}"


# ---------------------------------------------------------------------
# Shape C: set operations between type-aligned operands
# ---------------------------------------------------------------------

_SET_OPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
            "INTERSECT ALL", "EXCEPT ALL"]


@st.composite
def setop_specs(draw):
    op = draw(st.sampled_from(_SET_OPS))
    wa = draw(_ORDER_LEAVES)
    wb = draw(_CUST_LEAVES)
    flip = draw(st.booleans())
    return op, wa, wb, flip


@settings(max_examples=12, deadline=None)
@given(spec=setop_specs())
def test_set_ops_agree_with_duckdb(qeng, sf_small, spec):
    op, wa, wb, flip = spec
    a = ("SELECT o_custkey AS k FROM {orders}"
         + (f" WHERE {wa}" if wa else ""))
    b = ("SELECT c_custkey AS k FROM {customer}"
         + (f" WHERE {wb}" if wb else ""))
    if flip:
        a, b = b, a
    sql = f"{a} {op} {b}"
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"set-op mismatch for: {sql}"


# ---------------------------------------------------------------------
# Shape D: subqueries — IN / NOT IN / EXISTS / NOT EXISTS / scalar
# ---------------------------------------------------------------------

_LINE_LEAVES = st.sampled_from([
    "l_quantity < 10",
    "l_returnflag = 'R'",
    "l_discount >= 0.05",
    "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'",
])


@st.composite
def subquery_specs(draw):
    kind = draw(st.sampled_from(["in", "not_in", "exists", "not_exists",
                                 "scalar"]))
    wo = draw(_ORDER_LEAVES)
    wc = draw(_CUST_LEAVES)
    wl = draw(_LINE_LEAVES)
    return kind, wo, wc, wl


@settings(max_examples=12, deadline=None)
@given(spec=subquery_specs())
def test_subqueries_agree_with_duckdb(qeng, sf_small, spec):
    kind, wo, wc, wl = spec
    outer_where = f" AND {wo}" if wo else ""
    inner_c = f" WHERE {wc}" if wc else ""
    if kind in ("in", "not_in"):
        neg = "NOT " if kind == "not_in" else ""
        sql = (
            "SELECT o_orderkey FROM {orders} o WHERE o_custkey "
            + neg + "IN (SELECT c_custkey FROM {customer}" + inner_c + ")"
            + outer_where
        )
    elif kind in ("exists", "not_exists"):
        neg = "NOT " if kind == "not_exists" else ""
        sql = (
            "SELECT o.o_orderkey FROM {orders} o WHERE " + neg
            + "EXISTS (SELECT 1 FROM {lineitem} l "
            + f"WHERE l.l_orderkey = o.o_orderkey AND {wl})"
            + outer_where
        )
    else:  # correlated scalar subquery in the projection
        sql = (
            "SELECT o.o_orderkey, "
            "(SELECT max(c_acctbal) FROM {customer} c "
            "WHERE c.c_custkey = o.o_custkey" + (f" AND {wc}" if wc else "")
            + ") AS bal FROM {orders} o"
            + (f" WHERE {wo}" if wo else "")
        )
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"subquery mismatch for: {sql}"


# ---------------------------------------------------------------------
# Shape E: CTE chains — agg CTE joined back, optionally referenced twice
# ---------------------------------------------------------------------

@st.composite
def cte_specs(draw):
    wc = draw(_CUST_LEAVES)
    wo = draw(_ORDER_LEAVES)
    having = draw(st.sampled_from([None, "count(*) >= 2"]))
    twice = draw(st.booleans())
    return wc, wo, having, twice


@settings(max_examples=10, deadline=None)
@given(spec=cte_specs())
def test_cte_chains_agree_with_duckdb(qeng, sf_small, spec):
    wc, wo, having, twice = spec
    cte = (
        "WITH cust AS (SELECT c_custkey, c_nationkey FROM {customer}"
        + (f" WHERE {wc}" if wc else "") + "), "
        "ords AS (SELECT o_custkey, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS tot FROM {orders}"
        + (f" WHERE {wo}" if wo else "")
        + " GROUP BY o_custkey"
        + (f" HAVING {having}" if having else "") + ") "
    )
    if twice:  # second reference to the same CTE (self-join through it)
        sql = cte + (
            "SELECT c.c_nationkey, count(*) AS nc, sum(o.n) AS total_n "
            "FROM cust c JOIN ords o ON c.c_custkey = o.o_custkey "
            "JOIN cust c2 ON c2.c_custkey = c.c_custkey "
            "GROUP BY c.c_nationkey"
        )
    else:
        sql = cte + (
            "SELECT c.c_nationkey, sum(o.tot) AS tot "
            "FROM cust c JOIN ords o ON c.c_custkey = o.o_custkey "
            "GROUP BY c.c_nationkey"
        )
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"CTE mismatch for: {sql}"


# ---------------------------------------------------------------------
# Shape F: scalar-expression surfaces shared by both engines —
# CASE / COALESCE / NULLIF / LEAST / GREATEST / arithmetic / casts
# ---------------------------------------------------------------------

_EXPRS = [
    "CASE WHEN o_totalprice > 200000 THEN 'hi' WHEN o_totalprice > 50000 "
    "THEN 'mid' ELSE 'lo' END",
    "coalesce(nullif(o_orderstatus, 'O'), 'open')",
    "least(o_custkey, 100) + greatest(o_custkey % 13, 5)",
    "abs(o_custkey - 75) * 2",
    # NOTE: CAST(double AS BIGINT) itself is NOT comparable — DuckDB
    # ROUNDS (150000.75 → 150001) while Spark and DataFusion (the
    # reference) TRUNCATE; floor() first makes the oracle agree
    "CAST(floor(o_totalprice) AS BIGINT) % 97",
    # STRING, not VARCHAR: Spark 4 requires a length on VARCHAR(n);
    # both engines accept the STRING alias
    "CAST(o_orderkey AS STRING)",
    "nullif(o_custkey % 3, 0)",
    "CASE o_orderstatus WHEN 'O' THEN o_custkey ELSE -o_custkey END",
]


@settings(max_examples=12, deadline=None)
@given(
    exprs=st.lists(st.sampled_from(_EXPRS), min_size=1, max_size=3,
                   unique=True),
    where=_ORDER_LEAVES,
)
def test_scalar_expressions_agree_with_duckdb(qeng, sf_small, exprs, where):
    sel = ", ".join(f"({e}) AS e{i}" for i, e in enumerate(exprs))
    sql = ("SELECT o_orderkey, " + sel + " FROM {orders}"
           + (f" WHERE {where}" if where else ""))
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"expression mismatch for: {sql}"


# ---------------------------------------------------------------------
# Shape G: temporal semantics — EXTRACT parts + date_trunc units over
# the real o_orderdate column.
#
# Probed oracle hazards, excluded by construction (not engine bugs):
#   - EXTRACT(SECOND): Spark returns DECIMAL, DuckDB BIGINT (canon
#     float-compare would pass but the column type legitimately differs);
#   (DOW and EPOCH were excluded here until r14 — the engine now
#   rewrites both to the reference's Postgres semantics, so they're in
#   the pool below)
#   - date_trunc day-and-coarser: DuckDB returns DATE where Spark
#     returns TIMESTAMP — same value, so both sides CAST to TIMESTAMP.
# ---------------------------------------------------------------------

# ---------------------------------------------------------------------
# Shape H: derived tables — window functions inside a subquery, outer
# filter/aggregate over the computed column (the composition QUALIFY
# desugars into; here written explicitly so both engines parse it raw)
# ---------------------------------------------------------------------

@st.composite
def derived_specs(draw):
    fn = draw(st.sampled_from(_RANK_FNS))
    part = draw(st.sampled_from(_PARTS))
    ordc = draw(st.sampled_from(_ORDS))
    k = draw(st.integers(1, 4))
    outer = draw(st.sampled_from(["filter", "agg"]))
    where = draw(_ORDER_LEAVES)
    return fn, part, ordc, k, outer, where


@settings(max_examples=10, deadline=None)
@given(spec=derived_specs())
def test_window_in_derived_table_agrees_with_duckdb(qeng, sf_small, spec):
    fn, part, ordc, k, outer, where = spec
    inner = (
        f"SELECT o_orderkey, {part} AS p, {fn} OVER (PARTITION BY {part} "
        f"ORDER BY {ordc} DESC, o_orderkey) AS rnk FROM {{orders}}"
        + (f" WHERE {where}" if where else "")
    )
    if outer == "filter":
        sql = f"SELECT o_orderkey, rnk FROM ({inner}) t WHERE rnk <= {k}"
    else:
        sql = (f"SELECT p, count(*) AS cnt, max(rnk) AS mx "
               f"FROM ({inner}) t WHERE rnk <= {k} GROUP BY p")
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"derived-table mismatch for: {sql}"


_EXTRACT_PARTS = ["year", "quarter", "month", "week", "day", "doy",
                  "hour", "minute",
                  # r14: DIVERGENCES #15/#16 closed — the engine
                  # rewrites DOW to Sunday=0 numbering and EPOCH to
                  # fractional seconds, so both join the DuckDB
                  # differential pool (CAST AS BIGINT canonicalizes)
                  "dow", "epoch"]
_TRUNC_UNITS = ["year", "quarter", "month", "week", "day", "hour"]


@settings(max_examples=10, deadline=None)
@given(
    parts=st.lists(st.sampled_from(_EXTRACT_PARTS), min_size=1,
                   max_size=3, unique=True),
    unit=st.sampled_from(_TRUNC_UNITS),
    where=_ORDER_LEAVES,
)
def test_temporal_parts_agree_with_duckdb(qeng, sf_small, parts, unit,
                                          where):
    sel = ", ".join(
        f"CAST(EXTRACT({p} FROM o_orderdate) AS BIGINT) AS p_{p}"
        for p in parts)
    sql = (
        "SELECT o_orderkey, " + sel
        + f", CAST(date_trunc('{unit}', o_orderdate) AS TIMESTAMP) AS tr"
        + " FROM {orders}" + (f" WHERE {where}" if where else "")
    )
    ours, duck = _run_both(qeng, sf_small, sql)
    assert _rows_close(ours, duck), f"temporal mismatch for: {sql}"
