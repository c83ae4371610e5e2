"""Index-pruning differential: pruned reads must equal unpruned truth.

The managed-table read path prunes the FILE LIST before the scan opens
(engine._pruned_managed_read): btree/Z-order ranges via the file-stats
index, bitmap postings for eq/OR-of-eq, inverted postings for
contains/LIKE terms. Every prune is supposed to be FAIL-OPEN — a bug
that falsely drops a file silently loses rows, the worst failure class
this engine has. This property test builds a multi-file indexed table
once, then fires random DSL filters through the PRUNED path
(engine.query over the named table) and compares row-for-row against
DuckDB evaluating the same predicate over ALL the table's data files.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beacon_spark.engine import Engine

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta"]
GRPS = ["red", "green", "blue", "gold"]


@pytest.fixture(scope="module")
def pruned_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("prune-lake")
    eng = Engine(spark, datasets_root=str(root))
    # several INSERTs → several data files, so pruning has real targets;
    # ids are range-clustered per insert so btree stats discriminate
    eng.sql(
        "CREATE TABLE pt AS SELECT id, "
        "element_at(array('red','green','blue','gold'), "
        "  CAST(id % 4 AS INT) + 1) AS grp, "
        "concat(element_at(array('alpha','beta','gamma','delta','epsilon',"
        "'zeta','theta'), CAST(id % 7 AS INT) + 1), ' ', "
        "element_at(array('alpha','beta','gamma','delta','epsilon',"
        "'zeta','theta'), CAST(id % 5 AS INT) + 1)) AS words "
        "FROM range(0, 250)"
    )
    for lo in (250, 500, 750):
        eng.sql(
            f"INSERT INTO pt SELECT id, "
            f"element_at(array('red','green','blue','gold'), "
            f"  CAST(id % 4 AS INT) + 1) AS grp, "
            f"concat(element_at(array('alpha','beta','gamma','delta',"
            f"'epsilon','zeta','theta'), CAST(id % 7 AS INT) + 1), ' ', "
            f"element_at(array('alpha','beta','gamma','delta','epsilon',"
            f"'zeta','theta'), CAST(id % 5 AS INT) + 1)) AS words "
            f"FROM range({lo}, {lo + 250})"
        )
    eng.sql("CREATE INDEX pt_id ON pt(id) USING btree")
    eng.sql("CREATE INDEX pt_grp ON pt(grp) USING bitmap")
    eng.sql("CREATE INDEX pt_words ON pt(words) USING inverted")
    from beacon_spark.managed import ManagedTable

    mt = ManagedTable(spark, eng.catalog._load()["tables"]["pt"])
    assert len(mt.files()) >= 4  # pruning has real targets
    return eng, mt


def _leaf_range(draw):
    lo = draw(st.integers(-50, 1000))
    hi = draw(st.integers(-50, 1000))
    return {"column": "id", "gt_eq": min(lo, hi), "lt_eq": max(lo, hi)}


def _leaf_cmp(draw):
    op = draw(st.sampled_from(["eq", "gt", "lt", "gt_eq", "lt_eq"]))
    return {"column": "id", op: draw(st.integers(-50, 1000))}


def _leaf_grp(draw):
    if draw(st.booleans()):
        return {"column": "grp", "eq": draw(st.sampled_from(GRPS + ["void"]))}
    vals = draw(st.lists(st.sampled_from(GRPS), min_size=1, max_size=3,
                         unique=True))
    return {"or": [{"column": "grp", "eq": v} for v in vals]}


def _leaf_words(draw):
    # full words, fragments, and a never-present term
    t = draw(st.sampled_from(
        WORDS + ["alp", "eta", "gamma delta", "nothere"]))
    return {"column": "words", "contains": t}


@st.composite
def prune_filters(draw):
    leaves = [
        {"range": _leaf_range, "cmp": _leaf_cmp, "grp": _leaf_grp,
         "words": _leaf_words}[draw(st.sampled_from(
            ["range", "cmp", "grp", "words"]))](draw)
        for _ in range(draw(st.integers(1, 3)))
    ]
    return {"and": leaves}


def _leaf_sql(n) -> str:
    if "or" in n:
        return "(" + " OR ".join(_leaf_sql(c) for c in n["or"]) + ")"
    col = n["column"]
    if "contains" in n:
        return f"(contains(words, '{n['contains']}'))"
    ops = {"eq": "=", "gt": ">", "lt": "<", "gt_eq": ">=", "lt_eq": "<="}
    parts = []
    for op, s in ops.items():
        if op in n:
            v = n[op]
            parts.append(
                f"{col} {s} " + (f"'{v}'" if isinstance(v, str) else str(v)))
    return "(" + " AND ".join(parts) + ")"


@settings(max_examples=15, deadline=None)
@given(flt=prune_filters())
def test_pruned_reads_match_full_scan(pruned_table, flt):
    eng, mt = pruned_table
    got = sorted(
        r.id for r in eng.query({
            "select": ["id"], "from": "pt", "filter": flt,
        }).collect()
    )
    where = " AND ".join(_leaf_sql(leaf) for leaf in flt["and"])
    con = duckdb.connect()
    try:
        files = [f.replace("'", "''") for f in mt.files()]
        want = sorted(r[0] for r in con.execute(
            f"SELECT id FROM read_parquet({files!r}) WHERE {where}"
        ).fetchall())
    finally:
        con.close()
    assert got == want, f"pruned read lost/invented rows for {flt!r}"


# =====================================================================
# Model-based DML differential: after a random INSERT/DELETE/UPDATE/
# OPTIMIZE sequence, EVERY retained version must read back exactly the
# model's snapshot (the manifest machinery is the transactional core —
# a COW bug here is silent history corruption).
# =====================================================================


@settings(max_examples=6, deadline=None)
@given(ops=st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(1, 5)),
        st.tuples(st.just("delete_mod"), st.integers(2, 7)),
        st.tuples(st.just("update_add"), st.integers(1, 9)),
        st.tuples(st.just("optimize"), st.just(0)),
    ),
    min_size=1, max_size=6,
))
def test_dml_history_matches_model(spark, tmp_path_factory, ops):
    import itertools

    eng = Engine(spark, datasets_root=str(
        tmp_path_factory.mktemp("dml-model")))
    from beacon_spark.managed import ManagedTable

    eng.sql("CREATE TABLE mt AS SELECT id, CAST(id AS DOUBLE) AS v "
            "FROM range(0, 20)")
    mt = ManagedTable(spark, eng.catalog._load()["tables"]["mt"])
    model = {i: float(i) for i in range(20)}  # id -> v
    # keyed by the ACTUAL committed version: a no-op OPTIMIZE (nothing
    # small enough to fold) correctly commits no new manifest
    history = {mt.current_version(): dict(model)}
    next_id = itertools.count(1000)
    for kind, arg in ops:
        if kind == "insert":
            ids = [next(next_id) for _ in range(arg)]
            vals = ", ".join(f"({i}, CAST({i} AS DOUBLE))" for i in ids)
            eng.sql(f"INSERT INTO mt VALUES {vals}")
            model.update({i: float(i) for i in ids})
        elif kind == "delete_mod":
            eng.sql(f"DELETE FROM mt WHERE id % {arg} = 0")
            model = {i: v for i, v in model.items() if i % arg != 0}
        elif kind == "update_add":
            eng.sql(f"UPDATE mt SET v = v + {arg} WHERE id % 3 = 1")
            model = {i: (v + arg if i % 3 == 1 else v)
                     for i, v in model.items()}
        else:
            eng.sql("OPTIMIZE mt")
            model = dict(model)  # compaction: contents unchanged
        history[mt.current_version()] = dict(model)
    # latest read matches the final model
    got = {r.id: r.v for r in eng.sql("SELECT * FROM mt").collect()}
    assert got == history[max(history)]
    # EVERY retained version matches its snapshot (COW time travel)
    for ver, snap in sorted(history.items()):
        rows = eng.sql(
            f"SELECT * FROM mt VERSION AS OF {ver}").collect()
        assert {r.id: r.v for r in rows} == snap, f"version {ver} diverged"
