"""Physical-plan audits for the headline queries: the properties that
make the 100 TB story true must hold in the executed plan, not just in
intent — pushed-down filters reach the parquet scan, projections prune
the read schema, small dims broadcast, and the hot relational path stays
inside whole-stage codegen (no Python in the loop)."""

import pytest


@pytest.fixture(scope="module")
def sf(sf_small):
    return sf_small


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf):
    import __spark_entry__ as E

    df = E._q_filter_range(spark, sf)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # the range predicate must appear inside the scan's pushed filters
    assert "GreaterThanOrEqual" in plan or "GreaterThan" in plan


def test_projection_prunes_read_schema(spark, sf):
    """A 2-column projection must not read all 16 lineitem columns."""
    df = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    rs = plan[plan.index("ReadSchema:"):].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs and "l_shipdate" not in rs


def test_top_orders_broadcasts_customer(spark, sf):
    import __spark_entry__ as E

    plan = _plan(E._q_top_orders(spark, sf))
    assert "BroadcastHashJoin" in plan


def test_pricing_summary_partial_agg(spark, sf):
    """groupBy must map-side combine (partial_ HashAggregate) before the
    exchange — the thing that keeps a 100 TB agg shuffle small."""
    import __spark_entry__ as E

    plan = _plan(E._q_pricing_summary(spark, sf))
    assert "partial_" in plan and "Exchange" in plan


def test_relational_path_no_python(spark, sf):
    """The relational headline queries must not drop into Python, and
    the final (AQE) plan must run inside whole-stage codegen — the
    ``*(n)`` stage markers in the executed plan."""
    import __spark_entry__ as E

    for q in (E._q_pricing_summary, E._q_top_orders, E._q_filter_range,
              E._q_window_topk):
        df = q(spark, sf)
        df.collect()  # let AQE finalize the plan
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "*(1)" in plan  # codegen stage marker


def test_sim_topk_is_take_ordered(spark, sf):
    """Exact cosine top-k must be TakeOrdered (per-partition partial
    top-k, only k rows to the driver) — not a global sort."""
    import __spark_entry__ as E

    plan = _plan(E._q_sim_topk(spark, sf))
    assert "TakeOrderedAndProject" in plan


def test_cosine_pairs_candidate_exchange_ids_only(spark):
    """cosine_pairs_lsh's candidate dedup must shuffle only pair ids:
    the HashAggregate implementing dropDuplicates(id_a, id_b) (and the
    exchange feeding it) must not carry vector payloads — vectors are
    re-joined per unique pair afterwards."""
    import numpy as np

    from beacon_spark.pipeline.similarity import cosine_pairs_lsh

    rng = np.random.default_rng(1)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = _plan(cosine_pairs_lsh(df, threshold=0.5))
    for line in plan.splitlines():
        if "HashAggregate" in line and "id_a" in line and "id_b" in line:
            assert "__va" not in line and "__vb" not in line and "__v#" not in line
            break
    else:
        pytest.fail("no dedup HashAggregate over (id_a, id_b) in plan")
    # no Exchange ships a vector column to the dedup
    for line in plan.splitlines():
        if "Exchange hashpartitioning(id_a" in line:
            assert "__va" not in line and "__vb" not in line


def test_federated_scan_filter_fully_pushed(spark, tmp_path):
    """A predicate the remote compiles must be CONSUMED by pushFilters:
    the local physical plan over the beacon_remote scan carries no
    residual Spark-side Filter for it (the remote's WHERE did the work),
    while an inexpressible predicate leaves a local Filter."""
    import json
    import os

    from beacon_spark.engine import Engine
    from beacon_spark.server import BeaconFlightServer

    root = str(tmp_path / "srv")
    os.makedirs(root)
    seng = Engine(spark, datasets_root=root)
    seng.sql("CREATE TABLE planf AS SELECT id, id % 3 AS g FROM range(50)")
    server = BeaconFlightServer(seng, port=0)
    port = server.serve_background()
    try:
        ceng = Engine(spark, datasets_root=str(tmp_path / "cli"))
        ceng.sql(f"ATTACH 'grpc://127.0.0.1:{port}' AS pln")
        pushed = ceng.sql("SELECT id FROM pln__planf WHERE id > 40")
        import re as _re

        plan = _plan(pushed)
        # no Filter NODE above the scan (RuntimeFilters: [] is scan
        # metadata, not a filter node) — fully pushed to the remote
        assert not _re.search(r"\bFilter \(", plan), plan
        assert pushed.count() == 9
        residual = ceng.sql("SELECT id FROM pln__planf WHERE id % 7 = 1")
        plan2 = _plan(residual)
        # the modulo predicate stays a local post-scan Filter node
        assert _re.search(r"\bFilter \(", plan2), plan2
    finally:
        ceng.sql("DETACH pln")
        server.shutdown()
