"""Scale-regression guards: fixed job-count / metadata-op budgets.

The round-6 COW-probe bug (one Spark job PER FILE on UPDATE/DELETE) was
found by reading plans, not by a test; these pin the budgets so an
accidental per-file loop can't come back. Each op runs against the
accounting ``mock://`` store at N=64 and N=256 data files (both above
Spark's parallel-partition-discovery threshold, so the one bounded
listing job appears on both sides) and must spend IDENTICAL Spark job
counts and metadata-plane op counts — anything
O(files) on the driver/metadata path is a regression the diff will
show as a changed budget (reference contract: actions.rs DML plans one
scan regardless of fragment count).
"""

import uuid
from collections import Counter
from urllib.parse import urlparse

import pytest

from beacon_spark.engine import Engine
from beacon_spark.sources import bytesource as bs


class BudgetStoreFS(bs._ArrowFS):
    root_dir: str = ""
    ops = Counter()  # class-level: survives per-call instantiation

    def __init__(self, scheme, authority):
        from pyarrow import fs as pafs

        self.scheme, self.authority = scheme, authority
        self.fs = pafs.SubTreeFileSystem(self.root_dir, pafs.LocalFileSystem())
        self._root = ""

    def spark_path(self, uri: str) -> str:
        BudgetStoreFS.ops["spark_path"] += 1
        return self.root_dir + urlparse(uri).path

    def _count(name):
        def wrapper(self, *a, **kw):
            BudgetStoreFS.ops[name] += 1
            return getattr(bs._ArrowFS, name)(self, *a, **kw)

        wrapper.__name__ = name
        return wrapper

    for _m in ("read_bytes", "write_bytes", "publish_bytes", "listdir",
               "makedirs", "move", "remove", "rmtree", "isdir", "exists"):
        locals()[_m] = _count(_m)
    del _m, _count


@pytest.fixture()
def budget_root(tmp_path, spark):
    store_dir = tmp_path / "bstore"
    store_dir.mkdir()
    BudgetStoreFS.root_dir = str(store_dir)
    BudgetStoreFS.ops = Counter()
    bs.register_scheme("bmock", BudgetStoreFS)
    # keep file listing driver-side at every N so job counts compare OUR
    # code, not Spark's parallel-discovery regime change at 32 paths
    key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "100000")
    yield "bmock://lake"
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)
    bs._SCHEMES.pop("bmock", None)
    bs._FS_CACHE.clear()


def _measure(spark, fn):
    """(spark job count, metadata op Counter) spent by ``fn``."""
    sc = spark.sparkContext
    gid = f"budget-{uuid.uuid4().hex[:8]}"
    before = Counter(BudgetStoreFS.ops)
    sc.setJobGroup(gid, "budget probe")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
    delta = Counter(BudgetStoreFS.ops)
    delta.subtract(before)
    return jobs, +delta


def _mk_table(eng, name: str, nfiles: int) -> None:
    """A managed table whose current version holds ``nfiles`` parquet
    fragments (one CTAS over a repartitioned source)."""
    eng.sql(f"CREATE TABLE {name} AS "
            f"SELECT id, id % 16 AS g, CAST(id AS DOUBLE) AS v "
            f"FROM (SELECT /*+ REPARTITION({nfiles}) */ id "
            f"      FROM range({nfiles * 50}))")


def _budgets_for(spark, budget_root, op, nfiles, prep=None):
    # one lake root PER SIZE: budgets must reflect this table's file
    # count, not catalog neighbors resolved alongside it
    eng = Engine(spark, datasets_root=f"{budget_root}/n{nfiles}")
    name = f"t{nfiles}_{uuid.uuid4().hex[:6]}"
    _mk_table(eng, name, nfiles)
    if prep is not None:
        prep(eng, name)
    return _measure(spark, lambda: op(eng, name))


def _assert_same_budget(spark, budget_root, op, prep=None, label=""):
    ja, opsa = _budgets_for(spark, budget_root, op, 64, prep)
    jb, opsb = _budgets_for(spark, budget_root, op, 256, prep)
    assert ja == jb, (
        f"{label}: Spark job count scales with file count "
        f"(N=64 → {ja} jobs, N=256 → {jb} jobs)"
    )
    for k in ("listdir", "read_bytes", "isdir", "exists"):
        assert opsa[k] == opsb[k], (
            f"{label}: metadata op {k} scales with file count "
            f"(N=64 → {opsa[k]}, N=256 → {opsb[k]}); full deltas "
            f"{dict(opsa)} vs {dict(opsb)}"
        )
    return ja, opsa


def test_update_budget_fixed(spark, budget_root):
    """UPDATE touching a single id must cost the same jobs/metadata ops
    on a 4-file and a 64-file table (the r6 one-job touched-file probe,
    managed.py:274-299)."""
    jobs, _ = _assert_same_budget(
        spark, budget_root,
        lambda eng, name: eng.sql(f"UPDATE {name} SET v = -1 WHERE id = 7"),
        label="UPDATE",
    )
    assert jobs <= 5, f"UPDATE spends {jobs} jobs — expected a small constant"


def test_delete_budget_fixed(spark, budget_root):
    _assert_same_budget(
        spark, budget_root,
        lambda eng, name: eng.sql(f"DELETE FROM {name} WHERE id = 7"),
        label="DELETE",
    )


def test_optimize_budget_fixed(spark, budget_root):
    """OPTIMIZE reads all fragments (inherent, one distributed scan) but
    must not spend driver jobs or metadata ops per file."""
    _assert_same_budget(
        spark, budget_root,
        lambda eng, name: eng.sql(f"OPTIMIZE {name}"),
        label="OPTIMIZE",
    )


def test_pruned_read_budget_fixed(spark, budget_root):
    """A btree-indexed point read plans the same number of jobs and
    metadata ops whatever the fragment count — pruning happens from the
    index metadata, not by touching files."""

    def prep(eng, name):
        eng.sql(f"CREATE INDEX idx_{name} ON {name} (id)")

    _assert_same_budget(
        spark, budget_root,
        lambda eng, name: eng.sql(
            f"SELECT count(*) AS c FROM {name} WHERE id = 7").collect(),
        prep=prep,
        label="pruned read",
    )


def test_crawler_resweep_budget(spark, budget_root, tmp_path):
    """The FIRST crawler sweep legitimately reads each new dataset once
    (schema registration is per-discovery work); the invariant that must
    hold at scale is the STEADY STATE: a re-sweep that discovers nothing
    new spends a flat, dataset-count-independent budget — the daily
    sweep over a 100 TB lake must not re-read footers."""

    def run(nfiles):
        eng = Engine(spark, datasets_root=budget_root)
        fs = bs.fs_for(budget_root)
        sub = f"crawl{nfiles}"
        df = spark.range(10).selectExpr("id")
        for i in range(nfiles):
            df.coalesce(1).write.mode("overwrite").parquet(
                fs.spark_path(f"{budget_root}/{sub}/ds{i}.parquet"))
        eng.sql(f"CREATE CRAWLER c_{sub} ON '{sub}'")
        eng.sql(f"RUN CRAWLER c_{sub}")  # discovery sweep: O(new) reads
        return _measure(spark, lambda: eng.sql(f"RUN CRAWLER c_{sub}"))

    ja, opsa = run(8)
    jb, opsb = run(48)
    assert ja == jb, f"crawler re-sweep jobs scale: {ja} vs {jb}"
    # the listing CALL count must not be per-dataset (one tree walk)
    assert opsb["listdir"] <= opsa["listdir"] + 2, (
        f"crawler listdir calls scale with dataset count: "
        f"{opsa['listdir']} vs {opsb['listdir']}"
    )
    assert opsb["read_bytes"] == opsa["read_bytes"], (
        f"crawler re-sweep reads bytes per dataset: {opsa['read_bytes']} "
        f"vs {opsb['read_bytes']}"
    )


def test_statement_overhead_independent_of_table_count(spark, budget_root):
    """signature() is ONE catalog read (no per-table manifest LISTs) and
    DML re-registers only its own table: a SELECT, and an INSERT
    followed by a SELECT, spend identical metadata ops whether the
    catalog holds 3 or 24 tables. Before this pin, EVERY statement paid
    one listdir per catalog table just to compute the change token."""

    def run(ntables):
        eng = Engine(spark, datasets_root=f"{budget_root}/cat{ntables}")
        for i in range(ntables):
            eng.sql(f"CREATE TABLE ct{i} AS SELECT id FROM range(10)")
        eng.sql("SELECT count(*) FROM ct0").collect()  # settle registration
        jq, opsq = _measure(
            spark,
            lambda: eng.sql("SELECT count(*) AS c FROM ct0").collect())
        jd, opsd = _measure(
            spark,
            lambda: (eng.sql("INSERT INTO ct0 SELECT id FROM range(5)"),
                     eng.sql("SELECT count(*) AS c FROM ct0").collect()))
        return (jq, opsq), (jd, opsd)

    (qa, da) = run(3)
    (qb, db) = run(24)
    for k in ("listdir", "read_bytes", "isdir", "exists"):
        assert qa[1][k] == qb[1][k], (
            f"SELECT metadata op {k} scales with catalog size: "
            f"{qa[1][k]} vs {qb[1][k]}")
        assert da[1][k] == db[1][k], (
            f"INSERT+SELECT metadata op {k} scales with catalog size: "
            f"{da[1][k]} vs {db[1][k]}")
    assert qa[0] == qb[0] and da[0] == db[0]


def test_federated_pushdown_remote_call_budget(spark, tmp_path):
    """VERDICT r7 item 7: one schema plan (get_flight_info/query_schema)
    + one do_get per pushed statement — never per-row/per-partition
    re-planning — and the (endpoint, principal) connection cache is hit
    across repeated statements. Pinned at two statement counts: the
    per-statement budget must not grow with history."""
    from beacon_spark.engine import Engine
    from beacon_spark.server import BeaconFlightServer
    import beacon_spark.server.remote as rem

    root = str(tmp_path / "fedbudget")
    eng = Engine(spark, datasets_root=root)
    eng.sql("CREATE TABLE fb AS SELECT id, id % 3 AS g FROM range(30)")
    server = BeaconFlightServer(eng, port=0)
    port = server.serve_background()
    counts = {"schema": 0, "do_get": 0, "conns": 0}
    orig_qs = rem.RemoteBeacon.query_schema
    orig_dg = BeaconFlightServer.do_get
    orig_init = rem.RemoteBeacon.__init__

    def spy_qs(self, sql):
        counts["schema"] += 1
        return orig_qs(self, sql)

    def spy_dg(self, context, ticket):
        counts["do_get"] += 1
        return orig_dg(self, context, ticket)

    def spy_init(self, *a, **kw):
        counts["conns"] += 1
        return orig_init(self, *a, **kw)

    rem.RemoteBeacon.query_schema = spy_qs
    BeaconFlightServer.do_get = spy_dg
    rem.RemoteBeacon.__init__ = spy_init
    try:
        ceng = Engine(spark, datasets_root=str(tmp_path / "fbc"))
        ceng.sql(f"ATTACH 'grpc://127.0.0.1:{port}' AS lake")
        conns_after_attach = counts["conns"]

        def run_n(n):
            before = dict(counts)
            for _ in range(n):
                rows = ceng.sql(
                    "SELECT g, count(*) AS n FROM lake__fb GROUP BY g"
                ).collect()
                assert len(rows) == 3
            return {k: counts[k] - before[k] for k in counts}

        d2 = run_n(2)
        d4 = run_n(4)
        # exactly one plan + one fetch per statement, at both counts
        assert d2["schema"] == 2 and d4["schema"] == 4
        assert d2["do_get"] == 2 and d4["do_get"] == 4
        # no new connections after ATTACH — the cache is hit throughout
        assert d2["conns"] == 0 and d4["conns"] == 0
        assert counts["conns"] == conns_after_attach
        ceng.sql("DETACH lake")
    finally:
        rem.RemoteBeacon.query_schema = orig_qs
        BeaconFlightServer.do_get = orig_dg
        rem.RemoteBeacon.__init__ = orig_init
        server.shutdown()
        eng.sql("DROP TABLE fb")


# ---------------------------------------------------------------- r9: AQE
# skew-split pins for the band/span self-joins. At 100 TB a boilerplate-
# heavy corpus makes one band or span key hot; session.py enables AQE
# skew-join, but nothing pinned that OUR join shapes (cached inputs,
# residual id-inequality, trailing distinct) remain splittable. These
# plant a hot key and assert the executed plan shows the split.

import contextlib


@contextlib.contextmanager
def _skew_confs(spark):
    """Test-scale AQE skew thresholds (+ forced SMJ — a broadcast join
    has no skew problem and would mask the property being pinned)."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # test-scale bytes: shuffle blocks are lz4-compressed, so a
        # hot partition of (long, long) rows measures just a few KB
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    }
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    df.rdd.getNumPartitions()  # materialize -> AQE final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_minhash_hot_band_key_splits_under_aqe(spark):
    """A boilerplate clique shares ONE band signature (identical text,
    bands=1): the candidate self-join's hot partition is split by AQE
    (SortMergeJoin(skew=true)) instead of landing on one straggler
    task, and the verified pairs stay exactly the boilerplate clique.
    Pins that the join SHAPE (cached inputs, id-inequality residual,
    trailing distinct) stays AQE-splittable."""
    from pyspark.sql import functions as F

    from beacon_spark.pipeline.dedup import minhash_lsh_pairs

    n_hot, n_uniq = 600, 80
    boiler = " ".join(f"w{j}" for j in range(12))
    docs = spark.range(n_hot + n_uniq).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit(boiler)).otherwise(
            F.concat_ws(" ", *[
                F.concat(F.lit(f"u{j}x"), F.col("id")) for j in range(12)
            ])
        ).alias("text"),
    )
    with _skew_confs(spark):
        pairs = minhash_lsh_pairs(
            docs, threshold=0.5, num_perm=8, bands=1)
        plan = _final_plan(pairs)
        assert "skew=true" in plan, plan[:800]
        assert pairs.count() == n_hot * (n_hot - 1) // 2


def test_span_dedup_hot_span_key_salted(spark):
    """A boilerplate passage repeated across a large doc clique makes
    ONE span key hot. AQE's OptimizeSkewedJoin cannot split this join
    (the dup-keys child is an aggregate, which its SMJ pattern does not
    match — verified in r9), so the operator salts: the join keys must
    include the salt column (the hot key fans across 16 shuffle keys
    instead of one straggler task) and every boilerplate doc reports
    its span duplicated."""
    from pyspark.sql import functions as F

    from beacon_spark.pipeline.dedup import duplicate_spans

    n_hot, n_uniq = 400, 80
    # exactly 13 tokens -> ONE span per hot doc: a single hot span key
    boiler = " ".join(f"b{j}" for j in range(13))
    docs = spark.range(n_hot + n_uniq).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit(boiler)).otherwise(
            F.concat_ws(" ", *[
                F.concat(F.lit(f"v{j}x"), F.col("id")) for j in range(14)
            ])
        ).alias("text"),
    )
    with _skew_confs(spark):
        out = duplicate_spans(docs, n=13)
        plan = _final_plan(out)
        # the spans-vs-dup-keys join shuffles on (__k, __s): the salt
        # IS in the join keys, so a hot __k cannot own one partition
        import re

        m = re.search(r"Join.*__k#\d+L?, __s#\d+", plan)
        assert m, plan[:1200]
        hot = out.filter(F.col("doc_id") < n_hot).collect()
        assert len(hot) == n_hot
        assert all(r.dup_spans == r.total_spans == 1 for r in hot)


def test_span_dedup_salt_distributes_hot_key(spark):
    """The salt actually spreads the hot key: the planted clique's span
    rows land on >1 salt value (deterministic pmod(xxhash64(id), 16))."""
    from pyspark.sql import functions as F

    n = spark.range(400).select(
        F.pmod(F.xxhash64("id"), F.lit(16)).alias("s")
    ).select(F.countDistinct("s").alias("d")).collect()[0].d
    assert n == 16
