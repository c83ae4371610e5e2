"""Cross-PROCESS concurrency hammer for managed tables on a plain
filesystem root.

The thread-level race tests (test_managed.py) exercise the O_EXCL /
link-based manifest claim in one process; the bdb:// container got a
cross-process hammer in r11 (which found torn reads the thread tests
structurally could not). This is the same treatment for the plain-fs
path: several OS processes, each with its own SparkSession, fire
INSERT / UPDATE / OPTIMIZE at ONE file:// table; the parent then does
model-based verification — every acknowledged commit's rows are
present exactly once (zero lost rows, zero duplicates), update counts
reconstruct from the linearized version order, and historical versions
read back as the model's snapshot at that version.

Fresh worker seeds every run (SystemRandom), printed for reproduction
via SPARK_GRAFT_HAMMER_SEED.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import pytest

_WORKER = r"""
import json, random, sys
worker_id, path, log_path, seed, n_ops = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]))
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable, ManifestConflict

spark = get_spark(app_name=f"hammer{worker_id}", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
t = ManagedTable(spark, path)
rng = random.Random(seed)
log, batch = [], 0
for i in range(n_ops):
    op = rng.choice(["insert", "insert", "insert", "update", "update",
                     "compact"])
    if op == "insert":
        n = rng.randint(1, 4)
        rows = [(worker_id * 1_000_000 + batch * 1_000 + j,
                 worker_id, batch, 0) for j in range(n)]
        df = spark.createDataFrame(rows, "id long, w long, b long, val long")
        v = t.insert(df)  # insert retries internally
        log.append({"op": "insert", "version": v, "w": worker_id,
                    "b": batch, "n": n})
        batch += 1
    elif op == "update":
        for _ in range(25):
            try:
                v = t.update({"val": "val + 1"}, f"w = {worker_id}")
                log.append({"op": "update", "version": v, "w": worker_id})
                break
            except ManifestConflict:
                continue
    else:
        try:
            t.compact(target_file_bytes=1 << 20)
        except ManifestConflict:
            pass
with open(log_path, "w") as f:
    json.dump(log, f)
spark.stop()
print("DONE")
"""


_VACUUM_WORKER = r"""
import sys, time
path, seconds = sys.argv[1], float(sys.argv[2])
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable, ManifestConflict

spark = get_spark(app_name="vachammer", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
t = ManagedTable(spark, path)
end = time.time() + seconds
n = 0
while time.time() < end:
    try:
        t.vacuum(retain_versions=1)
        n += 1
    except ManifestConflict:
        pass
    time.sleep(0.02)
spark.stop()
print(f"VACUUMS {n}")
"""

_INSERT_WORKER = r"""
import sys
worker_id, path, n_ops = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable

spark = get_spark(app_name=f"inshammer{worker_id}", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
t = ManagedTable(spark, path)
for b in range(n_ops):
    df = spark.createDataFrame(
        [(worker_id * 1_000_000 + b, worker_id, b)], "id long, w long, b long")
    t.insert(df)
spark.stop()
print("DONE")
"""


def test_vacuum_races_concurrent_inserts_across_processes(spark, tmp_path):
    """A VACUUM loop in one process races INSERTs from two others
    against one file:// table. The r11 fix: a data file moved into
    data/ before its manifest commit must never be deleted (the table
    would serve file-not-found forever). Every acknowledged insert must
    be present and READABLE at the end — zero lost rows, no dangling
    manifest references."""
    from beacon_spark.managed import ManagedTable

    path = str(tmp_path / "vt")
    t = ManagedTable(spark, path)
    t.create(spark.createDataFrame([(0, -1, 0)], "id long, w long, b long"))

    n_ops = 8
    writers = [subprocess.Popen(
        [sys.executable, "-c", _INSERT_WORKER, str(w), path, str(n_ops)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo")
        for w in (1, 2)]
    vac = subprocess.Popen(
        [sys.executable, "-c", _VACUUM_WORKER, path, "25"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo")
    for p in writers:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0 and b"DONE" in out, err.decode()[-2000:]
    out, err = vac.communicate(timeout=480)
    assert vac.returncode == 0, err.decode()[-2000:]
    n_vac = int(out.split()[-1])
    assert n_vac > 0, "vacuum loop never ran"

    # every acknowledged row present and the referenced files readable
    rows = t.read().collect()
    ids = sorted(r.id for r in rows)
    want = sorted([0] + [w * 1_000_000 + b for w in (1, 2)
                         for b in range(n_ops)])
    assert ids == want, f"lost/extra rows after {n_vac} vacuums"


def test_multiprocess_insert_update_optimize_hammer(spark, tmp_path):
    from beacon_spark.managed import ManagedTable

    seed0 = int(os.environ.get("SPARK_GRAFT_HAMMER_SEED",
                               random.SystemRandom().randrange(1 << 30)))
    print(f"hammer seed: {seed0} (SPARK_GRAFT_HAMMER_SEED to reproduce)")

    path = str(tmp_path / "ht")
    t = ManagedTable(spark, path)
    t.create(spark.createDataFrame([(0, -1, 0, 0)],
                                   "id long, w long, b long, val long"))

    n_workers, n_ops = 3, 10
    procs, log_paths = [], []
    for w in range(n_workers):
        lp = str(tmp_path / f"log{w}.json")
        log_paths.append(lp)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(w), path, lp,
             str(seed0 + 7 * w), str(n_ops)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo"))
    outs = [p.communicate(timeout=480) for p in procs]
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0 and b"DONE" in out, err.decode()[-2000:]

    log: list[dict] = []
    for lp in log_paths:
        log.extend(json.load(open(lp)))
    inserts = [e for e in log if e["op"] == "insert"]
    updates = [e for e in log if e["op"] == "update"]
    assert inserts, "hammer produced no inserts"
    versions = [e["version"] for e in log]
    assert len(versions) == len(set(versions)), \
        "two acknowledged commits share a version number"

    # ---- final state: zero lost rows, zero duplicates ----------------
    rows = t.read().collect()
    got = {}
    for r in rows:
        got.setdefault((r.w, r.b), []).append(r)
    assert len(got.pop((-1, 0))) == 1  # the seed row
    expected_batches = {(e["w"], e["b"]): e for e in inserts}
    assert set(got) == set(expected_batches), (
        f"row batches mismatch: missing="
        f"{set(expected_batches) - set(got)} "
        f"extra={set(got) - set(expected_batches)} seed={seed0}")
    for key, e in expected_batches.items():
        batch_rows = got[key]
        assert len(batch_rows) == e["n"], (key, seed0)
        want_val = sum(1 for u in updates
                       if u["w"] == e["w"] and u["version"] > e["version"])
        assert all(r.val == want_val for r in batch_rows), (
            f"{key}: vals={[r.val for r in batch_rows]} "
            f"want {want_val} seed={seed0}")

    # ---- time travel: sampled versions replay the model --------------
    sample = sorted(versions)[:: max(1, len(versions) // 8)]
    for v in sample:
        snap = t.read(version=v).collect()
        want_rows = 1 + sum(e["n"] for e in inserts if e["version"] <= v)
        assert len(snap) == want_rows, (v, seed0)
        want_sum = sum(
            e["n"] * sum(1 for u in updates
                         if u["w"] == e["w"] and e["version"] < u["version"] <= v)
            for e in inserts if e["version"] <= v)
        assert sum(r.val for r in snap) == want_sum, (v, seed0)


_MOCK_PREAMBLE = r"""
def _register_mock(root):
    from urllib.parse import urlparse

    from pyarrow import fs as pafs

    from beacon_spark.sources import bytesource as bs

    class SubFS(bs._ArrowFS):
        def __init__(self, scheme, authority):
            self.scheme, self.authority = scheme, authority
            self.fs = pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())
            self._root = ""

        def spark_path(self, uri):
            return root + urlparse(uri).path

    bs.register_scheme("mock", SubFS)
"""

_INSERT_WORKER_URI = _MOCK_PREAMBLE + r"""
import sys
worker_id, path, n_ops = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
if path.startswith("mock://"):
    _register_mock(sys.argv[4])
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable

spark = get_spark(app_name=f"inshammer{worker_id}", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
t = ManagedTable(spark, path)
for b in range(n_ops):
    df = spark.createDataFrame(
        [(worker_id * 1_000_000 + b, worker_id, b)], "id long, w long, b long")
    t.insert(df)
spark.stop()
print("DONE")
"""

_VACUUM_WORKER_URI = _MOCK_PREAMBLE + r"""
import sys, time
path, seconds = sys.argv[1], float(sys.argv[2])
if path.startswith("mock://"):
    _register_mock(sys.argv[3])
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable, ManifestConflict

spark = get_spark(app_name="vachammer", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
t = ManagedTable(spark, path)
end = time.time() + seconds
n = 0
while time.time() < end:
    try:
        t.vacuum(retain_versions=1)
        n += 1
    except ManifestConflict:
        pass
    time.sleep(0.02)
spark.stop()
print(f"VACUUMS {n}")
"""


_KILL_WORKER = _MOCK_PREAMBLE + r"""
import os, sys
worker_id, path, ack_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
if path.startswith("mock://"):
    _register_mock(sys.argv[4])
from beacon_spark.session import get_spark
from beacon_spark.managed import ManagedTable
spark = get_spark(app_name=f"killhammer{worker_id}", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={"spark.driver.memory": "2g"})
from beacon_spark.managed import ManifestConflict
t = ManagedTable(spark, path)
ack = open(ack_path, "a")
b = 0
while True:
    rid = worker_id * 1_000_000 + b
    df = spark.createDataFrame([(rid, worker_id, b)],
                               "id long, w long, b long")
    t.insert(df)
    # durably acknowledge AFTER the commit returns: rows in the table
    # must always be a SUPERSET of these ids
    ack.write(f"{rid}\n"); ack.flush(); os.fsync(ack.fileno())
    b += 1
    if b % 3 == 0:
        # a kill mid-COMPACTION (rewriting every live file) is a
        # different window than mid-insert: rows must survive it too
        try:
            t.compact(target_file_bytes=1 << 20)
        except ManifestConflict:
            pass
"""


@pytest.mark.parametrize("backend", ["fs", "mock"])
def test_sigkill_mid_commit_never_loses_acknowledged_rows(
        spark, tmp_path, monkeypatch, backend):
    """Crash consistency: a writer SIGKILLed at a random point (possibly
    mid-Spark-write, mid-rename, or mid-manifest-claim) must leave the
    table readable, every DURABLY ACKNOWLEDGED insert present exactly
    once, new commits accepted, and its abandoned staging reclaimable —
    the invariants the O_EXCL/link claim + staging-grace design exists
    to provide. (The hammers cover concurrent completions; this covers
    torn executions.) The mock:// leg drives the _ArrowFS plane —
    native renames, link-based publish_if_absent — through the same
    kill windows."""
    import signal
    import time

    from beacon_spark.managed import ManagedTable

    extra: list[str] = []
    if backend == "mock":
        from urllib.parse import urlparse

        from pyarrow import fs as pafs

        from beacon_spark.sources import bytesource as bs

        root = str(tmp_path / "store")
        os.makedirs(root)

        class SubFS(bs._ArrowFS):
            def __init__(self, scheme, authority):
                self.scheme, self.authority = scheme, authority
                self.fs = pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())
                self._root = ""

            def spark_path(self, uri):
                return root + urlparse(uri).path

        bs.register_scheme("mock", SubFS)
        path = "mock://bucket/kt"
        extra = [root]
    else:
        path = str(tmp_path / "kt")
    t = ManagedTable(spark, path)
    t.create(spark.createDataFrame([(0, -1, 0)], "id long, w long, b long"))

    acked: list[int] = []
    for w in (1, 2, 3):  # three independent kill windows
        ack_path = str(tmp_path / f"ack{w}.txt")
        p = subprocess.Popen(
            [sys.executable, "-c", _KILL_WORKER, str(w), path, ack_path]
            + extra,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            cwd="/root/repo")
        # wait until the worker is actually committing, then strike at
        # a random moment inside the insert loop
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(ack_path) and os.path.getsize(ack_path):
                break
            if p.poll() is not None:
                raise AssertionError(
                    p.communicate()[1].decode()[-2000:])
            time.sleep(0.05)
        else:
            raise AssertionError("worker never committed")
        time.sleep(random.SystemRandom().uniform(0.0, 1.5))
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        with open(ack_path) as f:
            acked += [int(x) for x in f.read().split()]

    # every durably acknowledged row present; nothing duplicated
    rows = [r.id for r in t.read().collect()]
    assert len(rows) == len(set(rows)), "duplicated rows after crashes"
    missing = set(acked) - set(rows)
    assert not missing, f"lost acknowledged rows: {sorted(missing)[:5]}"

    # the table still accepts and serves new commits
    t.insert(spark.createDataFrame([(999_999_999, 9, 0)],
                                   "id long, w long, b long"))
    assert 999_999_999 in {r.id for r in t.read().collect()}

    # the killed writers' staging dirs AND orphaned manifest tmp files
    # reclaim once out of grace
    from beacon_spark.sources import bytesource as bs_mod

    monkeypatch.setattr(ManagedTable, "STAGING_GRACE_SECS", 0.0)
    t.vacuum(retain_versions=1)
    leftover = [d for d in bs_mod.listdir(t.path)
                if d.startswith("_staging-")]
    assert not leftover, leftover
    tmps = [f for f in bs_mod.listdir(bs_mod.join(t.path, "_manifests"))
            if ".tmp-" in f]
    assert not tmps, tmps
    after = {r.id for r in t.read().collect()}
    assert set(acked) <= after and 999_999_999 in after


def test_sigkill_mid_commit_on_bdb_container(spark, tmp_path):
    """Crash consistency on the bdb:// container: a SIGKILLed writer
    leaves a mid-transaction sqlite journal, per-process shadow
    cache/stage scratch, and possibly a half-staged Spark write. The
    table must stay readable with every durably acknowledged row
    present, keep accepting commits, and the dead process's shadow dir
    must reap on the next container open (the (pid, starttime)
    ownership sweep)."""
    import signal
    import tempfile as _tempfile
    import time

    from beacon_spark.managed import ManagedTable
    from beacon_spark.sources import container as bc

    db = str(tmp_path / "lake.db")
    path = f"bdb://{db}/kt"
    t = ManagedTable(spark, path)
    t.create(spark.createDataFrame([(0, -1, 0)], "id long, w long, b long"))

    acked: list[int] = []
    dead_pids: list[int] = []
    for w in (1, 2):
        ack_path = str(tmp_path / f"back{w}.txt")
        p = subprocess.Popen(
            [sys.executable, "-c", _KILL_WORKER, str(w), path, ack_path],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            cwd="/root/repo")
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(ack_path) and os.path.getsize(ack_path):
                break
            if p.poll() is not None:
                raise AssertionError(p.communicate()[1].decode()[-2000:])
            time.sleep(0.05)
        else:
            raise AssertionError("worker never committed")
        time.sleep(random.SystemRandom().uniform(0.0, 1.5))
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        dead_pids.append(p.pid)
        with open(ack_path) as f:
            acked += [int(x) for x in f.read().split()]

    rows = [r.id for r in t.read().collect()]
    assert len(rows) == len(set(rows)), "duplicated rows after crashes"
    missing = set(acked) - set(rows)
    assert not missing, f"lost acknowledged rows: {sorted(missing)[:5]}"
    t.insert(spark.createDataFrame([(999_999_999, 9, 0)],
                                   "id long, w long, b long"))
    assert 999_999_999 in {r.id for r in t.read().collect()}

    # reopening the container sweeps the dead workers' shadow scratch
    bc.close_container(db)
    t.read().count()  # reopens → _reap_dead_shadows runs
    base = os.path.join(_tempfile.gettempdir(), "beacon-bdb")
    stale = []
    for name in os.listdir(base) if os.path.isdir(base) else []:
        pf = os.path.join(base, name, "owner.pid")
        try:
            pid = int(open(pf).read().split()[0])
        except (OSError, ValueError, IndexError):
            continue
        if pid in dead_pids:
            stale.append(name)
    assert not stale, f"dead workers' shadow dirs not reaped: {stale}"
    bc.close_container(db)


@pytest.mark.parametrize("backend", ["mock", "bdb"])
def test_vacuum_races_inserts_on_remote_backends(spark, tmp_path, backend):
    """r14 (VERDICT #2): the r13/r14 vacuum-safety fixes lean on
    primitives whose semantics differ off the plain filesystem —
    bs.touch landing stamps, bs.mtime, listing consistency, and
    put-if-absent. Run the cross-process VACUUM-vs-INSERT hammer on
    the mock:// object store (SubTree Arrow fs: NATIVE renames that
    preserve mtimes, facade-mediated listing) and the bdb:// container
    (sqlite conditional put, key-UPDATE renames). Every acknowledged
    insert must be present exactly once and readable at the end."""
    from beacon_spark.managed import ManagedTable
    from beacon_spark.sources import bytesource as bs

    if backend == "mock":
        from urllib.parse import urlparse

        from pyarrow import fs as pafs

        root = str(tmp_path / "store")
        os.makedirs(root)

        class SubFS(bs._ArrowFS):
            def __init__(self, scheme, authority):
                self.scheme, self.authority = scheme, authority
                self.fs = pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())
                self._root = ""

            def spark_path(self, uri):
                return root + urlparse(uri).path

        bs.register_scheme("mock", SubFS)
        path = "mock://bucket/vt"
        extra = [root]
    else:
        path = f"bdb://{tmp_path / 'lake.db'}/vt"
        extra = []

    try:
        t = ManagedTable(spark, path)
        t.create(spark.createDataFrame([(0, -1, 0)],
                                       "id long, w long, b long"))

        n_ops = 6
        writers = [subprocess.Popen(
            [sys.executable, "-c", _INSERT_WORKER_URI, str(w), path,
             str(n_ops)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo")
            for w in (1, 2)]
        vac = subprocess.Popen(
            [sys.executable, "-c", _VACUUM_WORKER_URI, path, "20"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo")
        for p in writers:
            out, err = p.communicate(timeout=480)
            assert p.returncode == 0 and b"DONE" in out, err.decode()[-2000:]
        out, err = vac.communicate(timeout=480)
        assert vac.returncode == 0, err.decode()[-2000:]
        n_vac = int(out.split()[-1])
        assert n_vac > 0, "vacuum loop never ran"

        ids = sorted(r.id for r in t.read().collect())
        want = sorted([0] + [w * 1_000_000 + b for w in (1, 2)
                             for b in range(n_ops)])
        assert ids == want, (
            f"lost/extra rows after {n_vac} vacuums on {backend}")

        # quiesced post-hammer vacuum with zero grace: old unreferenced
        # files reclaim; every acknowledged row still reads back
        t2 = ManagedTable(spark, path)
        t2.vacuum(retain_versions=1, grace_seconds=0.0)
        assert sorted(r.id for r in t2.read().collect()) == want
    finally:
        if backend == "mock":
            bs.register_scheme("mock", SubFS)  # drop cached instance
