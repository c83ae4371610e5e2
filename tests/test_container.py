"""Single-file ``beacon.db`` container databases (``bdb://`` scheme).

Parity target: the reference's embedded mode — ``Database::open``
(``beacon-core/src/embedded.rs:66-110``) over a one-file
``beacon_redb_store::RedbStore`` (``beacon-redb-store/src/lib.rs``):
"copy it and you carry the whole dataset with you". These tests pin

- the store primitives (transactional writes, native rename, ranged
  reads that never extract the object),
- the staging absorb that lets the Spark JVM write parquet "into" the
  container,
- the full managed workflow (CTAS / DML / time travel / MV) running
  inside one file, and
- the headline property: checkpoint, copy the ONE file elsewhere,
  reopen, everything is there.
"""

import os
import shutil
import sqlite3

import pytest

from beacon_spark.sources import bytesource as bs
from beacon_spark.sources import container as bc


@pytest.fixture()
def root(tmp_path):
    yield f"bdb://{tmp_path}/lake.db"
    bc.close_container(str(tmp_path / "lake.db"))


# ------------------------------------------------------------ primitives


def test_split_uri_forms(tmp_path):
    db, key = bc.split_uri(f"bdb://{tmp_path}/lake.db/a/b/c.json")
    assert db == f"{tmp_path}/lake.db" and key == "a/b/c.json"
    db, key = bc.split_uri(f"bdb://{tmp_path}/lake.db")
    assert key == ""
    with pytest.raises(bc.ContainerError):
        bc.split_uri(f"bdb://{tmp_path}/no-container-here/x")
    with pytest.raises(bc.ContainerError):
        bc.split_uri("s3://bucket/lake.db/x")


def test_write_read_list_move_delete(root):
    bs.publish_bytes(f"{root}/catalog.json", b'{"v":1}')
    bs.write_bytes(f"{root}/t/data/a.parquet", b"P" * 64)
    bs.write_bytes(f"{root}/t/data/b.parquet", b"Q" * 32)

    assert bs.read_bytes(f"{root}/catalog.json") == b'{"v":1}'
    assert bs.listdir(root) == ["catalog.json", "t"]
    assert bs.listdir(f"{root}/t/data") == ["a.parquet", "b.parquet"]
    assert bs.isdir(f"{root}/t") and not bs.isfile(f"{root}/t")
    assert bs.isfile(f"{root}/catalog.json")
    assert not bs.exists(f"{root}/nope")
    assert bs.mtime(f"{root}/catalog.json") > 0

    # native rename: a directory move is one key rewrite, not copy+delete
    bs.move(f"{root}/t", f"{root}/u")
    assert not bs.exists(f"{root}/t")
    assert bs.listdir(f"{root}/u/data") == ["a.parquet", "b.parquet"]

    # overwrite via publish is atomic-per-key (a sqlite transaction)
    bs.publish_bytes(f"{root}/catalog.json", b'{"v":2}')
    assert bs.read_bytes(f"{root}/catalog.json") == b'{"v":2}'

    bs.remove(f"{root}/u/data/b.parquet")
    assert bs.listdir(f"{root}/u/data") == ["a.parquet"]
    bs.rmtree(f"{root}/u")
    assert not bs.exists(f"{root}/u")
    with pytest.raises(FileNotFoundError):
        bs.remove(f"{root}/u/data/b.parquet")


def test_walk_and_glob(root):
    for k in ("m/v1.json", "m/v2.json", "d/x/a.parquet", "top.txt"):
        bs.write_bytes(f"{root}/{k}", b"x")
    walked = {d: (tuple(dd), tuple(ff)) for d, dd, ff in bs.walk(root)}
    assert walked[root.rstrip("/")][1] == ("top.txt",)
    assert set(walked[root.rstrip("/")][0]) == {"m", "d"}
    assert walked[f"{root}/m"][1] == ("v1.json", "v2.json")
    assert bs.glob(f"{root}/m/*.json") == [f"{root}/m/v1.json", f"{root}/m/v2.json"]
    # glob.glob semantics, SAME as the r10-fixed _ArrowFS glob: '*'
    # stays within one path segment (fnmatch's crossed '/' and returned
    # files a local glob never would), '**' spans directories
    assert bs.glob(f"{root}/*/a.parquet") == []
    assert bs.glob(f"{root}/*/*/a.parquet") == [f"{root}/d/x/a.parquet"]
    assert bs.glob(f"{root}/**/a.parquet") == [f"{root}/d/x/a.parquet"]
    assert bs.glob(f"{root}/*.txt") == [f"{root}/top.txt"]


def test_ranged_reads_never_extract(root, tmp_path):
    payload = os.urandom(1 << 20)
    bs.write_bytes(f"{root}/big.bin", payload)
    buf = bs.open_buffer(f"{root}/big.bin")
    assert len(buf) == len(payload)
    assert bs.read_range(buf, 12345, 100) == payload[12345:12445]
    assert bs.read_head(f"{root}/big.bin", 16) == payload[:16]
    # a header walk must not have extracted the object to the cache
    cont = bc._container(str(tmp_path / "lake.db"))
    assert not os.path.exists(os.path.join(cont.cache_dir, "big.bin"))


def test_open_output_streams_and_commits(root):
    with bs.fs_for(root).open_output(f"{root}/blob.bin") as w:
        for _ in range(3):
            w.write(b"A" * (1 << 20))
    assert len(bs.read_bytes(f"{root}/blob.bin")) == 3 << 20
    # an exception inside the context must not publish a torn object
    class Boom(Exception):
        pass

    with pytest.raises(Boom):
        with bs.fs_for(root).open_output(f"{root}/torn.bin") as w:
            w.write(b"x")
            raise Boom()
    assert not bs.exists(f"{root}/torn.bin")


def test_staging_absorb_roundtrip(root):
    # simulate the JVM writing a staging directory through spark_path
    stage = bs.spark_path(f"{root}/_staging-x")
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "part-0.parquet"), "wb") as f:
        f.write(b"PARQUET")
    with open(os.path.join(stage, ".part-0.parquet.crc"), "wb") as f:
        f.write(b"junk")
    with open(os.path.join(stage, "_SUCCESS"), "wb") as f:
        f.write(b"")
    # the next facade op sees the finished files as container objects
    names = bs.listdir(f"{root}/_staging-x")
    assert "part-0.parquet" in names and ".part-0.parquet.crc" not in names
    bs.move(f"{root}/_staging-x/part-0.parquet", f"{root}/data/p.parquet")
    bs.rmtree(f"{root}/_staging-x")
    assert bs.read_bytes(f"{root}/data/p.parquet") == b"PARQUET"
    assert not bs.exists(f"{root}/_staging-x")
    # and the shadow dir is gone
    cont = bc._container(bc.split_uri(root + "/x")[0])
    assert not os.path.isdir(os.path.join(cont.stage_dir, "_staging-x"))


def test_spark_path_extracts_immutable_objects(root):
    bs.write_bytes(f"{root}/d/a.bin", b"one")
    p1 = bs.spark_path(f"{root}/d/a.bin")
    assert open(p1, "rb").read() == b"one"
    # cache hit: same object, same path, no re-extract needed
    assert bs.spark_path(f"{root}/d/a.bin") == p1
    # a mutation invalidates the cache
    bs.write_bytes(f"{root}/d/a.bin", b"two!")
    p2 = bs.spark_path(f"{root}/d/a.bin")
    assert open(p2, "rb").read() == b"two!"
    # directory-shaped read extracts the subtree
    bs.write_bytes(f"{root}/d/b.bin", b"three")
    d = bs.spark_path(f"{root}/d")
    assert sorted(os.listdir(d)) == ["a.bin", "b.bin"]


def test_container_file_is_sqlite_with_format_tag(root, tmp_path):
    bs.write_bytes(f"{root}/x", b"x")
    bc.checkpoint(str(tmp_path / "lake.db"))
    conn = sqlite3.connect(tmp_path / "lake.db")
    fmt = conn.execute(
        "SELECT v FROM beacon_meta WHERE k='format'").fetchone()[0]
    assert fmt == "beacon-spark-container/1"
    conn.close()


# ------------------------------------------------------------ engine


def test_managed_workflow_inside_one_file(spark, root):
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=root)
    eng.sql("CREATE TABLE obs AS SELECT id, id % 5 AS g, "
            "CAST(id AS DOUBLE) AS v FROM range(100)")
    assert bs.exists(f"{root}/.beacon_catalog/catalog.json")
    assert eng.sql("SELECT count(*) AS n FROM obs").collect()[0].n == 100
    eng.sql("INSERT INTO obs SELECT 1000 + id, 9 AS g, 0.5 AS v FROM range(10)")
    eng.sql("UPDATE obs SET v = -1.0 WHERE g = 9")
    assert eng.sql(
        "SELECT count(*) AS n FROM obs WHERE v = -1.0").collect()[0].n == 10
    eng.sql("DELETE FROM obs WHERE g = 9")
    assert eng.sql("SELECT count(*) AS n FROM obs").collect()[0].n == 100

    mt = eng.catalog.table("obs")
    assert mt.read(version=1).count() == 100
    assert mt.read(version=2).count() == 110
    assert eng.sql(
        "SELECT count(*) AS n FROM obs VERSION AS OF 2").collect()[0].n == 110

    eng.sql("CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, count(*) AS n FROM obs GROUP BY g")
    got = {(r.g, r.n) for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {(g, 20) for g in range(5)}


def test_copy_one_file_carries_the_lake(spark, tmp_path):
    """The redb-store contract (lib.rs:8-9): copy the file, carry the
    dataset. Build a lake, checkpoint, copy the single file to a new
    home, open THAT — every table and version must be there."""
    from beacon_spark import client

    src = tmp_path / "origin" / "lake.db"
    src.parent.mkdir()
    conn = client.connect(str(src), spark=spark)
    conn.sql("CREATE TABLE t AS SELECT id, id * 2 AS d FROM range(50)")
    conn.sql("INSERT INTO t SELECT 100 + id, 0 AS d FROM range(5)")
    assert int(conn.sql("SELECT count(*) AS n FROM t").arrow()["n"][0].as_py()) == 55
    conn.close()  # checkpoints: the WAL folds into the main file

    assert sorted(os.listdir(src.parent)) == ["lake.db"] or all(
        not f.endswith(("-wal", "-shm")) or os.path.getsize(src.parent / f) == 0
        for f in os.listdir(src.parent)
    )

    dst = tmp_path / "elsewhere" / "carried.db"
    dst.parent.mkdir()
    shutil.copyfile(src, dst)

    conn2 = client.connect(str(dst), spark=spark)
    try:
        assert int(conn2.sql("SELECT count(*) AS n FROM t").arrow()["n"][0].as_py()) == 55
        mt = conn2.engine.catalog.table("t")
        assert mt.current_version() == 2
        assert mt.read(version=1).count() == 50
    finally:
        conn2.close()


def test_client_memory_mode_untouched(spark):
    from beacon_spark import client

    conn = client.connect(":memory:", spark=spark)
    conn.sql("CREATE TABLE m AS SELECT 1 AS a")
    assert int(conn.sql("SELECT * FROM m").arrow()["a"][0].as_py()) == 1
    conn.close()


def test_jvm_overwrite_of_existing_paths_ingests_back(root, tmp_path):
    """The overwrite hole: spark_path hands out the extraction cache for
    EXISTING keys, so an overwrite-shaped JVM write must be ingested
    back (armed reconcile), including deletions (overwrite clears the
    target dir first)."""
    bs.write_bytes(f"{root}/exp/part-a.bin", b"old-a")
    bs.write_bytes(f"{root}/exp/part-b.bin", b"old-b")

    # simulate: JVM gets the dir, deletes old files, writes new ones
    d = bs.spark_path(f"{root}/exp")
    os.unlink(os.path.join(d, "part-a.bin"))
    os.unlink(os.path.join(d, "part-b.bin"))
    with open(os.path.join(d, "part-c.bin"), "wb") as f:
        f.write(b"new-c")

    # the next facade op reconciles: c ingested, a/b deleted
    assert bs.listdir(f"{root}/exp") == ["part-c.bin"]
    assert bs.read_bytes(f"{root}/exp/part-c.bin") == b"new-c"
    assert not bs.exists(f"{root}/exp/part-a.bin")

    # single-file overwrite: re-export to the same key
    bs.write_bytes(f"{root}/one.bin", b"v1")
    p = bs.spark_path(f"{root}/one.bin")
    with open(p, "wb") as f:
        f.write(b"v2-longer")
    assert bs.read_bytes(f"{root}/one.bin") == b"v2-longer"

    # a pure READ handout must not churn the container: hand out, touch
    # nothing, next op leaves bytes identical
    p2 = bs.spark_path(f"{root}/one.bin")
    before = bs.mtime(f"{root}/one.bin")
    assert bs.read_bytes(f"{root}/one.bin") == b"v2-longer"
    assert bs.mtime(f"{root}/one.bin") == before


def test_cache_eviction_under_budget(root, tmp_path, monkeypatch):
    """The extraction cache stays under CACHE_BYTES: least-recently-
    accessed unarmed files evict (and re-extract on demand); armed
    subtrees never do."""
    cont = bc._container(str(tmp_path / "lake.db"))
    monkeypatch.setattr(type(cont), "CACHE_BYTES", 3_000)
    for i in range(8):
        bs.write_bytes(f"{root}/d/f{i}.bin", bytes([i]) * 1_000)
    for i in range(8):
        cont.cache_path(f"d/f{i}.bin")  # plain extraction (8 KB total)
    cont._prune_cache()
    cached = [f for f in os.listdir(os.path.join(cont.cache_dir, "d"))]
    assert 0 < len(cached) <= 3
    # evicted objects re-extract transparently with correct bytes
    p0 = bs.spark_path(f"{root}/d/f0.bin")
    assert open(p0, "rb").read() == b"\x00" * 1_000
    # spark_path handouts PIN their files: a lazy DataFrame may read the
    # handed-out path any time later, so pruning never evicts it (the
    # budget bounds only re-extractable plain reads)
    p7 = bs.spark_path(f"{root}/d/f7.bin")
    for i in range(1, 7):
        cont.cache_path(f"d/f{i}.bin")
    cont._prune_cache()
    assert os.path.exists(p7) and os.path.exists(p0)


def test_container_kv_semantics_property(tmp_path):
    """Property: an arbitrary op sequence (write/overwrite/remove/move/
    ranged-read) against the container matches a plain dict model."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.sampled_from(["a", "b/c", "b/d", "deep/x/y", "k.json"])
    payloads = st.binary(min_size=0, max_size=2048)
    ops = st.lists(
        st.one_of(
            st.tuples(st.just("put"), keys, payloads),
            st.tuples(st.just("del"), keys, st.just(b"")),
            st.tuples(st.just("mv"), st.tuples(keys, keys), st.just(b"")),
            st.tuples(st.just("read"), keys, st.just(b"")),
        ),
        max_size=30,
    )

    counter = [0]

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(ops)
    def run(sequence):
        counter[0] += 1
        root = f"bdb://{tmp_path}/prop{counter[0]}.db"
        model: dict[str, bytes] = {}
        for op, arg, data in sequence:
            if op == "put":
                bs.write_bytes(f"{root}/{arg}", data)
                model[arg] = data
            elif op == "del":
                if arg in model:
                    bs.remove(f"{root}/{arg}")
                    del model[arg]
                else:
                    with pytest.raises(FileNotFoundError):
                        bs.remove(f"{root}/{arg}")
            elif op == "mv":
                src, dst = arg
                if src in model and src != dst:
                    bs.move(f"{root}/{src}", f"{root}/{dst}")
                    model[dst] = model.pop(src)
            elif op == "read":
                if arg in model:
                    assert bs.read_bytes(f"{root}/{arg}") == model[arg]
                    if model[arg]:
                        buf = bs.open_buffer(f"{root}/{arg}")
                        mid = len(model[arg]) // 2
                        assert bs.read_range(buf, mid, 8) == \
                            model[arg][mid:mid + 8]
                else:
                    assert not bs.isfile(f"{root}/{arg}")
        # final state agrees
        for k, v in model.items():
            assert bs.read_bytes(f"{root}/{k}") == v
        bc.close_container(f"{tmp_path}/prop{counter[0]}.db")

    run()


def test_replaced_container_gets_fresh_shadow(tmp_path):
    """Copying a DIFFERENT .db over the same path must not serve the old
    container's cache files (phantom reads) nor reconcile them back into
    the new container — the shadow dir is keyed by container instance."""
    import shutil

    a = str(tmp_path / "lake.db")
    b = str(tmp_path / "other.db")
    bs.write_bytes(f"bdb://{a}/d/x.bin", b"AAAA")
    ca = bc._container(a)
    pa_ = bs.spark_path(f"bdb://{a}/d/x.bin")
    assert open(pa_, "rb").read() == b"AAAA"
    bs.write_bytes(f"bdb://{b}/d/y.bin", b"BBBB")
    bc.close_container(a)
    bc.close_container(b)
    shutil.copy(b, a)  # the portability workflow: replace the file
    cb = bc._container(a)
    assert cb.cache_dir != ca.cache_dir  # fresh shadow for the new instance
    assert cb.stat("d/x.bin") is None    # old object NOT resurrected
    assert bs.read_bytes(f"bdb://{a}/d/y.bin") == b"BBBB"


# ------------------------------------------ r11 decoder-review findings


def test_publish_if_absent_threads_one_winner(root):
    """The container's conditional put is a real transactional
    primitive: N threads racing for one key — exactly one INSERT
    commits, every loser sees False, and the winner's payload is what
    the key holds."""
    import threading

    wins = []

    def go(i):
        if bs.publish_if_absent(f"{root}/m/v1.json", b"payload-%d" % i):
            wins.append(i)

    ths = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert len(wins) == 1
    assert bs.read_bytes(f"{root}/m/v1.json") == b"payload-%d" % wins[0]


def test_publish_if_absent_processes_one_winner(tmp_path):
    """Cross-PROCESS conditional put: the sqlite INSERT is atomic
    across processes publishing into one bdb:// file — the concurrency
    class where file-backed stores silently lose updates."""
    import subprocess
    import sys

    db = tmp_path / "race.db"
    script = (
        "import sys\n"
        "from beacon_spark.sources import bytesource as bs\n"
        "won = bs.publish_if_absent(sys.argv[1], sys.argv[2].encode())\n"
        "print('WON' if won else 'LOST')\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script,
             f"bdb://{db}/manifest/v1.json", f"writer-{i}"],
            stdout=subprocess.PIPE, cwd="/root/repo")
        for i in range(4)
    ]
    outs = [p.communicate()[0].decode().strip() for p in procs]
    assert all(p.returncode == 0 for p in procs)
    assert sorted(outs).count("WON") == 1, outs
    winner = outs.index("WON")
    assert bs.read_bytes(f"bdb://{db}/manifest/v1.json") == \
        f"writer-{winner}".encode()
    bc.close_container(str(db))


def test_cross_process_reads_never_tear(tmp_path):
    """r11 review F1: stat -> blobopen now rides one WAL read snapshot,
    so another PROCESS's DELETE+INSERT of the same key can't dangle the
    rowid mid-read (OperationalError) or serve another object's bytes
    after rowid reuse. A writer process flips the key between two
    different-sized payloads while we hammer reads: every read must be
    exactly one of the two payloads."""
    import subprocess
    import sys
    import time as _t

    db = tmp_path / "rw.db"
    a, b = b"A" * 70_000, b"B" * 130_000
    bs.write_bytes(f"bdb://{db}/obj.bin", a)
    writer = (
        "import sys, time\n"
        "from beacon_spark.sources import container as bc\n"
        "c = bc._container(sys.argv[1])\n"
        "a, b = b'A' * 70_000, b'B' * 130_000\n"
        "t0 = time.time()\n"
        "i = 0\n"
        "while time.time() - t0 < 3.0:\n"
        "    c.write_bytes('obj.bin', a if i % 2 else b)\n"
        "    i += 1\n"
    )
    p = subprocess.Popen([sys.executable, "-c", writer, str(db)],
                         cwd="/root/repo")
    cont = bc._container(str(db))
    deadline = _t.time() + 2.5
    n = 0
    while _t.time() < deadline:
        got = cont.read_bytes("obj.bin")
        assert got in (a, b), (len(got), got[:8], got[-8:])
        head = cont.read_range("obj.bin", 0, 16)
        assert head in (a[:16], b[:16])
        n += 1
    p.wait(timeout=30)
    assert n > 50  # the loop really hammered
    bc.close_container(str(db))


def test_concurrent_extraction_from_two_processes(tmp_path):
    """r11 review F2: extraction tmp names are unique per writer — two
    processes extracting the same object into the SHARED shadow cache
    no longer interleave truncating writes into one '.extract' file
    (the winner used to publish a corrupt cache copy straight to the
    JVM). Both extractions must yield the exact object bytes."""
    import subprocess
    import sys

    import hashlib as _hashlib

    db = tmp_path / "ex.db"
    payload = os.urandom(3 << 20)
    digest = _hashlib.sha256(payload).hexdigest()
    bs.write_bytes(f"bdb://{db}/data/big.parquet", payload)
    # each process repeatedly invalidates + re-extracts the SHARED cache
    # entry; a successful open must always see the EXACT bytes (the old
    # fixed '.extract' tmp produced interleaved garbage here). A
    # FileNotFoundError is legal — another process invalidated between
    # handout and open, which the immutable-data contract normally
    # precludes; this test violates it on purpose to force concurrency.
    script = (
        "import sys, hashlib\n"
        "from beacon_spark.sources import container as bc\n"
        "c = bc._container(sys.argv[1])\n"
        "seen = 0\n"
        "for _ in range(12):\n"
        "    p = c.cache_path('data/big.parquet')\n"
        "    try:\n"
        "        got = open(p, 'rb').read()\n"
        "    except FileNotFoundError:\n"
        "        continue\n"
        "    assert hashlib.sha256(got).hexdigest() == sys.argv[2], len(got)\n"
        "    seen += 1\n"
        "    c._invalidate('data/big.parquet')\n"
        "assert seen, 'never observed a successful read'\n"
        "print('OK')\n"
    )
    procs = [subprocess.Popen([sys.executable, "-c", script, str(db),
                               digest],
                              stdout=subprocess.PIPE, cwd="/root/repo")
             for _ in range(3)]
    outs = [p.communicate()[0].decode().strip() for p in procs]
    assert outs == ["OK"] * 3 and all(p.returncode == 0 for p in procs)
    # and THIS process still extracts the exact bytes
    cont = bc._container(str(db))
    with open(cont.cache_path("data/big.parquet"), "rb") as f:
        assert f.read() == payload
    bc.close_container(str(db))


def test_checkpoint_without_open_handle(tmp_path):
    """r11 review F5: checkpoint() of a container this process never
    opened must still fold the -wal sidecar in — otherwise 'checkpoint
    before shipping' silently did nothing and the copied .db missed
    every commit still in the WAL."""
    import subprocess
    import sys

    db = tmp_path / "ship.db"
    # another process writes and exits WITHOUT closing/checkpointing
    script = (
        "import os, sys\n"
        "from beacon_spark.sources import bytesource as bs\n"
        "bs.write_bytes(f'bdb://{sys.argv[1]}/k.json', b'shipped')\n"
        # skip interpreter teardown: a clean exit closes the last sqlite
        # handle, which auto-checkpoints — the crashed-writer shape we
        # are simulating leaves the WAL behind
        "os._exit(0)\n"
    )
    subprocess.run([sys.executable, "-c", script, str(db)],
                   check=True, cwd="/root/repo")
    wal = str(db) + "-wal"
    assert os.path.exists(wal) and os.path.getsize(wal) > 0
    bc.checkpoint(str(db))
    assert os.path.getsize(wal) == 0 if os.path.exists(wal) else True
    # the bare .db alone (copied elsewhere) carries the commit
    dst = tmp_path / "copy.db"
    shutil.copyfile(db, dst)
    assert bs.read_bytes(f"bdb://{dst}/k.json") == b"shipped"
    bc.close_container(str(dst))


def test_symlinked_container_is_one_instance(tmp_path):
    """r11 review F7: the same file reached via a symlink maps to the
    SAME in-process instance (realpath keying) — two instances would
    race each other with independent locks and ledgers."""
    db = tmp_path / "real.db"
    bs.write_bytes(f"bdb://{db}/x", b"1")
    link = tmp_path / "alias.db"
    os.symlink(db, link)
    assert bc._container(str(link)) is bc._container(str(db))
    assert bs.read_bytes(f"bdb://{link}/x") == b"1"
    bc.close_container(str(db))


def test_managed_table_commits_in_container_are_conditional(spark, tmp_path):
    """Manifest commits inside a bdb:// container ride the container's
    NATIVE conditional put: concurrent INSERTs from multiple threads
    into one container-backed managed table never lose rows (the same
    contract test_concurrent_inserts_never_lose_rows pins for local
    manifests, here across the sqlite commit path)."""
    import threading

    from beacon_spark.managed import ManagedTable

    root = f"bdb://{tmp_path}/lake.db/t1"
    t = ManagedTable(spark, root)
    t.create(spark.createDataFrame([(0,)], "v int"))
    errs = []

    def ins(k):
        try:
            t.insert(spark.createDataFrame([(k,)] * 5, "v int"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=ins, args=(k,)) for k in range(1, 5)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    assert t.read().count() == 1 + 4 * 5
    assert t.current_version() == 5
    bc.close_container(str(tmp_path / "lake.db"))


def test_container_glob_matches_local_glob_semantics(tmp_path):
    """r11 F3 differential pin: bdb:// glob must return exactly what
    glob.glob(recursive=True) returns over a mirrored local tree —
    '*' stays within one path segment, '**' spans, classes translate."""
    import glob as pyglob

    keys = ["a.txt", "ab.txt", "d/a.txt", "d/e/a.txt", "d/e/f.bin",
            "x1/y.txt", "x2/y.txt", "top"]
    db = tmp_path / "g.db"
    local = tmp_path / "mirror"
    for k in keys:
        bs.write_bytes(f"bdb://{db}/{k}", b"x")
        p = local / k
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    pats = ["*.txt", "*/a.txt", "**/a.txt", "d/**/*.bin", "x[12]/y.txt",
            "x[!1]/y.txt", "?.txt", "**", "d/*"]
    for pat in pats:
        want = sorted(
            p.replace(str(local) + "/", "")
            for p in pyglob.glob(f"{local}/{pat}", recursive=True)
            if not p.endswith(str(local))
        )
        # glob.glob lists dirs too; the container has only objects
        want = [w for w in want if w in keys]
        got = sorted(
            u.split(".db/", 1)[1] for u in bs.glob(f"bdb://{db}/{pat}")
        )
        assert got == want, (pat, got, want)
    bc.close_container(str(db))


def test_reap_dead_shadows_survives_pid_reuse(tmp_path):
    """The shadow reaper must key on (pid, starttime), not pid alone: a
    recycled pid made a crashed process's scratch look owned by a LIVE
    process (even ourselves), so its never-acknowledged stage files
    survived for a later sweep to ingest as phantom rows."""
    C = bc._Container
    me_start = C._proc_start(os.getpid())
    assert isinstance(me_start, int)  # Linux container

    base = tmp_path / "shadows"

    def shadow(name, owner):
        d = base / name
        (d / "stage").mkdir(parents=True)
        (d / "owner.pid").write_text(owner)
        return d

    alive = shadow("alive", f"{os.getpid()} {me_start}")
    recycled = shadow("recycled", f"{os.getpid()} {me_start + 777}")
    # a pid beyond pid_max never exists: both identity forms must reap it
    dead = shadow("dead", f"{2**22 + 12345} 1")
    legacy_alive = shadow("legacy", f"{os.getpid()}")  # pre-starttime format
    garbage = shadow("garbage", "not-a-pid")

    C._reap_dead_shadows(str(base))

    assert alive.is_dir(), "live owner with matching starttime reaped"
    assert not recycled.exists(), "recycled-pid shadow not reaped"
    assert not dead.exists(), "dead-pid shadow not reaped"
    assert legacy_alive.is_dir(), "legacy live-pid shadow reaped"
    assert garbage.is_dir(), "unparseable owner file must be left alone"
