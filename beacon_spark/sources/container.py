"""Single-file database container — the ``beacon.db`` embedded mode.

The reference can open a whole lake from ONE file: ``Database::open``
(``beacon-db/beacon-core/src/embedded.rs:66-110``) mounts a
``beacon.db``-style container backed by ``beacon_redb_store::RedbStore``
(``beacon-db/beacon-redb-store/src/lib.rs:1-30``) — a transactional
key/value index plus a blob heap sharing one file, so "copy it and you
carry the whole dataset with you".

This is the Spark-first analog, built on the Python stdlib's ``sqlite3``
in the same role redb plays there: one ``.db`` file holds a
transactional ``objects(key, size, mtime, data)`` table — the index AND
the bulk bytes. It plugs into the :mod:`bytesource` facade as the
``bdb://`` scheme, so the ENTIRE engine — catalog, managed tables,
manifests, indexes, stats, secrets — runs inside the container with no
other code changes (the same property the reference gets from
``object_store``).

URI form: ``bdb:///abs/path/lake.db/inner/key`` — the container path is
everything up to the first component ending in ``.db``; the rest is the
object key. Opening a missing file creates it (the embedded-database
contract: possession of the file is full control, embedded.rs:15-18).

Two planes, mirroring the redb split ("small objects inline, large
objects in the heap"):

- **Metadata plane** (catalog JSON, manifests, posting indexes read via
  pyarrow): straight from sqlite. Writes are transactions, so
  ``publish_bytes`` is atomic-per-key — a stronger commit primitive
  than S3's PUT. Ranged reads use ``Connection.blobopen`` (incremental
  blob I/O), so a NetCDF/parquet header walk does NOT pull the whole
  object.
- **Data plane** (``spark.read.parquet`` / ``df.write.parquet`` on the
  JVM, which cannot see inside a sqlite file): an on-demand local
  shadow. Reads extract the immutable data objects to a disposable
  cache dir (COW managed tables never mutate a data file, so the cache
  never goes stale; mutable keys are invalidated on every write/move).
  Writes hand Spark a staging shadow path; the very next facade op on
  that subtree absorbs the finished files into the container and
  deletes the shadow copies.

Scale contract — stated, not hidden: a single-file container is the
EMBEDDED, single-node mode, exactly as in the reference (RedbStore
mmaps a local file; a remote executor could not read it there either).
Multi-node lakes use directory or object-store roots. Within its scope
the plane split is O(bytes-read-once): extraction streams chunk-wise
through blobopen, never materializing an object in memory.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import posixpath
import re
import shutil
import sqlite3
import tempfile
import threading
import time
import uuid

SCHEME = "bdb"
_CHUNK = 1 << 20

_DDL = """
CREATE TABLE IF NOT EXISTS objects(
    key   TEXT PRIMARY KEY,
    size  INTEGER NOT NULL,
    mtime REAL NOT NULL,
    data  BLOB NOT NULL
);
CREATE TABLE IF NOT EXISTS beacon_meta(k TEXT PRIMARY KEY, v TEXT NOT NULL);
INSERT OR IGNORE INTO beacon_meta(k, v) VALUES('format', 'beacon-spark-container/1');
"""


class ContainerError(RuntimeError):
    pass


def split_uri(uri: str) -> tuple[str, str]:
    """``bdb:///a/b/lake.db/x/y`` → (``/a/b/lake.db``, ``x/y``).

    Parsed by hand, NOT urlparse: keys and glob patterns are plain
    object names, and urlparse would eat everything after a ``?``
    (query separator) or ``#`` (fragment) — a ``?.txt`` glob silently
    matched nothing."""
    m = re.match(rf"{SCHEME}://", uri, re.IGNORECASE)
    if not m:
        raise ContainerError(f"not a {SCHEME}:// URI: {uri!r}")
    path = uri[m.end():]
    parts = [p for p in path.split("/") if p]
    for i, p in enumerate(parts):
        if p.endswith(".db"):
            return "/" + "/".join(parts[: i + 1]), "/".join(parts[i + 1:])
    raise ContainerError(
        f"no container component (a path segment ending in '.db') in {uri!r}"
    )


def container_uri(db_path: str, key: str = "") -> str:
    base = f"{SCHEME}://{os.path.abspath(db_path)}"
    return f"{base}/{key.strip('/')}" if key else base


class _Container:
    """One open ``.db`` file: thread-local sqlite connections + shadow dirs."""

    def __init__(self, db_path: str):
        parent = os.path.dirname(db_path)
        if parent and not os.path.isdir(parent):
            raise ContainerError(f"parent directory does not exist: {parent}")
        self.db_path = db_path
        self._tls = threading.local()
        self._lock = threading.Lock()
        # serializes reconcile/absorb sweeps (REENTRANT: absorb calls
        # _reconcile_armed) — two concurrent facade ops double-ingesting
        # the same stage file crashed the second's unlink
        self._stage_lock = threading.RLock()
        # the shadow dirs are scoped to the CONTAINER INSTANCE, not just
        # its path: copying a different .db over the same path (the
        # module's stated portability workflow) must not serve the old
        # container's phantom cache files — or worse, reconcile them
        # back INTO the new container
        with self._lock:
            conn = self._conn()
            conn.executescript(_DDL)
            conn.execute(
                "INSERT OR IGNORE INTO beacon_meta(k, v) "
                "VALUES('instance_id', ?)", (uuid.uuid4().hex,))
            conn.commit()
            instance = conn.execute(
                "SELECT v FROM beacon_meta WHERE k = 'instance_id'"
            ).fetchone()[0]
        # PER-PROCESS shadow (r14 — the cross-process vacuum hammer on
        # bdb:// caught this): the cache/stage dirs hold THIS process's
        # in-flight JVM handoffs and its extraction ledger's backing
        # files. Sharing them across processes made one process's
        # reconcile sweep see another's mid-write staging parquet as
        # ledger-less cache to ingest/delete — Spark's committer then
        # died in setupJob under the vanished directory. sqlite is the
        # only cross-process truth; the shadow is scratch.
        # pid ALONE is not a process identity: after pid wrap-around a
        # NEW process could inherit a crashed one's shadow dir (its
        # ledger-less stage scratch would be swept INTO the container as
        # phantom rows) and the reaper would see the recycled pid as
        # alive forever. pid + kernel start time is unique per boot.
        me = f"{os.getpid()} {self._proc_start(os.getpid()) or ''}".strip()
        tag = hashlib.sha1(
            f"{db_path}:{instance}:{me}".encode()).hexdigest()[:16]
        shadow = os.path.join(tempfile.gettempdir(), "beacon-bdb", tag)
        self.cache_dir = os.path.join(shadow, "cache")
        self.stage_dir = os.path.join(shadow, "stage")
        os.makedirs(self.cache_dir, exist_ok=True)
        os.makedirs(self.stage_dir, exist_ok=True)
        with open(os.path.join(shadow, "owner.pid"), "w") as f:
            f.write(me)
        self._reap_dead_shadows(os.path.dirname(shadow))
        # cache paths handed to the JVM this session: lazy DataFrames
        # may execute ANY time later, so these are never pruned
        self._pinned: set[str] = set()
        # extraction ledger: key → (size, mtime) stamped on the cache
        # file when it was extracted. A cache file that no longer
        # matches its ledger entry was OVERWRITTEN by the JVM and must
        # be ingested back; a ledger entry whose file is gone was
        # deleted by the JVM (overwrite-mode clears the dir first).
        self._extracted: dict[str, tuple[int, float]] = {}
        # spark_path handouts of EXISTING keys/prefixes, each arming one
        # reconciliation sweep on the next facade op touching them
        self._armed: set[str] = set()

    @staticmethod
    def _proc_start(pid: int) -> int | None:
        """Kernel start time (clock ticks since boot) of ``pid`` — the
        disambiguator that makes (pid, start) a process identity across
        pid wrap-around. None off-Linux / when unreadable."""
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                stat = f.read()
            # comm (field 2) may contain spaces/parens: fields 3+ start
            # after the LAST ')'; starttime is field 22 (index 19 there)
            return int(stat[stat.rindex(b")") + 2:].split()[19])
        except (OSError, ValueError, IndexError):
            return None

    @classmethod
    def _reap_dead_shadows(cls, base: str) -> None:
        """Per-process shadow dirs outlive crashed processes — remove
        any whose recorded owner process is gone (best-effort; a dead
        process's un-ingested scratch was never acknowledged data).
        ``owner.pid`` holds ``pid [starttime]``: a live pid whose start
        time differs is a RECYCLED pid, i.e. the owner is dead."""
        try:
            entries = os.listdir(base)
        except OSError:
            return
        for name in entries:
            d = os.path.join(base, name)
            pid_file = os.path.join(d, "owner.pid")
            try:
                parts = open(pid_file).read().split()
                pid = int(parts[0])
                start = int(parts[1]) if len(parts) > 1 else None
            except (OSError, ValueError, IndexError):
                continue  # pre-r14 layout or mid-create — leave it
            now_start = cls._proc_start(pid)
            if start is not None and now_start is not None:
                if start != now_start:  # dead (pid possibly recycled)
                    shutil.rmtree(d, ignore_errors=True)
                continue  # alive — even if the pid matches our own
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                shutil.rmtree(d, ignore_errors=True)
            except OSError:
                continue  # alive but not ours to signal

    def _conn(self) -> sqlite3.Connection:
        # per-thread AND per-process: a forked Spark python worker
        # inherits this object (fork copies thread-locals), and using an
        # inherited sqlite handle across fork corrupts the database —
        # the pid guard forces a fresh connection in the child
        conn = getattr(self._tls, "conn", None)
        if conn is None or getattr(self._tls, "pid", None) != os.getpid():
            conn = sqlite3.connect(self.db_path, timeout=30.0)
            conn.execute("PRAGMA journal_mode=WAL")
            conn.execute("PRAGMA synchronous=NORMAL")
            self._tls.conn = conn
            self._tls.pid = os.getpid()
        return conn

    # ------------------------------------------------------ object index

    def stat(self, key: str) -> tuple[int, int, float] | None:
        row = self._conn().execute(
            "SELECT rowid, size, mtime FROM objects WHERE key = ?", (key,)
        ).fetchone()
        return None if row is None else (row[0], row[1], row[2])

    def keys_under(self, prefix: str) -> list[tuple[str, int, float]]:
        conn = self._conn()
        if not prefix:
            rows = conn.execute("SELECT key, size, mtime FROM objects")
        else:
            like = prefix.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
            rows = conn.execute(
                r"SELECT key, size, mtime FROM objects WHERE key LIKE ? ESCAPE '\'",
                (like + "/%",),
            )
        return [(r[0], r[1], r[2]) for r in rows]

    def has_prefix(self, prefix: str) -> bool:
        like = prefix.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        row = self._conn().execute(
            r"SELECT 1 FROM objects WHERE key LIKE ? ESCAPE '\' LIMIT 1",
            (like + "/%",),
        ).fetchone()
        return row is not None

    # ------------------------------------------------------ read plane

    @contextlib.contextmanager
    def _read_snapshot(self):
        """WAL read transaction: stat + blobopen must observe ONE
        database state. The in-process write lock already serializes
        threads, but ANOTHER PROCESS's DELETE+INSERT of the same key
        between stat and blobopen would dangle the rowid
        (OperationalError) — or, after rowid reuse, silently serve a
        different object's bytes. BEGIN pins the snapshot at the first
        read, so the rowid stays valid for the whole block."""
        conn = self._conn()
        conn.execute("BEGIN")
        try:
            yield conn
        finally:
            with contextlib.suppress(sqlite3.Error):
                conn.execute("COMMIT")

    def read_range(self, key: str, offset: int,
                   length: int | None) -> bytes:
        # stat + blobopen under the WRITE lock: write_from_file's
        # DELETE+INSERT mints a new rowid, so an unlocked read could
        # open a deleted row (OperationalError) — or, after rowid
        # reuse, silently read another object's bytes.
        # length=None = "to the end", resolved INSIDE the snapshot —
        # a caller-supplied size from an earlier stat would mix two
        # database states and tear the read.
        with self._lock, self._read_snapshot() as conn:
            st = self.stat(key)
            if st is None:
                raise FileNotFoundError(f"{key} in {self.db_path}")
            rowid, size, _ = st
            if offset >= size:
                return b""
            length = (size - offset if length is None
                      else min(length, size - offset))
            with conn.blobopen(
                    "objects", "data", rowid, readonly=True) as bl:
                bl.seek(offset)
                return bl.read(length)

    def read_bytes(self, key: str) -> bytes:
        return self.read_range(key, 0, None)

    # ------------------------------------------------------ write plane

    def write_from_file(self, key: str, local: str) -> None:
        """Stream a local file into the container (zeroblob + chunked
        incremental writes — never the whole object in memory)."""
        size = os.path.getsize(local)
        with self._lock:
            conn = self._conn()
            with conn:  # one transaction: visible all-or-nothing
                conn.execute("DELETE FROM objects WHERE key = ?", (key,))
                conn.execute(
                    "INSERT INTO objects(key, size, mtime, data) "
                    "VALUES(?, ?, ?, zeroblob(?))",
                    (key, size, time.time(), size),
                )
                rowid = conn.execute(
                    "SELECT rowid FROM objects WHERE key = ?", (key,)
                ).fetchone()[0]
                with conn.blobopen("objects", "data", rowid) as bl, \
                        open(local, "rb") as f:
                    while True:
                        buf = f.read(_CHUNK)
                        if not buf:
                            break
                        bl.write(buf)
        self._invalidate(key)

    def write_bytes(self, key: str, data: bytes) -> None:
        with self._lock:
            conn = self._conn()
            with conn:
                conn.execute(
                    "INSERT OR REPLACE INTO objects(key, size, mtime, data) "
                    "VALUES(?, ?, ?, ?)",
                    (key, len(data), time.time(), sqlite3.Binary(data)),
                )
        self._invalidate(key)

    def touch(self, key: str) -> bool:
        """Re-stamp an object's mtime to now. ``rename`` is a key
        UPDATE that keeps the original write stamp, so a moved object
        would look as old as its staging write — VACUUM's landing-time
        guards need the LANDING stamp (same contract as the filesystem
        facades' touch)."""
        with self._lock:
            conn = self._conn()
            with conn:
                cur = conn.execute(
                    "UPDATE objects SET mtime = ? WHERE key = ?",
                    (time.time(), key),
                )
        return cur.rowcount == 1

    def write_bytes_if_absent(self, key: str, data: bytes) -> bool:
        """TRUE conditional put — the transactional primitive the
        object-store facade can only approximate with exists+verify.
        Two writers (threads OR processes) racing for one key: the
        sqlite INSERT commits exactly one; the loser gets False. This
        is what makes manifest/catalog commits inside a ``bdb://``
        container genuinely lost-update-free (redb's serialized write
        transactions give the reference the same property,
        beacon-redb-store/src/lib.rs:1-30)."""
        with self._lock:
            conn = self._conn()
            with conn:
                cur = conn.execute(
                    "INSERT OR IGNORE INTO objects(key, size, mtime, data) "
                    "VALUES(?, ?, ?, ?)",
                    (key, len(data), time.time(), sqlite3.Binary(data)),
                )
                won = cur.rowcount == 1
        if won:
            self._invalidate(key)
        return won

    def delete(self, key: str) -> None:
        with self._lock:
            conn = self._conn()
            with conn:
                conn.execute("DELETE FROM objects WHERE key = ?", (key,))
        self._invalidate(key)

    def delete_prefix(self, prefix: str) -> None:
        like = prefix.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        with self._lock:
            conn = self._conn()
            with conn:
                conn.execute(
                    r"DELETE FROM objects WHERE key LIKE ? ESCAPE '\'",
                    (like + "/%",),
                )
        shutil.rmtree(os.path.join(self.cache_dir, prefix), ignore_errors=True)
        self._forget_subtree(prefix)

    def rename(self, src: str, dst: str, *, is_dir: bool) -> None:
        """Key rewrite in ONE transaction — the container's native
        rename (no copy+delete, unlike S3)."""
        with self._lock:
            conn = self._conn()
            with conn:
                if is_dir:
                    like = src.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
                    # clear any keys the rename would collide with
                    conn.execute(
                        r"DELETE FROM objects WHERE key IN ("
                        r"SELECT ? || substr(key, ?) FROM objects "
                        r"WHERE key LIKE ? ESCAPE '\')",
                        (dst, len(src) + 1, like + "/%"),
                    )
                    conn.execute(
                        r"UPDATE objects SET key = ? || substr(key, ?) "
                        r"WHERE key LIKE ? ESCAPE '\'",
                        (dst, len(src) + 1, like + "/%"),
                    )
                else:
                    conn.execute("DELETE FROM objects WHERE key = ?", (dst,))
                    conn.execute(
                        "UPDATE objects SET key = ? WHERE key = ?", (dst, src)
                    )
        self._invalidate(src)
        self._invalidate(dst)
        for d in (src, dst):
            shutil.rmtree(os.path.join(self.cache_dir, d), ignore_errors=True)
            self._forget_subtree(d)

    def _forget_subtree(self, prefix: str) -> None:
        """Drop ledger/armed state under ``prefix`` — the cache copies
        are gone because WE removed them, which must never read as a
        JVM deletion in the next reconcile sweep."""
        for k in [k for k in self._extracted
                  if k == prefix or k.startswith(prefix + "/")]:
            self._extracted.pop(k, None)
        for k in [k for k in self._armed
                  if k == prefix or k.startswith(prefix + "/")]:
            self._armed.discard(k)

    # ------------------------------------------------------ shadow planes

    def _invalidate(self, key: str) -> None:
        self._extracted.pop(key, None)
        p = os.path.join(self.cache_dir, key)
        # missing_ok: the cache dir is SHARED across processes, and two
        # writers invalidating the same key race between the existence
        # check and the unlink — losing that race is success, not error
        with contextlib.suppress(FileNotFoundError):
            os.unlink(p)

    def cache_path(self, key: str) -> str:
        """Extract an object to the local cache (staleness-checked via
        size+mtime stamped onto the cache file) and return the path.
        Runs under the write lock: the rowid must not dangle across a
        concurrent DELETE+INSERT of the same key."""
        with self._lock:
            return self._cache_path_locked(key)

    def _cache_path_locked(self, key: str) -> str:
        # the whole stat -> extract region rides ONE read snapshot so a
        # concurrent process's DELETE+INSERT can't dangle the rowid
        # between the stat and the blob read
        with self._read_snapshot() as snap:
            return self._extract_in_snapshot(snap, key)

    def _extract_in_snapshot(self, snap, key: str) -> str:
        st = self.stat(key)
        if st is None:
            raise FileNotFoundError(f"{key} in {self.db_path}")
        rowid, size, mtime = st
        p = os.path.join(self.cache_dir, key)
        if os.path.isfile(p):
            s = os.stat(p)
            if s.st_size == size and abs(s.st_mtime - mtime) < 1e-3:
                try:
                    os.utime(p, (time.time(), s.st_mtime))  # LRU touch
                except OSError:
                    pass  # concurrently evicted: fall through, re-extract
                else:
                    self._extracted[key] = (size, mtime)
                    return p
        # a parent component may be cached as a FILE (keys 'a' and 'a/b'
        # can coexist in the container but not on a posix cache)
        parent = os.path.dirname(p)
        probe = parent
        while probe and probe != self.cache_dir:
            if os.path.isfile(probe):
                os.unlink(probe)
                break
            probe = os.path.dirname(probe)
        os.makedirs(parent, exist_ok=True)
        # UNIQUE tmp name: two processes share the cache dir (the shadow
        # tag is per container FILE), and a fixed '.extract' suffix let
        # their truncating opens interleave — the winner's os.replace
        # published a corrupt cache file the JVM then read. Each writer
        # now extracts to its own name; last replace wins with a whole
        # file either way.
        tmp = f"{p}.extract-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with snap.blobopen("objects", "data", rowid, readonly=True) as bl, \
                open(tmp, "wb") as f:
            remaining = size
            while remaining > 0:
                buf = bl.read(min(_CHUNK, remaining))
                if not buf:
                    break
                f.write(buf)
                remaining -= len(buf)
        # atime = NOW (the LRU key), mtime = the object's (the
        # staleness key) — pinning both to the object mtime made "LRU"
        # oldest-object-first and could evict the file being returned
        os.utime(tmp, (time.time(), mtime))
        os.replace(tmp, p)
        self._extracted[key] = (size, mtime)
        # amortized: a full cache walk only after ~1/8 budget of fresh
        # extraction — and BEFORE the caller uses p, never evicting the
        # file just returned (it carries the newest atime)
        self._since_prune = getattr(self, "_since_prune", 0) + size
        if self._since_prune > self.CACHE_BYTES // 8:
            self._since_prune = 0
            self._prune_cache(keep=key)
        return p

    #: extraction-cache budget (bytes); oldest-accessed files evicted past
    #: it. Overridable via BEACON_SPARK_BDB_CACHE_BYTES.
    CACHE_BYTES = int(os.environ.get("BEACON_SPARK_BDB_CACHE_BYTES",
                                     10 << 30))

    def _prune_cache(self, keep: str | None = None) -> None:
        """Keep the extraction cache under budget: evict least-recently-
        ACCESSED files that are not armed for reconciliation (an armed
        subtree may hold JVM writes not yet ingested — never those).
        Objects re-extract on demand, so eviction only costs a re-read.

        Armed-entry policy — correctness first:

        - under a PREFIX arm (a directory handout, e.g. an index dir
          or a dataset tree mid-extraction) nothing is evicted: the
          JVM may overwrite the whole directory, and overwrite
          DELETION detection needs the extraction ledger + cache
          copies intact.
        - a FILE arm's cache copy MAY be evicted (its ledger entry is
          dropped, the arm itself stays): single-file overwrites never
          pre-delete, so a later JVM write simply appears as a
          ledger-less file and reconciles as changed; a pure read
          re-extracts. This keeps read-heavy sessions (which arm every
          file handout) from pinning the cache forever.
        """
        entries = []
        total = 0
        for dirpath, _dirs, files in os.walk(self.cache_dir):
            for f in files:
                p = os.path.join(dirpath, f)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                key = os.path.relpath(p, self.cache_dir).replace(os.sep, "/")
                entries.append((st.st_atime, st.st_size, key, p))
                total += st.st_size
        if total <= self.CACHE_BYTES:
            return
        prefix_arms = [a for a in self._armed
                       if os.path.isdir(os.path.join(self.cache_dir, a))]
        entries.sort()
        for _atime, sz, key, p in entries:
            if key == keep:
                continue
            if ".extract-" in os.path.basename(p):
                # extraction tmp: an ORPHAN (crashed process) is
                # reclaimable, but a live extraction in another process
                # is not — age-gate so we never unlink a tmp mid-write
                if _atime < time.time() - 300:
                    with contextlib.suppress(OSError):
                        os.unlink(p)
                    total -= sz
                    if total <= self.CACHE_BYTES:
                        return
                continue
            if any(key == a or key.startswith(a + "/") for a in prefix_arms):
                continue
            if any(key == pin or key.startswith(pin + "/")
                   for pin in self._pinned):
                # the JVM holds this path inside a LAZY DataFrame — it
                # cannot re-extract, so eviction = FileNotFoundException
                # at collect time
                continue
            try:
                os.unlink(p)
            except OSError:
                continue
            self._extracted.pop(key, None)
            total -= sz
            if total <= self.CACHE_BYTES:
                return
        if total > self.CACHE_BYTES:
            import logging

            logging.getLogger("beacon_spark.container").warning(
                "bdb cache exceeds its budget (%d > %d bytes): the "
                "overage is pinned by spark_path handouts this session "
                "(lazy DataFrames may still read them)",
                total, self.CACHE_BYTES,
            )

    def cache_tree(self, prefix: str) -> str:
        """Extract every object under ``prefix`` and return the cache
        dir (for directory-shaped JVM reads, e.g. an index rebuild's
        ``spark.read.parquet(idx_dir)``). The prefix arms FIRST so a
        prune fired mid-extraction can never evict the tree's earlier
        files out from under the handout."""
        self._armed.add(prefix)
        for key, _, _ in self.keys_under(prefix):
            self.cache_path(key)
        d = os.path.join(self.cache_dir, prefix)
        os.makedirs(d, exist_ok=True)
        return d

    def stage_path(self, key: str) -> str:
        p = os.path.join(self.stage_dir, key)
        os.makedirs(os.path.dirname(p) or self.stage_dir, exist_ok=True)
        return p

    def reconcile(self, prefix: str) -> None:
        """Fold JVM writes that landed on the EXTRACTION cache back into
        the container. ``spark_path`` hands the cache path out for keys
        that already exist, so an overwrite-shaped JVM write (a
        re-export, an in-place ``mode("overwrite")``) mutates cache
        files rather than staging ones. Every such handout arms one
        sweep: files that differ from their extraction ledger entry are
        ingested; ledger entries whose file vanished were deleted by
        the JVM (overwrite clears the target first) and are deleted
        from the container too."""
        root = os.path.join(self.cache_dir, prefix) if prefix else self.cache_dir
        seen: set[str] = set()
        if os.path.isdir(root):
            for dirpath, dirs, files in os.walk(root):
                if "_temporary" in dirs:
                    dirs.remove("_temporary")
                for f in files:
                    if f.startswith("."):
                        continue
                    if ".extract-" in f:
                        # orphaned extraction tmp (crashed process) —
                        # never ingest it as an object
                        continue
                    local = os.path.join(dirpath, f)
                    key = os.path.relpath(local, self.cache_dir).replace(os.sep, "/")
                    seen.add(key)
                    try:
                        st = os.stat(local)
                    except OSError:
                        continue  # vanished mid-walk (concurrent prune)
                    rec = self._extracted.get(key)
                    if rec and rec[0] == st.st_size and abs(rec[1] - st.st_mtime) < 1e-3:
                        continue  # untouched read cache
                    # ingest; write_from_file invalidates the cache copy,
                    # so the next read re-extracts the fresh object
                    self.write_from_file(key, local)
        elif os.path.isfile(root) and prefix:
            st = os.stat(root)
            rec = self._extracted.get(prefix)
            seen.add(prefix)
            if not (rec and rec[0] == st.st_size
                    and abs(rec[1] - st.st_mtime) < 1e-3):
                self.write_from_file(prefix, root)
        # deletion pass: extracted-then-vanished files under the prefix
        for key in [k for k in self._extracted
                    if (not prefix or k == prefix or k.startswith(prefix + "/"))
                    and k not in seen]:
            if not os.path.exists(os.path.join(self.cache_dir, key)):
                self._extracted.pop(key, None)
                if self.stat(key) is not None:
                    self.delete(key)

    def _reconcile_armed(self, op_key: str) -> None:
        with self._stage_lock:
            for armed in list(self._armed):
                if (not op_key or not armed or armed == op_key
                        or armed.startswith(op_key + "/")
                        or op_key.startswith(armed + "/")):
                    self._armed.discard(armed)
                    self.reconcile(armed)

    def absorb(self, key_prefix: str) -> None:
        """Pull any finished Spark-written shadow files under
        ``key_prefix`` into the container, then drop the shadow copies.
        Called before every metadata-plane op, so a facade caller never
        observes the staging window."""
        self._reconcile_armed(key_prefix)
        # the stage sweep is serialized: two concurrent facade ops
        # walking the same tree double-ingested files and crashed the
        # loser's unlink; vanished files are tolerated regardless
        with self._stage_lock:
            root = (os.path.join(self.stage_dir, key_prefix)
                    if key_prefix else self.stage_dir)
            if not os.path.isdir(root):
                if os.path.isfile(root):
                    self.write_from_file(key_prefix, root)
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(root)
                return
            for dirpath, dirs, files in os.walk(root):
                # Hadoop commits through _temporary/ + rename: files
                # still in there belong to an in-flight write —
                # absorbing them would ingest torn part files. They
                # surface at the final path once the task commit
                # renames them.
                if "_temporary" in dirs:
                    dirs.remove("_temporary")
                for f in files:
                    local = os.path.join(dirpath, f)
                    if f.startswith("."):  # Hadoop .crc shadows
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(local)
                        continue
                    key = os.path.relpath(
                        local, self.stage_dir).replace(os.sep, "/")
                    try:
                        self.write_from_file(key, local)
                    except FileNotFoundError:
                        continue  # a racing sweep already ingested it
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(local)
            # drop the shadow tree unless an in-flight _temporary/
            # still holds files (they surface via task-commit rename)
            if not any(files for _, _, files in os.walk(root)):
                shutil.rmtree(root, ignore_errors=True)


def checkpoint(db_path: str) -> None:
    """Fold the WAL back into the main file (``wal_checkpoint(TRUNCATE)``)
    so the container is a SINGLE file on disk — call before copying or
    shipping it. The reference's redb container has this property at
    every commit; sqlite in WAL mode has it after a checkpoint."""
    db_path = os.path.realpath(db_path)
    with _CONTAINERS_LOCK:
        c = _CONTAINERS.get(db_path)
    if c is not None:
        c._conn().execute("PRAGMA wal_checkpoint(TRUNCATE)")
    elif os.path.isfile(db_path):
        # not open in THIS process — a -wal sidecar left by another
        # process would otherwise silently survive the "checkpoint
        # before shipping" call and the copied .db would miss commits
        conn = sqlite3.connect(db_path, timeout=30.0)
        try:
            conn.execute("PRAGMA wal_checkpoint(TRUNCATE)")
        finally:
            conn.close()


def close_container(db_path: str) -> None:
    """Checkpoint and drop the process's handle on a container. Safe to
    call on a container that was never opened."""
    db_path = os.path.realpath(db_path)
    with _CONTAINERS_LOCK:
        c = _CONTAINERS.pop(db_path, None)
    if c is None:
        return
    try:
        conn = c._conn()
        conn.execute("PRAGMA wal_checkpoint(TRUNCATE)")
        conn.close()
    except sqlite3.Error:
        pass


_CONTAINERS: dict[str, _Container] = {}
_CONTAINERS_LOCK = threading.Lock()


def _container(db_path: str) -> _Container:
    # realpath, not abspath: the same file reached via a symlink must
    # map to the SAME instance, or two in-process handles race each
    # other with independent locks/ledgers
    db_path = os.path.realpath(db_path)
    with _CONTAINERS_LOCK:
        c = _CONTAINERS.get(db_path)
        if c is None:
            c = _CONTAINERS[db_path] = _Container(db_path)
        return c


class _ContainerByteSource:
    """Ranged reads straight off the sqlite blob (bytesource.ByteSource
    duck type) — header walks never extract or materialize the object."""

    def __init__(self, cont: _Container, key: str):
        self._c = cont
        self._key = key
        st = cont.stat(key)
        if st is None:
            raise FileNotFoundError(f"{key} in {cont.db_path}")
        self._size = st[1]

    def size(self) -> int:
        return self._size

    def read_range(self, offset: int, length: int) -> bytes:
        return self._c.read_range(self._key, offset, length)

    def close(self) -> None:
        pass


class ContainerFS:
    """The ``bdb://`` bytesource facade. One instance serves every open
    container (the facade cache keys on (scheme, authority) and bdb
    URIs carry the container in the path)."""

    def __init__(self, scheme: str = SCHEME, authority: str = ""):
        self.scheme, self.authority = scheme, authority

    # -------------------------------------------------- key plumbing

    def _ck(self, uri: str) -> tuple[_Container, str]:
        db, key = split_uri(uri)
        cont = _container(db)
        cont.absorb(key)
        return cont, key

    # -------------------------------------------------- read side

    def open_buffer(self, uri: str):
        from . import bytesource as bs

        cont, key = self._ck(uri)
        return bs.LazyBuf(_ContainerByteSource(cont, key))

    def read_bytes(self, uri: str) -> bytes:
        cont, key = self._ck(uri)
        return cont.read_bytes(key)

    def open_text(self, uri: str, **kw):
        kw.setdefault("encoding", "utf-8")
        return io.StringIO(self.read_bytes(uri).decode(kw["encoding"]))

    def exists(self, uri: str) -> bool:
        cont, key = self._ck(uri)
        if not key:
            return True
        return cont.stat(key) is not None or cont.has_prefix(key)

    def isfile(self, uri: str) -> bool:
        cont, key = self._ck(uri)
        return bool(key) and cont.stat(key) is not None

    def isdir(self, uri: str) -> bool:
        cont, key = self._ck(uri)
        return (not key) or cont.has_prefix(key)

    def listdir(self, uri: str) -> list[str]:
        cont, key = self._ck(uri)
        depth = len(key.split("/")) if key else 0
        names = set()
        for k, _, _ in cont.keys_under(key):
            parts = k.split("/")
            if len(parts) > depth:
                names.add(parts[depth])
        return sorted(names)

    def walk(self, uri: str):
        cont, key = self._ck(uri)
        db = cont.db_path
        base = container_uri(db, key).rstrip("/")
        tree: dict[str, tuple[list[str], list[str]]] = {base: ([], [])}
        rows = cont.keys_under(key) if key else cont.keys_under("")
        for k, _, _ in sorted(rows):
            rel = k[len(key):].lstrip("/") if key else k
            parts = rel.split("/")
            cur = base
            for d in parts[:-1]:
                nxt = f"{cur}/{d}"
                dirs, _files = tree.setdefault(cur, ([], []))
                if d not in dirs:
                    dirs.append(d)
                tree.setdefault(nxt, ([], []))
                cur = nxt
            tree.setdefault(cur, ([], []))[1].append(parts[-1])
        for d, (dirs, files) in tree.items():
            yield d, dirs, files

    def glob(self, pattern: str) -> list[str]:
        # glob semantics, NOT fnmatch: fnmatch's '*' crosses '/', so
        # 'lake.db/data/*.parquet' silently matched data/sub/x.parquet —
        # the same wrong-input-set bug fixed for remote stores in
        # bytesource._glob_regex; share that translation
        from .bytesource import _glob_regex

        db, keypat = split_uri(pattern)
        cont = _container(db)
        cont.absorb("")
        rx = _glob_regex(keypat)
        out = [
            container_uri(db, k)
            for k, _, _ in cont.keys_under("")
            if rx.match(k)
        ]
        return sorted(out)

    def size(self, uri: str) -> int:
        cont, key = self._ck(uri)
        st = cont.stat(key)
        if st is None:
            raise FileNotFoundError(uri)
        return st[1]

    def mtime(self, uri: str) -> float:
        cont, key = self._ck(uri)
        st = cont.stat(key)
        if st is not None:
            return st[2]
        rows = cont.keys_under(key)
        if not rows:
            raise FileNotFoundError(uri)
        return max(m for _, _, m in rows)

    def touch(self, uri: str) -> None:
        # rename preserves the staging-write stamp (it is a key UPDATE)
        # — re-stamp so VACUUM's landing-time guards see landing time
        cont, key = self._ck(uri)
        if not cont.touch(key):
            raise FileNotFoundError(uri)

    # -------------------------------------------------- write side

    def write_bytes(self, uri: str, data: bytes) -> None:
        cont, key = self._ck(uri)
        cont.write_bytes(key, data)

    def publish_bytes(self, uri: str, data: bytes) -> None:
        # a sqlite transaction IS the atomic publish
        self.write_bytes(uri, data)

    def publish_if_absent(self, uri: str, data: bytes) -> bool:
        cont, key = self._ck(uri)
        return cont.write_bytes_if_absent(key, data)

    def makedirs(self, uri: str) -> None:
        split_uri(uri)  # validate; directories are implicit

    def remove(self, uri: str) -> None:
        cont, key = self._ck(uri)
        if cont.stat(key) is None:
            raise FileNotFoundError(uri)
        cont.delete(key)

    def rmtree(self, uri: str) -> None:
        cont, key = self._ck(uri)
        if cont.stat(key) is not None:
            cont.delete(key)
        cont.delete_prefix(key)
        shutil.rmtree(os.path.join(cont.stage_dir, key), ignore_errors=True)

    def move(self, src: str, dst: str) -> None:
        cont, skey = self._ck(src)
        dcont, dkey = self._ck(dst)
        if dcont is not cont:
            raise ContainerError("move across containers is not supported")
        if cont.stat(skey) is not None:
            cont.rename(skey, dkey, is_dir=False)
        elif cont.has_prefix(skey):
            cont.rename(skey, dkey, is_dir=True)
        else:
            raise FileNotFoundError(src)

    def open_output(self, uri: str):
        cont, key = self._ck(uri)

        class _Out:
            def __init__(self):
                fd, self._tmp = tempfile.mkstemp(prefix="bdb-out-")
                self._f = os.fdopen(fd, "wb")

            def write(self, b):
                return self._f.write(b)

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.close(commit=exc[0] is None)

            def close(self, commit: bool = True):
                if self._f.closed:
                    return
                self._f.close()
                try:
                    if commit:
                        cont.write_from_file(key, self._tmp)
                finally:
                    os.unlink(self._tmp)

        return _Out()

    # -------------------------------------------------- data plane (JVM)

    def spark_path(self, uri: str) -> str:
        cont, key = self._ck(uri)
        if cont.stat(key) is not None:
            p = cont.cache_path(key)
            cont._armed.add(key)  # a JVM overwrite here must ingest back
            cont._pinned.add(key)  # lazy DataFrames read this path LATER
            return p
        if cont.has_prefix(key):
            p = cont.cache_tree(key)
            cont._armed.add(key)
            cont._pinned.add(key)
            return p
        # a write target: hand Spark a staging shadow; the next facade
        # op on this subtree absorbs the finished files
        return cont.stage_path(key)

    def dataset_source(self, uri: str):
        return self.spark_path(uri), None
