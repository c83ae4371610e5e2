"""Managed tables: versioned parquet tables with row-level DML.

The reference's managed tables are Lance-backed with INSERT/UPDATE/DELETE/
ALTER (``beacon-core/src/statement_plan/actions.rs:509-795``). The
idiomatic Spark answer is Delta Lake; this container has no Delta jars, so
this module implements the same contract on plain parquet + JSON manifest
versions — structurally a miniature Delta log:

    <root>/<name>/
      _manifests/v00000001.json   {"version", "schema", "files": [...]}
      data/part-<uuid>.parquet

  - readers pin a manifest (snapshot isolation + time travel)
  - INSERT appends files + a new manifest (no rewrite)
  - UPDATE/DELETE are copy-on-write rewrites of only the files that may
    contain matching rows (parquet footer min/max pre-filter — the same
    fail-open pruning as stats.py), exactly the reference's COW fallback
    (``statement_plan/lower.rs:30-62``)
  - ALTER ADD COLUMN is metadata-only (supertype align on read)

On a Delta/Iceberg-equipped cluster, swap this for ``delta-spark`` —
Engine's statement surface stays identical.

Storage: every metadata/manifest/index path goes through the
object-store byte-source (``sources/bytesource.py``) — the reference's
managed tables live on ``object_store`` like everything else
(``beacon-core/src/statement_plan/actions.rs:509-795``), so a table
root may be ``s3://bucket/lake/t`` as readily as ``/data/lake/t``.
Data-plane reads/writes hand Spark ``bytesource.spark_path`` forms
(``s3:// → s3a://``) so the JVM connectors and the Python metadata
layer see the same store; manifest commits are ``publish_bytes``
(local: tmp+rename, object store: atomic PUT).
"""

from __future__ import annotations

import contextlib
import json
import os
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beacon_spark.schema import align_to_schema
from beacon_spark.sources import bytesource as bs


class ManagedTableError(RuntimeError):
    pass


class ManifestConflict(ManagedTableError):
    """A concurrent writer committed this version number first. Appends
    retry against the new base (insert's loop); rewrites surface the
    conflict loudly — their survivors were computed from a snapshot the
    winner may have invalidated (Delta's ConcurrentModificationException
    contract)."""


def _parquet_num_rows(path: str) -> int:
    """Row count from the parquet footer (works on local paths and
    object-store URIs via ranged reads). Fail-open: unreadable → assume
    non-empty so the file is kept."""
    try:
        import pyarrow.parquet as pq

        p, fs = bs.dataset_source(path)
        with pq.ParquetFile(p if fs is None else fs.open_input_file(p)) as f:
            return f.metadata.num_rows
    except Exception:
        return -1


class ManagedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest_dir = bs.join(path, "_manifests")
        self.data_dir = bs.join(path, "data")

    # ------------------------------------------------------------ manifests

    def _manifests(self) -> list[str]:
        if not bs.isdir(self.manifest_dir):
            return []
        return sorted(
            f for f in bs.listdir(self.manifest_dir) if f.endswith(".json")
        )

    def current_version(self) -> int:
        ms = self._manifests()
        return int(ms[-1][1:-5]) if ms else 0

    def versions(self) -> list[tuple[int, float]]:
        """``(version, committed_at)`` for every RETAINED version,
        ascending — skips vacuum tombstones (their names persist as
        reuse guards but they are no longer readable) and in-progress
        empty claims. Time travel / SHOW VERSIONS iterate this instead
        of raw ``_manifests()``."""
        out: list[tuple[int, float]] = []
        for name in self._manifests():
            target = bs.join(self.manifest_dir, name)
            try:
                body = bs.read_text(target)
            except OSError:
                continue  # vacuumed/reclaimed underneath us
            if not body:
                continue  # claim in progress
            try:
                doc = json.loads(body)
            except ValueError:
                continue
            if doc.get("vacuumed") or "files" not in doc:
                continue
            out.append((int(name[1:9]), bs.mtime(target)))
        return out

    #: an empty manifest claim older than this is treated as abandoned
    #: (writer crashed between the O_EXCL claim and the atomic replace)
    #: and reclaimed by the next reader. Generous on purpose: a LIVE
    #: writer pausing this long mid-commit, then waking inside the
    #: stat-to-replace window of a new committer, is the only way the
    #: reclaim could lose a commit — and the publish-side re-check in
    #: _commit_manifest closes even that.
    ABANDONED_CLAIM_SECS = 60.0

    def _read_manifest(self, version: int | None = None,
                       _reclaimed: bool = False) -> dict:
        ms = self._manifests()
        if not ms:
            raise ManagedTableError(f"no managed table at {self.path}")
        name = f"v{version:08d}.json" if version is not None else ms[-1]
        target = bs.join(self.manifest_dir, name)
        for _ in range(20):
            body = bs.read_text(target)
            if body:
                doc = json.loads(body)
                if doc.get("vacuumed"):
                    # the name stays claimed forever (version-reuse
                    # guard) but the content is gone
                    raise ManagedTableError(
                        f"{self.path}: version {doc.get('version', name)} "
                        f"has been vacuumed — time travel no longer "
                        f"reaches it")
                return doc
            # the no-hardlink commit fallback claims the name empty for
            # an instant before the atomic replace — wait it out
            time.sleep(0.01)
        # still empty after 200ms: either a slow writer or a crashed one.
        # A claim past ABANDONED_CLAIM_SECS is abandoned — reclaim it so
        # the table heals instead of erroring on every read forever.
        if not _reclaimed and bs.is_local(target):
            p = bs.local_path(target)
            try:
                stale = (os.path.getsize(p) == 0 and
                         time.time() - os.path.getmtime(p)
                         > self.ABANDONED_CLAIM_SECS)
            except OSError:
                stale = True  # vanished underneath us — re-resolve
            if stale:
                with contextlib.suppress(OSError):
                    os.unlink(p)
                if version is not None:
                    raise ManagedTableError(
                        f"{self.path}: version {version} was claimed but "
                        f"never committed (crashed writer); the abandoned "
                        f"claim has been reclaimed")
                return self._read_manifest(None, _reclaimed=True)
        raise ManagedTableError(
            f"{self.path}: manifest {name} stayed empty (crashed writer?) "
            f"— if the writer is known dead, delete {target} to repair")

    def _write_manifest(
        self,
        schema: T.StructType,
        files: list[str],
        aliases: dict | None = None,
        alias_files: dict | None = None,
        retired: list | None = None,
        stream_batches: dict | None = None,
        base_version: int | None = None,
    ) -> int:
        """``aliases`` = the RENAME COLUMN physical-name map
        ({logical: [retired physical names…]}); None carries the
        current manifest's map forward (every non-ALTER mutation must,
        or renamed columns would lose their old files' data).
        ``alias_files`` ({retired physical name: [rel files that may
        still carry it]}) is recorded at rename time and PRUNED here to
        the surviving file set — once every carrying file has been
        rewritten (OPTIMIZE with a large-enough target, overwrite, a
        full UPDATE) the retired name drops out of ``aliases`` and is
        reusable again, instead of being blocked forever.
        ``retired`` = physical names of DROPPED columns (and their
        rename aliases) that data files may still carry: ADD/RENAME
        refuse these names while any carrier survives, else old files'
        values would silently resurrect into the new column. Pruned
        with its carriers like aliases."""
        if (aliases is None or alias_files is None or retired is None
                or stream_batches is None):
            try:
                m = self._read_manifest()
            except ManagedTableError:
                m = {}
            if aliases is None:
                aliases = m.get("aliases") or {}
            if alias_files is None:
                alias_files = m.get("alias_files") or {}
            if retired is None:
                retired = m.get("retired") or []
            if stream_batches is None:
                stream_batches = m.get("stream_batches") or {}
        fset = set(files)
        alias_files = {a: [f for f in carr if f in fset]
                       for a, carr in alias_files.items()}
        # a retired name whose every carrying file is gone is dead;
        # pre-alias_files manifests recorded no carrier list for it, so
        # an UNKNOWN name stays conservatively (its files can't be told
        # apart from rewritten ones)
        dead = {a for a, carr in alias_files.items() if not carr}
        aliases = {
            k: kept
            for k, v in aliases.items()
            if (kept := [a for a in v if a not in dead])
        }
        # mirror the alias rule: an entry that exists and pruned to []
        # is dead (every carrier rewritten); a name with NO entry is
        # UNKNOWN (older/foreign writer recorded no carriers) and stays
        # conservatively — freeing it would re-open the ADD COLUMN
        # silent-resurrection path the retired set exists to block
        retired = sorted(
            r for r in retired if r not in alias_files or alias_files[r]
        )
        referenced = {a for v in aliases.values() for a in v} | set(retired)
        alias_files = {a: c for a, c in alias_files.items()
                       if c and a in referenced}
        # the conditional claim must be on the version the writer READ:
        # recomputing current_version() here gave a stale-base writer a
        # fresh number, so it never collided — it just committed a file
        # list missing every concurrent writer's files (the lost-update
        # this mechanism exists to stop)
        version = (base_version if base_version is not None
                   else self.current_version()) + 1
        bs.makedirs(self.manifest_dir)
        doc = {"version": version, "schema": schema.jsonValue(),
               "files": files}
        if aliases:
            doc["aliases"] = aliases
        if alias_files:
            doc["alias_files"] = alias_files
        if retired:
            doc["retired"] = retired
        if stream_batches:
            # per-stream last-applied micro-batch ids: the idempotency
            # markers that make streaming ingestion exactly-once (they
            # commit ATOMICALLY with the data they mark — ingest.py)
            doc["stream_batches"] = stream_batches
        self._commit_manifest(version, json.dumps(doc).encode())
        # Version-number REUSE cannot happen: VACUUM replaces dropped
        # manifests with TOMBSTONE files (same name, {"vacuumed": true})
        # instead of deleting them, so a slow writer whose candidate
        # number was vacuumed finds the name still claimed and gets a
        # clean ManifestConflict from put-if-absent above. The previous
        # design (r13) deleted old manifests and compensated with a
        # post-commit "newer version exists → retract ours" check — but
        # that conflated the vacuum-reuse case with the BENIGN race
        # where a fast follower read our fresh commit and built v(N+2)
        # on top of it inside our link→list window: retracting then
        # punched a hole under the follower and made insert()'s retry
        # double-append our files. Tombstones make the claim namespace
        # append-only, so a successful put-if-absent IS the commit —
        # nothing is ever retracted.
        return version

    def _commit_manifest(self, version: int, payload: bytes) -> None:
        """Put-if-absent commit of ONE version number (the Delta-log
        concurrency primitive): two writers that both read vN race for
        v(N+1); exactly one wins, the loser gets :class:`ManifestConflict`
        instead of silently replacing the winner's manifest and orphaning
        its data files (the old unconditional publish was a lost-update).
        Local stores claim the name atomically via ``os.link``; remote
        stores ride ``bs.publish_if_absent`` — NATIVE-conditional where
        the store has the primitive (the bdb container's sqlite
        INSERT), exists-check + write-back verify elsewhere (same
        compromise as Catalog._mutate)."""
        target = bs.join(self.manifest_dir, f"v{version:08d}.json")
        if bs.is_local(target):
            p = bs.local_path(target)
            tmp = f"{p}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(payload)
            try:
                os.link(tmp, p)  # atomic claim + full-file visibility
            except FileExistsError:
                raise ManifestConflict(
                    f"{self.path}: version {version} was committed by a "
                    f"concurrent writer"
                ) from None
            except OSError:
                # filesystem without hard links (SMB/some FUSE mounts):
                # claim the name with O_EXCL, then make the content
                # visible atomically via replace — a reader in the tiny
                # claim window sees an empty manifest, which
                # _read_manifest treats as not-yet-committed
                try:
                    os.close(os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                except FileExistsError:
                    raise ManifestConflict(
                        f"{self.path}: version {version} was committed by "
                        f"a concurrent writer"
                    ) from None
                # a reader may have reclaimed our claim as abandoned (see
                # _read_manifest) if we stalled past the reclaim age, and
                # a NEW writer may have committed this version since — a
                # blind replace here would clobber that commit. Publish
                # only if our empty claim is still in place.
                try:
                    if os.stat(p).st_size:
                        raise ManifestConflict(
                            f"{self.path}: version {version} was committed "
                            f"by a concurrent writer after our claim was "
                            f"reclaimed as abandoned")
                except FileNotFoundError:
                    raise ManifestConflict(
                        f"{self.path}: claim for version {version} was "
                        f"reclaimed as abandoned before publish") from None
                os.replace(tmp, p)
                return
            finally:
                with contextlib.suppress(OSError):
                    os.unlink(tmp)
            return
        # bs.publish_if_absent is NATIVE-conditional for the bdb
        # container (one sqlite INSERT, atomic across processes) and
        # exists+put+verify for object stores without a conditional PUT
        if not bs.publish_if_absent(target, payload):
            raise ManifestConflict(
                f"{self.path}: version {version} was committed by a "
                f"concurrent writer"
            )

    def _write_data(self, df: DataFrame) -> list[str]:
        """One parquet file per partition into data/ under fresh names.
        The Spark write targets ``spark_path(staging)``; the renames into
        data/ are metadata-plane moves on the same store."""
        staging = bs.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(bs.spark_path(staging))
        bs.makedirs(self.data_dir)
        out = []
        for f in sorted(bs.listdir(staging)):
            if f.endswith(".parquet"):
                src = bs.join(staging, f)
                if _parquet_num_rows(src) == 0:
                    # zero-row parts (empty-schema CREATE, delete-all
                    # survivors, empty partitions) carry nothing but a
                    # schema header; keeping them bloats file lists and
                    # pins rename alias_files carriers forever
                    continue
                new = f"part-{uuid.uuid4().hex}.parquet"
                dst = bs.join(self.data_dir, new)
                bs.move(src, dst)
                # rename PRESERVES the staging-write mtime, so a file
                # from a long Spark job would look old the moment it
                # lands; VACUUM's in-flight protections (grace window +
                # newer-than-last-commit) both key off mtime, so stamp
                # the LANDING time
                with contextlib.suppress(OSError):
                    bs.touch(dst)
                out.append(f"data/{new}")
        bs.rmtree(staging)
        return out

    # ------------------------------------------------------------ operations

    def create(self, df: DataFrame) -> "ManagedTable":
        if self._manifests():
            raise ManagedTableError(f"table already exists at {self.path}")
        files = self._write_data(df)
        self._write_manifest(df.schema, files, base_version=0)
        return self

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._read_manifest()["schema"])

    def files(self, version: int | None = None) -> list[str]:
        """Absolute paths of the version's data files."""
        return [
            bs.join(self.path, f) for f in self._read_manifest(version)["files"]
        ]

    def cluster_by(
        self, columns: str | list[str], n_files: int | None = None
    ) -> int:
        """Physically cluster the table (the Z-ORDER analog, serving the
        Lance btree-index role, actions.rs:763-820).

        One column: range-repartition + in-partition sort — every file
        owns a disjoint value range. Parquet footer min/max then skips
        row groups natively, and the file-stats index skips whole files
        before the scan even opens them.

        Several columns: Morton/Z-order — each (numeric/temporal) column
        is linearly scaled to 16 bits between its min and max (one cheap
        agg; the same spirit as Delta's range-id interleave, without a
        sample job), the bits interleaved into one long, and the table
        range-repartitioned + sorted on that Z value. Files then cover
        small hyper-rectangles, so min/max pruning stays selective on
        EVERY clustered column, not just the leading one. The Z value is
        a pure Catalyst expression (shifts + ors); it is dropped before
        writing."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        df = self.read()
        n = n_files or max(len(m["files"]), 4)
        if len(cols) == 1:
            clustered = df.repartitionByRange(
                n, F.col(cols[0])
            ).sortWithinPartitions(cols[0])
        else:
            if len(cols) > 4:
                raise ManagedTableError("Z-order supports at most 4 columns")
            k = len(cols)
            # bits per column capped so the top interleaved position
            # stays below bit 63 — bit 63 is the long's SIGN bit, and a
            # set sign bit would flip half the Z space negative,
            # scrambling the range partitioning (and colliding with the
            # -1 null sentinel)
            bits = min(16, 63 // k)  # (bits-1)*k + (k-1) <= 62 < sign bit
            top = (1 << bits) - 1
            exprs = []
            for i, c in enumerate(cols):
                dt = schema[c].dataType
                if isinstance(dt, T.TimestampNTZType):
                    # NTZ has no direct double cast; go through timestamp
                    exprs.append(F.col(c).cast("timestamp").cast("double"))
                elif isinstance(dt, T.TimestampType):
                    exprs.append(F.col(c).cast("double"))
                elif isinstance(dt, T.DateType):
                    exprs.append(
                        F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
                    )
                elif isinstance(dt, (T.DoubleType, T.FloatType)):
                    # NaN would poison min/max AND blow up the ANSI
                    # long cast — map it to null (handled like nulls)
                    exprs.append(F.nanvl(F.col(c).cast("double"), F.lit(None)))
                elif isinstance(dt, T.NumericType):
                    exprs.append(F.col(c).cast("double"))
                else:
                    raise ManagedTableError(
                        f"Z-order needs numeric/temporal columns; {c!r} is "
                        f"{dt.simpleString()}"
                    )
            stats = df.agg(
                *[F.min(e).alias(f"__lo_{i}") for i, e in enumerate(exprs)],
                *[F.max(e).alias(f"__hi_{i}") for i, e in enumerate(exprs)],
            ).collect()[0]
            z = F.lit(0).cast("long")
            for i, (c, col) in enumerate(zip(cols, exprs)):
                lo = stats[f"__lo_{i}"]
                hi = stats[f"__hi_{i}"]
                if lo is None or hi is None:
                    continue  # empty table / all-null column: no signal
                lo_f, hi_f = float(lo), float(hi)
                span = (hi_f - lo_f) or 1.0
                # clamp in DOUBLE before the cast — ANSI mode (Spark 4
                # default) turns an Infinity/overflow long cast into a
                # query-killing error. A null (or NaN→null) value scales
                # to 0 for THIS column only (least/greatest's null-skip
                # does exactly that), so the row keeps its interleave
                # bits on every other clustered column — nulling the
                # whole z would funnel null-heavy tables into one skewed
                # bucket with no pruning on the non-null columns.
                scaled = F.least(
                    F.lit(float(top)),
                    F.greatest(
                        F.lit(0.0),
                        (col - F.lit(lo_f)) / F.lit(span) * top,
                    ),
                ).cast("long")
                # interleave: bit b of column i lands at position b*k + i
                for b in range(bits):
                    z = z.bitwiseOR(
                        F.shiftleft(
                            F.shiftright(scaled, b).bitwiseAND(F.lit(1)),
                            b * k + i,
                        )
                    )
            # z is never null (per-column nulls scaled to 0 above); the
            # coalesce is belt-and-braces against an all-skipped build
            zc = F.coalesce(z, F.lit(0))
            clustered = (
                df.withColumn("__z", zc)
                .repartitionByRange(n, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        files = self._write_data(clustered)
        # full rewrite through the logical frame: every new file carries
        # logical names, so retired rename aliases (and dropped-column
        # tombstones) are cleared
        return self._write_manifest(
            schema, files, aliases={}, alias_files={}, retired=[],
            base_version=m["version"])

    def _read_files(
        self,
        paths: list[str],
        schema: T.StructType,
        aliases: dict | None = None,
    ) -> DataFrame:
        """Scan manifest data files WITH the manifest schema pinned.
        Schema evolution is metadata-only (alter_add_column /
        alter_rename_column), so a version's file set can mix pre- and
        post-ALTER schemas; a bare ``spark.read.parquet`` infers from
        ONE footer, and when that footer predates the ALTER the newer
        files' column values are silently pruned to null. Passing the
        schema makes the reader clip per file: present columns read,
        absent ones null-fill.

        ``aliases`` (manifest ``"aliases"``: {logical: [old physical
        names…]}) is the RENAME COLUMN read path: old files carry the
        retired physical name, new files the logical one — the read
        schema includes both and the logical column COALESCEs across
        them (a file holds data under exactly one of the names, by
        construction). Metadata-only, no rewrite — the Lance/Delta
        column-mapping shape, not a 100 TB file rewrite per rename."""
        aliases = {
            k: [a for a in v if a not in schema.fieldNames()]
            for k, v in (aliases or {}).items()
            if k in schema.fieldNames()
        }
        if not any(aliases.values()):
            df = self.spark.read.schema(schema).parquet(
                *bs.spark_paths(paths))
            return align_to_schema(df, schema)
        by_name = {f.name: f for f in schema.fields}
        read_schema = T.StructType(list(schema.fields) + [
            T.StructField(a, by_name[logical].dataType, True)
            for logical, olds in aliases.items() for a in olds
        ])
        df = self.spark.read.schema(read_schema).parquet(
            *bs.spark_paths(paths))
        cols = []
        for f in schema.fields:
            olds = aliases.get(f.name)
            if olds:
                cols.append(F.coalesce(F.col(f.name), *[
                    F.col(a) for a in olds]).alias(f.name))
            else:
                cols.append(F.col(f.name))
        return align_to_schema(df.select(*cols), schema)

    def read(self, version: int | None = None) -> DataFrame:
        m = self._read_manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        paths = [bs.join(self.path, f) for f in m["files"]]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self._read_files(paths, schema, m.get("aliases"))

    def overwrite(self, df: DataFrame) -> int:
        """Replace contents with a new version; prior versions stay readable
        (MV REFRESH re-materialization, statement_plan/physical.rs:128-266)."""
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        files = self._write_data(align_to_schema(df, schema))
        # no old file survives an overwrite — rename aliases and
        # dropped-column tombstones clear; stream markers persist (an
        # overwrite doesn't un-apply ingested batches)
        return self._write_manifest(
            schema, files, aliases={}, alias_files={}, retired=[],
            stream_batches=m.get("stream_batches") or {},
            base_version=m["version"])

    def insert(self, df: DataFrame,
               stream_marker: tuple[str, int] | None = None) -> int:
        """Append rows. ``stream_marker`` = (stream name, micro-batch id)
        makes the append IDEMPOTENT for streaming replays: the marker
        commits in the same manifest write as the data, so a crash
        between data commit and checkpoint commit leaves proof the batch
        landed — the replay sees marker >= batch_id and no-ops instead
        of double-ingesting (foreachBatch alone is at-least-once)."""
        files: list[str] | None = None
        schema_json: dict | None = None
        for _ in range(8):
            m = self._read_manifest()
            markers = dict(m.get("stream_batches") or {})
            if stream_marker is not None:
                s, bid = stream_marker
                prev = markers.get(s)
                if prev is not None and int(prev) >= int(bid):
                    return self.current_version()  # replayed batch — no-op
                markers[s] = int(bid)
            if files is None:
                schema_json = m["schema"]
                files = self._write_data(
                    align_to_schema(df, T.StructType.fromJson(schema_json)))
            elif m["schema"] != schema_json:
                # a concurrent ALTER changed the schema our files were
                # written against — merging blind could mis-bind renamed
                # columns; surface it instead
                raise ManifestConflict(
                    f"{self.path}: schema changed concurrently during "
                    f"INSERT; retry the statement"
                )
            try:
                # appends are retryable: on conflict, re-read the winner's
                # manifest and append the SAME data files to its file list
                # (the pre-conflict behavior silently dropped the loser).
                # Dedupe on merge: if a ManifestConflict ever fires after
                # the commit actually landed (a remote store's write-back
                # verify reading stale), the winner's list already holds
                # our files — appending blind would serve duplicated rows
                seen = set(m["files"])
                return self._write_manifest(
                    T.StructType.fromJson(m["schema"]),
                    m["files"] + [f for f in files if f not in seen],
                    m.get("aliases") or {}, m.get("alias_files") or {},
                    m.get("retired") or [], markers,
                    base_version=m["version"])
            except ManifestConflict:
                continue
        raise ManifestConflict(
            f"{self.path}: INSERT lost the commit race 8 times; retry"
        )

    def _split_files(
        self, predicate: str, schema: T.StructType
    ) -> tuple[list[str], list[str]]:
        """Files that contain matching rows vs provably-clean files —
        ONE Spark job over the whole file set: scan with the predicate
        pushed down, group by ``input_file_name()``, collect the
        distinct touched files. A per-file ``limit(1)`` probe would
        launch one job per file — a 1,000-file table would pay 1,000
        job-scheduling round trips where this pays one (parquet
        footer/row-group pruning still skips non-matching chunks inside
        the single scan). Reads are schema-pinned so predicates may
        reference columns added by metadata-only ALTER."""
        m = self._read_manifest()
        paths = [bs.join(self.path, rel) for rel in m["files"]]
        if not paths:
            return [], []
        # spark_path may differ from the stored rel (object-store
        # mapping), so match on basename — data files carry unique
        # uuid names by construction (_write_data)
        hit_names = {
            posixpath.basename(r.f) for r in
            self._read_files(paths, schema, m.get("aliases"))
            .filter(F.expr(predicate))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        touched, clean = [], []
        for rel in m["files"]:
            name = posixpath.basename(rel)
            (touched if name in hit_names else clean).append(rel)
        return touched, clean

    def delete(self, predicate: str) -> int:
        """COW delete: rewrite only files containing matches."""
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        touched, clean = self._split_files(predicate, schema)
        new_files = list(clean)
        if touched:
            survivors = self._read_files(
                [bs.join(self.path, f) for f in touched], schema,
                m.get("aliases"),
            ).filter(~F.expr(predicate))
            new_files += self._write_data(survivors)
        return self._write_manifest(
            schema, new_files,
            m.get("aliases") or {}, m.get("alias_files") or {},
            m.get("retired") or [], m.get("stream_batches") or {},
            base_version=m["version"])

    def update(self, assignments: dict[str, str], predicate: str | None) -> int:
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        # bind assignment targets to schema columns EAGERLY, resolving
        # case-insensitively like Spark's analyzer — an unknown (or
        # merely differently-cased) target used to be silently skipped,
        # so `UPDATE t SET typo = 5` reported ok and changed nothing
        by_lower = {f.name.lower(): f.name for f in schema.fields}
        unknown = [k for k in assignments if k.lower() not in by_lower]
        if unknown:
            raise ManagedTableError(
                f"UPDATE: unknown column(s) {sorted(unknown)} "
                f"(have: {sorted(by_lower.values())})"
            )
        # Spark's analyzer errors on duplicate assignment targets; two
        # targets differing only by case would otherwise collapse to one
        # assignment, last-writer-wins, silently
        seen: dict[str, str] = {}
        for k in assignments:
            prior = seen.setdefault(k.lower(), k)
            if prior != k:
                raise ManagedTableError(
                    f"UPDATE: duplicate assignment target "
                    f"{prior!r} / {k!r}"
                )
        assignments = {by_lower[k.lower()]: v for k, v in assignments.items()}
        predicate = predicate or "true"
        touched, clean = self._split_files(predicate, schema)
        new_files = list(clean)
        if touched:
            df = self._read_files(
                [bs.join(self.path, f) for f in touched], schema,
                m.get("aliases"),
            )
            cond = F.expr(predicate)
            cols = []
            for fld in schema.fields:
                if fld.name in assignments:
                    cols.append(
                        F.when(cond, F.expr(assignments[fld.name]))
                        .otherwise(F.col(fld.name))
                        .cast(fld.dataType)
                        .alias(fld.name)
                    )
                else:
                    cols.append(F.col(fld.name))
            new_files += self._write_data(align_to_schema(df.select(*cols), schema))
        return self._write_manifest(
            schema, new_files,
            m.get("aliases") or {}, m.get("alias_files") or {},
            m.get("retired") or [], m.get("stream_batches") or {},
            base_version=m["version"])

    def alter_add_column(self, name: str, spark_type: str) -> int:
        """Metadata-only schema evolution: readers NULL-fill via align."""
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        if name in [f.name for f in schema.fields]:
            raise ManagedTableError(f"column {name} already exists")
        aliases = m.get("aliases") or {}
        if any(name in olds for olds in aliases.values()) or \
                name in (m.get("retired") or []):
            # data files still carry this physical name for a RENAMED or
            # DROPPED column — a new logical column with the same name
            # would silently resurrect their values. Refuse loudly.
            raise ManagedTableError(
                f"column name {name!r} is still carried by data files of "
                f"a renamed or dropped column; OPTIMIZE the table first"
            )
        schema = schema.add(T.StructField(name, _parse_type(spark_type), True))
        return self._write_manifest(
            schema, m["files"],
            m.get("aliases") or {}, m.get("alias_files") or {},
            m.get("retired") or [], m.get("stream_batches") or {},
            base_version=m["version"])

    def alter_rename_column(self, old: str, new: str) -> int:
        """Metadata-only RENAME COLUMN (Lance applies renames without a
        rebuild — actions.rs ALTER path; test contract:
        integration-tests/test_lance_tables.py:93-114): the manifest
        schema swaps the name and records the retired physical name in
        ``aliases``, so readers COALESCE old files' column into the new
        name. No data rewrite — at 100 TB a rename stays O(1)."""
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ManagedTableError(f"no column {old}")
        if new in names:
            raise ManagedTableError(f"column {new} already exists")
        aliases = dict(m.get("aliases") or {})
        if any(new in olds for olds in aliases.values()) or \
                new in (m.get("retired") or []):
            raise ManagedTableError(
                f"column name {new!r} is still carried by data files of "
                f"a previously renamed or dropped column; OPTIMIZE the "
                f"table first"
            )
        fields = [
            T.StructField(new, f.dataType, f.nullable) if f.name == old
            else f
            for f in schema.fields
        ]
        aliases[new] = aliases.pop(old, []) + [old]
        # every CURRENT file may still carry the retired physical name;
        # _write_manifest prunes this list as rewrites replace them, and
        # the alias dies with its last carrier
        alias_files = dict(m.get("alias_files") or {})
        alias_files[old] = list(m["files"])
        return self._write_manifest(
            T.StructType(fields), m["files"], aliases, alias_files,
            m.get("retired") or [], m.get("stream_batches") or {},
            base_version=m["version"])

    def alter_drop_column(self, name: str) -> int:
        """Metadata-only DROP COLUMN. Data files still carry the dropped
        column's physical name (and, if it had been renamed, its retired
        aliases) — all of those move to the manifest's ``retired`` set so
        a later ADD/RENAME cannot reuse them and silently resurrect the
        old files' values. Each frees when its last carrier is
        rewritten, same lifecycle as rename aliases."""
        m = self._read_manifest()
        schema = T.StructType.fromJson(m["schema"])
        fields = [f for f in schema.fields if f.name != name]
        if len(fields) == len(schema.fields):
            raise ManagedTableError(f"no column {name}")
        aliases = dict(m.get("aliases") or {})
        olds = aliases.pop(name, [])
        alias_files = dict(m.get("alias_files") or {})
        # conservative carrier list for the column's own physical name:
        # every current file may still hold it
        alias_files.setdefault(name, list(m["files"]))
        retired = set(m.get("retired") or []) | {name} | set(olds)
        return self._write_manifest(
            T.StructType(fields), m["files"], aliases, alias_files,
            sorted(retired), m.get("stream_batches") or {},
            base_version=m["version"])

    # --------------------------------------------------- inverted index

    TOKEN_RE = "[^a-z0-9]+"

    def _build_posting_index(self, index_name: str, key_of) -> int:
        """Shared key→posting-file index builder (inverted + bitmap):
        ``key_of(scan_df)`` yields a DataFrame of (token, file) pairs for
        new files; written token-sorted so probes are range reads.
        Incremental: files already in the index keep their postings; only
        new files are scanned (cost ∝ appended data). Returns the number
        of files newly indexed."""
        idx_dir = bs.join(self.path, "_indexes", index_name)
        files = self.files()
        basenames = {bs.basename(f) for f in files}
        prior = None
        indexed: set[str] = set()
        if bs.isdir(idx_dir):
            prior = self.spark.read.parquet(bs.spark_path(idx_dir))
            # keep postings of files still live in the current manifest —
            # as a broadcast semi-join, not isin(): a 100k-file table
            # would inline 100k string literals into the plan
            live = self.spark.createDataFrame(
                [(b,) for b in sorted(basenames)], "file string")
            prior = prior.join(F.broadcast(live), "file", "left_semi").cache()
            indexed = {r.file for r in prior.select("file").distinct().collect()}
        new_files = [f for f in files if bs.basename(f) not in indexed]
        parts = [] if prior is None else [prior]
        if new_files:
            parts.append(key_of(self.spark.read.parquet(*bs.spark_paths(new_files))))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        tmp = idx_dir + f".tmp-{uuid.uuid4().hex}"
        try:
            out.sort("token").write.mode("overwrite").parquet(bs.spark_path(tmp))
        finally:
            if prior is not None:
                prior.unpersist()  # the build's cache must not outlive it
        # sidecar: the exact file set this index covers — prune treats
        # files OUTSIDE it as unprunable (fail-open on a stale index)
        bs.write_bytes(
            bs.join(tmp, "_indexed_files.json"),
            json.dumps(sorted(basenames)).encode(),
        )
        if bs.isdir(idx_dir):
            bs.rmtree(idx_dir)
        bs.move(tmp, idx_dir)
        return len(new_files)

    def build_inverted_index(self, column: str, index_name: str) -> int:
        """Token→posting-file index (the Lance inverted-index role,
        reference ``beacon-core/src/statement_plan/actions.rs:763-820``):
        one distributed pass tokenizes ``column`` (lowercase, split on
        non-alphanumeric), emits DISTINCT (token, file) pairs."""

        def key_of(df):
            return (
                df.select(
                    F.explode(
                        F.split(F.lower(F.col(column).cast("string")), self.TOKEN_RE)
                    ).alias("token"),
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).alias("file"),
                )
                .filter(F.col("token") != "")
                .distinct()
            )

        return self._build_posting_index(index_name, key_of)

    def build_bitmap_index(self, column: str, index_name: str) -> int:
        """Value→posting-file index for low-cardinality columns (the
        Lance bitmap-index role): DISTINCT (value, file) pairs, value
        stringified. Probed by equality/IN predicates via
        :meth:`bitmap_prune`; index size ∝ cardinality × files."""

        def key_of(df):
            return (
                df.select(
                    F.col(column).cast("string").alias("token"),
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).alias("file"),
                )
                .filter(F.col("token").isNotNull())
                .distinct()
            )

        return self._build_posting_index(index_name, key_of)

    def bitmap_prune(
        self, index_name: str, clauses: list[list[str]]
    ) -> list[str] | None:
        """Files that can satisfy CNF equality clauses on the indexed
        column: each clause is a list of alternative values (an eq leaf
        = one value; an OR of eqs on the column = several); a file
        survives when EVERY clause has at least one posted value.
        Fail-open (None) when the index is missing/unreadable; the
        postings read is a token-IN pyarrow scan (value-sorted row
        groups)."""
        idx_dir = bs.join(self.path, "_indexes", index_name)
        if not bs.isdir(idx_dir) or not clauses:
            return None
        wanted = sorted({v for cl in clauses for v in cl})
        try:
            import pyarrow.dataset as pads

            p, fs = bs.dataset_source(idx_dir)
            tbl = pads.dataset(p, format="parquet", filesystem=fs).to_table(
                filter=pads.field("token").isin(wanted)
            )
        except Exception:
            return None
        posted: dict[str, set] = {}
        for f, v in zip(
            tbl.column("file").to_pylist(), tbl.column("token").to_pylist()
        ):
            posted.setdefault(f, set()).add(v)
        keep = {
            f
            for f, vs in posted.items()
            if all(vs & set(cl) for cl in clauses)
        }
        try:
            indexed = set(
                json.loads(bs.read_text(bs.join(idx_dir, "_indexed_files.json")))
            )
        except (OSError, ValueError):
            # missing OR corrupted coverage manifest -> can't prune
            # safely (fail-open, never crash the query)
            return None
        return [
            f
            for f in self.files()
            # unindexed files are kept unconditionally (fail-open)
            if bs.basename(f) in keep or bs.basename(f) not in indexed
        ]

    def inverted_prune(
        self, index_name: str, terms: list[str]
    ) -> list[str] | None:
        """Files that can contain rows where the indexed column CONTAINS
        every term. Substring-safe: ``contains 'error'`` matches a row
        whose only posted token is ``errors``, and in a multi-word term
        the first/last pieces may be a token's suffix/prefix — so a
        query piece matches a posted token when the piece is a SUBSTRING
        of the token, and a file survives when every piece has at least
        one substring-matching posted token (AND semantics). Fail-open:
        returns None when the index is missing/unreadable. The postings
        read is a metadata-sized pyarrow scan with a match_substring
        filter over the token dictionary, no Spark job."""
        import re as _re

        idx_dir = bs.join(self.path, "_indexes", index_name)
        if not bs.isdir(idx_dir):
            return None
        pieces = set()
        for t in terms:
            pieces.update(x for x in _re.split(self.TOKEN_RE, str(t).lower()) if x)
        if not pieces:
            return None
        try:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            expr = None
            for p in sorted(pieces):
                e = pc.match_substring(pads.field("token"), p)
                expr = e if expr is None else expr | e
            p, fs = bs.dataset_source(idx_dir)
            tbl = pads.dataset(p, format="parquet", filesystem=fs).to_table(
                filter=expr
            )
        except Exception:
            return None
        seen: dict[str, set] = {}
        for f, t in zip(
            tbl.column("file").to_pylist(), tbl.column("token").to_pylist()
        ):
            seen.setdefault(f, set()).update(p for p in pieces if p in t)
        keep = {f for f, ps in seen.items() if ps >= pieces}
        try:
            indexed = set(
                json.loads(bs.read_text(bs.join(idx_dir, "_indexed_files.json")))
            )
        except (OSError, ValueError):
            # missing OR corrupted coverage manifest -> can't prune
            # safely (fail-open, never crash the query)
            return None
        return [
            f
            for f in self.files()
            # unindexed files are kept unconditionally (fail-open)
            if bs.basename(f) in keep or bs.basename(f) not in indexed
        ]

    def compact(self, target_file_bytes: int = 128 << 20,
                small_ratio: float = 0.5) -> tuple[int, int]:
        """``OPTIMIZE``: fold the small-file tail into target-sized
        files. Streaming ingestion (CREATE STREAM) and frequent small
        INSERTs land one parquet file per micro-batch; at scale the
        table degrades into thousands of tiny files whose open/footer
        cost dominates the scan. Compaction is INCREMENTAL: only files
        under ``small_ratio * target_file_bytes`` are rewritten (one
        coalesced write sized by their total bytes); files already near
        target size are carried into the new manifest untouched, so the
        rewrite cost is proportional to the small tail, not the table.

        COW contract: prior manifests keep referencing the original
        files, so time travel across the compaction boundary still
        works; VACUUM reclaims the superseded small files later.
        Returns (files_before, files_after)."""
        manifest = self._read_manifest()
        rels = manifest["files"]
        threshold = int(target_file_bytes * small_ratio)
        small, keep, total = [], [], 0
        for rel in rels:
            sz = bs.size(bs.join(self.path, rel))  # one stat per file
            if sz < threshold:
                small.append(rel)
                total += sz
            else:
                keep.append(rel)
        if len(small) <= 1:
            return len(rels), len(rels)
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        df = self._read_files(
            [bs.join(self.path, rel) for rel in small],
            T.StructType.fromJson(manifest["schema"]),
            manifest.get("aliases"),
        ).coalesce(n_out)
        new = self._write_data(df)
        self._write_manifest(
            T.StructType.fromJson(manifest["schema"]), keep + new,
            manifest.get("aliases") or {}, manifest.get("alias_files") or {},
            manifest.get("retired") or [],
            manifest.get("stream_batches") or {},
            base_version=manifest["version"],
        )
        return len(rels), len(keep) + len(new)

    #: crashed-writer staging dirs younger than this survive VACUUM —
    #: a live 100 TB write can legitimately stage for hours (Delta's
    #: VACUUM retention plays the same role for its tombstoned files)
    STAGING_GRACE_SECS = 7 * 24 * 3600.0

    #: minimum age (seconds since landing in data/) before an
    #: unreferenced data file becomes VACUUM-reclaimable. The Delta
    #: retention contract in miniature: a concurrent writer must get
    #: from file-land to manifest-commit inside this window.
    VACUUM_GRACE_SECS = 600.0

    #: how long a vacuumed manifest's NAME stays claimed as a tombstone
    #: before a later VACUUM may delete the file. While the tombstone
    #: exists, a stale writer that computed the same version number gets
    #: a clean put-if-absent conflict instead of committing an invisible
    #: orphan (acknowledged-row loss). A writer stalled mid-commit
    #: longer than this is out of contract — the same shape as Delta's
    #: log-retention window.
    MANIFEST_TOMBSTONE_SECS = 7 * 24 * 3600.0

    def vacuum(self, retain_versions: int = 1,
               grace_seconds: float | None = None) -> tuple[int, int]:
        """Reclaim storage: drop manifests older than the newest
        ``retain_versions`` and delete data files no surviving version
        references. Time travel shortens accordingly (the same contract
        as Delta VACUUM / Lance cleanup). Returns (manifests_removed,
        files_removed).

        Concurrent-writer safety, two independent guards (r13 — the
        cross-process hammer caught the first guard alone losing
        acknowledged rows): a data file is deleted only when it is
        unreferenced AND (a) older than the newest manifest AND (b)
        landed in ``data/`` more than ``grace_seconds`` ago (default
        :data:`VACUUM_GRACE_SECS`). Guard (a) alone is insufficient:
        writer A lands its file, writer B commits, and VACUUM runs
        before A's commit — A's file is unreferenced and older than
        B's manifest, yet A's imminent commit references it (the
        hammer reproduced exactly this as lost acknowledged rows).
        Guard (b) closes it for any writer that commits within the
        grace window — the same retention contract Delta's VACUUM
        documents. ``_write_data`` touch-stamps files at LANDING time
        (rename preserves the staging-write mtime, which for a long
        Spark job can predate the move by hours). Crashed writers'
        ``_staging-*`` dirs are reclaimed after
        :data:`STAGING_GRACE_SECS`.
        """
        if retain_versions < 1:
            raise ManagedTableError("VACUUM must retain at least 1 version")
        if grace_seconds is None:
            grace_seconds = self.VACUUM_GRACE_SECS
        ms = self._manifests()
        # classify once: live manifests vs tombstones from earlier
        # vacuums vs in-progress empty claims (left alone — the
        # abandoned-claim reclaim in _read_manifest owns those)
        docs: dict[str, dict] = {}
        for name in ms:
            try:
                body = bs.read_text(bs.join(self.manifest_dir, name))
                docs[name] = json.loads(body) if body else {}
            except (OSError, ValueError):
                docs[name] = {}
        live_ms = [n for n in ms if "files" in docs[n]]
        tomb_ms = [n for n in ms if docs[n].get("vacuumed")]
        keep_ms = live_ms[-retain_versions:]
        drop_ms = (live_ms[: -retain_versions]
                   if retain_versions < len(live_ms) else [])
        live: set[str] = set()
        for name in keep_ms:
            live.update(docs[name]["files"])
        # default=0.0, NOT inf: with zero manifests (pre-first-commit
        # window / misuse) `mtime >= inf` would be False for every file
        # and VACUUM would delete an in-flight INSERT's data — the exact
        # race the guard exists for. 0.0 treats everything as in-flight,
        # failing safe.
        newest_commit = max(
            (bs.mtime(bs.join(self.manifest_dir, name)) for name in ms),
            default=0.0,
        )
        removed_files = 0
        now = time.time()
        if bs.isdir(self.data_dir):
            for fn in bs.listdir(self.data_dir):
                if fn.endswith(".parquet") and f"data/{fn}" not in live:
                    p = bs.join(self.data_dir, fn)
                    try:
                        mt = bs.mtime(p)
                    except OSError:
                        continue  # vanished — another vacuum got it
                    if mt >= newest_commit or now - mt < grace_seconds:
                        continue  # in flight (either guard)
                    try:
                        bs.remove(p)
                    except OSError:
                        continue  # a concurrent vacuum removed it first
                    removed_files += 1
        # TOMBSTONE, never delete: the manifest NAME is the put-if-absent
        # claim token, so deleting it would free the version number for a
        # slow writer to reuse — its commit would land invisibly behind
        # newer versions (acknowledged-row loss; the r13 post-commit
        # retraction that tried to compensate conflated this with the
        # benign fast-follower race and could retract GOOD commits).
        # Content is atomically replaced so concurrent readers see the
        # old manifest or the tombstone, never a torn file.
        for name in drop_ms:
            v = int(name[1:9])
            bs.publish_bytes(
                bs.join(self.manifest_dir, name),
                json.dumps({"version": v, "vacuumed": True}).encode())
        # reap tombstones past the retention contract: a writer still
        # mid-commit MANIFEST_TOMBSTONE_SECS after its number was
        # vacuumed is out of contract (same shape as Delta's log
        # retention), so the reuse guard may finally release the name
        for name in tomb_ms:
            p = bs.join(self.manifest_dir, name)
            with contextlib.suppress(OSError):
                if now - bs.mtime(p) > self.MANIFEST_TOMBSTONE_SECS:
                    bs.remove(p)
        # abandoned staging dirs (writer crashed between _write_data's
        # Spark write and the moves): old enough = reclaimable
        for fn in bs.listdir(self.path) if bs.isdir(self.path) else []:
            if fn.startswith("_staging-"):
                p = bs.join(self.path, fn)
                with contextlib.suppress(OSError):
                    if now - bs.mtime(p) > self.STAGING_GRACE_SECS:
                        bs.rmtree(p)
        # manifest .tmp-* files orphaned by a writer killed between its
        # tmp write and the os.link claim (the unlink lives in a finally
        # SIGKILL skips): excluded from _manifests() by the .json filter,
        # so purely a disk leak — reclaim past the same grace
        if bs.isdir(self.manifest_dir):
            for fn in bs.listdir(self.manifest_dir):
                if ".tmp-" in fn:
                    p = bs.join(self.manifest_dir, fn)
                    with contextlib.suppress(OSError):
                        if now - bs.mtime(p) > self.STAGING_GRACE_SECS:
                            bs.remove(p)
        return len(drop_ms), removed_files

    def drop(self) -> None:
        bs.rmtree(self.path)


def _parse_type(s: str) -> T.DataType:
    """Spark type from a dialect type string. The reference accepts the
    bare DataFusion spellings VARCHAR/CHAR/TEXT (no length) — Spark
    requires a length on VARCHAR/CHAR, so those normalize to string
    (the same Utf8 the reference maps them to)."""
    import re as _re

    from pyspark.sql.types import _parse_datatype_string

    s = _re.sub(r"(?i)^\s*(?:varchar|char|text)(?:\s*\(\s*\d+\s*\))?\s*$",
                "string", s)
    return _parse_datatype_string(s)


# ---------------------------------------------------------------- catalog


class Catalog:
    """Persisted engine catalog: managed tables, views, materialized views
    (the reference persists these across restarts — runtime.rs MV tests).
    Stored as JSON under <datasets_root>/.beacon_catalog/."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.dir = bs.join(root, ".beacon_catalog")
        self.tables_dir = bs.join(self.dir, "tables")
        self.file = bs.join(self.dir, "catalog.json")

    _EMPTY = {
        "views": {},
        "materialized_views": {},
        "tables": {},
        "external_tables": {},
        "indexes": {},
        "crawlers": {},
        "streams": {},
        "secrets": {},
        "extensions": {},
    }

    def _load(self) -> dict:
        cat = {}
        if bs.exists(self.file):
            cat = json.loads(bs.read_text(self.file))
        for k, v in self._EMPTY.items():
            cat.setdefault(k, dict(v))
        return cat

    def _save(self, cat: dict) -> None:
        # "rev" is a monotonic commit counter: the signature() change
        # token — exact on stores whose mtime granularity (S3: seconds)
        # would otherwise miss two commits in one tick
        cat["rev"] = int(cat.get("rev", 0)) + 1
        bs.makedirs(self.dir)
        bs.publish_bytes(self.file, json.dumps(cat, indent=1).encode())

    # ---- managed tables ----

    def table(self, name: str) -> ManagedTable:
        cat = self._load()
        if name not in cat["tables"]:
            raise ManagedTableError(f"unknown managed table {name!r}")
        return ManagedTable(self.spark, cat["tables"][name])

    def _assert_name_free(self, cat: dict, name: str,
                          replace_in: str | None = None) -> None:
        """Catalog names are ONE namespace (the reference's DataFusion
        session registers every provider by bare name): without this, a
        view created over an existing managed table would silently
        shadow it at re-registration time (views register last), making
        INSERT and SELECT disagree about what <name> is. ``replace_in``
        exempts same-category replacement (CREATE OR REPLACE VIEW)."""
        kinds = {"tables": "managed table",
                 "external_tables": "external table",
                 "views": "view",
                 "materialized_views": "materialized view"}
        for c, label in kinds.items():
            if c == replace_in:
                continue
            if name in cat.get(c, {}):
                raise ManagedTableError(
                    f"name {name!r} already exists as a {label}")

    @staticmethod
    def _check_name(name: str) -> None:
        """Catalog names become PATH COMPONENTS under tables_dir. The
        SQL surface only admits ``\\w+``, but the embedded API is public:
        a name like ``../x`` would escape the lake root (the same class
        as the atlas registry path escape fixed in r11)."""
        import re as _re

        if not _re.fullmatch(r"\w+", name or ""):
            raise ManagedTableError(
                f"bad table name {name!r} (letters/digits/underscore only)")

    def create_table(self, name: str, df: DataFrame) -> ManagedTable:
        # DDL catalog commits go through _mutate (lock + merge-on-
        # conflict): a plain load->save raced concurrent DDL and the
        # last writer silently erased the other's entry
        self._check_name(name)
        self._assert_name_free(self._load(), name)
        path = bs.join(self.tables_dir, name)
        t = ManagedTable(self.spark, path).create(df)

        def apply(cat: dict) -> None:
            self._assert_name_free(cat, name)
            cat["tables"][name] = path

        self._mutate(apply)
        return t

    def drop_table(self, name: str) -> None:
        dropped: list[str] = []

        def apply(cat: dict) -> None:
            path = cat["tables"].pop(name, None)
            cat.get("table_versions", {}).pop(name, None)
            # a dropped table's extensions go with it: a later table
            # reusing the name must not inherit mcp/preset docs validated
            # against the OLD schema
            cat.get("extensions", {}).pop(name, None)
            dropped.clear()
            if path:
                dropped.append(path)

        self._mutate(apply)
        for path in dropped:
            ManagedTable(self.spark, path).drop()

    # ---- external tables (CREATE EXTERNAL TABLE ... STORED AS ... LOCATION,
    #      actions.rs:221-492: a named listing over files in place) ----

    def create_external_table(
        self, name: str, fmt: str, paths: list[str],
        options: dict | None = None, password: str | None = None,
        partitioned_by: list[str] | None = None, replace: bool = False,
    ) -> None:
        """One ATOMIC catalog commit: the table entry and (when given) its
        password secret + back-reference land in the same _save — a crash
        can never leave an entry whose credential is missing. ``replace``
        = CREATE OR REPLACE: the previous definition (and its credential
        secret) leaves in the SAME commit the new one lands in."""
        entry = {
            "format": fmt.lower(),
            "paths": paths,
            "options": options or {},
        }
        if partitioned_by:
            entry["partitioned_by"] = list(partitioned_by)
        sname = f"__exttbl_{name}"
        secret_entry = None
        if password is not None:
            # encrypted at rest (secretbox.py — key lives outside the
            # lake root), mirroring the reference's EncryptedSecret
            from beacon_spark.secretbox import default_box

            secret_entry = {
                "type": "password",
                "scope": paths[0] if paths else "",
                "persistent": True,
                "options": {
                    "password": default_box().encrypt(password)
                },
            }
            entry["password_secret"] = sname

        def apply(cat: dict) -> None:
            self._assert_name_free(
                cat, name, replace_in="external_tables" if replace else None)
            if replace:
                prev = cat["external_tables"].pop(name, None)
                if isinstance(prev, dict) and prev.get("password_secret"):
                    cat.get("secrets", {}).pop(prev["password_secret"], None)
            if password is not None:
                cat.setdefault("secrets", {})[sname] = secret_entry
            cat["external_tables"][name] = entry

        self._mutate(apply)

    def drop_external_table(self, name: str) -> bool:
        found: list[bool] = []

        def apply(cat: dict) -> None:
            entry = cat["external_tables"].pop(name, None)
            found.clear()
            found.append(entry is not None)
            if entry is not None:
                if isinstance(entry, dict) and entry.get("password_secret"):
                    cat.get("secrets", {}).pop(entry["password_secret"], None)
                cat.get("extensions", {}).pop(name, None)

        if name not in self._load()["external_tables"]:
            return False
        self._mutate(apply)
        return bool(found and found[0])

    # ---- secondary indexes (Lance btree/bitmap/inverted analog: recorded
    #      metadata; the btree role is served by the file-stats min/max
    #      index, actions.rs:763-820) ----

    def create_index(self, name: str, table: str, column: str, using: str) -> None:
        def apply(cat: dict) -> None:
            if name in cat["indexes"]:
                raise ManagedTableError(f"index {name!r} already exists")
            cat["indexes"][name] = {
                "table": table, "column": column, "using": using}

        self._mutate(apply)

    def drop_index(self, name: str) -> None:
        self._mutate(lambda cat: cat["indexes"].pop(name, None))

    # ---- crawlers (scheduled re-discovery of new files -> auto-registered
    #      external tables, beacon-core/src/crawler/*; embedded mode has no
    #      scheduler so RUN is the sync point) ----

    def create_crawler(
        self, name: str, prefix: str | None, schedule_secs: int | None = None,
        format_filter: list[str] | None = None, table_naming: str = "file",
    ) -> None:
        def apply(cat: dict) -> None:
            if name in cat["crawlers"]:
                raise ManagedTableError(f"crawler {name!r} already exists")
            cat["crawlers"][name] = {
                "prefix": prefix or "",
                "schedule_secs": schedule_secs,
                "format_filter": format_filter,
                "table_naming": table_naming,
                "last_run": None,
            }

        self._mutate(apply)

    def touch_crawler(self, name: str, when: float) -> None:
        """Record a crawl's completion time (drives run_due scheduling)."""
        def apply(cat: dict) -> None:
            if name in cat["crawlers"]:
                cat["crawlers"][name]["last_run"] = when

        if name in self._load()["crawlers"]:
            self._mutate(apply)

    def drop_crawler(self, name: str) -> None:
        self._mutate(lambda cat: cat["crawlers"].pop(name, None))

    # ---- views ----

    def create_view(self, name: str, sql: str, replace: bool = False) -> None:
        def apply(cat: dict) -> None:
            self._assert_name_free(
                cat, name, replace_in="views" if replace else None)
            if name in cat["views"] and not replace:
                raise ManagedTableError(f"view {name!r} already exists")
            cat["views"][name] = sql

        self._mutate(apply)

    def create_materialized_view(self, name: str, sql: str, df: DataFrame) -> None:
        self._check_name(name)
        self._assert_name_free(self._load(), name)
        path = bs.join(self.tables_dir, f"_mv_{name}")
        ManagedTable(self.spark, path).create(df)

        def apply(cat: dict) -> None:
            self._assert_name_free(cat, name)
            cat["materialized_views"][name] = {"sql": sql, "path": path}

        self._mutate(apply)

    def refresh_materialized_view(self, name: str, df: DataFrame) -> None:
        cat = self._load()
        if name not in cat["materialized_views"]:
            raise ManagedTableError(f"unknown materialized view {name!r}")
        path = cat["materialized_views"][name]["path"]
        ManagedTable(self.spark, path).overwrite(df)

    def mv_sql(self, name: str) -> str | None:
        mv = self._load()["materialized_views"].get(name)
        return mv["sql"] if mv else None

    def drop_view(self, name: str) -> None:
        mv_paths: list[str] = []

        def apply(cat: dict) -> None:
            cat["views"].pop(name, None)
            mv = cat["materialized_views"].pop(name, None)
            cat.get("extensions", {}).pop(name, None)
            mv_paths.clear()
            if mv:
                mv_paths.append(mv["path"])

        self._mutate(apply)
        for p_ in mv_paths:
            ManagedTable(self.spark, p_).drop()

    def signature(self) -> tuple | None:
        """Cheap change token so Engine re-registers temp views only when
        the catalog or any table version moved. None = no catalog yet.

        ONE catalog read — no per-table manifest listing. Structural DDL
        writes the catalog (rev bumps in _save); manifest-only DML
        records itself via note_table_version (also a catalog write), so
        rev alone captures every mutation made through the engine. This
        is what keeps a 1,000-table lake from paying 1,000 object-store
        LISTs on EVERY statement just to learn nothing changed. (A
        mutation that bypasses the engine's SQL surface must call
        note_table_version itself, or registered views pin stale file
        lists until the next structural catalog write.)"""
        if not bs.exists(self.file):
            return None
        return self._sig_of(self._load())

    @staticmethod
    def _sig_of(cat: dict) -> tuple:
        return (
            cat.get("rev", 0),
            tuple(sorted(cat.get("table_versions", {}).items())),
            tuple(sorted(cat["tables"])),
            tuple(sorted(cat["materialized_views"])),
            tuple(sorted(cat["views"])),
        )

    def note_table_version(self, name: str, version: int | None = None) -> tuple:
        """Record a manifest-level mutation (INSERT/UPDATE/DELETE/
        OPTIMIZE/ALTER/REFRESH) in the catalog so ``signature()`` sees
        it without listing manifests. The recorded value only needs to
        CHANGE, not match the manifest version exactly. Returns the
        signature of the document AS WRITTEN, so the caller can adopt
        exactly its own write — a concurrent writer's later change
        still mismatches and forces a full re-registration.

        Because this runs on EVERY DML, its read-modify-write goes
        through ``_mutate``: a local lock file serializes concurrent
        engines, and a write-verify retry re-applies the version bump
        onto a concurrently-changed document instead of last-writer-wins
        erasing it (ADVICE r7: a DML's catalog save must never silently
        drop a concurrent CREATE TABLE)."""
        def apply(cat: dict) -> None:
            vers = cat.setdefault("table_versions", {})
            vers[name] = (int(version) if version is not None
                          else int(vers.get(name, 0)) + 1)

        return self._sig_of(self._mutate(apply))

    @contextlib.contextmanager
    def _write_lock(self, timeout: float = 10.0):
        """Cross-process mutex for catalog read-modify-write cycles.
        Local roots take an O_CREAT|O_EXCL lock file (the portable
        advisory lock); object-store roots have no create-if-absent
        primitive in the byte-source facade, so there the lock is a
        no-op and ``_mutate``'s write-verify retry is the (narrowed-
        window) guard. A stale lock older than ``timeout`` (a crashed
        writer) is broken rather than wedging the lake."""
        if not bs.is_local(self.dir):
            yield
            return
        bs.makedirs(self.dir)
        # os-level primitives need a plain path — a file:// root would
        # make every os.open fail FileNotFoundError and DML would never
        # bump the catalog rev (lost invalidation for other engines)
        lock = os.path.join(bs.local_path(self.dir), "catalog.lock")
        deadline = time.monotonic() + timeout
        fd = None
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > timeout:
                        # break the stale lock via atomic rename so only
                        # ONE waiter wins — a bare unlink lets a second
                        # waiter delete the winner's FRESH lock and both
                        # proceed as holders
                        broken = f"{lock}.stale.{os.getpid()}"
                        os.rename(lock, broken)
                        # RE-VERIFY after the rename: between our
                        # staleness check and the rename, another
                        # breaker may have already broken the stale
                        # lock AND created its own fresh one — renaming
                        # that away would mint a second holder. A fresh
                        # capture is put back (best effort); only a
                        # still-stale capture authorizes proceeding.
                        if time.time() - os.path.getmtime(broken) > timeout:
                            with contextlib.suppress(OSError):
                                os.unlink(broken)
                            continue
                        try:
                            os.rename(broken, lock)
                        except OSError:
                            with contextlib.suppress(OSError):
                                os.unlink(broken)
                except OSError:
                    pass  # holder released / raced — fall through to wait
                if time.monotonic() > deadline:
                    break  # proceed unlocked — write-verify still guards
                time.sleep(0.005)
        try:
            yield
        finally:
            if fd is not None:
                os.close(fd)
                with contextlib.suppress(OSError):
                    os.unlink(lock)

    def _mutate(self, fn) -> dict:
        """Serialized, merge-on-conflict read-modify-write: load →
        ``fn(cat)`` → save under the local lock file, then VERIFY the
        document on disk is the one written. If a concurrent engine
        interleaved (object stores have no lock), reload ITS document
        and re-apply ``fn`` so both writers' changes land — merged, not
        last-writer-wins. Returns the document as written."""
        with self._write_lock():
            cat: dict = {}
            for _ in range(8):
                cat = self._load()
                base_rev = int(cat.get("rev", 0))
                fn(cat)
                # pre-save check: a lock-less writer (object store, or a
                # process that bypassed the facade) may have committed
                # while fn ran — saving now would erase it and the
                # post-save verify could NOT tell (it compares disk to
                # our own doc). Re-load cheaply and restart on its doc.
                if bs.exists(self.file) and \
                        int(self._load().get("rev", 0)) != base_rev:
                    continue
                self._save(cat)
                chk = self._load()
                if json.dumps(chk, sort_keys=True) == \
                        json.dumps(cat, sort_keys=True):
                    return cat
            return cat  # pathological contention: every pass merged

    def names(self) -> dict:
        cat = self._load()
        return {
            "tables": sorted(cat["tables"]),
            "views": sorted(cat["views"]),
            "materialized_views": sorted(cat["materialized_views"]),
            "external_tables": sorted(cat["external_tables"]),
            "indexes": sorted(cat["indexes"]),
            "crawlers": sorted(cat["crawlers"]),
        }
