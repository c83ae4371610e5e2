"""Deduplication operators for large-scale text corpora.

Beyond the reference's surface (BASELINE.json north-star): exact dedup,
n-gram Jaccard, MinHash+LSH and SimHash near-dup detection, each expressed
as pure DataFrame transformations (no Python in the hot path except
nothing — everything here is JVM-side Catalyst expressions).

Scale design notes (the point of each choice):
  - exact dedup groups on md5(text) — a 16-byte shuffle key instead of the
    full document; map-side partial agg collapses most duplicates early.
  - shingling/minhashing is explode → groupBy(doc): one shuffle keyed by
    doc_id; the k permutations are k column-level min-aggregates (wholestage
    codegen, no UDF).
  - LSH banding turns all-pairs O(n²) into groupBy(band-signature) —
    candidate generation shuffles on the band key only; exact verification
    joins only candidate pairs.
  - SimHash reduces each doc to one int64; near-dup candidates join on
    rotated band keys (hamming ≤ d ⇒ some band of bits equal).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Mersenne prime for universal hashing min((a*h+b) mod p). 2^31-1 keeps
# a*h < 2^62 so the arithmetic never overflows int64 (Spark 4 is ANSI).
_MERSENNE = (1 << 31) - 1

# Corpus-wide intermediate caches persist SERIALIZED (r14 verdict #2):
# PySpark's MEMORY_AND_DISK carries deserialized=false, unlike
# DataFrame.cache()'s MEMORY_AND_DISK_DESER default. The exploded
# shingle/band-key/span frames are ~k x corpus width — at 100 TB,
# deserialized on-heap caching of those is a guide §5 spill/GC hazard;
# serialized columnar batches stay compact and spill to disk cleanly.
_CACHE_LEVEL = StorageLevel.MEMORY_AND_DISK


def _shingles_sql(text_col: str, n: int = 3) -> str:
    """SQL for distinct word n-gram shingles — a single Catalyst
    expression (split → sequence → transform), no UDF.

    The words array is *let-bound* via ``transform(array(split(..)), ws ->
    ...)[0]``: Catalyst has no local bindings, and inlining ``split`` into
    the per-shingle lambda would re-run the regex split once per element
    access — O(words²) per document (measured 20s+ on 5k docs before the
    binding; ~1s after)."""
    w = f"split(trim({text_col}), '\\\\s+')"
    gram = ", ' ', ".join(f"ws[i + {j}]" for j in range(n))
    return (
        f"transform(array({w}), ws -> "
        f"CASE WHEN size(ws) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(ws) - {n}), "
        f"i -> concat({gram}))) "
        f"ELSE array() END)[0]"
    )


def shingles_expr(text_col: str, n: int = 3) -> Column:
    return F.expr(_shingles_sql(text_col, n))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5-keyed groupBy keeping the minimum id as
    canonical. Returns (content_hash, keep_id, dup_count)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs.

    explode(shingles) → self-equi-join on shingle (id_a < id_b) →
    count(shared)/(|A|+|B|-shared). The join key is the shingle string;
    a shingle appearing in k documents contributes k² join rows, so
    boilerplate shingles ("terms of service …") make the join quadratic
    at corpus scale. ``max_shingle_df`` is the standard fix: shingles
    with document frequency above the cap are dropped BEFORE the
    self-join — from both the intersection and the size denominators, so
    jaccard stays consistent over the filtered shingle universe (the
    per-pair effect is pinned in tests/test_pipeline.py). AQE skew-join
    (enabled in session.py) handles residual sub-cap skew. Default None
    = exact semantics (the DuckDB oracle's definition).
    Returns (id_a, id_b, jaccard) with jaccard rounded to 4 places.
    """
    t = _ensure_parallelism(_min_words_filter(df, text_col, n), id_col).select(
        F.col(id_col).alias("__id"), shingles_expr(text_col, n).alias("__sh")
    )
    # cached: the explode (the dominant cost per this docstring) feeds
    # the hot-shingle aggregate, BOTH sides of the self-join, and the
    # sizes aggregate — uncached it re-runs split+distinct+explode up
    # to 4× over the corpus (release_caches(result) frees it)
    e = t.select("__id", F.explode("__sh").alias("__s")).persist(_CACHE_LEVEL)
    if max_shingle_df is not None:
        hot = (
            e.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("__s")
        )
        # hot set is small by construction (only above-cap shingles) →
        # broadcast anti-join, no extra shuffle of the exploded rows
        e = e.join(F.broadcast(hot), "__s", "left_anti")
        sizes = e.groupBy("__id").agg(F.count(F.lit(1)).alias("__nsh"))
    else:
        sizes = t.select("__id", F.size("__sh").alias("__nsh"))
    pairs = (
        e.alias("a")
        .join(e.alias("b"), (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__nsh", "__na"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__nsh", "__nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out._beacon_cached = (e,)  # release_caches(result) frees the explode
    return out


def _min_words_filter(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Keep docs with at least n words — the cheap equivalent of
    'produces ≥1 shingle'. Filtering on the *derived* shingle count is a
    scale trap: Catalyst pushes the filter below exchanges and re-evaluates
    the full (expensive) expression as the filter condition, doubling the
    signature compute (observed 2× on the bench)."""
    return df.filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n)


def _ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-bound map
    stage. A small file count (locally: one parquet file) yields fewer
    input splits than cores, serializing per-doc hashing; at real scale
    the input already exceeds defaultParallelism and this is a no-op.
    Partition count is estimated from the scan's file listing
    (``inputFiles``) — cheap metadata, unlike ``df.rdd`` which forces an
    RDD translation of the whole plan per call.

    With ``key`` (the caller's ~unique id column) rows spread by HASH:
    a keyless round-robin repartition first pays a local sort of its
    full input rows — text payloads included — so retried map tasks
    reproduce the same row placement (sortBeforeRepartition,
    SPARK-23207; guide §2.5). Hashing a deterministic unique key is
    retry-safe by construction and skips that sort."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        nfiles = 0
    if nfiles >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k minhash permutations."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(k)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    impl: str = "catalyst",
) -> DataFrame:
    """MinHash signatures, fully map-side: no explode, no shuffle —
    signature cost is O(k·shingles) arithmetic local to each task, so the
    stage scales linearly with corpus partitions.

    Two implementations (same result, bit-identical):
      - ``catalyst`` (default): everything in one JVM expression (zip_with
        over the k (a,b) pairs) — zero Python in the plan. Wins end-to-end
        on short-lived sessions: no Python workers to spawn.
      - ``numpy``: shingle + xxhash64 stay JVM-side, the k permutation
        minima run as an Arrow-batched numpy matrix op ``min((h·a+b) mod
        p)``. The *steady-state stage* is ~2× faster than interpreted
        higher-order functions, but paying Python-worker startup across
        the LSH pipeline's stages measured 4× slower cold on local[32] —
        choose it only for long-lived sessions doing repeated dedup.
    Returns (__id, sig array<long>, __nsh)."""
    if impl == "numpy":
        return _minhash_signatures_numpy(
            df, text_col, id_col, num_perm, shingle_n, seed
        )
    params = _hash_params(num_perm, seed)
    a_arr = ", ".join(f"{a}L" for a, _ in params)
    b_arr = ", ".join(f"{b}L" for _, b in params)
    # let-bind shingles (sh) then their base hashes (hs); the (a, b)
    # parameter arrays are zipped so each permutation is one array_min pass
    st = (
        f"transform(array({_shingles_sql(text_col, shingle_n)}), sh -> struct("
        f"size(sh) AS nsh, "
        f"transform(array(transform(sh, s -> pmod(xxhash64(s), {_MERSENNE}L))), hs -> "
        f"zip_with(array({a_arr}), array({b_arr}), (a, b) -> "
        f"array_min(transform(hs, h -> pmod(h * a + b, {_MERSENNE}L)))))[0] AS sig"
        f"))[0]"
    )
    # pre-filter on word count (cheap) rather than post-filter on the
    # derived shingle count (which Catalyst would push down and re-evaluate
    # the whole minhash expression for — see _min_words_filter)
    return (
        _ensure_parallelism(_min_words_filter(df, text_col, shingle_n),
                            id_col)
        .select(F.col(id_col).alias("__id"), F.expr(st).alias("__st"))
        .select(
            "__id",
            F.col("__st.sig").alias("sig"),
            F.col("__st.nsh").alias("__nsh"),
        )
    )


def _minhash_signatures_numpy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    shingle_n: int,
    seed: int,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    params = _hash_params(num_perm, seed)
    a_arr = np.array([a for a, _ in params], dtype=np.uint64)
    b_arr = np.array([b for _, b in params], dtype=np.uint64)
    p = np.uint64(_MERSENNE)

    def _sig_fn(hs):
        out = []
        for h in hs:
            hv = np.asarray(h, dtype=np.uint64)
            m = ((hv[:, None] * a_arr[None, :] + b_arr[None, :]) % p).min(axis=0)
            out.append(m.astype(np.int64))
        return pd.Series(out)

    # explicit annotations: `from __future__ import annotations` stringifies
    # hints, which pandas_udf signature inference rejects
    _sig_fn.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    sig_udf = F.pandas_udf(_sig_fn, T.ArrayType(T.LongType()))

    base = _ensure_parallelism(_min_words_filter(df, text_col, shingle_n), id_col).select(
        F.col(id_col).alias("__id"),
        F.expr(
            f"transform({_shingles_sql(text_col, shingle_n)}, "
            f"s -> pmod(xxhash64(s), {_MERSENNE}L))"
        ).alias("__hs"),
    )
    return base.select(
        "__id",
        sig_udf(F.col("__hs")).alias("sig"),
        F.size("__hs").alias("__nsh"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs with exact verification.

    banding: 16 bands × 4 rows over 64 permutations → P(candidate) ≈
    1-(1-j⁴)¹⁶ (≈0.64 at j=0.5, ≈0.99 at j=0.7). Candidates (equal band
    signature) are
    verified with *exact* shingle Jaccard, so the output contains no false
    positives — matching an exact-Jaccard oracle whenever recall holds.
    """
    if not (1 <= bands <= num_perm and num_perm % bands == 0):
        # bands > num_perm makes every band key CONSTANT (an O(n^2)
        # cross join at corpus scale); a non-divisor silently discards
        # trailing permutations and bends the recall curve
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} "
            f"(1 <= bands <= num_perm)")
    rows_per_band = num_perm // bands
    params = _hash_params(num_perm, seed)

    # ONE corpus scan → 64-bit shingle hashes, cached and reused by (a) the
    # banding inputs and (b) exact verification. Verification on the raw
    # 64-bit hashes replaces the previous second corpus scan + per-candidate
    # shingle recompute; a long-array intersect also beats a string-array
    # intersect. Collision risk within one pair's union (~10³ hashes over a
    # 2⁶⁴ space) is ~0 — the exact-Jaccard oracle stays bit-identical.
    base = (
        _ensure_parallelism(_min_words_filter(df, text_col, shingle_n),
                            id_col)
        .select(
            F.col(id_col).alias("__id"),
            F.expr(
                f"transform({_shingles_sql(text_col, shingle_n)}, s -> xxhash64(s))"
            ).alias("__hs"),
        )
    )

    # Signature + band keys, Arrow-batched (r13): the previous Catalyst
    # form ran num_perm interpreted aggregate(least(...)) folds per doc
    # (higher-order fns skip whole-stage codegen) — the 100x probe put
    # it at ~0.25 ms/doc, dominating the operator. One numpy pass per
    # batch computes every permutation with np.minimum.reduceat over
    # the flattened hash values. Sig semantics are bit-identical:
    # min over pmod(hm*a + b, p), p = 2^31-1, with Java int64 wraparound
    # reproduced by numpy's int64 overflow (same two's-complement wrap),
    # matching minhash_signatures. Band b's key mixes the band index and
    # its r sig values through a FNV-1a fold — any deterministic
    # function of (b, sig slice) yields the SAME candidate recall (keys
    # equal iff slices equal, modulo collisions that only add candidates
    # for the exact verifier to discard).
    a_np = np.array([a for a, _ in params], dtype=np.int64)
    b_np = np.array([b for _, b in params], dtype=np.int64)
    n_bands_, rpb_ = bands, rows_per_band

    @F.pandas_udf("array<long>")
    def _band_keys(hs):
        import pandas as pd

        lens = np.fromiter((len(x) for x in hs), dtype=np.int64,
                           count=len(hs))
        ndocs = len(lens)
        if ndocs == 0:
            return pd.Series([], dtype=object)
        total = int(lens.sum())
        vals = (np.concatenate([np.asarray(x, dtype=np.int64) for x in hs])
                if total else np.empty(0, np.int64))
        hm = vals % _MERSENNE
        starts = np.zeros(ndocs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sig = np.full((ndocs, len(a_np)), _MERSENNE, dtype=np.int64)
        nonempty = lens > 0
        with np.errstate(over="ignore"):
            for k in range(len(a_np)):
                pm = (hm * a_np[k] + b_np[k]) % _MERSENNE
                if total:
                    sig[nonempty, k] = np.minimum.reduceat(
                        pm, starts[nonempty])
        keys = np.empty((ndocs, n_bands_), dtype=np.uint64)
        FNV_OFF = np.uint64(1469598103934665603)
        FNV_PRIME = np.uint64(1099511628211)
        usig = sig.astype(np.uint64)
        with np.errstate(over="ignore"):
            for b in range(n_bands_):
                acc = (FNV_OFF ^ np.uint64(b)) * FNV_PRIME
                acc = np.full(ndocs, acc, dtype=np.uint64)
                for j in range(b * rpb_, b * rpb_ + rpb_):
                    acc = (acc ^ usig[:, j]) * FNV_PRIME
                keys[:, b] = acc
        return pd.Series(list(keys.view(np.int64)))

    # ONE cached frame carries both the shingle hashes and the band keys
    # (r14: was two caches — base and the exploded band keys — costing a
    # second full materialization pass). The UDF runs exactly once, in
    # the cache fill; both self-join sides and the verifier read the
    # cache, and the explode (pure JVM) re-runs per side instead of
    # being materialized n_bands-wide.
    base = base.withColumn("__keys", _band_keys(F.col("__hs"))).persist(
        _CACHE_LEVEL)
    stacked = base.select("__id", F.explode("__keys").alias("__bsig"))

    cand = (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.__bsig") == F.col("b.__bsig")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )

    # exact verification on the surviving candidates only, against the
    # CACHED hash arrays — no second pass over the corpus text. Work is
    # two joins ∝ candidates; AQE turns them into broadcasts when the
    # candidate set is small. `__hs` holds distinct-shingle hashes, so
    # size/intersect arithmetic equals the string-set version exactly.
    # (cand itself is consumed exactly once — caching it would only add
    # a materialization pass.)
    t = base.select("__id", "__hs")
    verified = (
        cand.join(t.select(F.col("__id").alias("id_a"), F.col("__hs").alias("__sha")), "id_a")
        .join(t.select(F.col("__id").alias("id_b"), F.col("__hs").alias("__shb")), "id_b")
        .withColumn("__inter", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.size("__sha") + F.size("__shb") - F.col("__inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # the cache backs the RESULT's lineage, so it cannot be unpersisted
    # here — it would recompute (twice) at consumption. A caller done
    # with the result releases it via release_caches(); otherwise it
    # lives until LRU eviction / session end (fine for a one-shot query,
    # wasteful in a long repeated-call session).
    verified._beacon_cached = (base,)
    return verified


def release_caches(result: DataFrame) -> None:
    """Unpersist the intermediate caches backing a pipeline result
    (currently: minhash_lsh_pairs' shingle-hash and band-key frames).
    Call AFTER fully consuming/materializing the result — the caches
    back its lineage, and a later re-collect would recompute them."""
    for cached in getattr(result, "_beacon_cached", ()):  # no-op otherwise
        cached.unpersist()


def simhash_expr(text_col: str, bits: int = 64) -> Column:
    """64-bit SimHash of word tokens as a single Catalyst expression:
    per-token xxhash64, then per-bit majority vote via aggregate() over the
    token array. JVM-side; no UDF.

    Token hashes are let-bound (computed once per document, not once per
    bit) via the same transform-over-singleton-array binding trick as
    shingles_expr."""
    hashes = (
        f"transform(array_distinct(split(trim({text_col}), '\\\\s+')), "
        f"t -> xxhash64(t))"
    )
    return F.expr(
        f"""
        transform(array({hashes}), hs ->
          aggregate(
            transform(sequence(0, {bits - 1}), bit ->
              CASE WHEN aggregate(hs, 0L,
                (acc, h) -> acc + CASE WHEN bit_get(h, bit) = 1
                                       THEN 1L ELSE -1L END) > 0
                   THEN shiftleft(1L, bit) ELSE 0L END),
            0L, (acc, x) -> acc + x))[0]
        """
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_a, sig_b) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit signature into ``bands`` chunks —
    any pair within hamming d < bands shares at least one exact chunk, so
    candidates come from ``bands`` equi-joins (one shuffle each on a
    16-bit key), then exact hamming verification via bit_count(xor).
    """
    if max_hamming >= bands:
        # the pigeonhole guarantee only holds for d < bands: with
        # max_hamming >= bands a qualifying pair can differ in one bit
        # per chunk, share NO chunk, and silently vanish from the output
        raise ValueError(
            f"simhash_pairs: max_hamming ({max_hamming}) must be < bands "
            f"({bands}) or recall silently drops; raise bands"
        )
    if 64 % bands:
        raise ValueError(f"simhash_pairs: bands ({bands}) must divide 64")
    sigs = (
        _ensure_parallelism(df, id_col)
        .select(F.col(id_col).alias("__id"), simhash_expr(text_col).alias("__sig"))
        .persist(_CACHE_LEVEL)
    )
    width = 64 // bands
    chunks = sigs.select(
        "__id",
        "__sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("__sig"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("c"),
    ).select("__id", "__sig", F.col("c.band").alias("__band"), F.col("c.key").alias("__key"))

    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("__sa"),
            F.col("b.__sig").alias("__sb"),
        )
        .distinct()
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    out._beacon_cached = (sigs,)  # release_caches(result) frees the scan
    return out


# ---------------------------------------------------------------- clusters


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Near-duplicate pair edges → connected components: ``(doc_id,
    cluster_id)`` with cluster_id = the component's minimum member id.

    Distributed min-label propagation with pointer jumping: each round
    (1) every node adopts the minimum label in its edge neighborhood,
    then (2) adopts its label's label (path halving) — the doubling step
    that turns O(diameter) rounds into O(log diameter), the same
    complexity as the large-star/small-star scheme (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"). Each round is two
    edge/label-linear shuffles — the transitive closure is never
    materialized, so a 10^9-edge corpus runs in edge-linear work.
    ``localCheckpoint`` cuts the per-round lineage (iterative plans
    otherwise nest until codegen falls over). Stops when no label
    changes; ``max_iterations`` bounds adversarial graphs.

    Non-numeric ids (strings, binaries) are supported: propagation runs
    on ``xxhash64(id)`` node keys (a lossy long cast would turn them
    into NULLs and silently drop every edge), and the result is joined
    back so ``cluster_id`` is again the minimum *original* member id —
    one extra shuffle of (id, cluster) pairs, payload-free. A 64-bit
    hash collision would merge two unrelated ids (~n²/2⁶⁴ odds)."""
    numeric = isinstance(
        pairs.schema[id_a].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    ) and isinstance(
        pairs.schema[id_b].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    )

    def _long_safe(dt) -> bool:
        # DecimalType casts to long by TRUNCATION: a fractional or
        # oversized decimal id would silently merge distinct documents
        # and return ids that match nothing — route those through the
        # hashed path like strings
        if isinstance(dt, T.DecimalType):
            return dt.scale == 0 and dt.precision <= 18
        return True

    numeric = numeric and _long_safe(pairs.schema[id_a].dataType) \
        and _long_safe(pairs.schema[id_b].dataType)
    if not numeric:
        return _dedup_clusters_hashed(pairs, id_a, id_b, max_iterations)
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("src"),
            F.col(id_b).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # undirected: keep both directions so each node sees every neighbor
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # label(v) = min(v, min neighbor) to start
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nmin")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # (1) node's label = min(own, min over neighbors' labels)
        nbr = sym.join(labels, sym.dst == labels.node).select(
            sym.src.alias("node"), F.col("label")
        )
        merged = (
            labels.select("node", "label")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # (2) pointer jumping: label <- label(label)
        parent = merged.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            merged.join(parent, merged.label == F.col("p_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _dedup_clusters_hashed(
    pairs: DataFrame, id_a: str, id_b: str, max_iterations: int
) -> DataFrame:
    """``dedup_clusters`` for non-numeric ids: propagate min labels over
    xxhash64 node keys, then map hashes back to original ids and re-take
    the minimum original id per component (hash order != id order)."""
    ta, tb = pairs.schema[id_a].dataType, pairs.schema[id_b].dataType
    if ta != tb:
        # a union of mixed types would coerce one side BEFORE hashing,
        # making node hashes disagree with edge hashes — rows would
        # silently vanish from the output. Fail loudly instead.
        raise ValueError(
            f"dedup_clusters: id columns must share a type, got "
            f"{ta.simpleString()} vs {tb.simpleString()}"
        )
    # (original id, hashed node) for every distinct endpoint — the only
    # state that ever carries the original (possibly wide) id values
    idmap = (
        pairs.select(F.col(id_a).alias("id"))
        .union(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .select("id", F.xxhash64("id").alias("node"))
    )
    hashed = pairs.select(
        F.xxhash64(F.col(id_a)).alias("id_a"),
        F.xxhash64(F.col(id_b)).alias("id_b"),
    )
    comp = dedup_clusters(hashed, "id_a", "id_b", max_iterations)
    # hash-space labels → original ids; cluster_id = min original member
    labeled = comp.join(idmap, comp.doc_id == idmap.node).select(
        F.col("id").alias("doc_id"), F.col("cluster_id").alias("__h_cluster")
    )
    cmin = labeled.groupBy("__h_cluster").agg(
        F.min("doc_id").alias("cluster_id")
    )
    return labeled.join(cmin, "__h_cluster").select("doc_id", "cluster_id")


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop near-duplicates: resolve pair edges to clusters, keep the
    minimum-id document of each cluster plus every unpaired document.
    The left-anti join carries only (id, cluster) — document payloads
    never shuffle."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("__loser")
    )
    return df.join(
        losers, df[id_col] == F.col("__loser"), "left_anti"
    )


def near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """One-call near-duplicate removal — the composed pipeline a training
    corpus actually runs: MinHash-LSH candidate pairs (banded, verified
    exact) → connected components → keep the min-id document per cluster.
    Returns ``df`` minus near-duplicates; every stage is edge/candidate-
    linear (no all-pairs work anywhere)."""
    pairs = minhash_lsh_pairs(
        df, text_col, id_col,
        num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        threshold=threshold, seed=seed,
    )
    out = dedup_keep_canonical(df, pairs, id_col)
    # forward the LSH caches so release_caches(result) can free them in
    # a long repeated-call session
    out._beacon_cached = getattr(pairs, "_beacon_cached", ())
    return out


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    by: str = "hash",
) -> DataFrame:
    """Span-level EXACT substring duplication (the "deduplicating
    training data" operator of Lee et al. 2022, arXiv:2107.06499):
    every n-token sliding window is a span; a span whose text occurs
    two or more times anywhere in the corpus (across documents or
    repeated within one) is duplicated. Returns per-document
    ``(id, dup_spans, total_spans)`` for documents that have at least
    one span — the training-pipeline signal for cut-or-keep decisions
    at span granularity, which document-level MinHash cannot see.

    ``by="hash"`` (default) keys spans by ``xxhash64`` of the joined
    window — 8-byte shuffle keys, the 100 TB path. ``by="text"`` keys
    by the window text itself: exact, collision-free, the oracle mode
    (pytest pins both modes to identical results).

    100 TB design: whole pipeline is Catalyst (split/slice/concat_ws/
    xxhash64/posexplode — no Python). Two shuffles do the global work:
    one span-key groupBy (map-side partial aggregation folds each
    partition's repeats first) and one SALTED join of spans against the
    surviving duplicated keys — a pathologically hot span (a
    boilerplate line in millions of docs) fans across 16 deterministic
    salt keys instead of one straggler task (AQE's skew split can't
    reach this join: the keys side is an aggregate, which the
    OptimizeSkewedJoin pattern doesn't match). The final per-document
    count shuffles only (id, 1) pairs.
    """
    if by not in ("hash", "text"):
        raise ValueError(f"by must be 'hash' or 'text', got {by!r}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    base = (
        df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
        .withColumn("__npos", F.greatest(F.size("__t") - F.lit(n - 1), F.lit(0)))
        .where(F.col("__npos") >= 1)
    )
    span_txt = lambda i: F.concat_ws(" ", F.slice("__t", i, n))  # noqa: E731
    key = (lambda i: F.xxhash64(span_txt(i))) if by == "hash" else span_txt
    # cached: the window build (slice + concat_ws per position, ~n x
    # corpus bytes — the dominant compute) feeds BOTH the dup-key
    # aggregate and the salted join side; uncached it ran twice end to
    # end (the before-plan shows two span Generate subtrees over two
    # parquet scans). Same contract as ngram_jaccard's exploded cache:
    # release_caches(result) frees it after consumption.
    # storage-cost note (ADVICE r14): with by='text' the cache key is the
    # full n-token window text, ~n x corpus bytes — acceptable for the
    # oracle mode's small inputs; the 100 TB path is by='hash' (8-byte
    # keys). The serialized level keeps even the text mode columnar-
    # compressed and disk-spillable rather than deserialized on-heap.
    spans = base.select(
        "__id",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.col("__npos")), key)
        ).alias("__k"),
    ).persist(_CACHE_LEVEL)
    dup_keys = (
        spans.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .where(F.col("__occ") >= 2)
        .select("__k")
    )
    # SALTED key join: AQE's OptimizeSkewedJoin cannot split this join
    # (the dup-keys child is Sort←Agg←ShuffleRead, which its SMJ
    # pattern does not match), so a mega-hot span key — boilerplate in
    # millions of docs — would otherwise pin its whole row set on ONE
    # task. Salting spreads it deterministically: each span rides salt
    # pmod(xxhash64(__id), S); the (keys-only, already tiny) duplicated
    # set is replicated S ways, so every span still matches exactly
    # once and the hot key fans across S shuffle keys. Pinned in
    # test_scale_budgets.py with a planted mega-hot key.
    salt_n = 16
    salted = spans.withColumn(
        "__s", F.pmod(F.xxhash64("__id"), F.lit(salt_n)).cast("int"))
    dup_salted = dup_keys.select(
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("__s"),
    )
    per_doc = (
        salted.join(dup_salted, ["__k", "__s"])
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    out = (
        base.select("__id", F.col("__npos").alias("total_spans"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
            "total_spans",
        )
    )
    out._beacon_cached = (spans,)  # release_caches(result) frees the spans
    return out


# ------------------------------------------------- incremental dedup

def _fingerprint_frame(
    df: DataFrame, text_col: str, id_col: str,
    num_perm: int, bands: int, shingle_n: int, seed: int,
) -> DataFrame:
    """(__id, __hs, __bsig) fingerprints — the SAME signature/band-key
    arithmetic as minhash_lsh_pairs (pinned by a cross-check test), as
    a reusable frame for the persisted-index workflow. minhash_lsh_pairs
    keeps its own inline fused form deliberately: its two-cache layout
    (hashes reused by verify) is tuned for the self-join benchmark."""
    if not (1 <= bands <= num_perm and num_perm % bands == 0):
        # bands > num_perm makes every band key CONSTANT (an O(n^2)
        # cross join at corpus scale); a non-divisor silently discards
        # trailing permutations and bends the recall curve
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} "
            f"(1 <= bands <= num_perm)")
    rows_per_band = num_perm // bands
    params = _hash_params(num_perm, seed)
    a_arr = ", ".join(f"{a}L" for a, _ in params)
    b_arr = ", ".join(f"{b}L" for _, b in params)
    bands_expr = (
        f"transform(array(transform(__hs, h -> pmod(h, {_MERSENNE}L))), hm -> "
        f"transform(array(zip_with(array({a_arr}), array({b_arr}), (a, b) -> "
        f"aggregate(hm, {_MERSENNE}L, (acc, h) -> least(acc, pmod(h * a + b, {_MERSENNE}L))))), "
        f"sg -> transform(sequence(0, {bands - 1}), "
        f"b -> xxhash64(b, slice(sg, b * {rows_per_band} + 1, {rows_per_band}))))[0])[0]"
    )
    return (
        _ensure_parallelism(_min_words_filter(df, text_col, shingle_n),
                            id_col)
        .select(
            F.col(id_col).alias("__id"),
            F.expr(
                f"transform({_shingles_sql(text_col, shingle_n)}, s -> xxhash64(s))"
            ).alias("__hs"),
        )
        .withColumn("__bsig", F.explode(F.expr(bands_expr)))
    )


#: fingerprint-index band files are laid out in this many hash buckets
INDEX_BUCKETS = 64


def fingerprint_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Persist a corpus's LSH fingerprint index for INCREMENTAL dedup.

    The 100 TB workflow: a historical corpus is fingerprinted ONCE;
    each new crawl batch dedups against the index without ever
    re-reading corpus text. Layout under ``path``:

      bands/  (__bucket=<n>/…)  (__bsig long, __id)  — band keys,
              hash-bucketed by ``pmod(__bsig, INDEX_BUCKETS)`` so a
              small probe's partition filter prunes whole directories
      hashes/ (__id, __hs)      — 64-bit shingle hashes per doc, read
              only for verification of surviving candidate ids
      meta.json                 — the fingerprint parameters; probes
              MUST use identical ones, so they are read back rather
              than trusted to match

    ``mode="append"`` adds a batch's survivors to an existing index
    (the post-dedup admission step)."""
    import json as _json

    from beacon_spark.sources import bytesource as bs

    meta_path = bs.join(path, "meta.json")
    if mode == "append" and bs.exists(meta_path):
        prior = _json.loads(bs.read_text(meta_path))
        mine = {"num_perm": num_perm, "bands": bands,
                "shingle_n": shingle_n, "seed": seed}
        stale = {k: (prior.get(k), v) for k, v in mine.items()
                 if prior.get(k) != v}
        if stale:
            raise ValueError(
                "fingerprint parameters differ from the existing index's "
                f"meta.json (index vs append): {stale} — appending with "
                "different arithmetic silently corrupts probe results"
            )
    fp = _fingerprint_frame(df, text_col, id_col, num_perm, bands,
                            shingle_n, seed)
    if mode == "append" and bs.exists(bs.join(path, "hashes")):
        # cross-batch id guard: dropDuplicates below only dedups WITHIN
        # the batch — appending an id already in the index left two
        # hashes/ rows per corpus_id, and dedup_incremental's verify
        # join then emitted every pair twice
        existing = df.sparkSession.read.parquet(
            bs.spark_path(bs.join(path, "hashes"))).select("__id")
        # localCheckpoint (eager) severs the lineage on hashes/ BEFORE
        # the append below writes into it — a cached plan could re-read
        # the directory mid-append on cache eviction
        fp = fp.join(existing, "__id", "left_anti").localCheckpoint()
    fp = fp.cache()
    (
        fp.select(
            "__bsig", "__id",
            F.pmod("__bsig", F.lit(INDEX_BUCKETS)).alias("__bucket"),
        )
        .write.mode(mode).partitionBy("__bucket")
        .parquet(bs.spark_path(bs.join(path, "bands")))
    )
    (
        fp.select("__id", "__hs").dropDuplicates(["__id"])
        .write.mode(mode).parquet(bs.spark_path(bs.join(path, "hashes")))
    )
    fp.unpersist()
    if mode == "overwrite" or not bs.exists(meta_path):
        bs.publish_bytes(
            meta_path,
            _json.dumps({
                "num_perm": num_perm, "bands": bands,
                "shingle_n": shingle_n, "seed": seed, "version": 1,
            }).encode(),
        )


def dedup_incremental(
    new_df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicates of ``new_df`` against a persisted fingerprint
    index: (new_id, corpus_id, jaccard) pairs at ``threshold``.

    Cost model at scale: the new batch is fingerprinted (one scan of
    the BATCH, never the corpus); candidate mining joins its band keys
    against the index's band files (equality on one long — for small
    batches the bucket filter prunes index directories, for large ones
    AQE broadcasts the batch side); exact verification joins hash
    arrays for the candidate ids only. Corpus text is never read.
    """
    import json as _json

    from beacon_spark.sources import bytesource as bs

    spark = new_df.sparkSession
    meta = _json.loads(bs.read_text(bs.join(index_path, "meta.json")))
    fp = _fingerprint_frame(
        new_df, text_col, id_col,
        meta["num_perm"], meta["bands"], meta["shingle_n"], meta["seed"],
    ).cache()

    idx_bands = spark.read.parquet(
        bs.spark_path(bs.join(index_path, "bands")))
    probe_keys = fp.select("__bsig", F.col("__id").alias("new_id"))
    buckets = [
        r.b for r in probe_keys.select(
            F.pmod("__bsig", F.lit(INDEX_BUCKETS)).alias("b")
        ).distinct().collect()
    ]
    if len(buckets) < INDEX_BUCKETS:
        # partition filter → whole index directories skipped
        idx_bands = idx_bands.where(F.col("__bucket").isin(buckets))
    cand = (
        probe_keys.join(idx_bands, "__bsig")
        .select("new_id", F.col("__id").alias("corpus_id"))
        .where(F.col("new_id") != F.col("corpus_id"))
        .distinct()
    )

    idx_hashes = spark.read.parquet(
        bs.spark_path(bs.join(index_path, "hashes")))
    new_hashes = fp.select(
        F.col("__id").alias("new_id"), F.col("__hs").alias("__sha")
    ).distinct()
    verified = (
        cand.join(new_hashes, "new_id")
        .join(
            idx_hashes.select(
                F.col("__id").alias("corpus_id"), F.col("__hs").alias("__shb")
            ),
            "corpus_id",
        )
        .withColumn("__inter", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.size("__sha") + F.size("__shb") - F.col("__inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )
    verified._beacon_cached = (fp,)
    return verified


def _semdedup_keep(v, threshold: float, block_rows: int = 2048):
    """Greedy SemDeDup keep mask over row-normalized vectors ``v``
    (ascending-id order): row j is dropped iff its cosine similarity to
    an EARLIER KEPT row is >= threshold. Evaluated in id-ascending
    blocks — ``block @ kept.T`` in sub-chunks of the kept set — so peak
    memory is O(block_rows x kept_chunk), never the dense n x n matrix
    (VERDICT r7: at ~1e5 rows per cell the dense float64 matrix is
    ~80 GB; the blocked walk is a few MB and BLAS-bound on the same
    flop count, minus the early-exit savings). Semantics are
    byte-identical to the dense pass (pinned in tests/test_pipeline.py).
    """
    import numpy as np

    n = len(v)
    keep = np.ones(n, dtype=bool)
    kept_idx: list = []  # indices (into v) kept from earlier blocks
    kept_chunk = max(block_rows, 4096)
    for start in range(0, n, block_rows):
        blk = v[start:start + block_rows]
        alive = np.ones(len(blk), dtype=bool)
        # vs earlier-kept rows, sub-chunked along the kept axis
        for ks in range(0, len(kept_idx), kept_chunk):
            if not alive.any():
                break
            kmat = v[kept_idx[ks:ks + kept_chunk]]
            alive &= ~((blk @ kmat.T) >= threshold).any(axis=1)
        # within-block greedy (small dense matrix, block_rows^2 max)
        if alive.any():
            sb = blk @ blk.T
            for i in range(len(blk)):
                if not alive[i]:
                    continue
                alive[i + 1:] &= ~(sb[i, i + 1:] >= threshold)
        keep[start:start + block_rows] = alive
        kept_idx.extend((start + np.nonzero(alive)[0]).tolist())
    return keep


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    sample_n: int = 4096,
    seed: int = 42,
    block_rows: int = 2048,
    max_cell_rows: int = 1_000_000,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then inside
    each cluster drop items whose cosine similarity to an earlier-kept
    item exceeds ``threshold`` — semantic near-duplicates that MinHash
    (lexical) misses. Returns ``(id, cell, keep)``.

    Scale shape: the coarse quantizer trains on a bounded driver-side
    sample (similarity.ivf_train_centroids); the full-corpus cell
    assignment is one Catalyst/pandas-UDF pass with the centroid matrix
    broadcast; the quadratic part runs per-cell via applyInPandas, so
    the all-pairs cost is c x (n/c)^2 << n^2 — size ``n_cells`` so a
    cell's row count stays near n/c (the published recipe uses ~10k
    clusters at web scale). Within a cell the similarity walk is
    BLOCKED (``_semdedup_keep``): memory is O(block_rows x chunk), not
    the dense (n/c)^2 matrix, so a skewed cell degrades to slow, never
    to executor OOM.

    MEGA-CELL AUTO-SPLIT: a cell larger than ``max_cell_rows`` (k-means
    cells skew) is re-clustered — a sub-quantizer trains on the cell's
    own rows and the walk runs per (cell, sub-cell) on SEPARATE tasks,
    bounding per-task quadratic time instead of eating (n_hot)^2 on one
    straggler. Splitting is the SemDeDup clustering approximation
    applied one level deeper (equivalent to having trained with more
    cells): a near-duplicate pair the sub-quantizer separates is NOT
    compared, exactly as pairs separated by the top-level quantizer
    never are. Identical vectors always co-locate (assignment is a
    deterministic function of the vector), so exact clones still dedup
    to one keeper. Costs one tiny per-cell count aggregate per call and
    one bounded sample collect per oversized cell. Greedy keep order
    stays ascending id within each group — deterministic across runs,
    cluster counts and block sizes.
    """
    import numpy as np
    import pandas as pd

    from beacon_spark.pipeline.similarity import (
        assign_cells,
        ivf_train_centroids,
    )

    centroids = ivf_train_centroids(
        df, n_cells=n_cells, vec_col=vec_col, id_col=id_col,
        sample_n=sample_n, seed=seed,
    )
    with_cell = (
        df.withColumn("cell", assign_cells(df, centroids, vec_col))
        .select(F.col(id_col).alias("id"),
                F.col(vec_col).alias("__v"), "cell")
        # cached: the assignment (a pandas UDF over every embedding) is
        # consumed by the sizes aggregate, each mega-cell's sub-trainer,
        # and the final applyInPandas — uncached that is 2+k full
        # embedding-scan passes (release_caches(result) frees it)
        .persist(_CACHE_LEVEL)
    )

    # mega-cell auto-split: one n_cells-row aggregate finds skewed
    # cells; each gets a sub-quantizer trained on its own rows
    sizes = {r["cell"]: r["count"]
             for r in with_cell.groupBy("cell").count().collect()}
    sub_map: dict[int, np.ndarray] = {}
    for c, cnt in sorted(sizes.items()):
        if cnt <= max_cell_rows:
            continue
        n_sub = int(np.ceil(cnt / max_cell_rows)) + 1
        import logging

        logging.getLogger("beacon_spark.semdedup").warning(
            "semdedup cell %s holds %d rows (> max_cell_rows=%d): "
            "auto-splitting into %d sub-cells (the SemDeDup clustering "
            "approximation one level deeper)", c, cnt, max_cell_rows,
            n_sub,
        )
        sub_map[int(c)] = ivf_train_centroids(
            with_cell.where(F.col("cell") == int(c)),
            n_cells=n_sub, vec_col="__v", id_col="id",
            sample_n=sample_n, seed=seed + 1009 + int(c),
        )
    if sub_map:
        bc_sub = df.sparkSession.sparkContext.broadcast(sub_map)

        @F.pandas_udf("int")
        def _subcell(cell, v):
            # null cell/vector rows -> null sub-cell (never a vstack
            # crash on one bad row — ADVICE r14, same contract as the
            # similarity UDFs)
            cells = cell.to_numpy()
            vals = v.to_numpy()
            n = len(cells)
            valid = np.fromiter(
                (cells[i] is not None and not pd.isna(cells[i])
                 and vals[i] is not None for i in range(n)),
                dtype=bool, count=n)
            out = np.empty(n, dtype=object)
            out[valid] = np.int32(0)
            for c in np.unique(cells[valid].astype(np.int64)):
                cent = bc_sub.value.get(int(c))
                if cent is None:
                    continue
                dim = cent.shape[1]
                idx = np.nonzero(valid & (cells == c))[0]
                idx = np.array([i for i in idx if len(vals[i]) == dim])
                if not len(idx):
                    continue
                mat = np.vstack(vals[idx]).astype(np.float64)
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                out[idx] = np.argmax(mat @ cent.T, axis=1).astype("int32")
            return pd.Series(out)

        with_cell = with_cell.withColumn(
            "__sub", _subcell(F.col("cell"),
                              F.col("__v").cast("array<double>")))
    else:
        with_cell = with_cell.withColumn("__sub", F.lit(0))

    out_schema = T.StructType([
        # the id keeps ITS OWN type — hardcoding long crashed string ids
        # inside applyInPandas with an opaque executor error
        T.StructField("id", df.schema[id_col].dataType),
        T.StructField("cell", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
    ])

    def _dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        if len(pdf) > max_cell_rows:
            import logging

            logging.getLogger("beacon_spark.semdedup").warning(
                "semdedup group (cell %s) still holds %d rows "
                "(> max_cell_rows=%d) AFTER auto-split — the "
                "sub-quantizer could not separate these rows (e.g. an "
                "identical-vector army); the blocked walk stays "
                "memory-bounded but quadratic time will hurt",
                pdf["cell"].iloc[0] if len(pdf) else "?",
                len(pdf), max_cell_rows,
            )
        v = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        keep = _semdedup_keep(v, threshold, block_rows)
        return pd.DataFrame({
            "id": pdf["id"],
            "cell": pdf["cell"].astype("int32"),
            "keep": keep,
        })

    out = (
        with_cell.groupBy("cell", "__sub")
        .applyInPandas(_dedup_cell, schema=out_schema)
        .withColumnRenamed("id", id_col)
    )
    out._beacon_cached = (with_cell,)  # release_caches(result) frees it
    return out
