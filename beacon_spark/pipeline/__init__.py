from beacon_spark.pipeline.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    shingles_expr,
)
from beacon_spark.pipeline.similarity import brute_force_topk, cosine_expr, lsh_ann_topk
from beacon_spark.pipeline.text import (
    fingerprint_expr,
    language_id,
    quality_metrics,
    token_count_expr,
)

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_pairs", "shingles_expr",
    "brute_force_topk", "cosine_expr", "lsh_ann_topk",
    "token_count_expr", "quality_metrics", "language_id", "fingerprint_expr",
]
