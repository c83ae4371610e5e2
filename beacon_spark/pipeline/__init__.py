from beacon_spark.pipeline.corpus import (
    chunk_documents,
    decontaminate,
    export_shards,
)
from beacon_spark.pipeline.dedup import (
    dedup_clusters,
    dedup_keep_canonical,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dedup,
    ngram_jaccard_pairs,
    shingles_expr,
    simhash_pairs,
)
from beacon_spark.pipeline.multimodal import (
    audio_stat_features,
    sample_frames,
    decode_image,
    decode_wav,
    extract_metadata,
    featurize,
    image_stat_features,
    resize_images,
)
from beacon_spark.pipeline.similarity import (
    brute_force_topk,
    cosine_expr,
    cosine_pairs_lsh,
    ivf_ann_topk,
    lsh_ann_topk,
)
from beacon_spark.pipeline.text import (
    fingerprint_expr,
    language_id,
    quality_filter,
    quality_metrics,
    repetition_metrics,
    scrub_pii,
    token_count_expr,
)

__all__ = [
    "chunk_documents", "decontaminate", "export_shards",
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_pairs", "shingles_expr",
    "dedup_clusters", "dedup_keep_canonical", "near_dedup",
    "brute_force_topk", "cosine_expr", "cosine_pairs_lsh",
    "lsh_ann_topk", "ivf_ann_topk",
    "token_count_expr", "quality_metrics", "language_id", "fingerprint_expr",
    "sample_frames",
    "repetition_metrics", "scrub_pii", "quality_filter",
    "extract_metadata", "featurize", "resize_images",
    "decode_image", "decode_wav", "image_stat_features", "audio_stat_features",
]
