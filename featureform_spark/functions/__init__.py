from featureform_spark.functions.text import (
    with_tokens,
    text_stats,
    language_id,
    doc_fingerprint,
    LANG_MARKERS,
)
from featureform_spark.functions.dedup import (
    dedup_exact,
    minhash_signature,
    minhash_lsh_pairs,
    simhash,
)
from featureform_spark.functions.similarity import (
    cosine_topk,
    hyperplane_lsh_buckets,
    ann_topk_lsh,
)
from featureform_spark.functions.lm import (
    bigram_model,
    ngram_lm_score,
)

__all__ = [
    "with_tokens",
    "text_stats",
    "language_id",
    "doc_fingerprint",
    "LANG_MARKERS",
    "dedup_exact",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "hyperplane_lsh_buckets",
    "ann_topk_lsh",
    "bigram_model",
    "ngram_lm_score",
]
