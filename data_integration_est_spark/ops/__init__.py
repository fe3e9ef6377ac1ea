"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal plumbing.

These extend the reference's estimator surface with the operations a
large-scale (100 TB) training-data pipeline needs.  Everything here is
built from JVM-side Column expressions or Arrow-batched pandas UDFs —
no row-at-a-time Python.
"""

from data_integration_est_spark.ops.text import (
    add_text_stats,
    language_id,
    quality_score,
    fingerprint,
)
from data_integration_est_spark.ops.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from data_integration_est_spark.ops.similarity import (
    brute_force_knn,
    lsh_knn,
    cosine_expr,
)

__all__ = [
    "add_text_stats", "language_id", "quality_score", "fingerprint",
    "exact_dedup", "minhash_signatures", "lsh_candidate_pairs",
    "ngram_jaccard_pairs", "simhash64",
    "brute_force_knn", "lsh_knn", "cosine_expr",
]
