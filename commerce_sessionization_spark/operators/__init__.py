from commerce_sessionization_spark.operators.sessionize import (
    augment_session_id,
    load_prev_active_sessions,
    sessionize_hour,
)
from commerce_sessionization_spark.operators.sessions import sessionize, session_stats
from commerce_sessionization_spark.operators.ingest import divide_file
from commerce_sessionization_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from commerce_sessionization_spark.operators.similarity import (
    all_pairs_topk,
    brute_force_topk,
)

__all__ = [
    "augment_session_id",
    "load_prev_active_sessions",
    "sessionize_hour",
    "sessionize",
    "session_stats",
    "divide_file",
    "exact_dedup",
    "minhash_lsh_dedup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "all_pairs_topk",
    "brute_force_topk",
]
