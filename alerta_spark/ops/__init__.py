from alerta_spark.ops.text import (  # noqa: F401
    tokenize,
    token_stats,
    language_id,
    quality_score,
    fingerprint,
)
from alerta_spark.ops.dedupe import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_signatures,
    simhash_near_dups,
)
from alerta_spark.ops.similarity import cosine_topk, normalize_embeddings  # noqa: F401
