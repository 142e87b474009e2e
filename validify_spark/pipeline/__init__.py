"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (token counting, quality scoring, language ID, fingerprinting)
and multimodal column plumbing. All Spark-first: built-in Column ops and
higher-order functions; numpy/Arrow UDFs only for simhash bit math and
the stubbed media decoders."""

from .corpus import clean_corpus
from .dedup import (
    duplicate_clusters,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_pairs,
    word_shingles,
)
from .similarity import (ann_recall_at_k, cosine_self_pairs, cosine_topk,
                         ivf_ann_topk, lsh_ann_topk, n_planes_for)
from .text import (compression_ratio, decontaminate, fingerprint,
                   lang_id, quality_score, redact_pii, token_stats)

__all__ = [
    "exact_duplicates", "duplicate_clusters", "word_shingles", "jaccard_pairs",
    "minhash_signatures", "minhash_lsh_pairs", "simhash_fingerprints",
    "simhash_pairs", "cosine_topk", "cosine_self_pairs", "lsh_ann_topk",
    "ivf_ann_topk", "ann_recall_at_k", "n_planes_for",
    "token_stats", "quality_score", "lang_id", "fingerprint",
    "redact_pii", "clean_corpus", "compression_ratio", "decontaminate",
]
