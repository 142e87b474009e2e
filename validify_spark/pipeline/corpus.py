"""End-to-end corpus cleaning: the composition a pretraining-data
pipeline actually runs, wired from the operators in this package —
redact PII → score quality / language → filter → benchmark
decontamination → exact dedup → near-dup clustering → keep one
representative per cluster.

Each stage is the already-tested operator; this module only sequences
them and prunes losers with left-anti joins on the doc id. At corpus
scale the id-keyed joins all hash-partition on the same key, so AQE
coalesces them into a handful of co-partitioned stages; the heavy
lifting (shingling, banded joins) lives inside the imported operators
with their documented scale properties.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from .dedup import duplicate_clusters, exact_duplicates, jaccard_pairs
from .text import decontaminate, lang_id, quality_score, redact_pii


def clean_corpus(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 quality_min: float = 0.4,
                 lang_allow: Optional[Sequence[str]] = None,
                 jaccard_threshold: float = 0.8,
                 max_df: Optional[int] = None,
                 redact: bool = True,
                 benchmark: Optional[DataFrame] = None,
                 decontam_n: int = 13,
                 decontam_min_hits: int = 1,
                 bench_text_col: Optional[str] = None) -> DataFrame:
    """Clean a document corpus for training use.

    Stages (each optional knob defaults to the pipeline-standard
    behavior):
      1. ``redact``: PII → typed placeholders (redact_pii).
      2. quality + language scoring over the (redacted) text;
         drop docs with quality < ``quality_min`` or, when
         ``lang_allow`` is given, a predicted language outside it.
      3. ``benchmark``: when an eval-set DataFrame is given, drop
         docs sharing ≥ ``decontam_min_hits`` word ``decontam_n``-grams
         with it (decontaminate + left-anti) — BEFORE dedup, so
         contaminated docs never seed a cluster whose representative
         survives them.
      4. exact dedup: of each identical-text group only the min-id
         canonical survives.
      5. near-dup dedup: jaccard pairs ≥ ``jaccard_threshold`` →
         connected components → only each cluster's min-id
         representative survives.

    Output: <id_col>, <text_col> (cleaned), n_redactions, quality,
    pred_lang — the surviving documents."""
    if redact:
        red = redact_pii(df, id_col, text_col)
        docs = red.select(
            F.col(id_col),
            F.col("clean_text").alias(text_col),
            "n_redactions")
    else:
        docs = df.select(F.col(id_col), F.col(text_col),
                         F.lit(0).alias("n_redactions"))

    q = quality_score(docs, id_col, text_col) \
        .select(id_col, "quality")
    lang = lang_id(docs, id_col, text_col) \
        .select(id_col, "pred_lang")
    scored = docs.join(q, id_col).join(lang, id_col)

    keep = F.col("quality") >= F.lit(quality_min)
    if lang_allow is not None:
        keep = keep & F.col("pred_lang").isin(*lang_allow)
    filtered = scored.filter(keep)

    if benchmark is not None:
        # benchmark text column defaults to the corpus's text_col
        # (eval sets usually share the schema); bench_text_col
        # overrides when they differ
        dirty = decontaminate(filtered, benchmark, id_col, text_col,
                              bench_text_col=bench_text_col or text_col,
                              n=decontam_n,
                              min_hits=decontam_min_hits).select(id_col)
        filtered = filtered.join(dirty, id_col, "left_anti")

    # exact dedup: drop every member of an identical-text group except
    # the canonical (min id)
    ex = exact_duplicates(filtered, id_col, text_col)
    drop_exact = (ex.filter(F.col(id_col) != F.col("canonical_id"))
                    .select(id_col))
    survivors = filtered.join(drop_exact, id_col, "left_anti")

    # near-dup dedup: cluster the remaining pairs, keep representatives
    pairs = jaccard_pairs(survivors, id_col, text_col,
                          threshold=jaccard_threshold, max_df=max_df)
    clusters = duplicate_clusters(pairs)
    drop_near = (clusters
                 .filter(F.col("doc_id") != F.col("cluster_id"))
                 .select(F.col("doc_id").alias(id_col)))
    return survivors.join(drop_near, id_col, "left_anti")
