"""Streaming deduplication — the ingest-side twin of
pipeline/dedup.exact_duplicates.

A training-data ingest pipeline wants dedup AT ARRIVAL, not as a later
batch pass: the first occurrence of a text flows through, later copies
are dropped, and Spark bounds the dedup state with the event-time
watermark (state for a hash is dropped once the watermark passes it, so
memory is proportional to the watermark window — not corpus history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm_hash(text_col: str, normalize: bool) -> F.Column:
    t = F.col(text_col)
    if normalize:
        # same normalization as pipeline/dedup.exact_duplicates, so a
        # streaming ingest and a batch audit agree on what "same" means
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    return F.md5(t)


def stream_exact_dedup(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "1 hour",
                       normalize: bool = True) -> DataFrame:
    """First-occurrence-wins exact dedup on a streaming DataFrame.

    With ``ts_col``: watermarked ``dropDuplicatesWithinWatermark`` —
    duplicates arriving within the watermark window of the original are
    dropped and state is bounded (the 100 TB/day ingest path). Without
    a ts column: plain streaming ``dropDuplicates`` (state grows with
    distinct hashes — tests/small streams only).

    Output: the input rows that survived, plus ``text_hash``."""
    out = stream_df.withColumn("text_hash",
                               _norm_hash(text_col, normalize))
    if ts_col is not None:
        return (out.withWatermark(ts_col, watermark)
                   .dropDuplicatesWithinWatermark(["text_hash"]))
    return out.dropDuplicates(["text_hash"])
