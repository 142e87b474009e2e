"""Streaming transcript diff — the ingest-side face of
checks/diffcheck.py (north_star per-turn text equality): each arriving
turn is compared against a static reference table (the validated
corpus, yesterday's partition, the migration source).

Directionality is inherent to streaming: a mutated or ghost turn is
detectable the moment it ARRIVES (this module, stateless); a turn
MISSING from the stream is an absence, only decidable once its
conversation finalizes — that is conversation-level work, covered by
the batch :func:`..checks.diffcheck.transcript_diff` run on the landed
data (or the session-gap machinery of streaming/conversation.py).

Scale shape: both sides project to (conv, idx, md5(text)) BEFORE the
stream-static LEFT join, so per micro-batch the join moves digests,
not corpus text; the reference is re-resolved each micro-batch (same
contract as streaming/referential.py — a reference update is picked
up without restarting the query). Zero streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_transcript_diff(stream_df: DataFrame,
                           reference: DataFrame,
                           conv_col: str = "conv_id",
                           idx_col: str = "turn_idx",
                           text_col: str = "text",
                           digest: bool = True) -> DataFrame:
    """One row per arriving turn that disagrees with the reference.

    Output (append): <conv_col>, <idx_col>, code ∈
    {'not_in_reference', 'text_mismatch'}. A both-NULL text compares
    equal; NULL vs value is a mismatch (same sentinel convention as
    the batch check). Duplicate reference keys would multiply rows —
    the reference's (conv, idx) is assumed unique, as in batch.
    """
    def _probe(df: DataFrame, tag: str) -> DataFrame:
        h = (F.md5(F.col(text_col).cast("string")) if digest
             else F.col(text_col).cast("string"))
        # NULL probes stay NULL — eqNullSafe below, same rationale as
        # the batch diff (a coalesce sentinel collides with literal
        # sentinel-valued text in digest=False mode)
        return df.select(
            F.col(conv_col), F.col(idx_col),
            h.alias(f"_h_{tag}"),
            F.lit(True).alias(f"_in_{tag}"))

    j = (_probe(stream_df, "s")
         .join(_probe(reference, "r"), on=[conv_col, idx_col],
               how="left"))
    code = (F.when(F.col("_in_r").isNull(),
                   F.lit("not_in_reference"))
             .when(~F.col("_h_s").eqNullSafe(F.col("_h_r")),
                   F.lit("text_mismatch")))
    return (j.select(conv_col, idx_col, code.alias("code"))
             .filter(F.col("code").isNotNull()))
