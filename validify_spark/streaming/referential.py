"""Streaming referential integrity — the ingest-side twin of
checks/referential.referential_orphans (north_star: "referential
integrity of conv_id across turn partitions").

A transcript ingest wants orphan detection AT ARRIVAL: a turn whose
conv_id has no row in the conversation-metadata table should surface in
the micro-batch it lands in, not in a nightly audit. Plan shape:
stream-static LEFT ANTI join — the static parent side is re-resolved
every micro-batch (so parents that appear between batches stop flagging
their children), reduced to distinct keys first, and broadcast by
default (conv metadata is dimension-sized next to the turn stream).
No streaming state at all in passthrough mode; the windowed mode adds
one watermarked count agg, state bounded by the watermark.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F


def stream_referential_orphans(
        stream_df: DataFrame,
        child_keys: Union[str, Sequence[str]],
        parent: DataFrame,
        parent_keys: Union[str, Sequence[str], None] = None,
        broadcast_parent: bool = True,
        ts_col: Optional[str] = None,
        watermark: str = "2 hours",
        window: Optional[str] = None) -> DataFrame:
    """Rows of ``stream_df`` whose key has no match in ``parent``.

    Passthrough mode (``window=None``): append-mode stream of the
    orphan rows themselves, all columns intact — route to a violations
    sink. Windowed mode (``ts_col`` + ``window``): per-event-time-window
    orphan counts per key, watermark-bounded.

    ``parent`` must be a batch (static) DataFrame; Spark re-evaluates
    it per micro-batch, so a parent table that gains rows between
    triggers is picked up without restarting the query.
    """
    ck = ([child_keys] if isinstance(child_keys, str)
          else list(child_keys))
    pk = parent_keys or ck
    pk = [pk] if isinstance(pk, str) else list(pk)

    parent_side = parent.select(*pk).distinct()
    if broadcast_parent:
        parent_side = F.broadcast(parent_side)

    cond = None
    for a, b in zip(ck, pk):
        c = stream_df[a] == parent_side[b]
        cond = c if cond is None else (cond & c)
    orphans = stream_df.join(parent_side, cond, "left_anti")

    if window is None:
        return orphans
    if ts_col is None:
        raise ValueError("windowed mode needs ts_col")
    return (orphans
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("__w"), *ck)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.col("__w.start").alias("window_start"),
                    *ck, "n_rows"))
