"""Ordering invariants over (conv_id, turn_idx): duplicate indices, gaps,
and timestamps moving backwards under the stable turn ordering
(north_star "per-turn text equality under stable (conv_id, turn_idx)
ordering"; SURVEY.md §2.8).

Window shape: one shuffle partitioned by conv_id, sorted by turn_idx.
Hot conversations (100× median turns) stay a single partition's worth of
work per conv — acceptable because per-conv turn counts are bounded in
practice; for adversarial skew the caller can pre-filter by conv length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def ordering_violations(df: DataFrame,
                        conv_col: str = "conv_id",
                        idx_col: str = "turn_idx",
                        ts_col: str | None = "ts") -> DataFrame:
    """One row per ordering violation.

    Output: <conv_col>, <idx_col>, code ∈
      {'dup_turn_idx', 'turn_idx_gap', 'ts_out_of_order'}.
    """
    # tie-break duplicate idx values by ts so lag() is deterministic —
    # an external oracle ordering by (idx, ts) sees the same sequence
    order_cols = [idx_col] + ([ts_col] if ts_col else [])
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    prev_idx = F.lag(idx_col).over(w)
    codes = [
        F.when((prev_idx.isNotNull()) & (F.col(idx_col) == prev_idx),
               F.lit("dup_turn_idx")),
        F.when((prev_idx.isNotNull()) & (F.col(idx_col) > prev_idx + 1),
               F.lit("turn_idx_gap")),
    ]
    if ts_col is not None:
        prev_ts = F.lag(ts_col).over(w)
        codes.append(
            F.when(prev_ts.isNotNull() & F.col(ts_col).isNotNull()
                   & (F.col(ts_col) < prev_ts),
                   F.lit("ts_out_of_order")))
    arr = F.array_compact(F.array(*codes))
    return (df
            .select(conv_col, idx_col, arr.alias("_codes"))
            .filter(F.size("_codes") > 0)
            .select(conv_col, idx_col,
                    F.explode("_codes").alias("code")))
