"""Conversation-shape invariants — transcript-level constraints that
need the whole (conv_id)-group in one place, beyond the per-adjacent-
pair codes of :mod:`.ordering` (north_star: multi-turn conversation /
agent transcripts; SURVEY.md §2.8 distributed-only checks).

Codes:

- ``first_idx_not_zero``  — the lowest turn_idx in the conversation is
  not 0 (transcripts are 0-based; a non-zero start means a lost head).
- ``first_role``          — the first turn's role != the expected
  opener (e.g. 'user' or 'system').
- ``last_role``           — the final turn's role != the expected
  closer (e.g. 'assistant': a conversation cut off mid-exchange).
- ``role_repeat``         — two consecutive turns share a role when
  strict alternation was requested (dropped reply / duplicated send).
- ``too_many_turns``      — conversation exceeds ``max_turns``
  (runaway agent loop); turn_idx is NULL for this conv-level code.

Scale shape: ONE shuffle — groupBy(conv_id) with a sorted
collect_list of (turn_idx, ts, role) structs, then pure higher-order
array expressions derive every code (no window, no second exchange,
no Python). Per-conversation turn counts are bounded in practice
(same contract as ordering_violations); a hot conv is one group's
work. Struct array_sort orders field-by-field, so (idx, ts) is the
same deterministic tie-break the ordering check and any external
oracle ``ORDER BY idx, ts`` use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_shape_violations(
        df: DataFrame,
        conv_col: str = "conv_id",
        idx_col: str = "turn_idx",
        role_col: str = "role",
        ts_col: str | None = "ts",
        zero_based: bool = True,
        first_role: str | None = None,
        last_role: str | None = None,
        alternate: bool = False,
        max_turns: int | None = None) -> DataFrame:
    """One row per conversation-shape violation.

    Output: <conv_col>, <idx_col> (NULL for conv-level codes), code.

    ``ts_col`` defaults to the transcript schema's ``ts`` but is only
    used as a sort tie-break when the column actually exists — pass an
    explicit name to make a missing column an error.
    """
    if ts_col == "ts" and "ts" not in df.columns:
        ts_col = None
    order = [F.col(idx_col).alias("i")]
    if ts_col is not None:
        order.append(F.col(ts_col).alias("t"))
    seq = F.array_sort(F.collect_list(
        F.struct(*order, F.col(role_col).alias("r"))))
    g = (df.groupBy(conv_col).agg(seq.alias("_seq")))

    first = F.col("_seq").getItem(0)
    last = F.element_at("_seq", -1)
    n = F.size("_seq")

    conv_codes = []
    if zero_based:
        conv_codes.append(
            F.when(first.getField("i") != 0,
                   F.struct(first.getField("i").alias("i"),
                            F.lit("first_idx_not_zero").alias("code"))))
    if first_role is not None:
        # NULL-safe: a NULL first role is not the expected opener
        conv_codes.append(
            F.when(~first.getField("r").eqNullSafe(F.lit(first_role)),
                   F.struct(first.getField("i").alias("i"),
                            F.lit("first_role").alias("code"))))
    if last_role is not None:
        conv_codes.append(
            F.when(~last.getField("r").eqNullSafe(F.lit(last_role)),
                   F.struct(last.getField("i").alias("i"),
                            F.lit("last_role").alias("code"))))
    idx_type = df.schema[idx_col].dataType.simpleString()
    if max_turns is not None:
        conv_codes.append(
            F.when(n > max_turns,
                   F.struct(F.lit(None).cast(idx_type).alias("i"),
                            F.lit("too_many_turns").alias("code"))))

    parts = []
    if conv_codes:
        parts.append(F.array_compact(F.array(*conv_codes)))
    if alternate:
        # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard n >= 2
        rep = F.when(
            n >= 2,
            F.array_compact(F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.when(
                    F.element_at("_seq", i + 1).getField("r").eqNullSafe(
                        F.element_at("_seq", i).getField("r")),
                    F.struct(
                        F.element_at("_seq", i + 1).getField("i")
                        .alias("i"),
                        F.lit("role_repeat").alias("code"))))),
        ).otherwise(F.array().cast(
            f"array<struct<i:{idx_type},code:string>>"))
        parts.append(rep)
    if not parts:
        raise ValueError("no shape checks requested")

    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return (g.select(conv_col, F.explode(out).alias("_v"))
             .select(conv_col,
                     F.col("_v.i").alias(idx_col),
                     F.col("_v.code").alias("code")))
