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

Scale shape: ONE shuffle — a window partitioned by conv_id, ordered by
(turn_idx[, ts], role): ``lag(role)`` answers role_repeat,
``row_number`` marks the first turn, a lead-based flag marks the last
(where row_number equals the group size, answering too_many_turns), and
every code is a compiled ``when`` over those — no collected array, no interpreted higher-order
lambdas. (r6: the previous collect_list + array_sort + per-element
``transform`` formulation spent most of its time in interpreted lambda
evaluation over every turn; the window form computes the identical
codes entirely in compiled expressions and shuffles the same one
exchange.) The (idx[, ts], role) sort matches the old struct
array_sort field-by-field order — including role as the final
tie-break — with ascending NULLS FIRST, so results are identical even
on (idx, ts)-duplicate rows. Per-conversation turn counts are bounded
in practice (same contract as ordering_violations); a hot conv is one
window group's work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


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
    if not (zero_based or first_role is not None or last_role is not None
            or alternate or max_turns is not None):
        raise ValueError("no shape checks requested")

    order = [idx_col] + ([ts_col] if ts_col else []) + [role_col]
    w = Window.partitionBy(conv_col).orderBy(
        *[F.col(c).asc_nulls_first() for c in order])

    # ONE window spec for everything: lag answers role_repeat,
    # row_number marks the first turn, and a lead-based last-row flag
    # replaces the separate unordered count-over-partition (at the last
    # row, row_number IS the group size, so too_many_turns reads _rn
    # there) — one Window operator instead of two.
    marked = df.select(
        conv_col, idx_col, role_col,
        F.row_number().over(w).alias("_rn"),
        F.lead(F.lit(1)).over(w).isNull().alias("_last"),
        F.lag(role_col).over(w).alias("_prev_r"))

    idx_type = df.schema[idx_col].dataType.simpleString()
    i, r = F.col(idx_col), F.col(role_col)
    first_row = F.col("_rn") == 1
    codes = []

    def st(icol, code):
        return F.struct(icol.alias("i"), F.lit(code).alias("code"))

    if zero_based:
        # NULL idx on the first turn: NULL != 0 is NULL -> not emitted,
        # same as the old struct-array formulation
        codes.append(F.when(first_row & (i != 0),
                            st(i, "first_idx_not_zero")))
    if first_role is not None:
        # NULL-safe: a NULL first role is not the expected opener
        codes.append(F.when(first_row
                            & ~r.eqNullSafe(F.lit(first_role)),
                            st(i, "first_role")))
    if last_role is not None:
        codes.append(F.when(F.col("_last")
                            & ~r.eqNullSafe(F.lit(last_role)),
                            st(i, "last_role")))
    if max_turns is not None:
        # emitted once per conversation (at its last row, where _rn =
        # group size); the attachment row is invisible in the output —
        # the struct carries a NULL idx either way
        codes.append(F.when(F.col("_last") & (F.col("_rn") > max_turns),
                            st(F.lit(None).cast(idx_type),
                               "too_many_turns")))
    if alternate:
        # NULL-safe like the old element-wise compare: two consecutive
        # NULL roles count as a repeat; the _rn >= 2 gate keeps the
        # first turn (lag = NULL) out of the comparison
        codes.append(F.when((F.col("_rn") >= 2)
                            & r.eqNullSafe(F.col("_prev_r")),
                            st(i, "role_repeat")))

    arr = F.array_compact(F.array(*codes))
    return (marked
            .select(conv_col, arr.alias("_v"))
            .filter(F.size("_v") > 0)
            .select(conv_col, F.explode("_v").alias("_s"))
            .select(conv_col,
                    F.col("_s.i").alias(idx_col),
                    F.col("_s.code").alias("code")))
