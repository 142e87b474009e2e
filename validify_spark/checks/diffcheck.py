"""Per-turn text-equality diff between two transcript tables — the
north_star acceptance invariant verbatim: "preserving per-turn text
equality under stable (conv_id, turn_idx) ordering". Run it between a
pipeline's input and output (or a table and its replica/migration) to
prove no turn was dropped, duplicated into the wrong slot, or had its
text mutated.

Codes:

- ``missing_in_right`` — (conv_id, turn_idx) exists on the left only.
- ``missing_in_left``  — exists on the right only.
- ``text_mismatch``    — both sides have the turn, text differs.

Scale shape: each side is projected to (conv_id, turn_idx,
xxhash64(text)) BEFORE the join, so the shuffle moves an 8-byte digest
instead of the full turn text — at 100 TB that is the difference
between shuffling the corpus and shuffling ~25 bytes/row. (r6: the
digest was md5 — a 32-char string; xxhash64 carries the same
collision class at a quarter of the digest bytes and compares as a
long.) The join co-partitions both sides on the same
(conv_id, turn_idx) keys: one shuffle per side, AQE handles skewed hot
conversations. Digest equality ⇒ text equality up to collisions
(2^-64-scale; pass ``digest=False`` to shuffle and compare raw text).

NULL text hashes to the hash seed on both sides, so "both NULL" stays
equal and "NULL vs value" stays a mismatch — the same verdicts as the
eqNullSafe convention digest=False uses (review finding r2).

Duplicate (conv_id, turn_idx) keys on a side multiply join rows —
every (left dup × right dup) pair is compared and reported; run
:func:`..checks.uniqueness_violations` / :func:`.ordering_violations`
first if that is not what you want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transcript_diff(left: DataFrame, right: DataFrame,
                    conv_col: str = "conv_id",
                    idx_col: str = "turn_idx",
                    text_col: str = "text",
                    digest: bool = True) -> DataFrame:
    """One row per diff violation: <conv_col>, <idx_col>, code."""
    def _side(df: DataFrame, tag: str) -> DataFrame:
        # digest: xxhash64 of NULL is the hash seed (a constant long),
        # so the eqNullSafe compare below gives the same verdicts as
        # on raw text. digest=False: NULL text probes stay NULL; the
        # comparison is eqNullSafe, so "both NULL" is equal and
        # "NULL vs non-NULL" mismatches. (A coalesce-to-sentinel would
        # make a literal text equal to the sentinel string compare
        # equal to NULL in digest=False mode — review finding.)
        probe = (F.xxhash64(F.col(text_col).cast("string")) if digest
                 else F.col(text_col).cast("string"))
        return df.select(
            F.col(conv_col).alias(conv_col),
            F.col(idx_col).alias(idx_col),
            probe.alias(f"_h_{tag}"),
            F.lit(True).alias(f"_in_{tag}"))

    j = (_side(left, "l")
         .join(_side(right, "r"), on=[conv_col, idx_col],
               how="full_outer"))
    code = (F.when(F.col("_in_r").isNull(), F.lit("missing_in_right"))
             .when(F.col("_in_l").isNull(), F.lit("missing_in_left"))
             .when(~F.col("_h_l").eqNullSafe(F.col("_h_r")),
                   F.lit("text_mismatch")))
    return (j.select(conv_col, idx_col, code.alias("code"))
             .filter(F.col("code").isNotNull()))
