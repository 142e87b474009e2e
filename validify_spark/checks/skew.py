"""Explicit skew handling for hot keys (north_rule: "explicit salting
and AQE-handled skew on hot conv_ids").

Two complementary mechanisms:

1. AQE (always on via session.py): splits skewed shuffle partitions at
   runtime — covers joins and final aggregations.
2. Explicit salting (this module): for grouped computations whose
   per-key state grows with group size (collect_list, long string
   aggs, exact distinct within key), where AQE cannot help because a
   single key's rows MUST meet. Salting splits each key into
   ``n_salts`` subgroups, aggregates partially per (key, salt), then
   merges the partials per key — two small shuffles instead of one
   skewed one, bounding any single task's state to |key|/n_salts rows.

Plain hash aggregations (count, sum, min, max, approx sketches) do NOT
need salting: Spark's partial aggregation already combines map-side, so
a hot conv_id contributes one partial row per input partition.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int = 16,
              seed: int = 42) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) — hash of all columns
    rather than rand() so retried tasks produce identical salts
    (determinism requirement; rand() breaks idempotent re-runs)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns],
                          F.lit(seed)), F.lit(n_salts)).cast("int"))


def salted_agg(df: DataFrame, keys: Sequence[str],
               partial_aggs: Sequence[Column],
               merge_aggs: Sequence[Column],
               n_salts: int = 16) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs``: aggregate expressions evaluated per (keys, salt);
    ``merge_aggs``: expressions merging the partials per keys. The
    partial outputs must be aliased, and merge expressions reference
    those aliases.

    Example — per-conversation totals robust to 100x-hot conv_ids:
        salted_agg(turns, ["conv_id"],
                   [F.count("*").alias("n"),
                    F.sum(F.length("text")).alias("chars")],
                   [F.sum("n").alias("n_turns"),
                    F.sum("chars").alias("total_chars")])
    """
    partial = (with_salt(df, n_salts)
               .groupBy(*keys, SALT_COL)
               .agg(*partial_aggs))
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_collect_list(df: DataFrame, keys: Sequence[str],
                        value: str, n_salts: int = 16) -> DataFrame:
    """collect_list per key without a single-task hot-key bottleneck:
    per-salt partial lists, flattened at merge. Ordering within the
    list is not guaranteed (sort afterwards if needed)."""
    return salted_agg(
        df, keys,
        [F.collect_list(value).alias("_part")],
        [F.flatten(F.collect_list("_part")).alias(f"{value}_list")],
        n_salts=n_salts)
