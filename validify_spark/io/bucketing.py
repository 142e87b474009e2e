"""Bucketed tables: co-located joins/aggregations without a shuffle.

At 10^12 turns the dominant cost of any conv-level operation (turn
ordering, per-conv aggregates, conv_id referential checks) is the
shuffle on conv_id. Writing the transcript table bucketed by conv_id
once moves that shuffle to write time: every later join/groupBy on the
bucket key reads co-located buckets and the plan shows NO Exchange on
the bucketed side (verified in tests/test_bucketing.py via
explain()).

Spark bucketing needs a table in the session catalog (saveAsTable) —
on a cluster that's the metastore/Iceberg catalog; locally it's the
spark-warehouse dir, same code path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str,
                   bucket_cols: Sequence[str], n_buckets: int = 64,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite",
                   format: str = "parquet") -> None:
    """Write ``df`` as a bucketed (optionally sort-within-bucket) table.

    ``sort_cols`` (e.g. turn_idx under conv_id buckets) additionally
    pre-sorts within each bucket file, which lets sort-merge joins and
    window functions skip the sort too."""
    w = (df.write.format(format).mode(mode)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchanges_on(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan — the
    test hook for 'this join/agg is shuffle-free'. BroadcastExchange is
    excluded (broadcasting a dimension-sized side is the cheap path,
    not the shuffle bucketing avoids)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line
               and "ReusedExchange" not in line
               and "BroadcastExchange" not in line)
