"""Exact two-sample Kolmogorov–Smirnov statistic, distributed — the
quantile-level complement to the KL/PSI histogram drift family
(north_star "distribution-drift on ... text-length histograms"):
D = sup_x |F_left(x) - F_right(x)| over the empirical CDFs, with no
binning error at all.

Scale shape (the prefix-sum problem without a global sort bottleneck):

1. union both samples with a side tag; derive a DETERMINISTIC value
   bucket per row from explicit approxQuantile boundaries. (Not
   ``repartitionByRange``: its boundaries are re-SAMPLED per action,
   so the offsets job and the scan job could disagree on where a row
   lands — the bucket expression is a pure function of the value.)
2. per-BUCKET (side0, side1) counts — one small aggregate straight
   off the union (partial agg, no wide shuffle).
3. driver turns the ≤P bucket counts into prefix offsets (audit-style
   small collect) and ships them into the UDF closure.
4. hash-repartition on the bucket id, sort each partition by
   (bucket, value), and one Arrow ``mapInPandas`` pass streams
   batch-by-batch (nothing pinned), carrying running counts that
   RESET to the bucket's offsets at each bucket change. |F_l - F_r|
   is evaluated only where the value changes (KS convention: all ties
   at x are processed before F(x) is read) and at bucket/partition
   ends — safe because a tie group has one value ⇒ one bucket.
   Emits one local-max row per partition; a final max-agg gives D.

Everything heavy is value-bucketed and single-pass; the only
driver-side data is the per-bucket count table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ._cdf import bucket_stats, bucketed, tagged_union


def ks_statistic(left: DataFrame, left_col: str,
                 right: DataFrame, right_col: str | None = None,
                 num_partitions: int | None = None,
                 round_to: int = 6) -> DataFrame:
    """Exact two-sample KS over a numeric column of each side.

    Returns a 1-row DataFrame: (d, n_left, n_right). NULL/NaN values
    are excluded (they have no position on the real line).
    """
    right_col = right_col or left_col
    spark = left.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism

    u = tagged_union(left, left_col, right, right_col)
    ub = bucketed(u, p)
    by_b, offsets, n0, n1 = bucket_stats(ub)
    if n0 == 0 or n1 == 0:
        raise ValueError("ks_statistic: a side has no non-null values")

    def _part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        best = 0.0
        cur_b = None
        run0 = run1 = 0
        prev_v = None
        prev_d = None  # |F_l - F_r| after the last-seen value group
        for pdf in batches:
            for b_val, grp in pdf.groupby("b", sort=True):
                if b_val != cur_b:
                    if prev_d is not None:  # bucket end closes group
                        best = max(best, prev_d)
                    cur_b = b_val
                    run0, run1 = offsets[b_val]
                    prev_v = prev_d = None
                v = grp["v"].to_numpy()
                s = grp["s"].to_numpy()
                cum0 = run0 + np.cumsum(s == 0)
                cum1 = run1 + np.cumsum(s == 1)
                run0, run1 = int(cum0[-1]), int(cum1[-1])
                d = np.abs(cum0 / n0 - cum1 / n1)
                if prev_v is not None and v[0] != prev_v \
                        and prev_d is not None:
                    best = max(best, prev_d)
                ends = np.nonzero(v[:-1] != v[1:])[0]
                if ends.size:
                    best = max(best, float(d[ends].max()))
                prev_v = float(v[-1])
                prev_d = float(d[-1])
        if prev_d is not None:  # partition end closes the last group
            best = max(best, prev_d)
        yield pd.DataFrame({"local_d": [best]})

    local = (ub.repartition(p, "b")
             .sortWithinPartitions("b", "v")
             .mapInPandas(_part, schema="local_d double"))
    return (local.agg(F.round(F.max("local_d"), round_to).alias("d"))
            .select("d",
                    F.lit(n0).cast("long").alias("n_left"),
                    F.lit(n1).cast("long").alias("n_right")))
