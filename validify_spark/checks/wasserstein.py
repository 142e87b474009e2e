"""Exact two-sample Wasserstein-1 (earth-mover) distance, distributed
— the magnitude-weighted complement to :mod:`.ks` in the drift family:
W1 = ∫ |F_left(x) - F_right(x)| dx over the empirical CDFs. KS answers
"how far apart do the CDFs GET"; W1 answers "how much mass must MOVE,
and how far" — a mean shift that never widens the CDF gap past D still
accumulates a large W1, which is why drift monitors want both.

Scale shape (shared with ks.py via :mod:`._cdf`):

1. tagged union, deterministic value buckets from explicit
   approxQuantile cuts — bucket id is a pure function of the value,
   and hash-repartitioning on ``b`` puts EVERY row of a bucket in one
   partition, so each bucket's CDF integral is computable locally.
2. per-bucket (counts, min_v, max_v) — one small aggregate; the
   driver derives prefix offsets = the exact cumulative CDF at each
   bucket's start.
3. one Arrow ``mapInPandas`` pass over (b, v)-sorted partitions
   computes each bucket's INTERIOR integral: Σ |F_l - F_r| after each
   distinct value, times the gap to the next distinct value (ties
   collapse — the CDF steps once per distinct value). Vectorized
   numpy; nothing pinned.
4. the BOUNDARY terms — |CDF diff at the end of bucket b| x
   (min_v(b+1) - max_v(b)) — only need per-bucket offsets/min/max,
   already on the driver: a Σ over ≤ p tiny terms, folded in as a
   literal. Total = Σ interior + Σ boundary, exact.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ._cdf import bucket_stats, bucketed, tagged_union


def wasserstein_distance(left: DataFrame, left_col: str,
                         right: DataFrame, right_col: str | None = None,
                         num_partitions: int | None = None,
                         round_to: int = 6) -> DataFrame:
    """Exact W1 between the empirical distributions of a numeric
    column of each side.

    Returns a 1-row DataFrame: (w1, n_left, n_right). NULL/NaN are
    excluded. Matches ``scipy.stats.wasserstein_distance`` on the same
    samples (equal-weight empirical measures).
    """
    right_col = right_col or left_col
    spark = left.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism

    u = tagged_union(left, left_col, right, right_col)
    ub = bucketed(u, p)
    by_b, offsets, n0, n1 = bucket_stats(ub, with_minmax=True)
    if n0 == 0 or n1 == 0:
        raise ValueError(
            "wasserstein_distance: a side has no non-null values")

    # boundary terms between consecutive buckets, driver-side: the CDF
    # is constant on the open gap (max_v(b), min_v(b_next)); its height
    # there is the prefix offset at b_next's start
    boundary = 0.0
    order = sorted(by_b)
    for b_prev, b_next in zip(order, order[1:]):
        c0, c1 = offsets[b_next]
        boundary += (abs(c0 / n0 - c1 / n1)
                     * (by_b[b_next]["min_v"] - by_b[b_prev]["max_v"]))

    # streaming pass, nothing pinned (same seam-carrying scheme as
    # ks.py): an Arrow chunk may split a bucket or a tie group, so
    # carry (bucket, running counts, last value, CDF-diff after it)
    # across chunks and add the seam's gap term when the value changes
    def _part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        total = 0.0
        cur_b = None
        run0 = run1 = 0
        prev_v = None
        prev_d = None  # |F_l - F_r| after the last-seen value group
        for pdf in batches:
            for b_val, grp in pdf.groupby("b", sort=True):
                if b_val != cur_b:
                    # bucket change: interior integral restarts (the
                    # inter-bucket gap is the driver's boundary term)
                    cur_b = b_val
                    run0, run1 = offsets[b_val]
                    prev_v = prev_d = None
                v = grp["v"].to_numpy()
                s = grp["s"].to_numpy()
                cum0 = run0 + np.cumsum(s == 0)
                cum1 = run1 + np.cumsum(s == 1)
                run0, run1 = int(cum0[-1]), int(cum1[-1])
                d = np.abs(cum0 / n0 - cum1 / n1)
                if prev_v is not None and v[0] != prev_v:
                    total += prev_d * (float(v[0]) - prev_v)
                ends = np.nonzero(v[:-1] != v[1:])[0]
                if ends.size:
                    total += float(
                        (d[ends] * (v[ends + 1] - v[ends])).sum())
                prev_v = float(v[-1])
                prev_d = float(d[-1])
        yield pd.DataFrame({"partial": [total]})

    local = (ub.repartition(p, "b")
             .sortWithinPartitions("b", "v")
             .mapInPandas(_part, schema="partial double"))
    return (local.agg(
        F.round(F.sum("partial") + F.lit(boundary), round_to)
        .alias("w1"))
        .select("w1",
                F.lit(n0).cast("long").alias("n_left"),
                F.lit(n1).cast("long").alias("n_right")))
