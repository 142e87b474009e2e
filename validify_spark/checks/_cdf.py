"""Shared machinery for exact two-sample empirical-CDF statistics
(:mod:`.ks`, :mod:`.wasserstein`): deterministic value-bucketing of the
tagged union of two samples, per-bucket counts, driver-side prefix
offsets, and ONE fused streaming Arrow pass that computes both
statistics — KS's sup |F_l - F_r| and W1's ∫ |F_l - F_r| dx read the
same after-each-value-group CDF differences, so asking for both costs
one scan, not two. See ks.py's module docstring for why the bucket id
must be a pure function of the value (approxQuantile cut points, not
``repartitionByRange``'s per-action re-sampling)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def tagged_union(left: DataFrame, left_col: str,
                 right: DataFrame, right_col: str) -> DataFrame:
    """(v double, s int) union of both samples, NULL/NaN dropped."""
    return (left.select(F.col(left_col).cast("double").alias("v"),
                        F.lit(0).alias("s"))
            .unionAll(right.select(
                F.col(right_col).cast("double").alias("v"),
                F.lit(1).alias("s")))
            .filter(F.col("v").isNotNull() & ~F.isnan("v")))


def bucketed(u: DataFrame, p: int) -> DataFrame:
    """Add deterministic bucket id ``b`` from GK-sketch quantile cuts
    (≤ p-1 strictly increasing; duplicates collapse). One eager job."""
    qs = [i / p for i in range(1, p)]
    cuts = sorted(set(u.approxQuantile("v", qs, 0.01))) if p > 1 else []
    bkt = F.lit(0)
    for c in cuts:
        bkt = bkt + F.when(F.col("v") >= c, 1).otherwise(0)
    return u.select("v", "s", bkt.alias("b"))


def bucket_stats(ub: DataFrame, with_minmax: bool = False):
    """Per-bucket (n0, n1[, min_v, max_v]) + prefix offsets.

    Returns (by_b, offsets, n0_total, n1_total) where ``by_b`` maps
    bucket id → Row and ``offsets`` maps bucket id → cumulative
    (side0, side1) counts BEFORE the bucket. Small driver collect
    (≤ p rows), same class as the audit aggregates.
    """
    aggs = [F.count(F.when(F.col("s") == 0, 1)).alias("n0"),
            F.count(F.when(F.col("s") == 1, 1)).alias("n1")]
    if with_minmax:
        aggs += [F.min("v").alias("min_v"), F.max("v").alias("max_v")]
    rows = ub.groupBy("b").agg(*aggs).collect()
    by_b = {r["b"]: r for r in rows}
    n0 = sum(r["n0"] for r in by_b.values())
    n1 = sum(r["n1"] for r in by_b.values())
    offsets, c0, c1 = {}, 0, 0
    for b in sorted(by_b):
        offsets[b] = (c0, c1)
        c0 += by_b[b]["n0"]
        c1 += by_b[b]["n1"]
    return by_b, offsets, n0, n1


def two_sample_stats(left: DataFrame, left_col: str,
                     right: DataFrame, right_col: str | None,
                     num_partitions: int | None,
                     round_to: int, caller: str) -> DataFrame:
    """Fused exact KS + W1 + CvM over the two samples, one pass.

    Returns a 1-row DataFrame (d, w1, cvm, n_left, n_right). The
    streaming per-partition scan carries (bucket, running counts, last
    value, CDF-diff after it, open tie-group size) across Arrow chunk
    seams; |F_l - F_r| is read only after complete value groups (the
    KS tie convention — exactly the heights the W1 integral needs,
    each weighted by the gap to the next distinct value, and that the
    CvM sum needs, each weighted by the tie group's pooled count).
    Inter-bucket W1 gap terms use only per-bucket offsets/min/max,
    folded in driver-side; the KS sup over those constant stretches is
    the bucket-end height, already closed at each bucket change /
    partition end; CvM integrates over the pooled SAMPLE measure, so
    value gaps contribute nothing.

    CvM convention (tie-friendly, oracle-expressible): T =
    n0·n1/(n0+n1)² · Σ over distinct pooled values of
    (pooled multiplicity) · (F_l − F_r)² with CDFs read after the
    value's whole tie group — the pooled-empirical-measure integral
    form of the two-sample Cramér–von Mises statistic.

    Cost note: the three passes (quantile cuts, per-bucket counts, the
    stats pass) read ONE materialization of the tagged union
    (``localCheckpoint`` of the slim (v, s) projection — r6; the blocks
    are released by the context cleaner once the returned DataFrame is
    dropped, so nothing outlives the caller's last action). Inputs on
    expensive lineage (joins, UDF scoring) are therefore computed
    exactly once regardless.
    """
    right_col = right_col or left_col
    spark = left.sparkSession
    # buckets are PARALLELISM units, not precision — the statistics
    # are exact at any p. Cap at 256: beyond that the p-1 chained
    # when() cut expressions stop buying wall-clock and start costing
    # Catalyst tree depth / codegen size (same ballooning-expression
    # class streaming/profile.py guards with its 512-bucket limit),
    # and defaultParallelism on a real cluster can be in the
    # thousands.
    p = min(num_partitions or spark.sparkContext.defaultParallelism,
            256)

    u = (tagged_union(left, left_col, right, right_col)
         .localCheckpoint(eager=True))
    ub = bucketed(u, p)
    by_b, offsets, n0, n1 = bucket_stats(ub, with_minmax=True)
    if n0 == 0 or n1 == 0:
        raise ValueError(f"{caller}: a side has no non-null values")

    boundary = 0.0
    order = sorted(by_b)
    for b_prev, b_next in zip(order, order[1:]):
        c0, c1 = offsets[b_next]
        boundary += (abs(c0 / n0 - c1 / n1)
                     * (by_b[b_next]["min_v"] - by_b[b_prev]["max_v"]))

    def _part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        best = 0.0        # KS: running sup of closed-group |F diff|
        total = 0.0       # W1: running interior integral
        sq = 0.0          # CvM: Σ pooled-count · (F diff)² per group
        cur_b = None
        run0 = run1 = 0
        prev_v = None
        prev_d = None     # |F_l - F_r| after the last-seen value group
        open_cnt = 0      # rows of the still-open tie group

        def close_group():
            nonlocal best, sq, open_cnt
            best = max(best, prev_d)
            sq += prev_d * prev_d * open_cnt
            open_cnt = 0

        for pdf in batches:
            for b_val, grp in pdf.groupby("b", sort=True):
                if b_val != cur_b:
                    if prev_d is not None:  # bucket end closes group
                        close_group()
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
                    # chunk seam on a value change closes prev group
                    total += prev_d * (float(v[0]) - prev_v)
                    close_group()
                ends = np.nonzero(v[:-1] != v[1:])[0]
                if ends.size:
                    best = max(best, float(d[ends].max()))
                    total += float(
                        (d[ends] * (v[ends + 1] - v[ends])).sum())
                    # groups fully inside this chunk: count = gap
                    # between consecutive end indices; the FIRST one
                    # also absorbs the carried open rows
                    bnds = np.concatenate(([-1], ends))
                    cnts = np.diff(bnds).astype(np.float64)
                    cnts[0] += open_cnt
                    open_cnt = 0
                    sq += float((d[ends] * d[ends] * cnts).sum())
                    open_cnt = int(len(v) - 1 - ends[-1])
                else:
                    open_cnt += len(v)
                prev_v = float(v[-1])
                prev_d = float(d[-1])
        if prev_d is not None:  # partition end closes the last group
            close_group()
        yield pd.DataFrame({"local_d": [best], "partial": [total],
                            "sq": [sq]})

    local = (ub.repartition(p, "b")
             .sortWithinPartitions("b", "v")
             .mapInPandas(
                 _part,
                 schema="local_d double, partial double, sq double"))
    scale = (n0 * n1) / float(n0 + n1) ** 2
    return (local.agg(
        F.round(F.max("local_d"), round_to).alias("d"),
        F.round(F.sum("partial") + F.lit(boundary), round_to)
        .alias("w1"),
        F.round(F.sum("sq") * F.lit(scale), round_to).alias("cvm"))
        .select("d", "w1", "cvm",
                F.lit(n0).cast("long").alias("n_left"),
                F.lit(n1).cast("long").alias("n_right")))
