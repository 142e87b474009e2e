"""Shared machinery for exact two-sample empirical-CDF statistics
(:mod:`.ks`, :mod:`.wasserstein`): deterministic value-bucketing of the
tagged union of two samples, per-bucket counts, and driver-side prefix
offsets. See ks.py's module docstring for why the bucket id must be a
pure function of the value (approxQuantile cut points, not
``repartitionByRange``'s per-action re-sampling)."""

from __future__ import annotations

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
