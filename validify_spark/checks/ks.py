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

from pyspark.sql import DataFrame

from ._cdf import two_sample_stats


def ks_statistic(left: DataFrame, left_col: str,
                 right: DataFrame, right_col: str | None = None,
                 num_partitions: int | None = None,
                 round_to: int = 6) -> DataFrame:
    """Exact two-sample KS over a numeric column of each side.

    Returns a 1-row DataFrame: (d, n_left, n_right). NULL/NaN values
    are excluded (they have no position on the real line). The scan
    (``_cdf.two_sample_stats``) computes W1 alongside for free — use
    :func:`.cdf_drift` to read both from one pass.
    """
    return two_sample_stats(left, left_col, right, right_col,
                            num_partitions, round_to,
                            "ks_statistic").select(
        "d", "n_left", "n_right")


def cdf_drift(left: DataFrame, left_col: str,
              right: DataFrame, right_col: str | None = None,
              num_partitions: int | None = None,
              round_to: int = 6) -> DataFrame:
    """All three exact CDF drift statistics from ONE pass: (d, w1,
    cvm, n_left, n_right) — KS's sup |F_l − F_r|, Wasserstein-1's
    ∫ |F_l − F_r| dx, and Cramér–von Mises' pooled-measure
    Σ (F_l − F_r)² all read the same after-group CDF differences, so
    a drift monitor wanting any two should call this, not the
    wrappers. The three disagree on purpose: KS is the sup (localized
    gaps), W1 weights by distance (mean shifts), CvM weights by
    pooled mass (body-of-distribution shape changes)."""
    return two_sample_stats(left, left_col, right, right_col,
                            num_partitions, round_to, "cdf_drift")


def cvm_statistic(left: DataFrame, left_col: str,
                  right: DataFrame, right_col: str | None = None,
                  num_partitions: int | None = None,
                  round_to: int = 6) -> DataFrame:
    """Exact two-sample Cramér–von Mises statistic (pooled-empirical-
    measure integral convention, ties read after their whole group —
    see ``_cdf.two_sample_stats``): 1-row (cvm, n_left, n_right)."""
    return two_sample_stats(left, left_col, right, right_col,
                            num_partitions, round_to,
                            "cvm_statistic").select(
        "cvm", "n_left", "n_right")
