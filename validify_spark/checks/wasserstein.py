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

from pyspark.sql import DataFrame

from ._cdf import two_sample_stats


def wasserstein_distance(left: DataFrame, left_col: str,
                         right: DataFrame, right_col: str | None = None,
                         num_partitions: int | None = None,
                         round_to: int = 6) -> DataFrame:
    """Exact W1 between the empirical distributions of a numeric
    column of each side.

    Returns a 1-row DataFrame: (w1, n_left, n_right). NULL/NaN are
    excluded. Matches ``scipy.stats.wasserstein_distance`` on the same
    samples (equal-weight empirical measures). The scan
    (``_cdf.two_sample_stats``) computes KS alongside for free — use
    :func:`.ks.cdf_drift` to read both from one pass.
    """
    return two_sample_stats(left, left_col, right, right_col,
                            num_partitions, round_to,
                            "wasserstein_distance").select(
        "w1", "n_left", "n_right")
