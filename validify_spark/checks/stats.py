"""Per-column stats profiles (north_star: null-rate, distinct-count via
HLL sketches, min/max, quantiles).

One job / one table scan computes every requested column's stats as a
single wide aggregate row (partial+final hash agg — mergeable across
partitions for free), then unpivots driver-side into a long profile
table. At 10^12 rows this is the only shape that works: sketches
(HLL, approx quantiles) are bounded-size and mergeable; nothing is
collected except the final one-row aggregate.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

PROFILE_QUANTILES = [0.25, 0.5, 0.75]


def _profile_aggs(df: DataFrame, cols: Sequence[str], approx: bool,
                  rsd: float):
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
        if approx:
            aggs.append(
                F.approx_count_distinct(col, rsd).alias(f"{c}__distinct"))
        else:
            aggs.append(F.countDistinct(col).alias(f"{c}__distinct"))
        if isinstance(df.schema[c].dataType, _NUMERIC):
            if approx:
                aggs.append(F.percentile_approx(
                    col, PROFILE_QUANTILES).alias(f"{c}__q"))
            else:
                aggs.append(F.percentile(
                    col, F.array(*[F.lit(q) for q in PROFILE_QUANTILES])
                ).alias(f"{c}__q"))
        else:
            aggs.append(F.lit(None).cast("array<double>").alias(f"{c}__q"))
    return aggs


def _profile(df: DataFrame, columns: Optional[Sequence[str]], approx: bool,
             rsd: float = 0.05) -> DataFrame:
    cols = list(columns or df.columns)
    row = df.agg(*_profile_aggs(df, cols, approx, rsd))
    # unpivot the single wide row into one row per column — stack() is
    # driver-free (still one Spark job, the agg above)
    n = F.col("__n")
    parts = []
    for c in cols:
        parts.append(F.struct(
            F.lit(c).alias("column"),
            n.alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.round(F.col(f"{c}__nulls") / F.greatest(n, F.lit(1)), 6)
             .alias("null_rate"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.round(F.col(f"{c}__q")[0], 6).alias("q25"),
            F.round(F.col(f"{c}__q")[1], 6).alias("q50"),
            F.round(F.col(f"{c}__q")[2], 6).alias("q75"),
        ))
    return (row
            .select(F.explode(F.array(*parts)).alias("s"))
            .select("s.*"))


def stats_profile(df: DataFrame,
                  columns: Optional[Sequence[str]] = None,
                  rsd: float = 0.05) -> DataFrame:
    """Sketch-based profile (HLL distinct, GK quantiles) — the 100 TB
    path. Note: the north_star names t-digest for quantiles; Spark's
    built-in mergeable quantile sketch is Greenwald-Khanna
    (percentile_approx), which serves the same role (bounded-size,
    mergeable, tunable accuracy) JVM-side — a Python t-digest UDAF
    would put the hot path back into per-row Python for no accuracy
    win at the same sketch size. Bounded memory, mergeable partials."""
    return _profile(df, columns, approx=True, rsd=rsd)


def stats_profile_exact(df: DataFrame,
                        columns: Optional[Sequence[str]] = None
                        ) -> DataFrame:
    """Exact profile (countDistinct, exact interpolated percentiles) —
    used for DuckDB-oracle cross-checks at small SF; one extra shuffle
    per distinct column vs the sketch path."""
    return _profile(df, columns, approx=False)
