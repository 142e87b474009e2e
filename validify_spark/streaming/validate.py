"""Structured Streaming validation.

The rule compiler emits stateless projections/filters, so the exact
same compiled expressions run unchanged on a streaming DataFrame —
``readStream`` → modify → validate → violations stream → ``writeStream``.
Watermarked windowed aggregation gives per-window pass/fail metrics with
late-data tolerance (SURVEY.md steering: watermarks + windowed aggs).

The batch/stream parity is structural, and tested: the violations of a
file-streamed table (availableNow trigger) equal the batch engine's
violations on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine import ValidationEngine


def stream_violations(engine: ValidationEngine,
                      stream_df: DataFrame) -> DataFrame:
    """Violations as a streaming DataFrame (append-mode friendly:
    stateless projection + filter + explode, no aggregation state)."""
    return engine.violations(stream_df)


def stream_partition_metrics(engine: ValidationEngine,
                             stream_df: DataFrame,
                             ts_col: str = "ts",
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Per-event-time-window validation metrics with a watermark for
    late data: (window, n_rows, n_failed_rows, passed). Append output
    mode — windows finalize when the watermark passes."""
    src = engine.normalize(stream_df).withWatermark(ts_col, watermark)
    failed = (~engine._pass_all(src)).cast("long")
    return (src
            .groupBy(F.window(F.col(ts_col), window).alias("window"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(failed).alias("n_failed_rows"))
            .withColumn("passed", F.col("n_failed_rows") == 0))
