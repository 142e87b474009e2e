"""Source/sink abstraction: Iceberg when a catalog is configured,
plain parquet otherwise (the sandbox fallback — SURVEY.md §2.7).

The engine never depends on Iceberg-only features: checkpoint markers
and audit rows work on any filesystem path, and violation sinks use
plain ``write.parquet`` with dynamic partition overwrite, which both
backends support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_iceberg_ref(ref: str) -> bool:
    # catalog.db.table (no slashes) → treat as a table identifier
    return "/" not in ref and ref.count(".") >= 1


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """``ref``: an Iceberg table identifier (``catalog.db.turns``) or a
    parquet path."""
    if _is_iceberg_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append",
                partition_by: list | None = None) -> None:
    if _is_iceberg_ref(ref):
        w = df.writeTo(ref)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
