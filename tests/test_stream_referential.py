"""Streaming referential integrity: batch parity, parent refresh
between micro-batches, windowed orphan counts."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from validify_spark.checks import referential_orphans  # noqa: E402
from validify_spark.streaming import (  # noqa: E402
    stream_referential_orphans)


def _run(stream_q, name, checkpoint=None, mode="append"):
    w = (stream_q.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True))
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    try:
        assert q.awaitTermination(120), f"stream {name} hung"
    finally:
        q.stop()


def test_stream_orphans_match_batch(spark, tmpdir):
    src = f"{tmpdir}/turns"
    spark.createDataFrame(
        [("a", 0, "hi"), ("a", 1, "yo"), ("b", 0, "?"), ("c", 0, "x")],
        "conv_id string, turn_idx int, text string").write.parquet(src)
    parent = spark.createDataFrame([("a",), ("c",)], "conv_id string")

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    _run(stream_referential_orphans(stream, "conv_id", parent),
         "orph_stream")
    got = {(r.conv_id, r.turn_idx)
           for r in spark.table("orph_stream").collect()}
    assert got == {("b", 0)}

    batch_keys = {r.conv_id for r in referential_orphans(
        spark.read.parquet(src), "conv_id", parent).collect()}
    assert batch_keys == {k for k, _ in got}


def test_stream_orphans_pick_up_late_parent(spark, tmpdir):
    """The static side is re-resolved per micro-batch: a parent that
    appears between triggers stops flagging its children."""
    src = f"{tmpdir}/turns2"
    pdir = f"{tmpdir}/parent2"
    ckpt = f"{tmpdir}/ckpt2"
    out = f"{tmpdir}/orphans2"
    spark.createDataFrame(
        [("a", 0), ("b", 0)], "conv_id string, turn_idx int"
    ).write.parquet(src)
    spark.createDataFrame([("a",)], "conv_id string").write.parquet(pdir)

    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream_referential_orphans(
                stream, "conv_id", spark.read.parquet(pdir))
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(120), "stream hung"
        finally:
            q.stop()

    run_once()
    assert {(r.conv_id, r.turn_idx)
            for r in spark.read.parquet(out).collect()} == {("b", 0)}

    # b's metadata lands; more b turns arrive in the next micro-batch
    spark.createDataFrame([("b",)], "conv_id string") \
        .write.mode("append").parquet(pdir)
    spark.createDataFrame([("b", 1), ("d", 0)],
                          "conv_id string, turn_idx int") \
        .write.mode("append").parquet(src)
    run_once()
    # the checkpoint resumes at the new files only; b is no longer an
    # orphan there ((b,1) absent), the still-parentless d is flagged
    assert {(r.conv_id, r.turn_idx)
            for r in spark.read.parquet(out).collect()} \
        == {("b", 0), ("d", 0)}


def test_stream_orphans_windowed_counts(spark, tmpdir):
    src = f"{tmpdir}/turns3"
    rows = [("a", i, f"2024-01-01 0{h}:10:00")
            for h in (1, 2) for i in range(3)] + \
           [("z", i, "2024-01-01 01:20:00") for i in range(2)]
    spark.createDataFrame(rows, "conv_id string, turn_idx int, s string") \
        .selectExpr("conv_id", "turn_idx", "CAST(s AS TIMESTAMP) AS ts") \
        .write.parquet(src)
    parent = spark.createDataFrame([("z",)], "conv_id string")

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_referential_orphans(
        stream, "conv_id", parent, ts_col="ts",
        watermark="1 hour", window="1 hour")
    _run(out, "orph_win", mode="complete")
    got = {(str(r.window_start), r.conv_id): r.n_rows
           for r in spark.table("orph_win").collect()}
    assert got == {("2024-01-01 01:00:00", "a"): 3,
                   ("2024-01-01 02:00:00", "a"): 3}
