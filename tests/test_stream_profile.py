"""Streaming column-profile + drift: batch parity on a file stream."""

import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from validify_spark.data import generate_turns  # noqa: E402
from validify_spark.streaming import (stream_column_profile,  # noqa: E402
                                      stream_drift)

EPS = 1e-6


def _run(stream_q, name):
    q = (stream_q.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(120), \
            f"stream {name} did not finish within 120s"
    finally:
        q.stop()


def test_stream_column_profile_matches_batch(spark, tmpdir):
    turns = generate_turns(spark, 800, seed=7) \
        .filter(F.col("ts").isNotNull()) \
        .withColumn("n", F.length("text"))  # multi-digit ints: typed
    src = f"{tmpdir}/prof_src"               # min/max, not '10' < '2'
    turns.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    prof = stream_column_profile(stream, ["role", "text", "n"],
                                 window="1 hour", watermark="2 hours")
    _run(prof, "prof_stream")
    got = {(r.window_start, r.column):
           (r.n_rows, r.n_null, r.null_rate, r.min, r.max)
           for r in spark.table("prof_stream").collect()}
    assert got, "expected at least one finalized window"

    batch = spark.read.parquet(src).withColumn(
        "w", F.window("ts", "1 hour"))
    for c in ("role", "text", "n"):
        want = (batch.groupBy(F.col("w.start").alias("ws"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col(c).isNull().cast("long")).alias("nn"),
                     F.min(F.col(c)).cast("string").alias("mn"),
                     F.max(F.col(c)).cast("string").alias("mx"))
                .collect())
        for r in want:
            g = got[(r.ws, c)]
            assert g[0] == r.n and g[1] == r.nn
            assert g[2] == round(r.nn / r.n, 6)
            assert (g[3], g[4]) == (r.mn, r.mx)


def test_stream_drift_matches_hand_computed(spark, tmpdir):
    turns = generate_turns(spark, 600, seed=11) \
        .filter(F.col("ts").isNotNull())
    src = f"{tmpdir}/drift_src"
    turns.write.parquet(src)
    batch = spark.read.parquet(src)
    # baseline = the whole corpus's role distribution (driver-side)
    n_total = batch.count()
    baseline = {r["role"] if r["role"] is not None else "__null__":
                r["cnt"] / n_total
                for r in batch.groupBy("role")
                              .agg(F.count(F.lit(1)).alias("cnt"))
                              .collect()}
    stream = spark.readStream.schema(batch.schema).parquet(src)
    d = stream_drift(stream, "role", baseline,
                     window="1 hour", watermark="2 hours")
    _run(d, "drift_stream")
    rows = spark.table("drift_stream").collect()
    assert rows, "expected finalized windows"

    wb = batch.withColumn("w", F.window("ts", "1 hour"))
    for r in rows:
        obs = {(x["role"] if x["role"] is not None else "__null__"):
               x["cnt"]
               for x in wb.filter(F.col("w.start") == r.window_start)
                          .groupBy("role")
                          .agg(F.count(F.lit(1)).alias("cnt"))
                          .collect()}
        n = sum(obs.values())
        assert n == r.n_rows
        buckets = set(baseline) | {"__null__", "__other__"}
        psi = kl = 0.0
        mad = 0.0
        for b in buckets:
            p_raw = obs.get(b, 0) / n
            q_raw = float(baseline.get(b, 0.0))
            p, q = max(p_raw, EPS), max(q_raw, EPS)
            psi += (p - q) * math.log(p / q)
            if p_raw > 0:
                kl += p * math.log(p / q)
            mad = max(mad, abs(p_raw - q_raw))
        assert abs(r.psi - round(psi, 6)) < 1e-5
        assert abs(r.kl - round(kl, 6)) < 1e-5
        assert abs(r.max_abs_diff - round(mad, 6)) < 1e-5


def test_stream_length_drift_self_baseline_near_zero(spark, tmpdir):
    """Length-bucket drift of a stream against ITS OWN batch histogram:
    a window covering the whole data must show ~zero PSI (bucket keys
    must line up exactly with checks/drift.length_histogram)."""
    from validify_spark.checks import length_histogram
    from validify_spark.streaming import stream_length_drift
    # generate_turns plants far-future ts outliers (time-rule fodder);
    # keep one contiguous year so a single window covers everything
    turns = generate_turns(spark, 400, seed=3) \
        .filter(F.col("ts").isNotNull()
                & (F.col("ts") < "2025-01-01"))
    src = f"{tmpdir}/lend_src"
    turns.write.parquet(src)
    batch = spark.read.parquet(src)
    baseline = {r.bucket: r.p
                for r in length_histogram(batch, "text",
                                          bucket_size=20).collect()}
    stream = spark.readStream.schema(batch.schema).parquet(src)
    d = stream_length_drift(stream, "text", baseline, bucket_size=20,
                            window="10 days", watermark="1 hour")
    _run(d, "lend_stream")
    rows = spark.table("lend_stream").collect()
    assert len(rows) == 1 and rows[0].n_rows == batch.count()
    assert rows[0].psi < 1e-4 and rows[0].kl < 1e-4, rows


def test_stream_drift_flags_new_category(spark, tmpdir):
    """A category absent from the baseline lands in __other__ with a
    floored baseline probability — PSI must spike well above the
    same-distribution case."""
    rows = [(f"c{i}", 0, "assistant" if i % 2 else "newrole",
             "t", None, f"2024-01-01 00:{i % 50:02d}:00")
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    src = f"{tmpdir}/newcat_src"
    df.write.parquet(src)
    baseline = {"assistant": 0.5, "user": 0.5}
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    d = stream_drift(stream, "role", baseline,
                     window="1 hour", watermark="2 hours")
    _run(d, "newcat_stream")
    rows = spark.table("newcat_stream").collect()
    assert rows and all(r.psi > 1.0 for r in rows), rows


def test_stream_numeric_drift_baseline_and_alarm(spark, tmpdir):
    """Numeric drift: equal-mass quantile buckets from a batch
    baseline; an identical stream shows ~zero PSI, a shifted stream
    alarms; PSI matches a hand-computed value from the same buckets."""
    import pandas as pd
    from validify_spark.streaming import (numeric_drift_baseline,
                                          stream_numeric_drift)

    rng_vals = [float((7 * i) % 100) for i in range(2000)]
    base_df = spark.createDataFrame(
        pd.DataFrame({"v": rng_vals}))
    cuts, baseline = numeric_drift_baseline(base_df, "v", n_buckets=10)
    assert 1 <= len(cuts) <= 9
    assert abs(sum(baseline.values()) - 1.0) < 1e-9

    # stream 1: same distribution + a few NULLs; stream 2: shifted +40
    same = [(v, "2024-01-01T00:10:00") for v in rng_vals[:1000]] + \
           [(None, "2024-01-01T00:11:00")] * 5
    shifted = [(v + 40.0, "2024-01-01T00:10:00")
               for v in rng_vals[:1000]]
    psis = {}
    for name, rows in (("same", same), ("shift", shifted)):
        src = f"{tmpdir}/nd_{name}"
        (spark.createDataFrame(rows, "v double, ts_s string")
         .select("v", F.col("ts_s").cast("timestamp").alias("ts"))
         .coalesce(1).write.parquet(src))
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        q = stream_numeric_drift(stream, "v", cuts, baseline,
                                 window="1 hour", watermark="2 hours")
        _run(q, f"nd_{name}")
        rows_out = spark.table(f"nd_{name}").collect()
        assert len(rows_out) == 1
        psis[name] = rows_out[0].psi

        # hand-computed PSI from the identical bucketing
        from validify_spark.streaming.profile import _numeric_bucket
        obs = (spark.createDataFrame(rows, "v double, ts_s string")
               .select(F.coalesce(
                   _numeric_bucket(F.col("v"), cuts),
                   F.lit("__null__")).alias("b"))
               .groupBy("b").count().collect())
        n = sum(r["count"] for r in obs)
        got = {r["b"]: r["count"] / n for r in obs}
        exp = 0.0
        for b in set(baseline) | set(got) | {"__null__", "__other__"}:
            p = max(got.get(b, 0.0), EPS)
            qq = max(baseline.get(b, 0.0), EPS)
            exp += (p - qq) * (math.log(p) - math.log(qq))
        assert rows_out[0].psi == round(exp, 6), name

    assert psis["same"] < 0.05 < psis["shift"], psis


def test_stream_numeric_drift_null_bucket_parity(spark, tmpdir):
    """Review regression: NULLs in BOTH baseline and stream must land
    in the same '__null__' bucket — an identical distribution with 10%
    NULLs shows ~zero PSI (the bug routed stream NULLs to '__other__',
    alarming against any null-bearing baseline)."""
    import pandas as pd
    from validify_spark.streaming import (numeric_drift_baseline,
                                          stream_numeric_drift)
    vals = [float(i % 50) for i in range(900)] + [None] * 100
    base_df = spark.createDataFrame(
        pd.DataFrame({"v": pd.array(vals, dtype="Float64")}))
    cuts, baseline = numeric_drift_baseline(base_df, "v", n_buckets=8)
    assert abs(baseline["__null__"] - 0.1) < 1e-9

    rows = [(v, "2024-01-01T00:10:00") for v in vals]
    src = f"{tmpdir}/ndn_src"
    (spark.createDataFrame(rows, "v double, ts_s string")
     .select("v", F.col("ts_s").cast("timestamp").alias("ts"))
     .coalesce(1).write.parquet(src))
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = stream_numeric_drift(stream, "v", cuts, baseline,
                             window="1 hour", watermark="2 hours")
    _run(q, "ndn")
    out = spark.table("ndn").collect()
    assert len(out) == 1 and out[0].psi < 0.01, out
