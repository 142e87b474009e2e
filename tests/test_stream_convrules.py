"""Streaming whole-conversation rules: the SAME (code, fn) pandas
rules as the batch operator, evaluated at session-gap finalize, emit
the same violations the batch pandas tier produces on the union of
all micro-batches — plus cross-batch accumulation and session-gap
fragmentation behavior."""

import time as _time

from pyspark.sql import functions as F

from validify_spark.checks import conversation_rules
from validify_spark.streaming import stream_conversation_rules

DDL = "conv_id string, turn_idx long, role string, text string, ts_s string"

# the same fns drive batch pandas tier AND the stream (the parity
# contract): compare values, not dtypes
PRULES = [
    ("has_assistant", lambda p: (p["role"] == "assistant").any()),
    ("text_budget_15", lambda p: p["text"].str.len().sum() <= 15),
    ("ends_assistant", lambda p: p["role"].iloc[-1] == "assistant"),
]


def _mk(spark, rows):
    return (spark.createDataFrame(rows, DDL)
            .select("conv_id", "turn_idx", "role", "text",
                    F.col("ts_s").cast("timestamp").alias("ts")))


def _run_stream(spark, tmpdir, name, batches, **kw):
    src_dir = f"{tmpdir}/{name}_src"
    schema = None
    for b in batches:
        df = _mk(spark, b)
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)  # distinct mtimes => file source batch order
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (stream_conversation_rules(stream, PRULES, ts_col="ts", **kw)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/{name}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return {(r.conv_id, r.code)
            for r in spark.sql(f"SELECT * FROM {name}").collect()}


# far-future lone row advancing the watermark past every real
# conversation's gap; its own conv never finalizes
FLUSH = [("zz_flush", 0, "user", "x", "2024-02-01T00:00:00")]


def test_cross_batch_finalize_and_batch_parity(spark, tmpdir):
    # c1 spans both batches; ONLY the union passes has_assistant and
    # ends_assistant — per-batch evaluation would wrongly flag it.
    # c2 has no assistant and busts the text budget.
    # c3 ends on 'user'.
    b1 = [("c1", 0, "user", "hi", "2024-01-01T00:00:00"),
          ("c2", 0, "user", "aaaaaaaaaa", "2024-01-01T00:00:10"),
          ("c3", 0, "user", "q", "2024-01-01T00:00:20")]
    b2 = [("c1", 1, "assistant", "hello", "2024-01-01T00:01:00"),
          ("c2", 1, "user", "bbbbbbbbbb", "2024-01-01T00:01:10"),
          ("c3", 1, "assistant", "a", "2024-01-01T00:01:30"),
          ("c3", 2, "user", "ty", "2024-01-01T00:01:40")]
    got = _run_stream(spark, tmpdir, "convrules_stream",
                      [b1, b2, FLUSH],
                      watermark="10 minutes", session_gap="30 minutes")
    expected = {("c2", "has_assistant"), ("c2", "text_budget_15"),
                ("c2", "ends_assistant"), ("c3", "ends_assistant")}
    assert got == expected

    # batch parity: same fns, union of all turns (flush row excluded —
    # it never finalizes in the stream)
    batch = {(r["conv_id"], r["code"])
             for r in conversation_rules(
                 _mk(spark, b1 + b2), pandas_rules=PRULES).collect()}
    assert batch == got


def test_session_gap_fragments_judged_separately(spark, tmpdir):
    # one conv_id, two episodes 2h apart (gap 30m): each fragment is
    # judged alone — episode 1 is clean, episode 2 opens with no
    # assistant and ends on user
    b = [("g", 0, "user", "hi", "2024-01-01T00:00:00"),
         ("g", 1, "assistant", "yo", "2024-01-01T00:00:30"),
         ("g", 2, "user", "back", "2024-01-01T02:00:00"),
         ("g", 3, "user", "???", "2024-01-01T02:00:10")]
    got = _run_stream(spark, tmpdir, "convrules_gap", [b, FLUSH],
                      watermark="10 minutes", session_gap="30 minutes")
    assert got == {("g", "has_assistant"), ("g", "ends_assistant")}


def test_bad_specs_raise(spark):
    import pytest
    df = _mk(spark, FLUSH)
    with pytest.raises(ValueError, match="no conversation rules"):
        stream_conversation_rules(df, [])
    with pytest.raises(ValueError, match="must be callable"):
        stream_conversation_rules(df, [("x", 3)])
    with pytest.raises(ValueError, match="unsupported state type"):
        stream_conversation_rules(
            df.withColumn("arr", F.array(F.lit(1))), PRULES)


def _agg_rules():
    return [
        ("has_assistant", F.max(F.col("role") == "assistant")),
        ("text_budget_15", F.sum(F.length("text")) <= 15),
        ("ends_assistant",
         F.max_by("role", F.col("ts").cast("long")) == "assistant"),
    ]


def _run_agg_stream(spark, tmpdir, name, batches, **kw):
    src_dir = f"{tmpdir}/{name}_src"
    schema = None
    for b in batches:
        df = _mk(spark, b)
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    from validify_spark.streaming import stream_conversation_rules_agg
    q = (stream_conversation_rules_agg(stream, _agg_rules(),
                                       ts_col="ts", **kw)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/{name}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return {(r.conv_id, r.code)
            for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_agg_tier_session_window_parity(spark, tmpdir):
    # the same conversations as the pandas-tier parity test, driven
    # through the fully-JVM session_window aggregate path
    b1 = [("c1", 0, "user", "hi", "2024-01-01T00:00:00"),
          ("c2", 0, "user", "aaaaaaaaaa", "2024-01-01T00:00:10"),
          ("c3", 0, "user", "q", "2024-01-01T00:00:20")]
    b2 = [("c1", 1, "assistant", "hello", "2024-01-01T00:01:00"),
          ("c2", 1, "user", "bbbbbbbbbb", "2024-01-01T00:01:10"),
          ("c3", 1, "assistant", "a", "2024-01-01T00:01:30"),
          ("c3", 2, "user", "ty", "2024-01-01T00:01:40")]
    got = _run_agg_stream(spark, tmpdir, "convrules_agg",
                          [b1, b2, FLUSH],
                          watermark="10 minutes",
                          session_gap="30 minutes")
    expected = {("c2", "has_assistant"), ("c2", "text_budget_15"),
                ("c2", "ends_assistant"), ("c3", "ends_assistant")}
    assert got == expected

    # batch agg-tier parity on the union (ts-ordered closer rule)
    from validify_spark.checks import conversation_rules
    batch = {(r["conv_id"], r["code"])
             for r in conversation_rules(
                 _mk(spark, b1 + b2), agg_rules=_agg_rules()).collect()}
    assert batch == got


def test_agg_tier_session_fragments(spark, tmpdir):
    # two episodes of one conv_id, 2h apart with a 30m gap: native
    # session windows judge them separately (same split semantics as
    # the stateful pandas twin) and report distinct session_starts
    b = [("g", 0, "user", "hi", "2024-01-01T00:00:00"),
         ("g", 1, "assistant", "yo", "2024-01-01T00:00:30"),
         ("g", 2, "user", "back", "2024-01-01T02:00:00"),
         ("g", 3, "user", "???", "2024-01-01T02:00:10")]
    src_dir = f"{tmpdir}/agg_gap_src"
    for batch in [b, FLUSH]:
        _mk(spark, batch).coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)
    stream = (spark.readStream.schema(spark.read.parquet(src_dir).schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    from validify_spark.streaming import stream_conversation_rules_agg
    q = (stream_conversation_rules_agg(
            stream, _agg_rules(), ts_col="ts",
            watermark="10 minutes", session_gap="30 minutes")
         .writeStream.format("memory").queryName("agg_gap")
         .option("checkpointLocation", f"{tmpdir}/agg_gap_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM agg_gap").collect()
    got = {(r.conv_id, str(r.session_start), r.code) for r in rows}
    # episode 1 (00:00) is clean; episode 2 (02:00) is all-user
    assert got == {
        ("g", "2024-01-01 02:00:00", "has_assistant"),
        ("g", "2024-01-01 02:00:00", "ends_assistant"),
    }


def test_agg_tier_bad_specs(spark):
    import pytest
    from validify_spark.streaming import stream_conversation_rules_agg
    df = _mk(spark, FLUSH)
    with pytest.raises(ValueError, match="no conversation rules"):
        stream_conversation_rules_agg(df, [])
    with pytest.raises(ValueError, match="Column or a 0-arg callable"):
        stream_conversation_rules_agg(df, [("x", "nope")])
