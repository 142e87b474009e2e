"""Streaming whole-conversation rules: the SAME (code, fn) pandas
rules as the batch operator, evaluated at session-gap finalize, emit
the same violations the batch pandas tier produces on the union of
all micro-batches — plus cross-batch accumulation, session-gap
fragmentation, and the native-session_window aggregate tier."""

import time as _time

import pytest
from pyspark.sql import functions as F

from validify_spark.checks import conversation_rules
from validify_spark.streaming import (stream_conversation_rules,
                                      stream_conversation_rules_agg)

DDL = "conv_id string, turn_idx long, role string, text string, ts_s string"

# the same fns drive batch pandas tier AND the stream (the parity
# contract): compare values, not dtypes
PRULES = [
    ("has_assistant", lambda p: (p["role"] == "assistant").any()),
    ("text_budget_15", lambda p: p["text"].str.len().sum() <= 15),
    ("ends_assistant", lambda p: p["role"].iloc[-1] == "assistant"),
]


def _agg_rules():
    return [
        ("has_assistant", F.max(F.col("role") == "assistant")),
        ("text_budget_15", F.sum(F.length("text")) <= 15),
        ("ends_assistant",
         F.max_by("role", F.col("ts").cast("long")) == "assistant"),
    ]


def _mk(spark, rows):
    return (spark.createDataFrame(rows, DDL)
            .select("conv_id", "turn_idx", "role", "text",
                    F.col("ts_s").cast("timestamp").alias("ts")))


def _drive(spark, tmpdir, name, batches, build):
    """Write each batch as one parquet file (distinct mtimes => file
    source batch order), run build(stream) through a checkpointed
    memory sink with availableNow, return the sink rows."""
    src_dir = f"{tmpdir}/{name}_src"
    schema = None
    for b in batches:
        df = _mk(spark, b)
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src_dir)
        _time.sleep(1.1)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (build(stream)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/{name}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


# far-future lone row advancing the watermark past every real
# conversation's gap; its own conv never finalizes (pandas tier) /
# its session stays open (agg tier)
FLUSH = [("zz_flush", 0, "user", "x", "2024-02-01T00:00:00")]

# c1 spans both batches; ONLY the union passes has_assistant and
# ends_assistant. c2 has no assistant and busts the text budget.
# c3 ends on 'user'.
B1 = [("c1", 0, "user", "hi", "2024-01-01T00:00:00"),
      ("c2", 0, "user", "aaaaaaaaaa", "2024-01-01T00:00:10"),
      ("c3", 0, "user", "q", "2024-01-01T00:00:20")]
B2 = [("c1", 1, "assistant", "hello", "2024-01-01T00:01:00"),
      ("c2", 1, "user", "bbbbbbbbbb", "2024-01-01T00:01:10"),
      ("c3", 1, "assistant", "a", "2024-01-01T00:01:30"),
      ("c3", 2, "user", "ty", "2024-01-01T00:01:40")]
EXPECTED = {("c2", "has_assistant"), ("c2", "text_budget_15"),
            ("c2", "ends_assistant"), ("c3", "ends_assistant")}

# one conv_id, two episodes 2h apart (gap 30m): episode 1 is clean,
# episode 2 is all-user (no assistant, ends on user)
GAP_ROWS = [("g", 0, "user", "hi", "2024-01-01T00:00:00"),
            ("g", 1, "assistant", "yo", "2024-01-01T00:00:30"),
            ("g", 2, "user", "back", "2024-01-01T02:00:00"),
            ("g", 3, "user", "???", "2024-01-01T02:00:10")]


def test_cross_batch_finalize_and_batch_parity(spark, tmpdir):
    rows = _drive(spark, tmpdir, "convrules_stream", [B1, B2, FLUSH],
                  lambda s: stream_conversation_rules(
                      s, PRULES, ts_col="ts", watermark="10 minutes",
                      session_gap="30 minutes"))
    got = {(r.conv_id, r.code) for r in rows}
    assert got == EXPECTED
    # every emitted row carries its fragment's start time
    assert all(r.session_start is not None for r in rows)

    # batch parity: same fns, union of all turns (flush row excluded —
    # it never finalizes in the stream)
    batch = {(r["conv_id"], r["code"])
             for r in conversation_rules(
                 _mk(spark, B1 + B2), pandas_rules=PRULES).collect()}
    assert batch == got


def test_session_gap_fragments_judged_separately(spark, tmpdir):
    rows = _drive(spark, tmpdir, "convrules_gap", [GAP_ROWS, FLUSH],
                  lambda s: stream_conversation_rules(
                      s, PRULES, ts_col="ts", watermark="10 minutes",
                      session_gap="30 minutes"))
    got = {(r.conv_id, str(r.session_start), r.code) for r in rows}
    # episode 1 (00:00) is clean; episode 2 (02:00) is all-user — the
    # session_start column attributes each violation to its episode
    assert got == {("g", "2024-01-01 02:00:00", "has_assistant"),
                   ("g", "2024-01-01 02:00:00", "ends_assistant")}


def test_agg_tier_session_window_parity(spark, tmpdir):
    # the same conversations driven through the fully-JVM
    # session_window aggregate path
    rows = _drive(spark, tmpdir, "convrules_agg", [B1, B2, FLUSH],
                  lambda s: stream_conversation_rules_agg(
                      s, _agg_rules(), ts_col="ts",
                      watermark="10 minutes", session_gap="30 minutes"))
    got = {(r.conv_id, r.code) for r in rows}
    assert got == EXPECTED

    # batch agg-tier parity on the union (ts-ordered closer rule)
    batch = {(r["conv_id"], r["code"])
             for r in conversation_rules(
                 _mk(spark, B1 + B2), agg_rules=_agg_rules()).collect()}
    assert batch == got


def test_agg_tier_session_fragments(spark, tmpdir):
    # native session windows judge the two episodes separately (same
    # split semantics as the stateful pandas twin) with distinct
    # session_starts
    rows = _drive(spark, tmpdir, "agg_gap", [GAP_ROWS, FLUSH],
                  lambda s: stream_conversation_rules_agg(
                      s, _agg_rules(), ts_col="ts",
                      watermark="10 minutes", session_gap="30 minutes"))
    got = {(r.conv_id, str(r.session_start), r.code) for r in rows}
    assert got == {("g", "2024-01-01 02:00:00", "has_assistant"),
                   ("g", "2024-01-01 02:00:00", "ends_assistant")}


def test_null_idx_order_parity_with_batch(spark, tmpdir):
    # a NULL-turn_idx system preamble must order FIRST in both the
    # batch pandas tier (na_position='first') and the stream
    # (order_turns None-first): the conversation ends 'assistant' in
    # both, so ends_assistant passes in both
    rows_in = [("n", None, "system", "sys", "2024-01-01T00:00:00"),
               ("n", 0, "user", "hi", "2024-01-01T00:00:05"),
               ("n", 1, "assistant", "yo", "2024-01-01T00:00:10")]
    rule = [("ends_assistant",
             lambda p: p["role"].iloc[-1] == "assistant")]
    rows = _drive(spark, tmpdir, "convrules_null", [rows_in, FLUSH],
                  lambda s: stream_conversation_rules(
                      s, rule, ts_col="ts", watermark="10 minutes",
                      session_gap="30 minutes"))
    stream_got = {(r.conv_id, r.code) for r in rows}
    batch_got = {(r["conv_id"], r["code"])
                 for r in conversation_rules(
                     _mk(spark, rows_in), pandas_rules=rule).collect()}
    assert stream_got == batch_got == set()


def test_bad_specs_raise(spark):
    df = _mk(spark, FLUSH)
    with pytest.raises(ValueError, match="no conversation rules"):
        stream_conversation_rules(df, [])
    with pytest.raises(ValueError, match="must be callable"):
        stream_conversation_rules(df, [("x", 3)])
    with pytest.raises(ValueError, match="unsupported state type"):
        stream_conversation_rules(
            df.withColumn("arr", F.array(F.lit(1))), PRULES)
    with pytest.raises(ValueError, match="no conversation rules"):
        stream_conversation_rules_agg(df, [])
    with pytest.raises(ValueError, match="Column or a 0-arg callable"):
        stream_conversation_rules_agg(df, [("x", "nope")])
