"""Rule-coverage report (per-rule fire counts, one scan) and the
streaming transcript diff (stream-vs-reference, stateless)."""

import time as _time

from pyspark.sql import functions as F

import validify_spark as vs
from validify_spark.streaming import stream_transcript_diff


def test_coverage_report_matches_violations(spark):
    df = spark.createDataFrame(
        [(1, "u@example.com", "user", 5.0),
         (2, "not-an-email", "user", -1.0),
         (3, None, "admin", 99.0),
         (4, "x@y.dev", "ghost", 2.0)],
        "id int, contact string, role string, score double")
    rules = [
        vs.required("role"),
        vs.email("contact"),               # NULL passes (Option)
        vs.range_("score", min=0, max=50),
        vs.is_in("role", ["user", "admin", "ghost"]),
        vs.length("id", min=1),            # never fires
    ]
    eng = vs.ValidationEngine(
        vs.RuleSet(rules=rules, name="cov"), key_cols=["id"])
    rep = {r.rule_id: r for r in eng.coverage_report(df).collect()}

    # every rule appears, even zero-fire ones
    assert len(rep) == len(rules)
    assert all(r.n_rows == 4 for r in rep.values())
    by_kind = {r.kind: r for r in rep.values()}
    assert by_kind["email"].n_failed == 1      # row 2; row 3 NULL passes
    assert by_kind["range"].n_failed == 2      # rows 2, 3
    assert by_kind["is_in"].n_failed == 0
    assert by_kind["length"].n_failed == 0
    assert by_kind["range"].fail_rate == 0.5

    # cross-check totals against the violations table: a rule's
    # n_failed == count of distinct keys with a violation for it
    viol = eng.violations(df)
    per_rule = {r.rule_id: r.n for r in
                viol.groupBy("rule_id")
                .agg(F.countDistinct("id").alias("n")).collect()}
    for rid, row in rep.items():
        assert per_rule.get(rid, 0) == row.n_failed, rid


def test_coverage_report_presence_gating(spark):
    """Presence failure suppresses main-rule counts for that row —
    same semantics as violations()."""
    df = spark.createDataFrame(
        [(1, None, "bad"), (2, "k", "also-bad")],
        "id int, payload_key string, v string")
    rules = [
        vs.required("payload_key", stage="presence"),
        vs.length("v", max=2),
    ]
    eng = vs.ValidationEngine(
        vs.RuleSet(rules=rules, name="pg"), key_cols=["id"])
    rep = {r.kind: r for r in eng.coverage_report(df).collect()}
    assert rep["required"].n_failed == 1       # row 1
    assert rep["length"].n_failed == 1         # row 2 only (1 gated)


def test_stream_transcript_diff(spark, tmpdir):
    ref = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, None)],
        "conv_id string, turn_idx int, text string")
    batches = [
        [("c1", 0, "hello"), ("c1", 1, "WORLD!")],   # 1 mutated
        [("c2", 0, None), ("c9", 5, "ghost")],       # NULL==NULL; ghost
    ]
    src = f"{tmpdir}/sd_src"
    for b in batches:
        (spark.createDataFrame(
            b, "conv_id string, turn_idx int, text string")
         .coalesce(1).write.mode("append").parquet(src))
        _time.sleep(1.1)
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_transcript_diff(stream, ref)
         .writeStream.format("memory").queryName("sdiff")
         .option("checkpointLocation", f"{tmpdir}/sd_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r.conv_id, r.turn_idx, r.code)
           for r in spark.sql("SELECT * FROM sdiff").collect()}
    assert got == {("c1", 1, "text_mismatch"),
                   ("c9", 5, "not_in_reference")}

    # digest=False path agrees
    q2 = (stream_transcript_diff(stream, ref, digest=False)
          .writeStream.format("memory").queryName("sdiff2")
          .option("checkpointLocation", f"{tmpdir}/sd_ckpt2")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(300)
    got2 = {(r.conv_id, r.turn_idx, r.code)
            for r in spark.sql("SELECT * FROM sdiff2").collect()}
    assert got2 == got
