"""Distributed-only checks: stats profile, uniqueness, referential,
drift, ordering — plus the deterministic turns generator."""

import pytest
from pyspark.sql import functions as F

from validify_spark.checks import (
    categorical_histogram, drift_report, ordering_violations,
    referential_orphans, stats_profile, stats_profile_exact,
    uniqueness_violations,
)
from validify_spark.data import (
    generate_conv_meta, generate_turns, standard_turns_ruleset,
)
from validify_spark.engine import ValidationEngine


def test_stats_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "id int, v double")
    prof = {r["column"]: r for r in stats_profile_exact(df).collect()}
    v = prof["v"]
    assert v["n_rows"] == 4 and v["n_nulls"] == 1
    assert v["null_rate"] == 0.25
    assert v["n_distinct"] == 3
    assert float(v["min_value"]) == 10.0 and float(v["max_value"]) == 40.0
    assert v["q50"] == 20.0


def test_stats_profile_sketch_quantile_bounds(spark):
    # GK sketch (percentile_approx default accuracy 10000 ⇒ rank error
    # ≤ n/10000): on uniform 0..10000 each quantile is within ~1% —
    # the error-bound evidence for the no_oracle sketch query
    from validify_spark.checks import stats_profile
    df = spark.range(10001).selectExpr("CAST(id AS DOUBLE) AS v")
    p = {r["column"]: r for r in stats_profile(df, ["v"]).collect()}
    assert abs(p["v"]["q25"] - 2500) <= 110
    assert abs(p["v"]["q50"] - 5000) <= 110
    assert abs(p["v"]["q75"] - 7500) <= 110


def test_stats_profile_sketch_close(spark):
    df = spark.range(0, 10000).withColumn("v", F.col("id") % 1000)
    p = {r["column"]: r for r in stats_profile(df, ["v"]).collect()}
    assert abs(p["v"]["n_distinct"] - 1000) / 1000 < 0.15  # HLL rsd 5%


def test_uniqueness(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1), ("b", 1)],
        "k string, i int")
    dups = {(r["k"], r["i"]): r["dup_count"]
            for r in uniqueness_violations(df, ["k", "i"]).collect()}
    assert dups == {("a", 1): 2, ("b", 1): 3}


def test_referential_orphans(spark):
    child = spark.createDataFrame(
        [("c1",), ("c1",), ("c2",), ("cX",), ("cX",), ("cX",)],
        "conv_id string")
    parent = spark.createDataFrame([("c1",), ("c2",), ("c3",)],
                                   "conv_id string")
    got = {r["conv_id"]: r["n_rows"]
           for r in referential_orphans(
               child, "conv_id", parent, broadcast_parent=True).collect()}
    assert got == {"cX": 3}


def test_drift_identical_is_zero(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "r string")
    h = categorical_histogram(df, "r")
    rep = drift_report(h, h).collect()[0]
    assert rep["psi"] == 0.0 and rep["kl"] == 0.0


def test_drift_detects_shift(spark):
    d1 = spark.createDataFrame([("a",)] * 90 + [("b",)] * 10, "r string")
    d2 = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "r string")
    rep = drift_report(categorical_histogram(d1, "r"),
                       categorical_histogram(d2, "r")).collect()[0]
    assert rep["psi"] > 0.2  # conventional "significant shift" threshold


def test_ordering_violations(spark):
    rows = [
        ("c1", 0, "2024-01-01 00:00:00"),
        ("c1", 1, "2024-01-01 00:01:00"),
        ("c1", 1, "2024-01-01 00:02:00"),   # dup idx
        ("c1", 3, "2024-01-01 00:03:00"),   # gap (2 missing)
        ("c2", 0, "2024-01-01 00:10:00"),
        ("c2", 1, "2024-01-01 00:05:00"),   # ts backwards
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts string") \
              .withColumn("ts", F.to_timestamp("ts"))
    got = sorted((r["conv_id"], r["turn_idx"], r["code"])
                 for r in ordering_violations(df).collect())
    assert got == [("c1", 1, "dup_turn_idx"), ("c1", 3, "turn_idx_gap"),
                   ("c2", 1, "ts_out_of_order")]


# ---------------------------------------------------------------------------
# turns generator + standard ruleset end-to-end
# ---------------------------------------------------------------------------


def test_generate_turns_deterministic(spark):
    a = generate_turns(spark, 2000, seed=42).orderBy("conv_id", "turn_idx",
                                                     "text").collect()
    b = generate_turns(spark, 2000, seed=42).orderBy("conv_id", "turn_idx",
                                                     "text").collect()
    assert a == b
    assert len(a) == 2000


def test_generate_turns_has_pathologies(spark):
    t = generate_turns(spark, 5000, seed=42)
    assert t.filter(F.col("role").isNull() | (F.col("role") == "robot")
                    ).count() > 0
    assert t.filter(F.col("text") == "").count() > 0
    assert t.filter(F.length("text") > 4000).count() > 0
    assert t.filter(F.col("ts").isNull()).count() > 0
    # hot convs present with >>median turns (median block is 8/conv)
    per_conv = t.groupBy("conv_id").count()
    assert per_conv.filter(F.col("count") > 100).count() == 4
    # dup keys exist
    assert uniqueness_violations(t, ["conv_id", "turn_idx"]).count() > 0


def test_standard_ruleset_over_turns(spark):
    # persist: avoid generator-into-predicate pushdown (64 KB codegen)
    t = generate_turns(spark, 3000, seed=42).persist()
    eng = ValidationEngine(standard_turns_ruleset(),
                           key_cols=["conv_id", "turn_idx"])
    summary = {r["code"]: r["n_violations"]
               for r in eng.validate(t).summary().collect()}
    # every injected pathology is caught by some rule
    assert summary.get("required", 0) > 0          # null role/ts
    assert summary.get("length", 0) > 0            # empty + overlong text
    assert summary.get("in", 0) > 0                # 'robot' role
    assert summary.get("non_control_char", 0) > 0  # \x07 texts
    assert summary.get("before_or_equal", 0) > 0   # year-2600 ts


def test_conv_meta_orphans(spark):
    t = generate_turns(spark, 3000, seed=42)
    m = generate_conv_meta(spark, 3000, seed=42)
    orphans = referential_orphans(t, "conv_id", m, broadcast_parent=True)
    assert orphans.count() > 0
    # and hot convs are NOT orphans
    assert orphans.filter(F.col("conv_id").startswith("hot")).count() == 0


def test_heavy_hitters_exact(spark):
    from validify_spark.checks import heavy_hitters
    rows = [(k, 1.0) for k in
            ["a"] * 50 + ["b"] * 30 + ["c"] * 10 + ["d"] * 5 + ["e"] * 5]
    df = spark.createDataFrame(rows, "k string, v double")
    top = heavy_hitters(df, ["k"], k=3).collect()
    assert [(r["k"], r["n_rows"]) for r in top] == \
        [("a", 50), ("b", 30), ("c", 10)]
    # tie at the k boundary breaks by key ascending
    top4 = heavy_hitters(df, ["k"], k=4).collect()
    assert [(r["k"], r["n_rows"]) for r in top4][-1] == ("d", 5)
    # min_share path
    share = heavy_hitters(df, ["k"], min_share=0.25)
    assert {r["k"] for r in share.collect()} == {"a", "b"}
    # extra_aggs piggyback one more metric on the same scan
    extra = heavy_hitters(df, ["k"], k=1,
                          extra_aggs=[F.sum("v").alias("sv")]).collect()
    assert extra[0]["sv"] == 50.0


def test_heavy_hitters_sketch_exact_when_capacity_suffices(spark):
    """capacity >= true distinct ⇒ the MG reduction never fires and the
    sketch equals the exact counts bit-for-bit."""
    from validify_spark.checks import heavy_hitters, heavy_hitters_sketch
    df = (spark.range(2000)
          .selectExpr("CAST(id % 37 AS STRING) AS k")
          .repartition(8))
    exact = {(r["k"], r["n_rows"])
             for r in heavy_hitters(df, ["k"], k=10).collect()}
    sk = {(r["k"], r["n_rows_min"])
          for r in heavy_hitters_sketch(df, ["k"], k=10,
                                        capacity=64).collect()}
    assert sk == exact


def test_heavy_hitters_sketch_lower_bound_and_survival(spark):
    """capacity << distinct: counts are lower bounds and the guaranteed
    heavy key (freq >> n/capacity) always survives the reductions."""
    from validify_spark.checks import heavy_hitters_sketch
    # 1000 rows of 'hot' + 900 singletons, shuffled across partitions
    df = (spark.range(1900)
          .selectExpr("CASE WHEN id % 19 < 10 THEN 'hot' "
                      "ELSE CAST(id AS STRING) END AS k")
          .repartition(8))
    got = heavy_hitters_sketch(df, ["k"], k=1, capacity=16).collect()
    assert got[0]["k"] == "hot"
    assert got[0]["n_rows_min"] <= 1000  # lower bound, never over
    assert got[0]["n_rows_min"] >= 1000 - 1900 // 16  # MG error bound
    # NULL keys are excluded
    df2 = spark.createDataFrame(
        [("a",), (None,), ("a",)], "k string")
    got2 = heavy_hitters_sketch(df2, ["k"], k=5, capacity=8).collect()
    assert {(r["k"], r["n_rows_min"]) for r in got2} == {("a", 2)}


def test_outliers_iqr(spark):
    from validify_spark.checks import outliers_iqr
    rows = ([(i, float(v)) for i, v in enumerate(range(1, 21))]
            + [(100, 1000.0), (101, -500.0), (102, None)])
    df = spark.createDataFrame(rows, "id int, v double")
    out = outliers_iqr(df, ["id"], ["v"], approx=False)
    got = {(r["id"], r["value"]) for r in out.collect()}
    # sorted non-nulls [-500, 1..20, 1000]: q1=5.25, q3=15.75,
    # iqr=10.5 → fences [-10.5, 31.5]: only the two spikes fall out
    assert got == {(100, 1000.0), (101, -500.0)}
    r0 = sorted(out.collect(), key=lambda r: r["id"])[0]
    assert r0["lo"] == -10.5 and r0["hi"] == 31.5
    assert r0["column"] == "v"
    # sketch mode finds the same spikes on this small input
    approx = outliers_iqr(df, ["id"], ["v"], approx=True)
    assert {(r["id"], r["value"])
            for r in approx.collect()} == {(100, 1000.0), (101, -500.0)}
    # round_bounds only rounds the fences, not membership here
    rb = outliers_iqr(df, ["id"], ["v"], approx=False, round_bounds=6)
    assert {(r["id"], r["value"])
            for r in rb.collect()} == {(100, 1000.0), (101, -500.0)}
