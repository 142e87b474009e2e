"""Bucketed co-located joins: the 100 TB shuffle-avoidance path.
Verifies via the physical plan that joining/aggregating two tables
bucketed on the same key needs NO shuffle Exchange, while the
unbucketed equivalent does. Broadcast is disabled for the join test so
the planner actually has to co-locate (with broadcast on, the small
side would be broadcast and bucketing bypassed — also fine, also
shuffle-free, but not what's under test)."""

import shutil

import pytest
from pyspark.sql import functions as F

from validify_spark.data import generate_turns
from validify_spark.io import exchanges_on, read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    turns = generate_turns(spark, 2000, seed=42)
    convs = (turns.groupBy("conv_id")
             .agg(F.count("*").alias("n_turns")))
    for t in ("turns_b", "convs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(turns, "turns_b", ["conv_id"], n_buckets=8,
                   sort_cols=["conv_id", "turn_idx"])
    write_bucketed(convs, "convs_b", ["conv_id"], n_buckets=8)
    return turns, convs


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_shuffle_free(spark, bucketed, no_broadcast):
    turns, convs = bucketed
    tb = read_bucketed(spark, "turns_b")
    cb = read_bucketed(spark, "convs_b")
    joined_b = tb.join(cb, "conv_id").select("conv_id", "turn_idx",
                                             "n_turns")
    joined_plain = turns.join(convs, "conv_id").select(
        "conv_id", "turn_idx", "n_turns")
    # same rows...
    assert joined_b.count() == joined_plain.count()
    # ...but the bucketed join plans zero shuffles, the plain one >= 1
    assert exchanges_on(joined_b) == 0
    assert exchanges_on(joined_plain) >= 1
    # and the scan really is bucket-pruned co-located input
    plan = joined_b._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan


def test_bucketed_groupby_is_shuffle_free(spark, bucketed):
    tb = read_bucketed(spark, "turns_b")
    agg = tb.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert exchanges_on(agg) == 0
    assert agg.count() > 0
