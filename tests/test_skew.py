"""Explicit salting for hot keys (north_rule skew handling)."""

from pyspark.sql import functions as F

from validify_spark.checks import salted_agg, salted_collect_list, with_salt
from validify_spark.data import generate_turns


def test_with_salt_deterministic_and_bounded(spark):
    t = generate_turns(spark, 2000, seed=42)
    a = with_salt(t, n_salts=8).select("__salt")
    vals = {r["__salt"] for r in a.distinct().collect()}
    assert vals <= set(range(8))
    b = with_salt(t, n_salts=8).select("__salt").collect()
    assert a.collect() == b  # deterministic (hash, not rand)


def test_salted_agg_matches_plain_agg(spark):
    t = generate_turns(spark, 5000, seed=42)
    plain = {r["conv_id"]: (r["n"], r["chars"]) for r in
             t.groupBy("conv_id")
              .agg(F.count("*").alias("n"),
                   F.sum(F.length("text")).alias("chars")).collect()}
    salted = {r["conv_id"]: (r["n"], r["chars"]) for r in
              salted_agg(
                  t, ["conv_id"],
                  [F.count("*").alias("pn"),
                   F.sum(F.length("text")).alias("pc")],
                  [F.sum("pn").alias("n"),
                   F.sum("pc").alias("chars")]).collect()}
    assert plain == salted


def test_salted_collect_list(spark):
    t = generate_turns(spark, 2000, seed=42)
    got = salted_collect_list(t, ["conv_id"], "turn_idx", n_salts=4)
    row = got.filter(F.col("conv_id").startswith("hot")).first()
    plain = (t.filter(F.col("conv_id") == row["conv_id"])
             .count())
    assert len(row["turn_idx_list"]) == plain  # no rows lost to salting
