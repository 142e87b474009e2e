"""Streaming face of the ruleset fuzzer: the compiler emits stateless
expressions, so ANY generated ruleset must produce the identical
violation set when the same table arrives as a file stream
(readStream + availableNow) instead of a batch scan — the structural
batch/stream parity claim, checked on random rule combinations instead
of one fixed ruleset (tests/test_audit_streaming.py)."""

import random

import pytest
from pyspark.sql import functions as F

import validify_spark as vs
from validify_spark.streaming import stream_violations

from test_fuzz_parity import TABLES, gen_ruleset

SF_DIR = "/root/testdata/sf0.001"
SEEDS = [3, 17, 42, 99, 123, 200]


@pytest.mark.parametrize("seed", SEEDS)
def test_generated_ruleset_stream_equals_batch(spark, tmpdir, seed):
    rng = random.Random(seed)
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    ruleset, _chains = gen_ruleset(rng, spec)
    key = spec["key"]
    strs = spec["strs"]

    df = (spark.read.parquet(f"{SF_DIR}/{table}.parquet")
          .withColumn("arr", F.array(*[F.col(c) for c in strs[:2]]))
          .withColumn("mp", F.create_map(F.lit("k1"), F.col(strs[0]),
                                         F.lit("k2"), F.col(strs[1])))
          .withColumn("st", F.struct(F.col(strs[0]).alias("a"),
                                     F.col(strs[1]).alias("b"))))
    if spec["ts"]:
        # the fuzzer can generate string-target time rules; mirror the
        # fixture's derived column
        from test_fuzz_parity import TSTR_COL, TSTR_FMT_SPARK
        df = df.withColumn(TSTR_COL, F.when(
            F.col(key) % 13 == 0, F.lit("not-a-date")
        ).otherwise(F.date_format(
            F.col(spec["ts"][0]) + F.make_interval(
                days=(F.col(key) % 7 - 3).cast("int")),
            TSTR_FMT_SPARK)))

    eng = vs.ValidationEngine(ruleset, key_cols=[key])
    batch = {tuple(str(x) for x in r) for r in
             eng.violations(df)
                .select(key, "rule_id", "location", "code",
                        F.to_json("params").alias("p")).collect()}

    src = f"{tmpdir}/fuzz_{seed}_src"
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    name = f"fuzz_stream_{seed}"
    q = (stream_violations(eng, stream)
         .select(key, "rule_id", "location", "code",
                 F.to_json("params").alias("p"))
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/fuzz_{seed}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = {tuple(str(x) for x in r) for r in
                spark.sql(f"SELECT * FROM {name}").collect()}
    assert streamed == batch, (
        f"seed={seed} table={table}: stream {len(streamed)} rows vs "
        f"batch {len(batch)}; rules="
        f"{[(r.kind, r.column) for r in ruleset.rules]}")
