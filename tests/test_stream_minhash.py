"""Streaming MinHash-LSH near-dup: per-row signatures are
value-identical to the batch groupBy signatures; a near-dup arriving
in a later micro-batch is caught; the stream's pair set equals the
batch op's banded candidate set on the union."""

import time as _time

import pytest
from pyspark.sql import functions as F

from validify_spark.pipeline.dedup import (minhash_lsh_pairs,
                                           minhash_signatures)
from validify_spark.streaming import stream_minhash_pairs
from validify_spark.streaming.minhash import minhash_signature_expr

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi "
          "psi omega one two three four five six seven eight").split()
BASE = " ".join(_WORDS)
EDIT = " ".join(w if w != "two" else "twoz" for w in _WORDS)  # near-dup
OTHER = ("completely unrelated text about database systems and "
         "distributed query planning with vectorized execution")

DDL = "doc_id long, text string, ts_s string"


def _mk(spark, rows):
    return (spark.createDataFrame(rows, DDL)
            .select("doc_id", "text",
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
    q = (stream_minhash_pairs(stream, ts_col="ts", **kw)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/{name}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return {(r.id_a, r.id_b) for r in
            spark.sql(f"SELECT * FROM {name}").collect()}


def test_rowwise_signatures_equal_batch(spark):
    """The streaming per-row signature expression produces exactly the
    batch minhash_signatures values (same md5 keyspace, same min)."""
    docs = _mk(spark, [(1, BASE, "2024-01-01T00:00:00"),
                       (2, EDIT, "2024-01-01T00:00:01"),
                       (3, OTHER, "2024-01-01T00:00:02"),
                       (4, "too short", "2024-01-01T00:00:03")])
    batch = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(16))
             for r in minhash_signatures(docs).collect()}
    roww = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(16))
            for r in docs.select(
                "doc_id", *minhash_signature_expr(F.col("text")))
            .filter(F.col("h0").isNotNull()).collect()}
    assert roww == batch
    assert 4 not in roww  # < n words: no shingles, no signature


def test_cross_batch_near_dup_and_batch_candidate_parity(spark, tmpdir):
    b1 = [(1, BASE, "2024-01-01T00:00:00"),
          (2, OTHER, "2024-01-01T00:01:00")]
    b2 = [(10, BASE, "2024-01-01T00:10:00"),   # exact dup of batch-1 doc
          (11, EDIT, "2024-01-01T00:11:00"),   # near-dup
          (12, OTHER + " extra words here", "2024-01-01T00:12:00")]
    got = _run_stream(spark, tmpdir, "mh_stream", [b1, b2],
                      ttl="1 hour", watermark="1 hour")
    # the exact dup of doc 1 arriving a batch later IS caught
    assert (1, 10) in got
    # unrelated docs never pair with the BASE family
    assert not any({a, b} & {2, 12} and {a, b} & {1, 10, 11}
                   for a, b in got)

    # pair-set parity: stream candidates == batch banded candidates on
    # the union (threshold=0 keeps every candidate; sets compare on
    # ids — the stream reports estimated, the batch exact, Jaccard)
    batch = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(
        _mk(spark, b1 + b2), threshold=0.0).collect()}
    assert got == batch


def test_ttl_bounds_matching(spark, tmpdir):
    # the same doc re-arrives 3h later under a 1h ttl: no pair
    b1 = [(1, BASE, "2024-01-01T00:00:00")]
    b2 = [(2, BASE, "2024-01-01T03:00:00")]
    got = _run_stream(spark, tmpdir, "mh_ttl", [b1, b2],
                      ttl="1 hour", watermark="10 minutes")
    assert got == set()


def test_bad_specs_raise(spark):
    df = _mk(spark, [(1, BASE, "2024-01-01T00:00:00")])
    with pytest.raises(ValueError, match="must divide"):
        stream_minhash_pairs(df, num_perm=16, bands=5)
    with pytest.raises(ValueError, match="integral column"):
        stream_minhash_pairs(df.withColumn(
            "doc_id", F.col("doc_id").cast("string")))


def test_corpus_parity_500_docs(spark, tmpdir):
    """Full 500-doc testdata corpus streamed in 2 micro-batches must
    reproduce the batch banded-candidate pair set exactly — the
    bucket-collision / multi-band regime a handful of crafted docs
    can't reach."""
    docs = (spark.read
            .parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) +
                        F.make_interval(
                            secs=F.col("doc_id").cast("double"))))
    src = f"{tmpdir}/mh_corpus_src"
    docs.where("doc_id < 250").coalesce(1) \
        .write.mode("append").parquet(src)
    _time.sleep(1.1)
    docs.where("doc_id >= 250").coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_minhash_pairs(stream, ts_col="ts", ttl="1 hour")
         .writeStream.format("memory").queryName("mh_corpus")
         .option("checkpointLocation", f"{tmpdir}/mh_corpus_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r.id_a, r.id_b)
           for r in spark.sql("SELECT * FROM mh_corpus").collect()}
    batch = {(r.id_a, r.id_b)
             for r in minhash_lsh_pairs(docs, threshold=0.0).collect()}
    assert got == batch
    # the corpus genuinely exercises multi-doc buckets (28 candidate
    # pairs observed; MinHash banding is far stricter than SimHash's)
    assert len(batch) > 10
