"""Streaming SimHash near-dup (r4 verdict "missing #4"): a near-dup
arriving in a later micro-batch of a doc from an earlier batch is
caught; the stream's pair set equals the batch ``simhash_pairs`` on
the union; event-time TTL bounds what an arriving doc can match."""

import time as _time

from pyspark.sql import functions as F

from validify_spark.pipeline import simhash_pairs
from validify_spark.streaming import stream_simhash_pairs

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi "
          "psi omega one two three four five six seven eight nine "
          "ten eleven twelve thirteen fourteen fifteen sixteen "
          "seventeen eighteen nineteen twenty red green blue cyan "
          "magenta yellow black white gray silver gold bronze iron "
          "copper zinc").split()
BASE = " ".join(_WORDS)
# one-token edit picked so the fingerprints land at Hamming distance 1
# (verified offline with the same md5 bit-vote algorithm): 'two'->'twoz'
EDIT = " ".join(w if w != "two" else "twoz" for w in _WORDS)
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
    q = (stream_simhash_pairs(stream, ts_col="ts", **kw)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", f"{tmpdir}/{name}_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return {(r.id_a, r.id_b, r.hamming)
            for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_cross_batch_near_dup_and_batch_parity(spark, tmpdir):
    b1 = [(1, BASE, "2024-01-01T00:00:00"),
          (2, OTHER, "2024-01-01T00:01:00")]
    b2 = [(10, BASE, "2024-01-01T00:10:00"),    # exact dup of batch-1 doc
          (11, EDIT, "2024-01-01T00:11:00"),    # near-dup (1-token edit)
          (12, OTHER + " extra", "2024-01-01T00:12:00")]
    got = _run_stream(spark, tmpdir, "sh_stream", [b1, b2])

    # the doc from batch 1 is matched by batch-2 arrivals — the case a
    # per-batch (stateless) formulation cannot see
    assert (1, 10, 0) in got

    union = _mk(spark, b1).unionByName(_mk(spark, b2))
    batch = {(r.id_a, r.id_b, r.hamming)
             for r in simhash_pairs(union).collect()}
    assert got == batch, (f"stream {sorted(got)} != batch "
                          f"{sorted(batch)}")
    # sanity: this corpus actually exercises near (not only exact) dups
    assert any(h > 0 for _, _, h in batch), batch


def test_ttl_bounds_matchable_history(spark, tmpdir):
    """An identical doc arriving AFTER the ttl window must not pair
    with the stale fingerprint (event-time bounded state)."""
    b1 = [(1, BASE, "2024-01-01T00:00:00")]
    b2 = [(20, BASE, "2024-01-01T03:00:00")]   # 3h later, ttl 1h
    got = _run_stream(spark, tmpdir, "sh_ttl", [b1, b2],
                      ttl="1 hour", watermark="10 hours")
    assert got == set(), f"stale fingerprint matched: {got}"


def test_within_batch_pairs_no_cross_band_dupes(spark, tmpdir):
    """Identical fingerprints agree on ALL four bands — lowest-band
    suppression must still emit the pair exactly once (memory sink
    accumulates every emission, so a dupe would show as extra rows)."""
    b1 = [(1, BASE, "2024-01-01T00:00:00"),
          (2, BASE, "2024-01-01T00:00:30"),
          (3, BASE, "2024-01-01T00:01:00")]
    src = f"{tmpdir}/sh_one_src"
    df = _mk(spark, b1)
    df.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_simhash_pairs(stream, ts_col="ts")
         .writeStream.format("memory").queryName("sh_one")
         .option("checkpointLocation", f"{tmpdir}/sh_one_ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    rows = [(r.id_a, r.id_b, r.hamming)
            for r in spark.sql("SELECT * FROM sh_one").collect()]
    assert sorted(rows) == [(1, 2, 0), (1, 3, 0), (2, 3, 0)]
