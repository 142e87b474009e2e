"""t-digest distributed quantiles: rank-error bound against exact
quantiles on uniform and heavily skewed data, fanout (tree-merge)
equivalence, and exact tails."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from validify_spark.checks.tdigest import tdigest_quantiles

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(values, estimate, prob):
    """|empirical rank of estimate - prob|."""
    return abs(np.searchsorted(np.sort(values), estimate) / len(values)
               - prob)


@pytest.fixture(scope="module")
def skewed(spark):
    # deterministic, heavy right tail: exp(hash-uniform * 8)
    df = (spark.range(0, 120_000, 1, 16)
          .select(F.exp((F.abs(F.xxhash64("id")) % 100000) / 100000.0
                        * 8).alias("v")))
    return df.cache()


def test_rank_error_bound_uniform(spark):
    df = (spark.range(0, 100_000, 1, 16)
          .select(((F.abs(F.xxhash64("id")) % 1_000_000) / 1000.0)
                  .alias("v")))
    vals = np.array([r.v for r in df.collect()])
    q = tdigest_quantiles(df, "v", probs=PROBS, compression=100)
    for p in PROBS:
        err = _rank_error(vals, q[p], p)
        bound = 0.01 if 0.1 <= p <= 0.9 else 0.005  # k1: tighter tails
        assert err < bound, (p, q[p], err)


def test_rank_error_bound_skewed(spark, skewed):
    vals = np.array([r.v for r in skewed.collect()])
    q = tdigest_quantiles(skewed, "v", probs=PROBS, compression=100)
    for p in PROBS:
        err = _rank_error(vals, q[p], p)
        assert err < 0.01, (p, q[p], err)


def test_fanout_tree_merge_close(spark, skewed):
    """The intermediate applyInPandas merge level must stay within the
    same rank-error envelope as the flat driver merge (each merge pass
    is itself a valid digest)."""
    vals = np.array([r.v for r in skewed.collect()])
    flat = tdigest_quantiles(skewed, "v", probs=PROBS)
    tree = tdigest_quantiles(skewed, "v", probs=PROBS, fanout=4)
    for p in PROBS:
        assert _rank_error(vals, tree[p], p) < 0.01, (p, tree[p])
        assert _rank_error(vals, flat[p], p) < 0.01, (p, flat[p])


def test_exact_tails_and_nulls(spark):
    rows = [(float(i),) for i in range(1000)] + [(None,)] * 50
    df = spark.createDataFrame(rows, "v double").repartition(8)
    q = tdigest_quantiles(df, "v", probs=[0.0, 1.0, 0.5])
    assert q[0.0] == 0.0          # exact min
    assert q[1.0] == 999.0        # exact max
    assert abs(q[0.5] - 499.5) < 15

    empty = spark.createDataFrame([(None,)], "v double")
    assert tdigest_quantiles(empty, "v", probs=[0.5])[0.5] is None
