"""Round-6 optimization internals: set-digest collapsing inside
``jaccard_pairs`` (docs with identical shingle sets run the quadratic
pair machinery once per representative, results expand back to member
pairs). These tests pin the collapse/expand bookkeeping the oracle
queries can't isolate: inter-group expansion sizes, weighted max_df
document frequencies, and the all-shingles-hot exclusion."""

from validify_spark.pipeline import jaccard_pairs


def _pairs(df, **kw):
    return {(r.id_a, r.id_b): (r.intersection, r.size_a, r.size_b,
                               r.jaccard)
            for r in jaccard_pairs(df, **kw).collect()}


def test_inter_group_expansion_sizes(spark):
    """Two exact-dup groups whose sets are near (but not equal): every
    cross pair appears with the per-slot correct sizes even when member
    ids interleave across groups."""
    # group A (7 tokens -> 5 shingles), ids 1, 4; group B drops the
    # last token (6 -> 4 shingles), ids 2, 3 — so cross pairs mix id
    # order: (1,2) has A in slot a; (2,4) has B in slot a.
    ta = "w0 w1 w2 w3 w4 w5 w6"
    tb = "w0 w1 w2 w3 w4 w5"
    df = spark.createDataFrame(
        [(1, ta), (4, ta), (2, tb), (3, tb)], ["doc_id", "text"])
    got = _pairs(df, n=3, threshold=0.5)
    # jaccard(A,B) = 4/5 = 0.8; intra pairs = 1.0
    assert got[(1, 4)] == (5, 5, 5, 1.0)
    assert got[(2, 3)] == (4, 4, 4, 1.0)
    for a, b in [(1, 2), (1, 3), (2, 4), (3, 4)]:
        i, sa, sb, j = got[(a, b)]
        assert (i, j) == (4, 0.8)
        # size follows the member in the slot: A docs (ids 1,4) have
        # size 5, B docs (ids 2,3) size 4
        assert sa == (5 if a in (1, 4) else 4)
        assert sb == (5 if b in (1, 4) else 4)
    assert len(got) == 6


def test_max_df_weighted_by_group_size(spark):
    """Document frequency under collapsing counts DOCS (group members),
    not representatives: 4 identical docs sharing every shingle push
    df to 4 even though only one rep carries them into the index."""
    t = "a b c d e"
    df = spark.createDataFrame(
        [(i, t) for i in range(4)], ["doc_id", "text"])
    # df=4 for every shingle; max_df=3 drops them all -> capped sets
    # empty -> no pairs at all (docs vanish from the index, and the
    # intra arm must honor that too)
    assert jaccard_pairs(df, n=3, threshold=0.5, max_df=3).count() == 0
    # max_df=4 keeps them: all 6 intra pairs at jaccard 1.0
    got = _pairs(df, n=3, threshold=0.5, max_df=4)
    assert len(got) == 6
    assert all(v == (3, 3, 3, 1.0) for v in got.values())


def test_collapse_no_op_on_distinct_corpus(spark):
    """Fully distinct docs: collapse is the identity, pair results
    match the direct jaccard definition."""
    rows = [(i, " ".join(f"t{i}_{k}" for k in range(6)) + " shared x y")
            for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _pairs(df, n=3, threshold=0.01)
    # each doc: 6 distinct own-prefixed shingles + ("shared x y" border
    # shingles); overlap exists only via the shared suffix
    assert got, "expected at least the shared-suffix pairs"
    for (a, b), (i, sa, sb, j) in got.items():
        assert a < b and 0 < i <= min(sa, sb)
        assert j == round(i / (sa + sb - i), 6)
