"""Driver-contract invariants for __spark_entry__.py: the shapes the
correctness harness depends on, locked down so a future edit can't
silently break the protocol."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

# queries that are rows-only BY DESIGN (sketches / LSH approximation
# have no SQL analog) — everything else must carry an oracle
ROWS_ONLY = {"ann_lsh", "ann_recall", "ann_ivf", "stats_profile_sketch",
             "stats_tdigest", "hot_keys_sketch"}


def test_every_query_is_callable():
    qs = E.queries()
    assert len(qs) >= 53
    assert all(callable(f) for f in qs.values())


def test_oracle_keys_subset_and_coverage():
    qs, oracles = set(E.queries()), E.oracle_sql()
    assert set(oracles) <= qs, "oracle for unknown query"
    missing = qs - set(oracles)
    assert missing == ROWS_ONLY, (
        f"queries without an oracle beyond the documented rows-only "
        f"set: {sorted(missing - ROWS_ONLY)}")
    assert all(isinstance(s, str) and s.strip().upper().startswith(
        ("SELECT", "WITH")) for s in oracles.values())


def test_oracle_queries_inside_driver_window():
    """The correctness driver checks only the FIRST 50 queries()
    entries. Every oracle-bearing query must sit inside that window
    (r3 silently lost coverage of 6 queries to ordering); rows-only
    queries go after position 50."""
    order = list(E.queries())
    oracles = set(E.oracle_sql())
    window = set(order[:50])
    outside = oracles - window
    assert not outside, (
        f"oracle-bearing queries outside the 50-entry check window: "
        f"{sorted(outside)}")
    assert len(oracles) == 50, (
        f"expected exactly 50 oracle-bearing queries filling the "
        f"window, got {len(oracles)}")


def test_entry_runs_flagship(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "code", "location"]
