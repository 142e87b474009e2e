"""Round-5 hardening: measured codegen-size guard for phase-2 chunk
packing (r4 verdict "what's wrong" #1), and oracle-adjacent checks for
the new guard machinery.

The r4 weight table (engine._KIND_WEIGHT) is an estimate: a `custom`
rule weighs 2 no matter how large the caller's builder expression
really is, so a pathological Column-builder could pack an over-64 KB
chunk and silently fall back to interpreted eval. Round 5 adds a
MEASURED backstop — each packed chunk's generated phase-2 code is
probed over an empty local relation and split until every codegen unit
is under engine._MAX_UNIT_LINES."""

import os
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

import validify_spark as vs
from validify_spark import engine as E
from validify_spark.engine import ValidationEngine
from validify_spark.rules import RuleSet


def _huge_builder(depth):
    def build(col, params=None):
        e = F.lit(True)
        for i in range(depth):
            e = e & F.when(
                F.substring(col, (i % 20) + 1, 3) == F.lit(f"x{i}"),
                F.lit(False)).otherwise(F.length(col) != F.lit(-i - 1))
        return e
    return build


def test_weights_trusted_for_known_kinds(spark):
    """The probe is driver-side codegen work — it must NOT run for
    rulesets of calibrated kinds (the flagship), only when a custom/
    unknown/wrapped-custom rule makes the weight table blind."""
    std = ValidationEngine(RuleSet(rules=[
        vs.length("a", min=1, max=5), vs.email("a"),
        vs.time("b", "before",
                target=__import__("datetime").datetime(2020, 1, 1)),
        vs.iter_("arr", vs.range_(None, min=0, max=1))], name="std"),
        ["k"])
    assert not std._weights_untrusted()
    cus = ValidationEngine(RuleSet(rules=[
        vs.length("a", min=1, max=5),
        vs.custom("a", _huge_builder(3))], name="cus"), ["k"])
    assert cus._weights_untrusted()
    wrapped = ValidationEngine(RuleSet(rules=[
        vs.iter_("arr", vs.custom(None, _huge_builder(3)))],
        name="wrap"), ["k"])
    assert wrapped._weights_untrusted()


def test_measured_guard_splits_oversized_chunks(spark, monkeypatch):
    """With the unit-line bound forced tiny, the guard must split a
    multi-custom chunk down to per-rule branches — and the chunked
    result must stay identical to the fused (barrier=False) path."""
    df = spark.createDataFrame(
        [(i, f"row{i}" * (i % 3 + 1)) for i in range(40)],
        "k long, c string")
    rules = [vs.custom("c", _huge_builder(8), display_name=f"h{j}")
             for j in range(4)]
    eng = ValidationEngine(RuleSet(rules=rules, name="patho"), ["k"])
    empty = spark.createDataFrame([], df.schema)

    # un-patched: 4 tiny customs fit one compilable chunk
    assert eng._refine_chunk_measured(empty, ["k"], rules, True) == [rules]

    monkeypatch.setattr(E, "_MAX_UNIT_LINES", 40)
    split = eng._refine_chunk_measured(empty, ["k"], rules, True)
    assert len(split) > 1, "guard did not split an over-bound chunk"
    assert [r for ch in split for r in ch] == rules  # order preserved

    chunked = {tuple(r) for r in
               eng.violations(df, barrier=True).collect()}
    fused = {tuple(r) for r in
             eng.violations(df, barrier=False).collect()}
    assert chunked == fused


def test_single_oversized_rule_warns_not_loops(spark, monkeypatch):
    monkeypatch.setattr(E, "_MAX_UNIT_LINES", 10)
    eng = ValidationEngine(RuleSet(
        rules=[vs.custom("c", _huge_builder(30))], name="one"), ["k"])
    empty = spark.createDataFrame([], "k long, c string")
    with pytest.warns(UserWarning, match="cannot chunk further"):
        out = eng._refine_chunk_measured(
            empty, ["k"], list(eng.ruleset.main_rules), True)
    assert len(out) == 1


def test_pathological_customs_zero_codegen_fallbacks():
    """End-to-end adjudication of the r4 finding: a ruleset of
    deliberately enormous custom builders must produce ZERO Janino
    `Failed to compile` errors. Runs in a subprocess because the
    signal is JVM stderr, which a pre-launched session's JVM writes to
    its inherited fd — invisible to pytest capture."""
    script = textwrap.dedent("""
        import validify_spark as vs
        from validify_spark.engine import ValidationEngine
        from validify_spark.rules import RuleSet
        from pyspark.sql import functions as F

        def huge(depth):
            def build(col, params=None):
                e = F.lit(True)
                for i in range(depth):
                    e = e & F.when(
                        F.substring(col, (i % 20) + 1, 3) == F.lit(f"x{i}"),
                        F.lit(False)).otherwise(F.length(col) != F.lit(-i - 1))
                return e
            return build

        spark = vs.get_spark("patho", cpus=4, shuffle_partitions=4,
                             driver_memory="4g")
        spark.sparkContext.setLogLevel("WARN")
        df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        rules = [vs.custom("c_comment", huge(200), display_name=f"h{j}")
                 for j in range(16)]
        eng = ValidationEngine(RuleSet(rules=rules, name="patho"),
                               ["c_custkey"])
        print("VIOLATIONS", eng.violations(df).count())
        spark.stop()
    """)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", script], cwd=repo,
                       capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "VIOLATIONS" in r.stdout
    n_failed = r.stderr.count("Failed to compile")
    assert n_failed == 0, (
        f"{n_failed} Janino failed-compiles with pathological custom "
        f"rules:\n{r.stderr[-2000:]}")
