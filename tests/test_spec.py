"""Declarative rule specs: named constants (parser.rs:100-107 analog,
derive_tests/tests/length.rs:25-52, in.rs:185-208), JSON round-trip,
custom-function registry."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from validify_spark import (
    ValidationEngine, RuleSpecError, ruleset_from_json,
    ruleset_from_spec, ruleset_to_spec,
)

SPEC = {
    "name": "turns",
    "constants": {"MAX_LEN": 6, "ROLES": ["user", "assistant"]},
    "modifiers": [{"kind": "trim", "column": "text"},
                  {"kind": "lowercase", "column": "role"}],
    "rules": [
        {"kind": "required", "column": "role", "stage": "presence"},
        {"kind": "length", "column": "text", "min": 1, "max": "$MAX_LEN"},
        {"kind": "is_in", "column": "role", "values": "$ROLES"},
        {"kind": "time", "column": "ts", "op": "before",
         "target": "2030-01-01T00:00:00", "inclusive": True},
        {"kind": "iter", "column": "tags",
         "inner": {"kind": "length", "min": 2}},
        {"kind": "schema", "predicate": "n >= 0", "code": "nonneg"},
    ],
}

RUN_TS = dt.datetime(2024, 6, 15)


def test_spec_constants_and_execution(spark):
    rs = ruleset_from_spec(SPEC)
    assert rs.rules[1].params["max"] == 6  # $MAX_LEN folded
    assert rs.rules[2].params["values"] == ["user", "assistant"]
    df = spark.createDataFrame(
        [(1, "USER", " ok ", dt.datetime(2024, 1, 1), ["ab"], 1),
         (2, "bot", "toolongtext", dt.datetime(2031, 1, 1), ["x"], -1)],
        "id int, role string, text string, ts timestamp, "
        "tags array<string>, n int")
    eng = ValidationEngine(rs, key_cols=["id"], run_ts=RUN_TS)
    v = eng.violations(df).collect()
    got = sorted((r["id"], r["code"]) for r in v)
    assert got == [(2, "before_or_equal"), (2, "in"), (2, "length"),
                   (2, "length"), (2, "nonneg")]


def test_spec_json_roundtrip(spark):
    rs = ruleset_from_spec(SPEC)
    spec2 = ruleset_to_spec(rs)
    rs2 = ruleset_from_json(json.dumps(spec2))
    assert len(rs2.rules) == len(rs.rules)
    # same behavior after a round-trip
    df = spark.createDataFrame(
        [(1, "user", "hi", dt.datetime(2024, 1, 1), ["ab"], 1)],
        "id int, role string, text string, ts timestamp, "
        "tags array<string>, n int")
    for r in (rs, rs2):
        eng = ValidationEngine(r, key_cols=["id"], run_ts=RUN_TS)
        assert eng.violations(df).count() == 0


def test_spec_custom_registry(spark):
    spec = {"rules": [{"kind": "custom", "column": "n",
                       "function": "positive", "code": "pos"}]}
    rs = ruleset_from_spec(
        spec, custom_registry={"positive": lambda c: c > 0})
    df = spark.createDataFrame([(1, 5), (2, -5)], "id int, n int")
    v = ValidationEngine(rs, key_cols=["id"]).violations(df).collect()
    assert [(r["id"], r["code"]) for r in v] == [(2, "pos")]
    # round-trip keeps the registry name
    spec2 = ruleset_to_spec(rs)
    assert spec2["rules"][0]["function"] == "positive"


def test_spec_errors():
    with pytest.raises(RuleSpecError, match="unknown constant"):
        ruleset_from_spec({"rules": [
            {"kind": "length", "column": "a", "min": "$NOPE"}]})
    with pytest.raises(RuleSpecError, match="custom_registry"):
        ruleset_from_spec({"rules": [
            {"kind": "custom", "column": "a", "function": "nope"}]})
    with pytest.raises(RuleSpecError, match="ISO-8601"):
        ruleset_from_spec({"rules": [
            {"kind": "time", "column": "a", "op": "before",
             "target": "01/02/2003"}]})
    from validify_spark import RuleSet, custom_modifier
    with pytest.raises(RuleSpecError, match="custom modifiers"):
        ruleset_to_spec(RuleSet(
            rules=[], modifiers=[custom_modifier("a", lambda c: c)]))
