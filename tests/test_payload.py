"""Serialized-payload entry point — ``T::validify_from(payload)``.

Reference parity: validify_derive/src/payload.rs and
derive_tests payload flows (payload/impl.rs:36-53): deserialize the
payload, report a whole-payload error when deserialization fails, then
run required/presence checks and the main rules over the parsed value.
Here the payload is a JSON-string column and the whole flow is one
``from_json`` (codegen, corrupt-record column) + the standard two-phase
engine — no per-row Python.
"""

import pytest
from pyspark.sql import functions as F

import validify_spark as vs
from validify_spark.payload import validate_json_payload

SCHEMA = "role string, text string"


def _ruleset():
    return vs.RuleSet(rules=[
        vs.required("role", stage="presence"),
        vs.required("text", stage="presence"),
        vs.length("text", min=2, max=64),
    ])


@pytest.fixture(scope="module")
def ingest(spark):
    rows = [
        (1, '{"role":"user","text":"hello world"}'),   # clean
        (2, 'not json {'),                              # malformed
        (3, '[1,2,3]'),                                 # array, not object
        (4, '42'),                                      # scalar, not object
        (5, '{"role":"user"}'),                         # missing field
        (6, '{"role":null,"text":"hi"}'),               # explicit null
        (7, '{"role":"user","text":"x"}'),              # main-rule fail
        (8, None),                                      # no payload at all
        (9, '{"role":"user","text":"ok!","extra":1}'),  # unknown field ok
    ]
    return spark.createDataFrame(rows, "k int, payload string")


def test_deserialization_failures_are_payload_code(ingest):
    _good, viol = validate_json_payload(
        ingest, "payload", SCHEMA, _ruleset(), key_cols=["k"])
    bad = {r["k"]: (r["code"], r["location"])
           for r in viol.filter("code = 'payload'").collect()}
    # malformed JSON, a JSON array, and a JSON scalar all fail WHOLE
    # payload — serde's "expected struct" analog — at location '/'
    assert bad == {2: ("payload", "/"), 3: ("payload", "/"),
                   4: ("payload", "/")}
    raw = {r["k"]: r["params"]["actual"]
           for r in viol.filter("code = 'payload'").collect()}
    assert raw[2] == "not json {"


def test_parsed_rows_run_the_normal_engine(ingest):
    _good, viol = validate_json_payload(
        ingest, "payload", SCHEMA, _ruleset(), key_cols=["k"])
    got = {(r["k"], r["code"], r["location"])
           for r in viol.filter("code <> 'payload'").collect()}
    assert got == {
        (5, "required", "/text"),     # missing field => Option::None
        (6, "required", "/role"),     # explicit null — same thing
        (7, "length", "/text"),       # parsed fine, main rule fires
        (8, "required", "/role"),     # NULL payload: all fields absent
        (8, "required", "/text"),
    }


def test_good_frame_carries_schema_fields_and_keys(ingest):
    good, _viol = validate_json_payload(
        ingest, "payload", SCHEMA, _ruleset(), key_cols=["k"])
    assert good.columns == ["k", "role", "text"]
    rows = {r["k"]: (r["role"], r["text"]) for r in good.collect()}
    # deserialization failures are excluded; rule failures are NOT
    # (anti-join on keys against violations for all-or-nothing)
    assert set(rows) == {1, 5, 6, 7, 8, 9}
    assert rows[1] == ("user", "hello world")
    assert rows[9] == ("user", "ok!")  # unknown fields ignored


def test_modifiers_apply_to_parsed_payload(spark):
    df = spark.createDataFrame(
        [(1, '{"role":"  USER  ","text":"hello"}')], "k int, payload string")
    rs = vs.RuleSet(rules=[vs.is_in("role", values=["user", "assistant"])],
                    modifiers=[vs.trim("role"), vs.lowercase("role")])
    good, viol = validate_json_payload(df, "payload", SCHEMA, rs,
                                       key_cols=["k"])
    assert viol.count() == 0
    assert good.collect()[0]["role"] == "  USER  "  # raw parse, pre-normalize


def test_reserved_corrupt_column_rejected(spark):
    df = spark.createDataFrame([(1, "{}")], "k int, payload string")
    with pytest.raises(ValueError, match="reserved"):
        validate_json_payload(
            df, "payload", "__corrupt_payload string", _ruleset(),
            key_cols=["k"])


def test_dedup_collapses_duplicate_rule_violations(spark):
    df = spark.createDataFrame(
        [(1, '{"role":"user","text":"x"}')], "k int, payload string")
    rs = vs.RuleSet(rules=[vs.length("text", min=2, max=64),
                           vs.length("text", min=2, max=64)])
    _g, viol = validate_json_payload(df, "payload", SCHEMA, rs,
                                     key_cols=["k"], dedup=True)
    assert viol.count() == 1


def test_strict_types_fails_whole_payload_like_serde(spark):
    rows = [
        (1, '{"role":"user","text":"hello","n":1}'),   # clean
        (2, '{"role":"user","text":42,"n":2}'),        # num into string:
                                                        # silent stringify
                                                        # (undetectable)
        (3, '{"role":"user","text":"hi","n":"x"}'),    # str into int
        (4, '{"role":"user","text":"hi","n":7.9}'),    # float into int
        (5, '{"role":"user","text":"hi","n":[1]}'),    # array into int
        (6, '{"role":"user","text":"hi","n":null}'),   # explicit null ok
        (7, '{"role":"user","text":"hi"}'),            # missing key ok
        (8, 'broken{'),                                # still corrupt
    ]
    df = spark.createDataFrame(rows, "k int, payload string")
    rs = vs.RuleSet(rules=[vs.required("role", stage="presence")])
    good, viol = validate_json_payload(
        df, "payload", "role string, text string, n int", rs,
        key_cols=["k"], strict_types=True)
    bad = {r["k"]: r["params"].get("field")
           for r in viol.filter("code = 'payload'").collect()}
    assert set(bad) == {3, 4, 5, 8}
    assert bad[3] == "n" and bad[4] == "n" and bad[5] == "n"
    assert bad[8] is None                     # corrupt, no single field
    assert {r["k"] for r in good.collect()} == {1, 2, 6, 7}
    # the documented undetectable class: number quietly stringifies
    assert good.filter("k = 2").collect()[0]["text"] == "42"


def test_type_mismatch_fails_payload_by_default(spark):
    # measured Spark behavior: PERMISSIVE from_json marks a row corrupt
    # when any field fails type conversion, so serde's invalid-type
    # whole-payload failure holds WITHOUT strict_types — strict_types
    # only adds the params['field'] attribution.
    df = spark.createDataFrame(
        [(1, '{"role":"user","text":"hi","n":"x"}')], "k int, payload string")
    rs = vs.RuleSet(rules=[vs.required("n", stage="presence")])
    _g, viol = validate_json_payload(
        df, "payload", "role string, text string, n int", rs,
        key_cols=["k"])
    rows = viol.collect()
    assert [r["code"] for r in rows] == ["payload"]
    assert "field" not in rows[0]["params"]  # attribution is opt-in


def test_no_python_udfs_in_plan(ingest):
    _good, viol = validate_json_payload(
        ingest, "payload", SCHEMA, _ruleset(), key_cols=["k"])
    plan = viol._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
