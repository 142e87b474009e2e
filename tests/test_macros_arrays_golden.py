"""Golden replays of the reference's remaining compile-behavior test
files: derive_tests/tests/macros.rs (schema_err sugar — two whole-row
errors from one validate, message optional) and
derive_tests/tests/unsupported_array.rs (custom fn on an array-typed
field with a code override)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import validify_spark as vs  # noqa: E402


def test_macros_schema_err_golden(spark):
    """macros.rs schema_err: Test{a:2,b:1,c:'2foio'} yields exactly
    ['a_b' (no message), 'NaN' ('not a number')], both at location '/'
    with no field name (macros.rs:21-39)."""
    df = spark.createDataFrame([(1, 2, 1, "2foio")],
                               "id int, a int, b int, c string")
    rs = vs.RuleSet(rules=[
        vs.schema_rule("NOT (a > b)", code="a_b"),
        vs.schema_rule("c RLIKE '^[0-9]+$'", code="NaN",
                       message="not a number"),
    ])
    eng = vs.ValidationEngine(rs, key_cols=["id"])
    errs = sorted(eng.violations(df).collect(),
                  key=lambda r: r.code)
    assert [e.code for e in errs] == ["NaN", "a_b"]
    by_code = {e.code: e for e in errs}
    assert by_code["a_b"].message is None
    assert by_code["NaN"].message == "not a number"
    for e in errs:
        assert e.location == "/"
        assert e.field is None


def test_custom_rule_on_array_column_golden(spark):
    """unsupported_array.rs: custom fn over an array field — passes
    when arr[0]==1, fails with the overridden code 'meh' otherwise;
    the email field on the same struct stays independent."""
    df = spark.createDataFrame(
        [(1, "bob@bob.com", [0, 0]),
         (2, "bob@bob.com", [1, 1]),
         (3, "bob@bob.com", [0, 1])],
        "id int, val string, array array<int>")
    rs = vs.RuleSet(rules=[
        vs.email("val"),
        vs.custom("array", builder=lambda c: c[0] == 1, code="meh"),
    ])
    eng = vs.ValidationEngine(rs, key_cols=["id"])
    rows = eng.violations(df).collect()
    assert {(r.id, r.code) for r in rows} == {(1, "meh"), (3, "meh")}


def test_custom_rule_on_array_column_all_pass(spark):
    df = spark.createDataFrame([(1, "bob@bob.com", [1, 0])],
                               "id int, val string, array array<int>")
    rs = vs.RuleSet(rules=[
        vs.email("val"),
        vs.custom("array", builder=lambda c: c[0] == 1, code="meh"),
    ])
    assert vs.ValidationEngine(rs, key_cols=["id"]) \
             .validate(df).is_valid()
