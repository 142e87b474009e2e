"""Core validator semantics: length, range, required, is_in/not_in,
contains, regex, non_control_char, must_match + option-null semantics +
violation codes/locations/params (reference derive_tests goldens).
"""

import pytest

from validify_spark import (
    RuleSet, ValidationEngine, contains, contains_not, is_in, length,
    must_match, non_control_char, not_in, range_, regex, required,
    schema_rule,
)
from validify_spark.rules import RuleSpecError


def run(spark, rows, ddl, rules, key=("id",)):
    df = spark.createDataFrame(rows, ddl)
    eng = ValidationEngine(RuleSet(rules=list(rules)), key_cols=list(key))
    return eng.violations(df).collect()


def test_length_chars_not_bytes(spark):
    # traits.rs:26-42: char count — 'héllo' is 5 chars
    v = run(spark, [(1, "héllo"), (2, "toolongvalue")], "id int, a string",
            [length("a", min=1, max=5)])
    assert len(v) == 1 and v[0]["id"] == 2
    assert v[0]["code"] == "length"
    assert v[0]["location"] == "/a"
    assert v[0]["params"]["actual"] == "12"
    assert v[0]["params"]["min"] == "1" and v[0]["params"]["max"] == "5"


def test_length_equal_overrides(spark):
    v = run(spark, [(1, "abc"), (2, "abcd")], "id int, a string",
            [length("a", equal=3)])
    assert len(v) == 1 and v[0]["id"] == 2
    assert v[0]["params"]["equal"] == "3"


def test_length_on_array_counts_elements(spark):
    v = run(spark, [(1, ["a", "b"]), (2, ["a"])], "id int, a array<string>",
            [length("a", min=2)])
    assert len(v) == 1 and v[0]["id"] == 2


def test_length_equal_with_bounds_rejected():
    with pytest.raises(RuleSpecError):
        RuleSet(rules=[length("a", min=1, equal=3)])


def test_range_inclusive_f64(spark):
    # range.rs:4-22: min <= v <= max inclusive, compared as f64
    v = run(spark, [(1, 5), (2, 10), (3, 11), (4, 0)], "id int, a int",
            [range_("a", min=1, max=10)])
    ids = sorted(r["id"] for r in v)
    assert ids == [3, 4]
    assert all(r["code"] == "range" for r in v)


def test_required_fires_on_null_others_skip(spark):
    # fields.rs:355-396: null passes every rule except required
    v = run(spark, [(1, None), (2, "ok")], "id int, a string",
            [required("a"), length("a", min=10)])
    # row 1: required fires, length does NOT (null skips); row 2: length fires
    got = sorted((r["id"], r["code"]) for r in v)
    assert got == [(1, "required"), (2, "length")]


def test_is_in_not_in_codes(spark):
    # validation.rs:186-199: codes 'in' and 'not_in'
    v = run(spark, [(1, "user"), (2, "robot")], "id int, a string",
            [is_in("a", ["user", "assistant"])])
    assert len(v) == 1 and v[0]["code"] == "in"
    v = run(spark, [(1, "ok"), (2, "forbidden")], "id int, a string",
            [not_in("a", ["forbidden", ""])])
    assert len(v) == 1 and v[0]["code"] == "not_in" and v[0]["id"] == 2


def test_contains_string_array_and_negation(spark):
    v = run(spark, [(1, "hello world"), (2, "nope")], "id int, a string",
            [contains("a", "world")])
    assert [r["id"] for r in v] == [2]
    v = run(spark, [(1, ["x", "y"]), (2, ["z"])], "id int, a array<string>",
            [contains("a", "x")])
    assert [r["id"] for r in v] == [2]
    v = run(spark, [(1, "with  double")], "id int, a string",
            [contains_not("a", "  ")])
    assert [r["id"] for r in v] == [1]


def test_regex_unanchored_search(spark):
    # tokens.rs:594-618: Regex::is_match = find anywhere
    v = run(spark, [(1, "xx123yy"), (2, "abc")], "id int, a string",
            [regex("a", r"\d+")])
    assert [r["id"] for r in v] == [2]


def test_non_control_char(spark):
    # non_control_char.rs table: '2H₂ + O₂ ⇌ 2H₂O' true, '\x0c' false
    v = run(spark, [(1, "2H₂ + O₂ ⇌ 2H₂O"), (2, "bad\x0cff"),
                    (3, "c1\x9fx")], "id int, a string",
            [non_control_char("a")])
    assert sorted(r["id"] for r in v) == [2, 3]


def test_must_match(spark):
    v = run(spark, [(1, "a", "a"), (2, "a", "b"), (3, None, None)],
            "id int, x string, y string", [must_match("x", other="y")])
    assert [r["id"] for r in v] == [2]
    assert v[0]["code"] == "must_match"


def test_schema_rule_location_and_coexistence(spark):
    # schema.rs:183-212: schema + field errors coexist; schema location '/'
    v = run(spark, [(1, "yolo", 1), (2, "other", 20)],
            "id int, a string, b int",
            [range_("b", min=1, max=10),
             schema_rule("NOT (a = 'yolo' AND b < 2)", code="fuk")])
    got = sorted((r["id"], r["code"], r["location"]) for r in v)
    assert got == [(1, "fuk", "/"), (2, "range", "/b")]


def test_display_name_renames_location(spark):
    # serde rename analog (with_serde.rs:6-29 → location '/firstName')
    v = run(spark, [(1, "")], "id int, first_name string",
            [length("first_name", min=1, display_name="firstName")])
    assert v[0]["location"] == "/firstName"
    assert v[0]["field"] == "firstName"


def test_nested_struct_column_rule(spark):
    v = run(spark, [(1, ("ab", "x")), (2, ("toolong", "y"))],
            "id int, nested struct<a: string, b: string>",
            [length("nested.a", max=3)])
    assert [r["id"] for r in v] == [2]
    assert v[0]["location"] == "/nested/a"


def test_presence_stage_gates_main(spark):
    # payload/impl.rs:17-53: presence failure suppresses stage-2 rules
    from validify_spark.rules import required as req
    pres = req("a", stage="presence")
    v = run(spark, [(1, None), (2, "x")], "id int, a string",
            [pres, length("a", min=3)])
    got = sorted((r["id"], r["code"]) for r in v)
    assert got == [(1, "required"), (2, "length")]
