"""Modifier pipeline goldens, ported from the reference
(derive_tests/tests/modify.rs:31-48,106-134; validify.rs:15-32,100-124).
"""

import pyspark.sql.functions as F
import pytest

from validify_spark import (
    RuleSet, ValidationEngine, capitalize, length, lowercase, trim,
    uppercase,
)


def _normalize_one(spark, value, modifiers, column="a"):
    df = spark.createDataFrame([(value,)], f"{column} string")
    rs = RuleSet(rules=[], modifiers=modifiers)
    eng = ValidationEngine(rs, key_cols=[column])
    return eng.normalize(df).collect()[0][0]


def test_trim_lowercase(spark):
    # modify.rs golden: '   LOWER ME     ' -> trim, lowercase -> 'lower me'
    out = _normalize_one(spark, "   LOWER ME     ",
                         [trim("a"), lowercase("a")])
    assert out == "lower me"


def test_trim_uppercase(spark):
    out = _normalize_one(spark, "  makemeshout   ",
                         [trim("a"), uppercase("a")])
    assert out == "MAKEMESHOUT"


def test_chain_trim_lower_capitalize(spark):
    # modify.rs:89-126: '           hELLO world    ' -> 'Hello world'
    out = _normalize_one(spark, "           hELLO world    ",
                         [trim("a"), lowercase("a"), capitalize("a")])
    assert out == "Hello world"


def test_capitalize_is_first_char_only_not_initcap(spark):
    out = _normalize_one(spark, "hello WORLD again", [capitalize("a")])
    assert out == "Hello WORLD again"  # rest untouched; NOT initcap


def test_trim_unicode_whitespace(spark):
    # Rust str::trim trims Unicode whitespace, not just ASCII space
    out = _normalize_one(spark, "   x  ", [trim("a")])
    assert out == "x"


def test_array_modifiers_map_over_elements(spark):
    # validify.rs:15-32: ['    lmeo    ', ' lm ao  '] -> ['LMEO', 'LM AO']
    df = spark.createDataFrame([(["    lmeo    ", " lm ao  "],)],
                               "tags array<string>")
    rs = RuleSet(rules=[], modifiers=[trim("tags"), uppercase("tags")])
    eng = ValidationEngine(rs, key_cols=["tags"])
    assert eng.normalize(df).collect()[0][0] == ["LMEO", "LM AO"]


def test_modify_then_validate_order(spark):
    # validify.rs:100-124: trim+lowercase before length(equal=8) makes
    # '   LOWER ME     ' (16 chars raw) pass as 'lower me' (8 chars)
    df = spark.createDataFrame([(1, "   LOWER ME     ")], "id int, a string")
    rs = RuleSet(rules=[length("a", equal=8)],
                 modifiers=[trim("a"), lowercase("a")])
    eng = ValidationEngine(rs, key_cols=["id"])
    res = eng.validate(df)
    assert res.violations.count() == 0
    assert res.normalized.collect()[0]["a"] == "lower me"


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id int, a string")
    rs = RuleSet(rules=[], modifiers=[trim("a"), capitalize("a")])
    eng = ValidationEngine(rs, key_cols=["id"])
    assert eng.normalize(df).collect()[0]["a"] is None


def test_nested_struct_modifier(spark):
    df = spark.createDataFrame([(1, ("  x  ",))],
                               "id int, nested struct<a: string>")
    rs = RuleSet(rules=[], modifiers=[trim("nested.a")])
    eng = ValidationEngine(rs, key_cols=["id"])
    assert eng.normalize(df).collect()[0]["nested"]["a"] == "x"
