"""Deep nested-location goldens (FIXTURES.md §2c;
derive_tests/tests/nested.rs:341-398, error_location.rs)."""

from validify_spark import RuleSet, ValidationEngine, iter_
from validify_spark.rules import Rule


def test_child_children_allowance_location(spark):
    # nested.rs:375 golden: '/child/children/0/allowance'
    df = spark.createDataFrame(
        [(1, ([([5],), ([1, 2],)],))],
        "id int, child struct<children: array<struct<"
        "allowance: array<int>>>>")
    inner = Rule(kind="length", column="allowance",
                 params={"min": 2, "max": None, "equal": None})
    eng = ValidationEngine(
        RuleSet(rules=[iter_("child.children", inner)]),
        key_cols=["id"])
    v = eng.violations(df).collect()
    assert len(v) == 1
    assert v[0]["location"] == "/child/children/0/allowance"
    assert v[0]["code"] == "length"


def test_prefs_name_location(spark):
    # fx_nested: '/prefs/0/name'
    df = spark.createDataFrame(
        [(1, [("", True), ("ok", False)])],
        "id int, prefs array<struct<name: string, value: boolean>>")
    inner = Rule(kind="length", column="name",
                 params={"min": 1, "max": None, "equal": None})
    eng = ValidationEngine(RuleSet(rules=[iter_("prefs", inner)]),
                           key_cols=["id"])
    v = eng.violations(df).collect()
    assert [r["location"] for r in v] == ["/prefs/0/name"]
