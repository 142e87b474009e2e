"""Port of the reference's deep-nesting location golden
(derive_tests/tests/error_location.rs:52-190 `with_complex_nesting`):
a two-level struct tree with arrays of structs, maps of structs, and a
custom rule that renames its error field — exactly 7 violations with
the reference's JSON-pointer locations.
"""

import datetime as dt

from validify_spark import RuleSet, ValidationEngine, iter_, \
    map_values_, range_
from validify_spark.rules import Rule

RUN_TS = dt.datetime(2024, 6, 15)

DDL = (
    "id int, "
    "first struct<"
    "  grandchildren: struct<extra_limbs: int>,"
    "  invalid_grandchildren: array<struct<head_count: int>>,"
    "  map: map<string, struct<psionic_manifestations: int,"
    "           transdimensional_accumulated_knowledges: int>>>, "
    "second struct<"
    "  grandchildren: struct<psionic_manifestations: int,"
    "           transdimensional_accumulated_knowledges: int>,"
    "  invalid_grandchildren: array<struct<defects: int>>,"
    "  more_invalid: array<struct<head_count: int>>>"
)

FAMILY = (
    1,
    (  # first
        (1,),                    # grandchildren.extra_limbs = 1 (max 0)
        [(1,), (0,), (1,)],      # invalid_grandchildren[1] bad
        {"fine": (0, 0), "bad": (3, 1)},  # map['bad'].psionic = 3 (max 2)
    ),
    (  # second
        (1_000_000, 1_000_000_000),  # both out of [0, 2]
        [(0,), (1,), (3,)],          # defects[2] = 3 (custom, renamed)
        [(2,), (0,)],                # more_invalid[1].head_count = 0
    ),
)


def test_complex_family_locations(spark):
    df = spark.createDataFrame([FAMILY], DDL)
    rules = [
        range_("first.grandchildren.extra_limbs", max=0),
        iter_("first.invalid_grandchildren",
              Rule(kind="range", column="head_count",
                   params={"min": 1, "max": None})),
        map_values_("first.map",
                    Rule(kind="range", column="psionic_manifestations",
                         params={"min": 0, "max": 2})),
        map_values_(
            "first.map",
            Rule(kind="range",
                 column="transdimensional_accumulated_knowledges",
                 params={"min": 0, "max": 2})),
        range_("second.grandchildren.psionic_manifestations",
               min=0, max=2),
        range_("second.grandchildren."
               "transdimensional_accumulated_knowledges", min=0, max=2),
        iter_("second.invalid_grandchildren",
              Rule(kind="custom", column="defects",
                   params={"builder": lambda c: c <= 2},
                   code="bla", display_name="obfuscated")),
        iter_("second.more_invalid",
              Rule(kind="range", column="head_count",
                   params={"min": 1, "max": None})),
    ]
    eng = ValidationEngine(RuleSet(rules=rules), key_cols=["id"],
                           run_ts=RUN_TS)
    locs = sorted(r["location"] for r in eng.violations(df).collect())
    assert locs == sorted([
        "/first/grandchildren/extra_limbs",
        "/first/invalid_grandchildren/1/head_count",
        "/first/map/bad/psionic_manifestations",
        "/second/grandchildren/psionic_manifestations",
        "/second/grandchildren/transdimensional_accumulated_knowledges",
        "/second/invalid_grandchildren/2/obfuscated",  # renamed field
        "/second/more_invalid/1/head_count",
    ])
