"""Enum-variant analog (reference: per-variant field validation,
validify_derive/src/validate/impl.rs:40-98, derive_tests/tests/enum.rs)
and payload column-existence semantics (validate_from reports `required`
for missing fields, validify_derive/src/payload.rs:123-135,
derive_tests/tests/payload.rs:14-22).
"""

import datetime as dt

from validify_spark import (
    RuleSet, ValidationEngine, email, length, range_, required, trim,
    variant_rules,
)

RUN_TS = dt.datetime(2024, 6, 15, 12, 0, 0)


def _eng(rules, modifiers=(), key=("id",)):
    return ValidationEngine(
        RuleSet(rules=list(rules), modifiers=list(modifiers)),
        key_cols=list(key), run_ts=RUN_TS)


# ---------------------------------------------------------------------------
# variant_rules — analog of derive_tests/tests/enum.rs: each variant's
# fields validate only for rows OF that variant
# ---------------------------------------------------------------------------


def test_variant_rules_gate_by_tag(spark):
    # discriminated union: kind='user' validates email; kind='job'
    # validates priority range; other kinds / NULL tag pass vacuously
    df = spark.createDataFrame(
        [(1, "user", "ok@example.com", None),
         (2, "user", "not-an-email", None),
         (3, "job", None, 5.0),
         (4, "job", None, 99.0),
         (5, "other", "not-an-email", 99.0),  # no rules apply
         (6, None, "not-an-email", 99.0)],    # NULL tag: vacuous pass
        "id int, kind string, contact string, priority double")
    rules = variant_rules("kind", {
        "user": [email("contact")],
        "job": [range_("priority", min=0, max=10)],
    })
    v = _eng(rules).violations(df).collect()
    got = sorted((r["id"], r["code"]) for r in v)
    assert got == [(2, "email"), (4, "range")]


def test_variant_rules_known_only(spark):
    df = spark.createDataFrame(
        [(1, "user"), (2, "mystery")], "id int, kind string")
    rules = variant_rules("kind", {"user": [length("kind", min=1)]},
                          known_only=True)
    v = _eng(rules).violations(df).collect()
    assert [(r["id"], r["code"]) for r in v] == [(2, "in")]


def test_variant_gate_with_presence_stage(spark):
    # gated required: only 'user' rows need contact
    df = spark.createDataFrame(
        [(1, "user", None), (2, "job", None)],
        "id int, kind string, contact string")
    rules = variant_rules("kind", {
        "user": [required("contact")],
    })
    v = _eng(rules).violations(df).collect()
    assert [(r["id"], r["code"]) for r in v] == [(1, "required")]


# ---------------------------------------------------------------------------
# payload column-existence: a rule naming an absent column emits
# `required` for every row instead of AnalysisException
# ---------------------------------------------------------------------------


def test_missing_column_reports_required(spark):
    df = spark.createDataFrame([(1, "x")], "id int, a string")
    v = _eng([length("a", min=1), email("missing_col")]) \
        .violations(df).collect()
    assert len(v) == 1
    r = v[0]
    assert (r["code"], r["location"], r["field"]) == \
        ("required", "/missing_col", "missing_col")


def test_missing_nested_column_reports_required(spark):
    df = spark.createDataFrame([(1, ("x",))],
                               "id int, s struct<a:string>")
    v = _eng([length("s.b", min=1)]).violations(df).collect()
    assert [(r["code"], r["location"]) for r in v] == \
        [("required", "/s/b")]


def test_missing_column_modifier_is_noop(spark):
    df = spark.createDataFrame([(1, " x ")], "id int, a string")
    eng = _eng([length("a", min=1)], modifiers=[trim("a"),
                                                trim("missing")])
    out = eng.normalize(df).collect()
    assert out[0]["a"] == "x"


def test_missing_column_gated_by_variant(spark):
    # the missing column's rule is gated: only 'user' rows fail
    df = spark.createDataFrame(
        [(1, "user"), (2, "job")], "id int, kind string")
    rules = variant_rules("kind", {"user": [required("contact")]})
    v = _eng(rules).violations(df).collect()
    assert [(r["id"], r["code"]) for r in v] == [(1, "required")]


def test_missing_column_presence_gates_main(spark):
    # presence rule on a missing column suppresses main-stage rules
    df = spark.createDataFrame([(1, "no")], "id int, a string")
    v = _eng([required("ghost", stage="presence"),
              length("a", min=99)]).violations(df).collect()
    assert [(r["code"], r["location"]) for r in v] == \
        [("required", "/ghost")]


def test_enum_validify_golden(spark):
    # port of derive_tests/tests/enum_validify.rs: per-variant modifiers
    # run before per-variant rules; the custom modifier rewrites to
    # '   modified   ', trim then strips it, and length(equal=8)
    # validates the result ('modified' = 8 chars -> pass)
    from validify_spark import (custom_modifier, length, trim,
                                variant_modifiers)
    from validify_spark import variant_rules
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "Unnamed", "anything"), (2, "Named", "anything"),
         (3, "Other", "x")],
        "id int, kind string, basic string")
    mods = variant_modifiers("kind", {
        "Unnamed": [custom_modifier(
            "basic", lambda c: F.lit("   modified   ")), trim("basic")],
        "Named": [custom_modifier(
            "basic", lambda c: F.lit("   modified   ")), trim("basic")],
    })
    rules = variant_rules("kind", {
        "Unnamed": [length("basic", equal=8)],
        "Named": [length("basic", equal=8)],
    })
    eng = ValidationEngine(
        RuleSet(rules=rules, modifiers=mods), key_cols=["id"],
        run_ts=RUN_TS)
    norm = {r["id"]: r["basic"] for r in eng.normalize(df).collect()}
    assert norm[1] == "modified" and norm[2] == "modified"
    assert norm[3] == "x"  # other variant untouched by gated modifiers
    assert eng.violations(df).count() == 0

    # invalid case: variant field fails its own rule with the variant
    # field's location; other variants never see that rule
    df2 = spark.createDataFrame(
        [(1, "Unnamed", "short"), (2, "Other", "short")],
        "id int, kind string, basic string")
    eng2 = ValidationEngine(
        RuleSet(rules=variant_rules("kind", {
            "Unnamed": [length("basic", equal=8)]})),
        key_cols=["id"], run_ts=RUN_TS)
    v = eng2.violations(df2).collect()
    assert [(r["id"], r["code"], r["location"]) for r in v] == \
        [(1, "length", "/basic")]


def test_rename_all_camel_case(spark):
    # with_serde.rs:55-79: rename_all=camelCase reports camelCase field
    # names + locations; explicit display_name wins; nested paths only
    # rename the leaf
    from validify_spark import length, rename_all
    df = spark.createDataFrame(
        [(1, "", "1312213", ("",))],
        "id int, snake_case string, snake_case_two string, "
        "nest struct<inner_field: string>")
    rules = rename_all([
        length("snake_case", min=1),
        length("snake_case_two", max=5),
        length("nest.inner_field", min=1),
    ])
    v = _eng(rules).violations(df).collect()
    got = sorted((r["location"], r["field"]) for r in v)
    assert got == [("/nest/innerField", "innerField"),
                   ("/snakeCase", "snakeCase"),
                   ("/snakeCaseTwo", "snakeCaseTwo")]
