"""The reference's flagship end-to-end case: BigBoi
(derive_tests/tests/validify.rs:295-559), ported row-for-row.

Valid row: passes with normalized output matching the reference asserts
(validify.rs:469-478). Invalid row: exactly 11 violations = 2 schema +
9 field (validify.rs:552-558).
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest

import validify_spark as vs
from validify_spark.rules import Rule

WORKING_HOURS = ["08", "09", "10", "11", "12", "13", "14", "15", "16"]
CAREER_LEVEL = ["One", "Two", "Over 9000"]
STATUSES = ["online", "offline", "za refaktorirat al neka ga"]
CONTRACT_TYPES = ["Fulltime", "Temporary"]
ALLOWED_MIME = ["jpeg", "png"]

RUN_TS = dt.datetime(2024, 6, 15, 12, 0, 0)

DDL = """
  id int, title string, status string, city_country string,
  description string, education string,
  type_of_workplace array<string>, working_hours string,
  part_time_period string, contract_type string,
  indefinite_probation_period boolean,
  indefinite_probation_period_duration int,
  career_level string, benefits string, meta_title string,
  meta_description string, meta_image string,
  published_at string, expires_at string,
  languages array<struct<company_opening_id: string, language: string,
                         proficiency: string, required: boolean,
                         created_by: string>>,
  tags struct<names: array<string>>
"""


def _greater_than_now(c):
    # greater_than_now (validify.rs:407-421): parse then >= now;
    # unparseable -> error
    return F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss") >= F.lit(RUN_TS)


def _valid_names(c):
    # validate_names (validify.rs:398-405): one error for the whole Vec
    return F.forall(c, lambda x: (F.length(x) <= 10) & (x != ""))


def bigboi_ruleset() -> vs.RuleSet:
    return vs.RuleSet(
        name="bigboi",
        modifiers=[
            vs.capitalize("city_country"),
            vs.capitalize("type_of_workplace"),
            vs.capitalize("contract_type"),
            vs.capitalize("benefits"),
            vs.trim("languages.language"),
            vs.trim("languages.proficiency"),
            vs.trim("tags.names"),
        ],
        rules=[
            vs.length("title", max=300),
            vs.is_in("status", STATUSES),
            vs.length("description", max=5000),
            vs.length("education", max=1000),
            vs.is_in("working_hours", WORKING_HOURS),
            vs.is_in("contract_type", CONTRACT_TYPES),
            vs.is_in("indefinite_probation_period_duration", [1, 2, 3]),
            vs.is_in("career_level", CAREER_LEVEL),
            vs.length("meta_title", max=60),
            vs.length("meta_description", max=160),
            vs.is_in("meta_image", ALLOWED_MIME),
            vs.custom("published_at", _greater_than_now,
                      code="invalid_date"),
            vs.custom("expires_at", _greater_than_now,
                      code="invalid_date"),
            vs.iter_("languages",
                     Rule(kind="is_in", column="proficiency",
                          params={"values": ["neznam", "sabijam"]})),
            vs.length("tags.names", min=1),
            vs.custom("tags.names", _valid_names, code="invalid_name"),
            vs.schema_rule(
                "NOT (contract_type = 'Fulltime' "
                "AND part_time_period IS NOT NULL)",
                code="schema",
                message="Fulltime contract cannot have part time period"),
            vs.schema_rule(
                "NOT (contract_type = 'Fulltime' "
                "AND indefinite_probation_period "
                "AND indefinite_probation_period_duration IS NULL)",
                code="schema"),
        ],
    )


def _valid_row():
    return (1, "al sam velik", "za refaktorirat al neka ga", "gradrzava",
            "kuvaj kavu peri podove ne pitaj nista", "any",
            ["cikuriku", "cheetz"], "08", None, "Fulltime", False, 2,
            "Over 9000", "svasta nesta", "a dokle vise", "ne da mi se",
            "jpeg", "2500-01-01 00:00:00", "2500-01-01 00:00:00",
            [("yolo mcswag", "    tommorrowlang     ",
              "sabijam      ", True, "ja"),
             ("divops", "go", "    neznam", None, "on")],
            (["tag", "tag", "tag"],))


def _invalid_row():
    return (2, "al sam velik", "invalid", "gradrzava",
            "kuvaj kavu peri podove ne pitaj nista", "any",
            ["cikuriku", "cheetz"], "invalid", "", "Fulltime", True,
            None, "Over 100000", "svasta nesta", "a dokle vise",
            "ne da mi se", "heic", "1999-01-01 00:00:00",
            "1999-01-01 00:00:00",
            [("yolo mcswag", "    tommorrowlang     ",
              "invalid      ", True, "ja"),
             ("divops", "go", "    invalid", None, "on")],
            (["taggggggggggggggggggggggggg", "tag", "tag"],))


def test_bigboi_valid_row_passes_with_normalized_output(spark):
    df = spark.createDataFrame([_valid_row()], DDL)
    eng = vs.ValidationEngine(bigboi_ruleset(), key_cols=["id"],
                              run_ts=RUN_TS)
    res = eng.validate(df)
    assert res.violations.count() == 0
    row = res.normalized.collect()[0]
    # validify.rs:469-478 golden normalized values
    assert row["languages"][0]["language"] == "tommorrowlang"
    assert row["languages"][1]["language"] == "go"
    assert row["languages"][0]["proficiency"] == "sabijam"
    assert row["languages"][1]["proficiency"] == "neznam"
    assert row["type_of_workplace"] == ["Cikuriku", "Cheetz"]
    assert row["city_country"] == "Gradrzava"
    assert row["benefits"] == "Svasta nesta"


def test_bigboi_invalid_row_11_violations(spark):
    df = spark.createDataFrame([_invalid_row()], DDL)
    eng = vs.ValidationEngine(bigboi_ruleset(), key_cols=["id"],
                              run_ts=RUN_TS)
    v = eng.violations(df).collect()
    # validify.rs:552-558: exactly 11 = 2 schema + 9 field
    assert len(v) == 11
    schema_errs = [r for r in v if r["location"] == "/"]
    field_errs = [r for r in v if r["location"] != "/"]
    assert len(schema_errs) == 2
    assert len(field_errs) == 9
    codes = sorted(r["code"] for r in field_errs)
    assert codes == ["in", "in", "in", "in", "in", "in",
                     "invalid_date", "invalid_date", "invalid_name"]
    locs = {r["location"] for r in field_errs}
    assert "/languages/0/proficiency" in locs
    assert "/languages/1/proficiency" in locs
    assert "/tags/names" in locs
