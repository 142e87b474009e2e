"""Payload-entry fuzzer: random rulesets driven THROUGH
``validate_json_payload`` vs the same DuckDB oracle.

Each trial serializes a real sf0.001 table row to a JSON payload column
(``to_json(struct(...))``, exact roundtrip through ``from_json``),
corrupts two seeded modulo classes (malformed JSON / JSON array — the
serde "expected struct" failures), generates a random RuleSet with the
test_fuzz_parity generator, and asserts:

  engine violations over the DESERIALIZED payload
      == payload-shape violations (corrupt keys, code='payload' at '/')
       + the plain-table oracle violations restricted to parsed keys.

This is the combinatorial coverage of the ``validify_from`` flow the
fixed presence_gating arm cannot give: gates, presence rules, ghost
columns, modifier chains, iter/map rules, schema rules — all running
over from_json output instead of native parquet columns.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from test_fuzz_parity import (
    SF_DIR,
    TABLES,
    TSTR_COL,
    TSTR_FMT_SPARK,
    UDF_COL,
    UDF_VALUES,
    build_oracle_sql,
    gen_ruleset,
)
from validify_spark.payload import validate_json_payload

MALFORMED_MOD, MALFORMED_RES = 17, 4   # key % 17 == 4 -> 'broken{'
ARRAY_MOD, ARRAY_RES = 23, 5           # key % 23 == 5 -> '[1,2]'


def _trial_count():
    return int(os.environ.get("SPARK_GRAFT_FUZZ_PAYLOAD_N", "40"))


@pytest.fixture(scope="module")
def sources(spark):
    """Same synthetic columns as test_fuzz_parity.sources (arr/mp/st,
    UDF pool column, string time target), NOT shared with it — this
    module caches its own copies."""
    out = {}
    for t, spec in TABLES.items():
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        strs = spec["strs"]
        df = (df
              .withColumn("arr", F.array(*[F.col(c) for c in strs[:2]]))
              .withColumn("mp", F.create_map(
                  F.lit("k1"), F.col(strs[0]),
                  F.lit("k2"), F.col(strs[1])))
              .withColumn("st", F.struct(
                  F.col(strs[0]).alias("a"),
                  F.col(strs[1]).alias("b"))))
        key = spec["key"]
        P = len(UDF_VALUES)
        vals_sql = ", ".join(
            "NULL" if v is None else "'" + v.replace("'", "''") + "'"
            for v in UDF_VALUES)
        df = df.withColumn(UDF_COL, F.expr(
            f"concat(repeat(' ', CAST({key} % 3 AS INT)), "
            f"element_at(array({vals_sql}), "
            f"CAST({key} % {P} AS INT) + 1), "
            f"repeat(' ', CAST({key} % 2 AS INT)))"))
        if spec["ts"]:
            ts0 = spec["ts"][0]
            df = df.withColumn(TSTR_COL, F.when(
                F.col(key) % 13 == 0, F.lit("not-a-date")
            ).otherwise(F.date_format(
                F.col(ts0) + F.make_interval(
                    days=(F.col(key) % 7 - 3).cast("int")),
                TSTR_FMT_SPARK)))
        out[t] = df.cache()
        out[t].count()
    yield out
    for df in out.values():
        df.unpersist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'{SF_DIR}/{t}.parquet'")
    return c


def _to_payload(src, key):
    """Serialize every non-key column into one JSON string, corrupting
    the two seeded modulo classes. Returns (payload_df, schema_ddl)."""
    fields = [f for f in src.schema.fields if f.name != key]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in fields)
    pay = src.select(
        F.col(key),
        F.when(F.col(key) % MALFORMED_MOD == MALFORMED_RES,
               F.lit('broken{'))
         .when(F.col(key) % ARRAY_MOD == ARRAY_RES, F.lit('[1,2]'))
         .otherwise(F.to_json(F.struct(*[F.col(f.name)
                                         for f in fields])))
         .alias("pl"))
    return pay, ddl


def _corrupt(k: int) -> bool:
    return (k % MALFORMED_MOD == MALFORMED_RES
            or k % ARRAY_MOD == ARRAY_RES)


def _run_payload_trial(spark, con, sources, seed):
    rng = random.Random(10_000 + seed)
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    ruleset, chains = gen_ruleset(rng, spec, with_udf=seed % 3 == 0)
    key = spec["key"]

    src = sources[table]
    pay, ddl = _to_payload(src, key)
    _good, viol = validate_json_payload(
        pay, "pl", ddl, ruleset, key_cols=[key])
    got = sorted((int(r[0]), r[1], r[2]) for r in
                 viol.select(key, "location", "code").collect())

    sql = build_oracle_sql(table, spec, ruleset, chains)
    parsed_exp = [(int(k), loc, code)
                  for k, loc, code in con.sql(sql).fetchall()
                  if not _corrupt(int(k))]
    corrupt_keys = [int(r[0]) for r in con.sql(
        f"SELECT {key} FROM {table} "
        f"WHERE {key} % {MALFORMED_MOD} = {MALFORMED_RES} "
        f"   OR {key} % {ARRAY_MOD} = {ARRAY_RES}").fetchall()]
    exp = sorted(parsed_exp
                 + [(k, "/", "payload") for k in corrupt_keys])
    assert got == exp, (
        f"seed={seed} table={table}: payload-engine {len(got)} rows vs "
        f"oracle {len(exp)}; first diffs: "
        f"{[x for x in got if x not in exp][:5]} / "
        f"{[x for x in exp if x not in got][:5]}\nruleset: "
        f"{[(r.kind, r.column, r.stage, r.params.get('_gate')) for r in ruleset.rules]}"
        f"\nchains: {chains}")


@pytest.mark.parametrize("block", range(4))
def test_fuzz_payload_parity(spark, sources, con, block):
    env = os.environ.get("SPARK_GRAFT_FUZZ_PAYLOAD_SEEDS")
    if env:
        seeds = [int(s) for s in env.split(",")]
    else:
        n = _trial_count()
        seeds = [s for s in range(n) if s % 4 == block]
    for seed in seeds:
        if env or seed % 4 == block:
            _run_payload_trial(spark, con, sources, seed)
