"""Deterministic synthetic multi-turn transcript generator.

Produces the engine's primary input shape (BASELINE.json input_hint):

    turns(conv_id string, turn_idx int, role string,
          text string, tool string, ts timestamp)

entirely Spark-side from ``spark.range`` — no driver-side data, so the
same code generates 10^4 or 10^12 rows (rows are pure functions of the
row id; generation parallelism = range partitions). Injected pathologies
per FIXTURES.md §1: invalid roles/NULLs, whitespace-padded / empty /
control-char / overlong texts, out-of-order and far-future timestamps,
duplicate (conv_id, turn_idx) pairs, hot conversations with ~100× median
turns, and orphan conv_ids missing from ``conv_meta``.

All injection sites are keyed on ``xxhash64(id, seed)`` mod primes —
deterministic for a given (n_rows, seed).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import rules as R

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "code", "browser", "calculator"]
BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

TURNS_PER_CONV = 8          # median conversation length
HOT_CONV_TURNS = 800        # ~100× median (skew testing)


def _h(seed: int):
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed)))


def generate_turns(spark: SparkSession, n_rows: int, seed: int = 42,
                   n_hot_convs: int = 4,
                   partitions: int | None = None) -> DataFrame:
    """~``n_rows`` turns: a uniform block of TURNS_PER_CONV-turn convs
    plus ``n_hot_convs`` hot conversations of up to HOT_CONV_TURNS turns
    (capped at 25% of the dataset so small test tables keep their
    shape)."""
    hot_turns = min(HOT_CONV_TURNS,
                    max(TURNS_PER_CONV * 4,
                        n_rows // (4 * max(n_hot_convs, 1))))
    hot_rows = n_hot_convs * hot_turns
    base_rows = max(n_rows - hot_rows, TURNS_PER_CONV)

    base = (spark.range(0, base_rows, 1, partitions or 32)
            .withColumn("conv_num", (F.col("id") / TURNS_PER_CONV)
                        .cast("long"))
            .withColumn("turn_idx", (F.col("id") % TURNS_PER_CONV)
                        .cast("int"))
            .withColumn("conv_id", F.concat(
                F.lit("c"), F.lpad(F.col("conv_num").cast("string"),
                                   9, "0"))))
    hot = (spark.range(0, hot_rows, 1, min(partitions or 32, 8))
           .withColumn("conv_num", (F.col("id") / hot_turns)
                       .cast("long"))
           .withColumn("turn_idx", (F.col("id") % hot_turns)
                       .cast("int"))
           .withColumn("conv_id", F.concat(
               F.lit("hot"), F.col("conv_num").cast("string")))
           .withColumn("id", F.col("id") + F.lit(1_000_000_000)))
    df = base.unionByName(hot)

    h = _h(seed)
    role_cycle = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.col("turn_idx") % 4 + 1).cast("int"))
    role = (F.when(h % 97 == 0, F.lit("robot"))
             .when(h % 193 == 0, F.lit(None))
             .otherwise(role_cycle))

    base_text = F.concat(
        F.lit("turn "), F.col("conv_id"), F.lit(" idx "),
        F.col("turn_idx").cast("string"), F.lit(" "),
        F.repeat(F.lit("lorem ipsum dolor sit amet "),
                 (h % 20).cast("int") + 1))
    text = (F.when(h % 31 == 0, F.concat(F.lit("   "), base_text,
                                         F.lit("   ")))
             .when(h % 41 == 0, F.lit(""))
             .when(h % 53 == 0, F.concat(base_text, F.lit("\x07bad")))
             .when(h % 61 == 0, F.repeat(F.lit("x"), 4200))
             .when(h % 67 == 0, F.concat(base_text,
                                         F.lit(" contact a@b.com")))
             .otherwise(base_text))

    tool = (F.when(role_cycle == "tool",
                   F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                                (h % 4 + 1).cast("int")))
             .otherwise(F.lit(None)))
    tool = (F.when(h % 89 == 3, F.lit(""))
             .when(h % 89 == 7, F.lit(" search "))
             .otherwise(tool))

    ts = F.timestamp_seconds(
        F.lit(int(BASE_TS.timestamp()))
        + (F.col("conv_num") % 500_000) * 60 + F.col("turn_idx") * 60
        + F.when(h % 73 == 0, -600).otherwise(0))
    ts = (F.when(h % 79 == 0,
                 F.lit(dt.datetime(2600, 1, 1)))
           .when(h % 83 == 0, F.lit(None).cast("timestamp"))
           .otherwise(ts))

    # duplicate (conv_id, turn_idx): pull ~1% of turn_idx down by one
    dup_idx = F.when((h % 101 == 0) & (F.col("turn_idx") > 0),
                     F.col("turn_idx") - 1).otherwise(F.col("turn_idx"))

    return df.select(
        F.col("conv_id"),
        dup_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def generate_conv_meta(spark: SparkSession, n_rows: int, seed: int = 42,
                       n_hot_convs: int = 4) -> DataFrame:
    """Parent table for the referential check: every conv_id from
    generate_turns EXCEPT ~1/89 of them (the orphans), plus the hot
    convs."""
    hot_turns = min(HOT_CONV_TURNS,
                    max(TURNS_PER_CONV * 4,
                        n_rows // (4 * max(n_hot_convs, 1))))
    hot_rows = n_hot_convs * hot_turns
    base_rows = max(n_rows - hot_rows, TURNS_PER_CONV)
    n_convs = (base_rows + TURNS_PER_CONV - 1) // TURNS_PER_CONV

    base = (spark.range(0, n_convs)
            .withColumn("conv_id", F.concat(
                F.lit("c"), F.lpad(F.col("id").cast("string"), 9, "0")))
            .filter(_h(seed + 1) % 89 != 0))
    hot = (spark.range(0, n_hot_convs)
           .withColumn("conv_id", F.concat(
               F.lit("hot"), F.col("id").cast("string"))))
    return (base.unionByName(hot)
            .select(
                "conv_id",
                F.element_at(F.array(F.lit("web"), F.lit("api"),
                                     F.lit("mobile")),
                             (F.abs(F.xxhash64("conv_id")) % 3 + 1)
                             .cast("int")).alias("source"),
                F.timestamp_seconds(
                    F.lit(int(BASE_TS.timestamp()))
                    + F.col("id") * 3600).alias("started")))


def standard_turns_ruleset(run_ts: dt.datetime | None = None) -> R.RuleSet:
    """The standard per-turn ruleset from FIXTURES.md §1 (mirrors the
    reference validators; citations in rules.py)."""
    return R.RuleSet(
        name="turns",
        rules=[
            R.required("role"),
            R.required("ts"),
            R.length("text", min=1, max=4000),
            R.is_in("role", ROLES),
            R.not_in("tool", ["", "forbidden"]),
            R.non_control_char("text"),
            R.range_("turn_idx", min=0, max=100000),
            R.time("ts", op="before",
                   target=run_ts or dt.datetime(2030, 1, 1),
                   inclusive=True),
        ],
        modifiers=[R.trim("text"), R.lowercase("role")],
    )


def standard_conversation_rules() -> list:
    """Standard whole-conversation aggregate rules for the transcript
    table — the ``conversation_rules(agg_rules=...)`` /
    ``AuditedValidationRun(conv_agg_rules=...)`` contract: (code,
    boolean aggregate Column) pairs, NULL verdict = failure.

    - ``has_assistant``: a conversation with no assistant turn is a
      broken trace (fires on generator poisons that replace the
      assistant slot with 'robot'/NULL, and on head-truncated convs).
    - ``max_512_turns``: runaway-agent cap (fires on the generator's
      hot conversations, HOT_CONV_TURNS=800).
    - ``tool_after_assistant``: the first tool turn must follow an
      assistant turn (agent traces show the assistant requesting the
      call).
    """
    min_tool = F.min(F.when(F.col("role") == "tool", F.col("turn_idx")))
    min_asst = F.min(F.when(F.col("role") == "assistant",
                            F.col("turn_idx")))
    return [
        ("has_assistant", F.max(F.col("role") == "assistant")),
        ("max_512_turns", F.count("*") <= 512),
        ("tool_after_assistant",
         min_tool.isNull()
         | (min_asst.isNotNull() & (min_asst < min_tool))),
    ]
