"""Isolate which rule subset's phase-2 projection overflows Janino 64KB.

Runs violations() with cumulative/individual rule subsets on sf0.001,
printing a marker before each so compile errors in stderr can be mapped
to the subset that triggered them.
"""
import sys

sys.path.insert(0, "/root/repo")

from validify_spark.session import get_spark  # noqa: E402
import validify_spark as vs  # noqa: E402
import __spark_entry__ as e  # noqa: E402


def main():
    spark = get_spark("probe-chunks")
    e._load(spark, "/root/testdata/sf0.001", "lineitem")
    turns = spark.sql(e.DERIVE_TURNS_SQL).localCheckpoint(eager=True)
    all_rules = e._turns_ruleset().rules
    mods = e._turns_ruleset().modifiers
    subsets = {
        "required": [all_rules[0]],
        "length": [all_rules[1]],
        "is_in": [all_rules[2]],
        "not_in": [all_rules[3]],
        "req+len": all_rules[:2],
        "req+len+is_in": all_rules[:3],
        "req+len+is_in+not_in": all_rules[:4],
        "len+is_in+not_in+ncc": all_rules[1:5],
    }
    for name, rules in subsets.items():
        # marker on stderr too so codegen errors (log4j -> stderr)
        # can be attributed to the subset that triggered them
        print(f"=== SUBSET {name} ===", file=sys.stderr, flush=True)
        print(f"=== SUBSET {name} ===", flush=True)
        eng = vs.ValidationEngine(
            vs.RuleSet(rules=rules, modifiers=mods),
            key_cols=["conv_id", "turn_idx"], run_ts=e._RUN_TS)
        n = eng.violations(turns).count()
        print(f"    rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
