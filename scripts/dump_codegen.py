"""Dump generated code for the phase-2 projection of a small ruleset to
find what bloats it past Janino's 64 KB limit."""
import sys

sys.path.insert(0, "/root/repo")

from validify_spark.session import get_spark  # noqa: E402
import validify_spark as vs  # noqa: E402
import __spark_entry__ as e  # noqa: E402


def main():
    spark = get_spark("dump-codegen")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    e._load(spark, "/root/testdata/sf0.001", "lineitem")
    turns = spark.sql(e.DERIVE_TURNS_SQL).localCheckpoint(eager=True)
    all_rules = e._turns_ruleset().rules
    mods = e._turns_ruleset().modifiers
    eng = vs.ValidationEngine(
        vs.RuleSet(rules=all_rules[1:5], modifiers=mods),
        key_cols=["conv_id", "turn_idx"], run_ts=e._RUN_TS)
    df = eng.violations(turns)
    df.explain("formatted")
    code = df._jdf.queryExecution().debug().codegenToSeq()
    n = code.size()
    print(f"{n} codegen units")
    for i in range(n):
        tup = code.apply(i)
        src = tup._2()
        body = src.body() if hasattr(src, "body") else str(src)
        lines = body.count("\n")
        with open(f"/tmp/codegen_{i}.java", "w") as f:
            f.write(body)
        print(f"unit {i}: {lines} lines -> /tmp/codegen_{i}.java")
    spark.stop()


if __name__ == "__main__":
    main()
