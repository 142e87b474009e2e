"""Per-query measurement harness for the r6 optimization round.

NOT the driver contract (bench.py is frozen for that) — this is the
guide §1 instrumentation: isolate single queries, run N timed passes
with the same count() methodology bench.py uses, record host steal%
per pass, and dump .explain("formatted") plans to plans/r06/.

Usage:
  python bench_extra.py time  <query> [query...]   # timed passes
  python bench_extra.py plan  <query> [suffix]     # dump formatted plan
  python bench_extra.py all                        # every headline query
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the
driver's measured SF), SPARK_GRAFT_CPUS, BENCH_EXTRA_PASSES (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("BENCH_EXTRA_PASSES", "3"))


def _read_proc_stat():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:9]]
        return vals[7], sum(vals)
    except Exception:  # noqa: BLE001
        return 0, 1


def _session():
    from validify_spark.session import get_spark
    return get_spark(
        "validify-bench-extra", cpus=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.driver.extraJavaOptions":
                    "-XX:ReservedCodeCacheSize=512m"})


def time_queries(names):
    import __spark_entry__ as E
    spark = _session()
    qs = E.queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, "/root/testdata/sf0.001").count()
        samples = []
        for i in range(PASSES):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            s0, j0 = _read_proc_stat()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            sec = round(time.perf_counter() - t0, 3)
            s1, j1 = _read_proc_stat()
            samples.append(
                {"sec": sec,
                 "steal_pct": round(100.0 * (s1 - s0)
                                    / max(j1 - j0, 1), 1)})
        out[name] = {"min": min(s["sec"] for s in samples),
                     "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))


def dump_plan(name, suffix="before"):
    import __spark_entry__ as E
    spark = _session()
    qs = E.queries()
    df = qs[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = f"plans/r06/{name}_{suffix}.txt"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({plan.count(chr(10))} lines)")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        time_queries(sys.argv[2:])
    elif mode == "plan":
        dump_plan(sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "before")
    elif mode == "all":
        import __spark_entry__ as E  # noqa: F401
        from bench import HEADLINE
        time_queries(HEADLINE)
