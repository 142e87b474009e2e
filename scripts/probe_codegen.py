"""Probe: compare timing stability of the 3M validation job across
codegen strategies, each in the SAME JVM (fresh session confs don't need
a restart for these). Also prints the JIT compile events for generated
classes when -XX:+PrintCompilation is routed to a file.

Usage: python scripts/probe_codegen.py <mode> [passes]
  modes: base | nowscg | split256 | huge8k | hybrid
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validify_spark.session import get_spark  # noqa: E402
from validify_spark.data import standard_turns_ruleset  # noqa: E402
from validify_spark.engine import ValidationEngine  # noqa: E402

N = 3_000_000
mode = sys.argv[1] if len(sys.argv) > 1 else "base"
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

conf = {}
if mode == "nowscg":
    conf["spark.sql.codegen.wholeStage"] = "false"
elif mode == "split256":
    conf["spark.sql.codegen.methodSplitThreshold"] = "256"
elif mode == "huge8k":
    conf["spark.sql.codegen.hugeMethodLimit"] = "8000"
elif mode == "factory":
    conf["spark.sql.codegen.factoryMode"] = "NO_CODEGEN"

spark = get_spark(f"probe-{mode}", cpus=32, shuffle_partitions=32,
                  extra_conf=conf)
path = f"/tmp/validify_bench_turns_{N}"
if not os.path.exists(path + "/_SUCCESS"):
    from validify_spark.data import generate_turns
    generate_turns(spark, N, seed=42, partitions=64) \
        .write.mode("overwrite").parquet(path)
turns = spark.read.parquet(path)
eng = ValidationEngine(standard_turns_ruleset(),
                       key_cols=["conv_id", "turn_idx"])
for i in range(passes):
    t0 = time.perf_counter()
    n = eng.violations(turns).count()
    dt = time.perf_counter() - t0
    print(f"[{mode}] pass {i}: {dt:.2f}s  {N/dt:,.0f} turns/s  viol={n}",
          flush=True)
spark.stop()
