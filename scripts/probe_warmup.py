"""Probe: per-pass timing curve of the 3M-row validation job in a fresh
JVM, with optional codegen conf overrides — isolates JIT warm-up from
steady state. Usage:
  python scripts/probe_warmup.py [passes] [k=v ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validify_spark.session import get_spark  # noqa: E402
from validify_spark.data import standard_turns_ruleset  # noqa: E402
from validify_spark.engine import ValidationEngine  # noqa: E402

N = 3_000_000
passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
conf = dict(kv.split("=", 1) for kv in sys.argv[2:])

spark = get_spark("probe", cpus=32, shuffle_partitions=32,
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
    print(f"pass {i}: {dt:.2f}s  {N/dt:,.0f} turns/s  viol={n}",
          flush=True)
spark.stop()
