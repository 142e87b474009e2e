"""Repro harness for the phase-2 Janino 64 KB codegen overflow.

Runs the flagship turns_validation query cold on a fresh JVM, printing
cold vs warm wall time. Compile failures appear on STDERR (log4j) —
run as:

  python scripts/repro_janino.py [sf_dir] 2>&1 \
      | grep -E "PASS|RESULT|Failed to compile|grows beyond"

Zero `Failed to compile` lines = the fix holds. For an automated
per-query count, use scripts/plan_audit.py (codegen_fallbacks column).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from validify_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("janino-repro")
    # capture codegen errors via log4j -> stderr (default appender);
    # CodeGenerator logs at ERROR on compile failure
    spark.sparkContext.setLogLevel("WARN")
    import __spark_entry__ as e

    times = []
    for i in range(3):
        t0 = time.monotonic()
        df = e.q_turns_validation(spark, sf_dir)
        n = df.count()
        dt = time.monotonic() - t0
        times.append(dt)
        print(f"PASS {i}: {dt:.2f}s rows={n}", flush=True)
    print(f"RESULT cold={times[0]:.2f} warm_min={min(times[1:]):.2f} "
          f"ratio={times[0]/min(times[1:]):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
