"""Driver-style oracle comparison: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet; compare row count,
column names, and order-insensitive values (stringified, rounded the
same way both sides already round).

Usage: python scripts/compare_oracle.py [sf_dir] [--only q1,q2,...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from validify_spark.session import get_spark  # noqa: E402

_args = sys.argv[1:]
ONLY = None
if "--only" in _args:
    i = _args.index("--only")
    ONLY = set(_args[i + 1].split(","))
    _args = _args[:i] + _args[i + 2:]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"


def canon(rows, cols):
    cols_sorted = sorted(cols)
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple("NULL" if d[c] is None else str(d[c])
                         for c in cols_sorted))
    return sorted(out), cols_sorted


def main() -> int:
    spark = get_spark("oracle-compare", cpus=8, shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    if ONLY is not None:
        qs = {k: v for k, v in qs.items() if k in ONLY}
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"✗ {name}: spark error: {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"• {name}: rows-only check — {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = [d[0] for d in rel.description]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"✗ {name}: duckdb error: {str(ex)[:200]}")
            continue
        sc, scn = canon(srows, scols)
        dc, dcn = canon(drows, dcols)
        if scn != dcn:
            failures.append((name, f"columns: spark={scn} duck={dcn}"))
            print(f"✗ {name}: column mismatch {scn} vs {dcn}")
        elif len(sc) != len(dc):
            failures.append((name, f"rowcount: {len(sc)} vs {len(dc)}"))
            print(f"✗ {name}: rowcount {len(sc)} vs {len(dc)}")
        elif sc != dc:
            bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            failures.append((name, f"values differ, e.g. {bad}"))
            print(f"✗ {name}: value mismatch e.g. {bad}")
        else:
            print(f"✓ {name}: {len(sc)} rows match")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
