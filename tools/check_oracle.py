"""Local stand-in for the driver's t2 correctness gate: run every registry
query on Spark and its oracle on DuckDB at sf0.01, compare row count, column
names, and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [name ...] [--sf DIR] [--vanilla]

``--vanilla`` builds a bare SparkSession (no session-factory configs) exactly
like the driver's harness does, so session-construction-time assumptions are
caught locally before the driver catches them.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gmall_flink_230422_spark.io import TABLES
from gmall_flink_230422_spark.plans import registry
from gmall_flink_230422_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format stably
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    argv = sys.argv[1:]
    sf_dir = SF_DIR
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    vanilla = "--vanilla" in argv
    args = [a for a in argv if not a.startswith("--")]
    specs = registry()
    names = args or list(specs)

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-vanilla")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            ores = con.sql(spec.oracle)
            ocols = ores.columns
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            failures.append(name)
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures.append(name)
            continue
        print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
        if len(srows) == 0:
            print(f"WARN {name}: 0 rows (matching, but trivially)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
