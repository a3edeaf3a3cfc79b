"""Run any registry query (or raw SQL over the test tables) from the CLI.

Usage:
  python tools/run_query.py q1_pricing_summary            # run + show
  python tools/run_query.py x_minhash_lsh --explain       # formatted plan
  python tools/run_query.py --sql "SELECT count(*) FROM lineitem"
  python tools/run_query.py --list                        # query names
  ... [--sf /root/testdata/sf0.01] [--n 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gmall_flink_230422_spark.io import DEFAULT_SF_DIR, register_views
from gmall_flink_230422_spark.plans import registry
from gmall_flink_230422_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--sf", default=DEFAULT_SF_DIR, help="testdata dir")
    ap.add_argument("--sql", help="raw Spark SQL over the registered tables")
    ap.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    ap.add_argument("--n", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    args = ap.parse_args()

    specs = registry()
    if args.list:
        for name, spec in sorted(specs.items()):
            tags = ",".join(spec.tags)
            print(f"{name:28s} [{tags}]")
        return

    spark = get_spark("run-query")
    if args.sql:
        register_views(spark, args.sf)
        df = spark.sql(args.sql)
    else:
        if not args.name or args.name not in specs:
            sys.exit(f"unknown query {args.name!r}; use --list")
        df = specs[args.name].fn(spark, args.sf)

    if args.explain:
        df.explain("formatted")
        return
    t0 = time.time()
    df.show(args.n, truncate=False)
    print(f"[{df.count()} rows, {time.time() - t0:.2f}s, sf={args.sf}]")


if __name__ == "__main__":
    main()
