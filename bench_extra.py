#!/usr/bin/env python3
"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench — bench.py stays frozen. This script times
individual registered queries (same `.count()` methodology as bench.py
so numbers are comparable, plus an optional noop-sink mode that
computes every column), labels jobs for the UI, and can dump
`.explain("formatted")` to plans/<tag>/<query>.txt.

Usage:
  python bench_extra.py [--sf-dir DIR] [--reps N] [--noop] \
      [--plans plans/r06 --tag before] query1 query2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--plans", default=None, help="directory to write explain output")
    ap.add_argument("--tag", default="", help="suffix for plan files, e.g. before/after")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pqc.registry import all_queries
    from pqc.session import get_spark

    spark = get_spark(cpus, app_name="pqc-bench-extra")
    queries = all_queries()
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = queries[name]
        out[name] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.monotonic() - t0, 3)
            out[name].append(dt)
            print(f"  {name} rep{rep}: {dt}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            suffix = f"_{args.tag}" if args.tag else ""
            with open(os.path.join(args.plans, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(explain_str(fn(spark, args.sf_dir)))
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "noop": args.noop,
        "timings": out,
        "min": {k: min(v) for k, v in out.items() if v},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
