#!/usr/bin/env python3
"""Two-parallelism scaling harness (north_rule evidence).

The rule demands ≥0.8 throughput efficiency from N to 4N executors;
this sandbox has no cluster, so the sanctioned stand-in is the same
job at ``local[8]`` vs ``local[32]`` on identical input, cold JVM per
run (subprocess), reporting validated imgs/sec at both levels and

    efficiency = (T_lo / T_hi) / (n_hi / n_lo)

The workload is the full images validation suite (decode island +
constraints + verdict rollup) over the deterministic fixture — the
north-star metric. Fixture generation happens once (cached on disk)
before any timed run.

Usage: python -m pqc.bench.scaling [n_images] [reps] [n_lo] [n_hi]
Writes results to stdout and appends a machine-readable block the
BASELINE.md scaling section can cite.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RUN_SNIPPET = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pqc.session import get_spark
from pqc.constraints import SuiteContext
from pqc.engine import ValidationSuite
from pqc.fixtures import cached_images_path, generate_image_dim
spark = get_spark({cpus}, 'pqc-scaling')
path = cached_images_path(spark, {n_images})
images = spark.read.parquet(path)
dim = generate_image_dim(images)
t0 = time.monotonic()
ctx = SuiteContext(images=images, image_dim=dim)
res = ValidationSuite().run(ctx)
n_viol = res.violations.count()
res.verdicts.count()
sec = time.monotonic() - t0
print(json.dumps({{"sec": sec, "n_violations": n_viol}}))
spark.stop()
"""


def run_once(cpus: int, n_images: int) -> dict:
    code = _RUN_SNIPPET.format(repo=REPO, cpus=cpus, n_images=n_images)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    # warm the fixture cache once (untimed) at full parallelism
    run_once(n_hi, n_images)

    results: dict[int, list[float]] = {n_lo: [], n_hi: []}
    viol = None
    for _ in range(reps):
        for cpus in (n_lo, n_hi):
            r = run_once(cpus, n_images)
            results[cpus].append(r["sec"])
            if viol is None:
                viol = r["n_violations"]
            assert r["n_violations"] == viol, "nondeterministic violations!"

    # min-of-reps: this sandbox shares a host with noisy neighbours
    # (observed 2-3× wall-time swings on identical runs); the minimum is
    # the least-contended measurement of each configuration
    t8 = min(results[n_lo])
    t32 = min(results[n_hi])
    eff = (t8 / t32) / (n_hi / n_lo)
    report = {
        "n_images": n_images,
        "reps": reps,
        "n_lo": n_lo,
        "n_hi": n_hi,
        "t_lo_sec": round(t8, 2),
        "t_hi_sec": round(t32, 2),
        "imgs_per_sec_lo": round(n_images / t8, 1),
        "imgs_per_sec_hi": round(n_images / t32, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
        "n_violations": viol,
        "all_runs_sec": {k: [round(x, 2) for x in v] for k, v in results.items()},
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
