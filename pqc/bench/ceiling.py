#!/usr/bin/env python3
"""Machine-ceiling control for the scaling evidence (BASELINE.md).

Measures what N→4N efficiency is ATTAINABLE on this host for any
CPU-bound workload, Spark removed from the equation: a fixed total
amount of numpy matmul + zlib work split over N worker processes.
The sandbox's vCPUs are host-contended, so 4× processes deliver < 4×
compute; the engine's raw Spark ratio should be read against this
ceiling, not against the theoretical 0.8.

Usage: python -m pqc.bench.ceiling [n_lo] [n_hi] [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
import zlib

import numpy as np

TOTAL_UNITS = 1536  # fixed total work, divided across workers


def _unit(seed: int) -> int:
    rng = np.random.default_rng(seed)
    a = rng.random((64, 64))
    acc = 0
    for _ in range(400):
        a = np.clip(a @ a.T / 64.0, 0, 1)
        acc += zlib.crc32(zlib.compress(a.tobytes(), 1))
    return acc & 0xFF


def _run(n_workers: int) -> float:
    t0 = time.monotonic()
    with mp.Pool(n_workers) as pool:
        pool.map(_unit, range(TOTAL_UNITS), chunksize=max(1, TOTAL_UNITS // (n_workers * 8)))
    return time.monotonic() - t0


def main() -> None:
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    _run(n_hi)  # warm page cache / fork pools
    results: dict[int, list[float]] = {n_lo: [], n_hi: []}
    for _ in range(reps):
        for n in (n_lo, n_hi):
            results[n].append(_run(n))
    t_lo, t_hi = min(results[n_lo]), min(results[n_hi])
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    print(
        json.dumps(
            {
                "n_lo": n_lo,
                "n_hi": n_hi,
                "t_lo_sec": round(t_lo, 2),
                "t_hi_sec": round(t_hi, 2),
                "ceiling_efficiency": round(eff, 3),
                "all_runs_sec": {k: [round(x, 2) for x in v] for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
