"""Measure the MinHash banding dial: recall / precision / candidate
count for several (K, b, r) configurations against exact shingle
Jaccard truth on the documents corpus.

The driver query (pqc/dedup.py minhash_lsh_dedup) pins K=64, b=32,
r=2; this script produces the evidence table for the PRODUCTION dial
(K=128, with (b, r) chosen from the S-curve threshold
t ≈ (1/b)^(1/r) against the j* = 0.2 target) — BASELINE.md §minhash.

Single-node by design: DuckDB computes the shingle sets exactly as
both engines' queries do (same portable 60-bit hash), numpy applies
the same XOR-salt permutation family, so the candidate sets measured
here are the ones the Spark plan would produce at each dial.

Usage: python scripts/minhash_dial.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

from pqc.dedup import JACCARD_THRESHOLD, _shingles_sql  # noqa: E402
from pqc.exprs import HASH_BITS  # noqa: E402

GOLDEN = 0x9E3779B97F4A7C15
MASK = (1 << HASH_BITS) - 1


def salts(k: int) -> np.ndarray:
    # same family as pqc/exprs.py minhash_perm: perm i uses
    # (a, b) = (i + 1, 17 i + 3)
    return np.array(
        [((i + 1) * GOLDEN + (17 * i + 3)) & MASK for i in range(k)],
        dtype=np.uint64,
    )


def measure(sf_dir: str) -> None:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sh = con.execute(f"WITH sh AS ({_shingles_sql()}) SELECT * FROM sh").df()
    docs = {d: np.array(g, dtype=np.uint64) for d, g in sh.groupby("doc_id")["hs"]}
    ids = sorted(docs)

    truth = set()
    sets = {d: set(v.tolist()) for d, v in docs.items()}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= JACCARD_THRESHOLD:
                truth.add((a, b))

    print(f"corpus: {len(ids)} docs, true pairs (j>={JACCARD_THRESHOLD}): {len(truth)}")
    print("| K | bands×rows | S-curve t=(1/b)^(1/r) | candidates | recall | precision |")
    print("|---|---|---|---|---|---|")
    for k, bands, rows in ((64, 32, 2), (128, 64, 2), (128, 32, 4), (126, 42, 3)):
        s = salts(k)
        sig = {d: np.array([(v ^ s[i]).min() for i in range(k)]) for d, v in docs.items()}
        buckets: dict = {}
        for d, sg in sig.items():
            for b in range(bands):
                key = (b, tuple(sg[b * rows : (b + 1) * rows]))
                buckets.setdefault(key, []).append(d)
        cand = set()
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, c = sorted((members[x], members[y]))
                    cand.add((a, c))
        hit = cand & truth
        rec = len(hit) / len(truth) if truth else float("nan")
        prec = len(hit) / len(cand) if cand else float("nan")
        t = (1 / bands) ** (1 / rows)
        print(
            f"| {k} | {bands}×{rows} | {t:.3f} | {len(cand)} | {rec:.2f} | {prec:.2f} |"
        )


def scurve(n_pairs: int = 200, n_shingles: int = 200) -> None:
    """Empirical collision probability vs controlled Jaccard, against
    the analytic S-curve 1-(1-j^r)^b. The corpus's true pairs all sit
    at j >= 0.8 (every dial detects them perfectly — see measure()),
    so the dials are discriminated here on synthetic pairs built at
    exact mid-range Jaccard: |A| = |B| = n with s = 2nj/(1+j) shared
    shingles."""
    rng = np.random.default_rng(42)
    grid = (0.10, 0.15, 0.20, 0.30, 0.50, 0.80)
    dials = ((64, 32, 2), (128, 64, 2), (128, 32, 4), (126, 42, 3))
    print(f"\nempirical P(collide) on {n_pairs} synthetic pairs/j (analytic in parens):")
    print("| j | " + " | ".join(f"{k}: {b}×{r}" for k, b, r in dials) + " |")
    print("|---|" + "---|" * len(dials))
    for j in grid:
        s = int(round(2 * n_shingles * j / (1 + j)))
        row = [f"| {j:.2f} "]
        for k, bands, rows in dials:
            sal = salts(k)
            hits = 0
            for _ in range(n_pairs):
                shared = rng.integers(0, MASK, s, dtype=np.uint64)
                a = np.concatenate(
                    [shared, rng.integers(0, MASK, n_shingles - s, dtype=np.uint64)]
                )
                b = np.concatenate(
                    [shared, rng.integers(0, MASK, n_shingles - s, dtype=np.uint64)]
                )
                siga = np.array([(a ^ sal[i]).min() for i in range(k)])
                sigb = np.array([(b ^ sal[i]).min() for i in range(k)])
                for bb in range(bands):
                    lo, hi = bb * rows, (bb + 1) * rows
                    if np.array_equal(siga[lo:hi], sigb[lo:hi]):
                        hits += 1
                        break
            analytic = 1 - (1 - j**rows) ** bands
            row.append(f"| {hits / n_pairs:.2f} ({analytic:.2f}) ")
        print("".join(row) + "|")


if __name__ == "__main__":
    measure(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    scurve()
