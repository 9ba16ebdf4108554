"""Portable expression builders shared across operators.

Two cross-engine determinism tools used throughout the query bank so
Spark results hash-match the DuckDB oracle bit-for-bit:

1. ``hash64`` — a 60-bit integer hash from md5, identical in Spark
   (``conv(substring(md5(s),1,15),16,10)``) and DuckDB
   (``('0x' || substring(md5(s),1,15))::BIGINT``). Used for MinHash /
   SimHash / fingerprints instead of engine-native ``hash()`` (which
   differs between engines).

2. ``dsum`` — order-independent floating aggregation: compute the
   per-row expression in double (deterministic), cast once to DECIMAL,
   sum exactly (decimal addition is associative), cast the total back
   to double. Plain ``SUM(double)`` differs across engines/partitions
   in the last ulps because fp addition is not associative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- portable 60-bit hash -------------------------------------------------

HASH_BITS = 60
HASH_PRIME = 2305843009213693951  # 2^61 - 1, Mersenne prime


def hash64(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (md5-based)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash64_sql_duckdb(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`hash64`."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One MinHash permutation as ``h XOR salt`` (salt derived from
    (a, b) via a golden-ratio multiply).

    The textbook ``(a*h + b) mod p`` family is unusable cross-engine:
    with h < 2^60, the multiply overflows 64-bit BIGINT and Spark and
    DuckDB wrap differently. XOR with a per-permutation constant stays
    in 64 bits, is portable, and is a valid MinHash family: XOR of a
    uniform hash with a constant is itself uniform, and each salt
    induces a different total order on shingle space, so the min over
    XORed hashes estimates Jaccard the same way (measured
    recall/precision table in BASELINE.md §minhash).
    """
    salt = (a * 0x9E3779B97F4A7C15 + b) & ((1 << HASH_BITS) - 1)
    return F.lit(salt).bitwiseXOR(h)


def minhash_perm_sql(expr: str, a: int, b: int) -> str:
    salt = (a * 0x9E3779B97F4A7C15 + b) & ((1 << HASH_BITS) - 1)
    return f"xor({salt}::BIGINT, {expr})"


# ---- exact cross-engine quantiles ------------------------------------------

QUANTILE_DENOM = 20  # q grid: multiples of 0.05 (covers .25/.5/.75/.95)


def sorted_vals(col: Column) -> Column:
    """Aggregate: sorted array of a column's non-null values — the
    carrier for :func:`quantile_exact`. ``collect_list`` drops nulls,
    matching ``quantile_cont``'s null handling. Exact sort-per-group is
    the small-group path; at 10^12 rows the same profile runs on
    ``percentile_approx`` t-digests (pqc/stats.py) whose error these
    exact values bound in tests."""
    return F.sort_array(F.collect_list(col))


def quantile_exact(arr: Column, q: float) -> Column:
    """Exact linear-interpolated quantile of a sorted INTEGER array.

    ``F.percentile`` (Spark) vs ``quantile_cont`` (DuckDB) interpolate
    in floating point with engine-specific rounding — last-ulp drift
    that breaks hash parity (the r2 ``images_partition_stats`` FAIL).
    Here q sits on the 1/20 grid, so with k = (n-1)*q, j = 20*frac(k)
    an integer, the interpolated value is (lo*(20-j) + hi*j) / 20:
    pure integer arithmetic up to one final IEEE division by 20, which
    is correctly rounded and therefore bit-identical in both engines.
    """
    num = round(q * QUANTILE_DENOM)
    assert abs(num - q * QUANTILE_DENOM) < 1e-9, f"q={q} not on 1/20 grid"
    n = F.size(arr)
    k20 = (n - F.lit(1)) * F.lit(num)
    j = k20 % QUANTILE_DENOM
    idx0 = ((k20 - j) / QUANTILE_DENOM).cast("int")  # exact: 20 | (k20-j)
    lo = F.get(arr, idx0)
    hi = F.coalesce(F.get(arr, idx0 + F.lit(1)), lo)  # j=0 ⇒ hi unused
    numr = lo.cast("bigint") * (F.lit(QUANTILE_DENOM) - j) + hi.cast("bigint") * j
    return (numr.cast("double") / F.lit(QUANTILE_DENOM)).cast("double")


def sorted_vals_sql(expr: str) -> str:
    """DuckDB aggregate twin of :func:`sorted_vals`."""
    return f"list_sort(list({expr}) FILTER (WHERE ({expr}) IS NOT NULL))"


def quantile_exact_sql(arr: str, q: float) -> str:
    """DuckDB SQL twin of :func:`quantile_exact` over a sorted-list
    expression (1-based indexing; out-of-range subscript → NULL)."""
    num = round(q * QUANTILE_DENOM)
    assert abs(num - q * QUANTILE_DENOM) < 1e-9, f"q={q} not on 1/20 grid"
    k20 = f"((len({arr}) - 1) * {num})"
    j = f"({k20} % {QUANTILE_DENOM})"
    i1 = f"({k20} // {QUANTILE_DENOM} + 1)"  # 1-based lo index
    lo = f"({arr})[{i1}]"
    hi = f"COALESCE(({arr})[{i1} + 1], {lo})"
    return (
        f"CAST(CAST(({lo}) * ({QUANTILE_DENOM} - {j}) + ({hi}) * {j} "
        f"AS DOUBLE) / {QUANTILE_DENOM} AS DOUBLE)"
    )


# ---- order-independent float aggregation ----------------------------------

DEC = "decimal(28,6)"
DEC_HI = "decimal(38,12)"  # for unit-scale values (cosines, ratios)


def dsum(expr: Column, scale: str = DEC) -> Column:
    """Exact (order-independent) sum of a double expression → double."""
    return F.sum(expr.cast(scale)).cast("double")


def dsum_sql(expr: str, scale: str = "DECIMAL(28,6)") -> str:
    return f"CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE)"


def davg(expr: Column, scale: str = DEC) -> Column:
    """Order-independent mean: exact decimal sum / bigint count."""
    return (F.sum(expr.cast(scale)).cast("double") / F.count(F.lit(1))).cast("double")


def davg_sql(expr: str, scale: str = "DECIMAL(28,6)") -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE) / COUNT(*) AS DOUBLE)"
