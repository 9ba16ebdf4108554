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
    """One MinHash permutation ``(a*h + b) mod p`` (p = 2^61-1).

    ``a``/``b`` must be < 2^30 so a*h stays within int128? No —
    Spark/DuckDB BIGINT is 64-bit and a*h overflows. We therefore use
    the split-multiply trick staying in 64 bits: with h < 2^60 and
    a < 2^3 it would still overflow, so instead we permute via the
    cheap XOR-with-constant + remultiply-free form:
    ``(h XOR salt) % p`` where salt varies per permutation. XOR of a
    uniform hash with a constant is itself uniform; min over XORed
    hashes is a valid MinHash family (each salt induces a different
    total order on shingle space).
    """
    salt = (a * 0x9E3779B97F4A7C15 + b) & ((1 << HASH_BITS) - 1)
    return F.lit(salt).bitwiseXOR(h)


def minhash_perm_sql(expr: str, a: int, b: int) -> str:
    salt = (a * 0x9E3779B97F4A7C15 + b) & ((1 << HASH_BITS) - 1)
    return f"xor({salt}::BIGINT, {expr})"


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
