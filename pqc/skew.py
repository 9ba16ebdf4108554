"""Skew handling — salted repartitioning / two-phase aggregation and
the hot-band cap for phash LSH joins (north_rule: "salted
repartitioning for phash/format skew, AQE-tuned shuffles").

Two tools:

1. ``salted_count`` / two-phase aggregation: a groupBy on a skewed key
   (``fmt`` is 85/15 in the corpus; real corpora are worse) sends every
   row of the hot key through one reducer. Salting splits each key into
   ``n_salts`` sub-keys (random-ish but deterministic via a row hash),
   partially aggregates, then combines — the hot key's work spreads over
   ``n_salts`` reducers. AQE's skew-join handles *joins*; aggregation
   skew needs this rewrite.

2. ``capped_band_join``: phash band self-joins explode when a band
   value is hot (monochrome corpora collapse to few phashes). Banding
   guarantees candidates for hamming ≤ 7 via ANY matching band, so
   dropping buckets above a count cap bounds the join to
   O(cap²·n_buckets) while keeping recall for pairs that share a
   *non-hot* band; fully-hot pairs are exact duplicates caught by the
   cheap exact-dup pass first (same screen→confirm layering as
   SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16
DEFAULT_BAND_CAP = 2000


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from a row-content hash (not rand(): retries
    and resumes must see the same partitioning)."""
    basis = F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns])
    return df.withColumn(salt_col, F.pmod(F.crc32(basis), F.lit(n_salts)).cast("int"))


def salted_count(df: DataFrame, key: str | Column, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) partial → groupBy
    (key) combine. Returns (key, n_rows)."""
    key_col = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df.select(key_col.alias("k")), n_salts)
    partial = salted.groupBy("k", "_salt").agg(F.count(F.lit(1)).alias("n_partial"))
    return (
        partial.groupBy("k")
        .agg(F.sum("n_partial").alias("n_rows"))
        .select(F.col("k").alias("key"), F.col("n_rows"))
    )


def capped_band_join(
    bands: DataFrame,
    band_cols: tuple[str, ...] = ("band_idx", "band_val"),
    cap: int = DEFAULT_BAND_CAP,
) -> tuple[DataFrame, DataFrame]:
    """Split a band table into (cold, hot_buckets): cold rows flow to
    the pairwise self-join; hot buckets (> cap members) are returned
    for reporting / exact-dup handling instead of joining quadratically.

    ``band_cols`` is any non-empty tuple of bucket-key column names
    (the phash path uses ``(band_idx, band_val)``; the MinHash path a
    single pre-hashed ``(band,)`` key).

    Returns (cold_bands, hot_bucket_stats).
    """
    cols = list(band_cols)
    counts = bands.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_members"))
    hot = counts.filter(F.col("n_members") > cap)
    cold = bands.join(F.broadcast(hot.select(*cols)), cols, "left_anti")
    return cold, hot
