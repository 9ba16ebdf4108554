"""Per-partition column statistics — the north-rule stats layer.

One hash-aggregate pass per table: count / null-rate / min / max per
column, HyperLogLog approx-distinct for keys, and t-digest-style
quantile sketches (`percentile_approx`) for numerics — every aggregate
has a map-side partial, so the shuffle carries one sketch per
(partition, column), never rows. Reference analogue: the prescreen
rollups and progress gauges (SURVEY §2.4), upgraded to sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANTILES = (0.25, 0.5, 0.75, 0.95)
PERCENTILE_ACCURACY = 10_000


def partition_profile(
    images: DataFrame,
    numeric_cols: tuple[str, ...] = ("w", "h"),
    key_col: str = "image_id",
    part_col: str = "part",
) -> DataFrame:
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key_col).alias(f"approx_distinct_{key_col}"),
    ]
    for c in numeric_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.percentile_approx(
                F.col(c).cast("double"), F.array(*[F.lit(q) for q in QUANTILES]),
                F.lit(PERCENTILE_ACCURACY),
            ).alias(f"quantiles_{c}"),
        ]
    return images.groupBy(part_col).agg(*aggs)


def null_rates(df: DataFrame, cols: tuple[str, ...], part_col: str = "part") -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / F.count(F.lit(1))).alias(
            f"null_rate_{c}"
        )
        for c in cols
    ]
    return df.groupBy(part_col).agg(*aggs)
