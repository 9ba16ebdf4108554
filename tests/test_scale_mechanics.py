"""Scale-mechanics tests: partition pruning on the Iceberg-layout
table, salted aggregation equivalence, hot-band capping, and sketch
accuracy (HLL / percentile_approx) against exact values."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pqc.fixtures import cached_images_path
from pqc.skew import capped_band_join, salted_count, with_salt


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning_on_part_filter(spark):
    images = spark.read.parquet(cached_images_path(spark, 2000))
    pruned = images.filter(F.col("part") == 3)
    plan = _plan(pruned.select("image_id"))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "part" in m.group(1), plan[:1500]
    # pruning actually works: only partition-3 rows are read
    assert pruned.count() == images.filter("part = 3").count() > 0


def test_salted_count_equals_plain_count(spark):
    images = spark.read.parquet(cached_images_path(spark, 2000))
    plain = {
        r["fmt"]: r["n"]
        for r in images.groupBy("fmt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r["key"]: r["n_rows"] for r in salted_count(images, "fmt").collect()}
    assert salted == plain


def test_salt_is_deterministic(spark):
    images = spark.read.parquet(cached_images_path(spark, 2000)).select(
        "image_id", "fmt"
    )
    a = {r["image_id"]: r["_salt"] for r in with_salt(images).collect()}
    b = {r["image_id"]: r["_salt"] for r in with_salt(images).collect()}
    assert a == b
    assert len(set(a.values())) > 1  # actually spreads


def test_capped_band_join_drops_only_hot_buckets(spark):
    import pandas as pd

    rows = [("a", 0, 1)] * 50 + [("b", 0, 2)] * 3 + [("c", 1, 1)] * 5
    pdf = pd.DataFrame(rows, columns=["id", "band_idx", "band_val"])
    bands = spark.createDataFrame(pdf)
    cold, hot = capped_band_join(bands, cap=10)
    hot_rows = hot.collect()
    assert len(hot_rows) == 1 and hot_rows[0]["n_members"] == 50
    assert cold.count() == 8  # the two cold buckets survive


def test_hll_and_quantile_sketch_accuracy(spark):
    from pqc.stats import partition_profile

    images = spark.read.parquet(cached_images_path(spark, 2000))
    prof = partition_profile(images, part_col="part")
    totals = prof.agg(
        F.sum("n_rows").alias("n"),
        F.sum("approx_distinct_image_id").alias("approx_sum"),
    ).first()
    exact_distinct = images.select("image_id").distinct().count()
    # per-partition HLLs sum to ≈ total distinct (parts are disjoint by id hash)
    assert abs(totals["approx_sum"] - exact_distinct) / exact_distinct < 0.05
    # percentile_approx at accuracy 10k ≈ exact interpolated percentile
    one = prof.filter(F.col("part") == 0).first()
    exact_p50 = (
        images.filter("part = 0")
        .agg(F.expr("percentile(w, 0.5)").alias("p"))
        .first()["p"]
    )
    approx_p50 = one["quantiles_w"][1]
    assert abs(approx_p50 - exact_p50) <= 32  # within one size bucket
