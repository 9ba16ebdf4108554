"""Driver-contract queries over the north-star images table.

These operate on the deterministic synthetic fixture (pqc/fixtures.py,
seed 42 — FIXTURES.md), not the sf parquet tables, so they carry no
DuckDB oracle: the driver records the weaker rows-only check, and the
row-level correctness gate lives in tests/test_image_island.py (exact
violation-set parity against the anomaly schedule + pixel roundtrips
vs the local reference decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pqc.registry import register

FIXTURE_ROWS = 2000


def _images(spark: SparkSession) -> DataFrame:
    from pqc.fixtures import cached_images_path

    return spark.read.parquet(cached_images_path(spark, FIXTURE_ROWS))


@register("images_suite_verdicts")
def images_suite_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full constraint suite over the images fixture → per-partition
    verdict table (part, constraint, n_checked, n_violations, passed).
    The north-rule surface."""
    from pqc.constraints import SuiteContext
    from pqc.engine import ValidationSuite
    from pqc.fixtures import generate_image_dim

    images = _images(spark)
    ctx = SuiteContext(images=images, image_dim=generate_image_dim(images))
    res = ValidationSuite().run(ctx)
    return res.verdicts.orderBy("part", "constraint")


@register("images_violation_rows")
def images_violation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The failed-rows surface (`app.py:1516-1521` analogue): every
    violating record with constraint + evidence detail."""
    from pqc.constraints import SuiteContext
    from pqc.engine import ValidationSuite
    from pqc.fixtures import generate_image_dim

    images = _images(spark)
    ctx = SuiteContext(images=images, image_dim=generate_image_dim(images))
    res = ValidationSuite().run(ctx)
    return res.violations.orderBy("constraint", "image_id")


@register("images_partition_stats")
def images_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition column profile: counts, HLL distinct, min/max,
    t-digest quantiles (north-rule stats layer)."""
    from pqc.stats import partition_profile

    prof = partition_profile(_images(spark))
    # arrays → strings for a stable rows-only fingerprint
    return prof.select(
        "part",
        "n_rows",
        "approx_distinct_image_id",
        "n_null_w",
        "min_w",
        "max_w",
        F.col("quantiles_w").cast("string").alias("quantiles_w"),
        "n_null_h",
        "min_h",
        "max_h",
        F.col("quantiles_h").cast("string").alias("quantiles_h"),
    ).orderBy("part")


@register("images_near_dup_pairs")
def images_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded phash self-join near-duplicate pairs (hamming ≤ 6)."""
    from pqc.constraints.near_dup import candidate_pairs

    return candidate_pairs(_images(spark)).orderBy("seq_a", "seq_b")


@register("images_near_dup_hot_buckets")
def images_near_dup_hot_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guard surface: phash band-pair buckets above the member cap
    that were diverted from the quadratic pair join (pqc/skew.py).
    Empty on a healthy corpus — rows here mean a phash-degenerate
    (e.g. monochrome) slice whose pairs were bounded away; their
    identical-phash members are still grouped by the exact-dup layer."""
    from pqc.constraints.near_dup import hot_buckets

    return hot_buckets(_images(spark)).orderBy("band_idx", "band_val")


@register("images_integrity_summary")
def images_integrity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-island rollup per (fmt): decode/psnr/phash gate pass
    counts — the vectorized Arrow pixel path exercised end-to-end."""
    from pqc.constraints import SuiteContext

    ctx = SuiteContext(images=_images(spark))
    integ = ctx.integrity()
    return (
        integ.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("decode_ok").cast("int")).alias("n_decode_ok"),
            F.sum(F.col("two_pass_ok").cast("int")).alias("n_two_pass_ok"),
            F.sum(F.col("dims_match").cast("int")).alias("n_dims_match"),
            F.sum(F.col("psnr_ok").cast("int")).alias("n_psnr_ok"),
            F.sum(F.col("phash_match").cast("int")).alias("n_phash_match"),
            F.round(F.avg(F.when(F.col("psnr_regen") != float("inf"), F.col("psnr_regen"))), 2).alias(
                "avg_psnr_lossy"
            ),
        )
        .orderBy("fmt")
    )


@register("images_drift_check")
def images_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS drift of the width distribution: fixture vs its shifted
    variant (positive control) and vs itself (null control)."""
    from pqc.constraints.drift import drift_verdict
    from pqc.fixtures import cached_images_path

    cur = _images(spark)
    shifted = spark.read.parquet(cached_images_path(spark, FIXTURE_ROWS, shift=4))
    null_case = drift_verdict(cur, cur, "w").withColumn("case", F.lit("null"))
    pos_case = drift_verdict(cur, shifted, "w").withColumn("case", F.lit("shifted"))
    return null_case.unionByName(pos_case)


@register("images_banned_caption_screen")
def images_banned_caption_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage text screen over captions (exact boundary join +
    levenshtein fuzzy), rolled up per canonical term."""
    from pqc.constraints import SuiteContext
    from pqc.constraints.text_rules import screen_hits

    ctx = SuiteContext(images=_images(spark))
    return (
        screen_hits(ctx)
        .groupBy("canonical", "syn_type", "match_kind")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("canonical", "syn_type", "match_kind")
    )
