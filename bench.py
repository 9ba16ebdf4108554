#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Runs the headline operator set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
north-star images validation suite over the deterministic fixture
(generation is a prepare step, excluded from timing; the suite itself
— decode island, constraints, verdict rollup — is timed and reported
as validated imgs/sec).

Scaling evidence (local[8] vs local[32]) is produced by
pqc/bench/scaling.py, which shells out to this script.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_IMAGE_ROWS = int(os.environ.get("PQC_BENCH_IMAGE_ROWS", "20000"))

HEADLINE_QUERIES = (
    "q1_pricing_summary",
    "market_segment_rollup",
    "topk_orders_per_customer",
    "top_brands_by_revenue",
    "sessionization",
    "hourly_event_rollup",
    "asof_join_last_click",
    "ks_drift_statistic",
    "column_stats_profile",
    "quantile_profile",
    "token_count_stats",
    "lang_id_confusion",
    "quality_score",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "simhash_fingerprint",
    "simhash_near_dup_pairs",
    "knn_brute_force_cosine",
    "ivf_ann_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_bucketed",
    "competitor_topk_match",
    "event_value_pivot",
    "npm_hfss_score",
    "free_from_bulk_screen",
    "streaming_windowed_rollup",
    "media_decode_features",
    "images_relational_verdicts",
    "near_dup_clusters",
    "tfidf_top_terms",
    "srp_lsh_near_dup",
    # r5: production MinHash dial + bulk-tier rule packs
    "minhash_lsh_dedup_k128",
    "nutrition_claim_detect_bulk",
    "ingredient_presence_map_bulk",
    "per_serving_sanity_bulk",
    "quality_filter_chain",
    "stratified_sample",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    from pqc.registry import all_queries
    from pqc.session import get_spark

    spark = get_spark(cpus, app_name="pqc-bench")
    queries = all_queries()

    # ---- prepare (untimed): fixture table on disk, warm input footer reads
    from pqc.constraints import SuiteContext
    from pqc.engine import ValidationSuite
    from pqc.fixtures import cached_images_path, generate_image_dim

    images_path = cached_images_path(spark, BENCH_IMAGE_ROWS)
    # warm the other one-off fixtures the headline queries read, so the
    # timed loop measures the operators, not first-run fixture writes
    from pqc.audit_packs import _ensure_catalog
    from pqc.catalog_packs import _ensure_claims_bulk, _ensure_presence_bulk
    from pqc.media import cached_media_table
    from pqc.rule_packs import _ensure_serving_bulk

    _ensure_catalog(spark)
    cached_media_table(spark)
    _ensure_claims_bulk(spark)
    _ensure_presence_bulk(spark)
    _ensure_serving_bulk(spark)

    timings: dict[str, float] = {}

    # ---- north-star: validated images/sec over the fixture
    images = spark.read.parquet(images_path)
    dim = generate_image_dim(images)
    # steady-state warmup (untimed, added r4): run the full suite over a
    # 96-row LIMIT first so whole-stage codegen compiles and the Python
    # decode-island workers spin up + import before the clock starts —
    # the timed pass then measures sustained throughput, which is what
    # a long-running cluster delivers. One-time costs (JVM JIT, Arrow
    # worker startup) were ~8 s of the previous ~22 s "suite" number;
    # BASELINE.md reports both cold and steady-state series.
    warm_ctx = SuiteContext(images=images.limit(96), image_dim=dim)
    ValidationSuite().run(warm_ctx).violations.count()
    warm_ctx.release()
    t0 = time.monotonic()
    ctx = SuiteContext(images=images, image_dim=dim)
    res = ValidationSuite().run(ctx)
    n_violations = res.violations.count()
    res.verdicts.count()
    suite_sec = time.monotonic() - t0
    res.release()
    timings["images_validation_suite"] = round(suite_sec, 3)
    imgs_per_sec = round(BENCH_IMAGE_ROWS / suite_sec, 1)

    # ---- headline relational / text / dedup / similarity queries
    for name in HEADLINE_QUERIES:
        fn = queries[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "image_rows": BENCH_IMAGE_ROWS,
                "validated_imgs_per_sec": imgs_per_sec,
                "n_violations": n_violations,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
