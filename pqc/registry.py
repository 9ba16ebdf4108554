"""Query registry — the bridge to the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query ``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, a
DuckDB oracle SQL string computing the same result (same column names —
the driver hashes values per sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}

# Intermediates pinned (persisted) by the CURRENT query. Self-joins over
# an expensive subplan (IVF assignment, shingle tables) otherwise
# recompute it once per join side — Spark only reuses identical
# exchanges, not identical logical subtrees. Pins are released when the
# next registered query starts (by then the previous result has been
# collected), so at most one query's worth of small intermediates is
# ever cached. unpersist() is lazy-safe: a released pin just recomputes.
#
# Lifecycle assumption: the driver runs registered queries SERIALLY,
# fully materializing each result before invoking the next (this is the
# driver contract's shape, and bench.py's). The lock below only makes
# the list operations safe if a harness ever interleaves query STARTS;
# a pin released while a concurrent query still holds its plan is
# correct-but-recomputing, never wrong.
import threading as _threading

_PINNED: list = []
_PIN_LOCK = _threading.Lock()


def pin(df):
    """persist() an intermediate for reuse inside the current query."""
    df.persist()
    with _PIN_LOCK:
        _PINNED.append(df)
    return df


def defer_release(release_fn) -> None:
    """Register a cleanup callable (e.g. SuiteResult.release) to run
    when the next registered query starts — queries that build a full
    SuiteContext must not leak its caches into later queries' plans
    (Spark's CacheManager substitutes any cached plan fragment)."""
    with _PIN_LOCK:
        _PINNED.append(release_fn)


def release_pins() -> None:
    while True:
        with _PIN_LOCK:
            if not _PINNED:
                return
            item = _PINNED.pop()
        if callable(item):
            item()
        else:
            item.unpersist()


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, *a, **k) -> DataFrame:
            release_pins()
            return fn(spark, sf_dir, *a, **k)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        REGISTRY[name] = RegisteredQuery(fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver's CORRECTNESS artifact checks the FIRST 50 entries of
# queries() (dict insertion order). With >50 registered queries the
# window must be allocated deliberately: queries with no driver row yet
# first, then this round's new operators, then last round's red/weak
# rows, then a rotation of previously-green ones. Names missing from
# this list sort after it in registration order — so every query still
# appears, just later. r2-green queries displaced past slot 50 keep
# their r2 artifact as evidence.
DRIVER_PRIORITY: list[str] = [
    # -- new in r5: production-dial MinHash + the three bulk-tier rule
    #    packs (never driver-checked)
    "minhash_lsh_dedup_k128",
    "nutrition_claim_detect_bulk",
    "ingredient_presence_map_bulk",
    "per_serving_sanity_bulk",
    "quality_filter_chain",
    "stratified_sample",
    "embedding_near_dup_trained",
    "decontamination_screen",
    "repetition_stats",
    # -- newly ORACLED in r5 (rows-only before): the full suite
    #    rollups + the decode-island summary, sidecar-hash-checked;
    #    plus the new island-ride thumbnail feature query
    "images_suite_verdicts",
    "images_violation_rows",
    "images_integrity_summary",
    "images_thumbnail_profile",
    # -- impl changed in r5 (degeneracy guards / interval-merge state /
    #    short-doc winnowing / versioned IVF index cache) — r4 evidence
    #    no longer reflects current code
    "minhash_lsh_dedup",
    "simhash_near_dup_pairs",
    "srp_lsh_near_dup",
    "near_dup_clusters",
    "winnowing_fingerprints",
    "streaming_sessionization",
    "ivf_ann_topk",
    # (ivf_multiprobe_topk shares the trained-index path checked via
    # ivf_ann_topk; its own impl is unchanged and r4-green)
    # -- the remaining queries whose latest green is r3 — rotated in so
    #    evidence stays fresh (r4∪r5). Displaced to the r6 window (all
    #    multi-round green, unchanged impls): top_brands_by_revenue,
    #    market_segment_rollup, hourly_event_rollup, event_cube_rollup,
    #    token_count_stats, ivf_multiprobe_topk
    "asof_join_last_click",
    "audit_nutritionals_scan",
    "embedding_norm_stats",
    "event_value_pivot",
    "exact_dup_groups",
    "food_supplement_check",
    "free_from_bulk_screen",
    "gelatin_source_classify",
    "gluten_contextual_check",
    "gluten_free_check",
    "images_banned_caption_screen",
    "images_drift_check",
    "images_near_dup_pairs",
    "knn_brute_force_cosine",
    "ks_drift_statistic",
    "lang_id_confusion",
    "media_frame_sample_plan",
    "ngram_jaccard_pairs",
    "nutrient_per100g_extract",
    "product_name_variant",
    "prohibited_marketplace_screen",
    "q1_pricing_summary",
    "quantile_profile",
    "range_check_violations",
    "referential_orphans",
    "sessionization",
    "simhash_fingerprint",
    "streaming_windowed_rollup",
    "topk_orders_per_customer",
    "uniqueness_violations",
]


def _ordered_names() -> list[str]:
    reg_idx = {n: i for i, n in enumerate(REGISTRY)}
    pri = {n: i for i, n in enumerate(DRIVER_PRIORITY)}
    sentinel = len(DRIVER_PRIORITY)
    return sorted(REGISTRY, key=lambda n: (pri.get(n, sentinel), reg_idx[n]))


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load_modules()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from pqc import (  # noqa: F401
        audit_packs,
        catalog_packs,
        compliance_packs,
        dedup,
        events_ops,
        image_queries,
        matching,
        media,
        relational,
        rule_packs,
        similarity,
        text,
    )
    from pqc import ledger  # noqa: F401
    from pqc.streaming import stateful, windowed  # noqa: F401

    _LOADED = True
