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
    # -- r3 red rows, fixed in r4 (HUGEINT oracle-type bug) — must
    #    produce hash-green driver evidence this round
    "column_stats_profile",
    "images_partition_stats",
    "ledger_partition_fingerprints",
    # -- new in r4: relational slice of the suite rollups (DuckDB twins)
    "images_relational_violations",
    "images_relational_verdicts",
    # -- changed in r4: de-vacuated (seeded non-empty) near-dup rows,
    #    trained-centroid IVF, sidecar-oracled media features
    "embedding_near_dup_pairs",
    "embedding_near_dup_bucketed",
    "images_near_dup_hot_buckets",
    "ivf_ann_topk",
    "ivf_multiprobe_topk",
    "media_decode_features",
    # -- the 29 r2-green queries displaced from the r3 window, rotated
    #    back so every query is green in the r3∪r4 artifacts
    "quality_score",
    "doc_fingerprint",
    "competitor_topk_match",
    "npm_hfss_score",
    "per_serving_sanity",
    "enumber_canonicalization",
    "pack_size_parse",
    "unit_normalization",
    "ingredient_presence_map",
    "fnv_accumulation",
    "user_event_type_sets",
    "max_by_selection",
    "bbox_iou_merge",
    "json_extraction",
    "spelling_check",
    "caffeine_age_restriction",
    "vegan_flag_conflict",
    "legal_category_format",
    "daily_dose_extractor",
    "nutrition_claim_detect",
    "pmo_category_classify",
    "methylated_vitamin_check",
    "novel_food_screen",
    "address_quality_score",
    "claims_capped_ranking",
    "html_strip",
    "allergen_bold_check",
    "medicinal_language_flag",
    "shelf_label_validation",
    # -- new r4 operators (transitive clustering, tf-idf salience,
    #    SRP-LSH bucketed near-dup)
    "near_dup_clusters",
    "tfidf_top_terms",
    "srp_lsh_near_dup",
    "winnowing_fingerprints",
    "bpe_token_stats",
    "quantized_knn_topk",
    "streaming_sessionization",
    "interval_range_join",
    "hierarchical_time_rollup",
    # -- rotation of r3-green heavies to keep their evidence fresh
    "streaming_stateful_dedup",
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
