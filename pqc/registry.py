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
_PINNED: list = []


def pin(df):
    """persist() an intermediate for reuse inside the current query."""
    df.persist()
    _PINNED.append(df)
    return df


def defer_release(release_fn) -> None:
    """Register a cleanup callable (e.g. SuiteResult.release) to run
    when the next registered query starts — queries that build a full
    SuiteContext must not leak its caches into later queries' plans
    (Spark's CacheManager substitutes any cached plan fragment)."""
    _PINNED.append(release_fn)


def release_pins() -> None:
    while _PINNED:
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


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return {name: rq.fn for name, rq in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_modules()
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}


_LOADED = False


def _load_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from pqc import (  # noqa: F401
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

    _LOADED = True
