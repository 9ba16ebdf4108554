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


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = RegisteredQuery(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
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
        relational,
        rule_packs,
        similarity,
        text,
    )

    _LOADED = True
