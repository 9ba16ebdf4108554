"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation query; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md §2) with
DuckDB oracles where SQL-expressible. Implementations live in pqc/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: constraint-suite verdict rollup over sf0.001.

    Runs the full images-table constraint suite (uniqueness,
    referential, ranges, pixel integrity, near-dup, text rules) over
    the deterministic fixture plus the testdata constraint checks, and
    returns one verdict row per constraint — the pass/fail surface of
    the north rule.
    """
    from pqc.engine import flagship_verdicts

    return flagship_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pqc.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pqc.registry import all_oracles

    return all_oracles()
