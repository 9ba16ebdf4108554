"""Every registered query must match its DuckDB oracle — the local twin
of the driver's CORRECTNESS gate, run at sf0.001 for speed (the driver
runs sf0.01; tests/test_oracle_parity_sf001 marks the full tier)."""

from __future__ import annotations

import pytest

from pqc.registry import REGISTRY, all_oracles, all_queries

from .conftest import SF_DIR_SMALL
from .oracle_util import compare

all_queries()  # force registration


@pytest.mark.parametrize("name", sorted(all_oracles().keys()))
def test_query_matches_oracle(spark, name):
    rq = REGISTRY[name]
    df = rq.fn(spark, SF_DIR_SMALL)
    compare(df, rq.oracle, SF_DIR_SMALL, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"constraint", "n_checked", "n_violations", "passed"}
