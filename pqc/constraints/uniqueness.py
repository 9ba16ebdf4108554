"""Uniqueness constraint: duplicate primary keys are violations.

Plan: hash-aggregate on the key (map-side partial combine), keep keys
with multiplicity > 1, semi-join back to tag every offending row. The
shuffle carries only (key, count) — at 10^12 rows nothing wide moves.
Reference analogue: dedupe-of-segments inverted index
(`banningredients.py:172-182`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pqc.constraints import SuiteContext, as_violation

NAME = "uniqueness:image_id"


def violations(ctx: SuiteContext) -> DataFrame:
    images = ctx.meta()
    dups = (
        images.groupBy("image_id")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    flagged = images.join(F.broadcast(dups), "image_id")
    return as_violation(
        flagged, NAME, F.concat(F.lit("key appears "), F.col("dup_count"), F.lit("×"))
    )
