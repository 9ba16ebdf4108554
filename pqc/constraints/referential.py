"""Referential-integrity constraint: image_id must resolve in the dim.

Plan: LEFT ANTI join (broadcast when the dim is small; sort-merge on
the shared key otherwise — Catalyst/AQE decide). Reference analogue:
UID resolve (`app.py:1291-1297`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pqc.constraints import SuiteContext, as_violation

NAME = "referential:image_id->image_dim"


def violations(ctx: SuiteContext) -> DataFrame:
    if ctx.image_dim is None:
        return ctx.images.sparkSession.createDataFrame(
            [], "image_id string, part int, constraint string, detail string"
        )
    orphans = ctx.meta().join(
        ctx.image_dim.select("image_id"), "image_id", "left_anti"
    )
    return as_violation(orphans, NAME, F.lit("image_id not present in image_dim"))
