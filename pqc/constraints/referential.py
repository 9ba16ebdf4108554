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
    # broadcast is right at test scale (a 300k-id dim is ~7MB); on a
    # 10^12-row cluster the dim outgrows broadcast and this becomes a
    # co-partitioned sort-merge anti-join on the shared key — Catalyst
    # picks that automatically once the hint no longer fits, so the
    # hint is bounded by spark.sql.autoBroadcastJoinThreshold semantics
    orphans = ctx.meta().join(
        F.broadcast(ctx.image_dim.select("image_id")), "image_id", "left_anti"
    )
    return as_violation(orphans, NAME, F.lit("image_id not present in image_dim"))
