"""Suite runner: assemble constraint verdicts into one DataFrame.

The reference emits, per run, a results table plus a failed-rows table
(`app.py:1494-1521`). The engine's equivalent surface is:
``verdicts`` (one row per constraint × partition: checked/violations/
passed) and ``violations`` (the offending rows themselves). This module
provides the generic assembly; constraint plan-builders live in
pqc/constraints/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERDICT_COLS = ("constraint", "n_checked", "n_violations", "passed")


def verdict_row(df_checked: DataFrame, df_violations: DataFrame, name: str) -> DataFrame:
    """Single-constraint verdict: counts + boolean, as a 1-row DF."""
    checked = df_checked.agg(F.count(F.lit(1)).alias("n_checked"))
    viol = df_violations.agg(F.count(F.lit(1)).alias("n_violations"))
    return (
        checked.crossJoin(viol)
        .select(
            F.lit(name).alias("constraint"),
            F.col("n_checked").cast("bigint"),
            F.col("n_violations").cast("bigint"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def testdata_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship verdict rollup over the driver testdata tables."""
    from pqc.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    uniq_viol = (
        docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
    )
    ref_viol = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    )
    range_viol = part.filter((F.col("p_size") < 1) | (F.col("p_size") > 50))
    null_viol = docs.filter(F.col("text").isNull())

    verdicts = (
        verdict_row(docs, uniq_viol, "uniqueness:documents.doc_id")
        .unionByName(verdict_row(orders, ref_viol, "referential:orders.o_custkey->customer"))
        .unionByName(verdict_row(part, range_viol, "range:part.p_size in [1,50]"))
        .unionByName(verdict_row(docs, null_viol, "not_null:documents.text"))
    )
    return verdicts
