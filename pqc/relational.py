"""Relational operator bank over the TPC-H-ish testdata tables.

Each query grafts one operator family from the reference (SURVEY.md §2
citations in docstrings) into idiomatic Catalyst-planned DataFrame code,
paired with a DuckDB oracle. Float aggregates use the decimal-exact
``dsum``/``davg`` helpers so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pqc.exprs import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    quantile_exact,
    quantile_exact_sql,
    sorted_vals,
    sorted_vals_sql,
)
from pqc.io import load_table
from pqc.registry import register

# ---------------------------------------------------------------------------
# A. Aggregation rollups (reference: prescreen rollups, SURVEY §2.4 A1-A3)
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped rollup: the canonical group-by + 8 aggregates.

    Grafts the reference's hit-count rollup pattern (`app.py:950-952`)
    at full aggregate width. Map-side partial aggregation + single
    shuffle on the two group keys; scan reads only the 7 referenced
    columns (column pruning) with the shipdate predicate pushed down.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SEGMENT_ORACLE = f"""
SELECT r.r_name AS region_name, c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, c.c_mktsegment
"""


@register("market_segment_rollup", oracle=_SEGMENT_ORACLE)
def market_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup: fact ⋈ three broadcast dims → group.

    Grafts the reference's dimension-lookup pattern (cached side CSVs,
    `banningredients.py:25-46`) as broadcast hash joins — no shuffle on
    the dim side; only the final groupBy shuffles, on a low-cardinality
    key pair.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# B. Window / ranking (reference: top-k candidates, SURVEY §2.5 W1-W3)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rk
  FROM orders
) WHERE rk <= 3
"""


@register("topk_orders_per_customer", oracle=_TOPK_ORACLE)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the reference's candidate trim (k=8 slice,
    `competitor_match.py:207-208`) as a rank-over-window — one shuffle
    on the partition key, no global sort. Ties broken deterministically
    by orderkey so results are reproducible across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


_BRAND_ORACLE = f"""
SELECT p_brand, n_items, revenue FROM (
  SELECT p.p_brand AS p_brand,
         COUNT(*) AS n_items,
         {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
) ORDER BY revenue DESC, p_brand ASC LIMIT 10
"""


@register("top_brands_by_revenue", oracle=_BRAND_ORACLE)
def top_brands_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast fact⋈dim join + rollup + deterministic top-N limit.

    Grafts best-match aggregation / ranking (J3/W1). `part` is the
    small side → broadcast, so the only shuffle is the final
    low-cardinality groupBy; TakeOrderedAndProject handles the limit
    without a global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# C. Constraint checks as queries (north_rule: uniqueness / referential /
#    range). Violation rows are DataFrames, mirroring the reference's
#    failed-rows file (`app.py:1516-1521`).
# ---------------------------------------------------------------------------

_UNIQ_ORACLE = """
SELECT lang, n_chars, COUNT(*) AS dup_count
FROM documents
GROUP BY lang, n_chars
HAVING COUNT(*) > 1
"""


@register("uniqueness_violations", oracle=_UNIQ_ORACLE)
def uniqueness_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness constraint: duplicate-key groups with multiplicity.

    Checks the composite key (lang, n_chars) on documents — a weak key
    with real duplicates, exercising the violation path. Single hash
    aggregation with map-side combine; at 10^12 scale this is the exact
    plan for uniqueness(image_id) (north_rule).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "n_chars")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


_REF_ORACLE = """
SELECT o.o_orderkey, o.o_custkey
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""


@register("referential_orphans", oracle=_REF_ORACLE)
def referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity constraint: FK rows with no dim match.

    Grafts the reference's UID resolve (`app.py:1291-1297`) as a
    broadcast LEFT ANTI join — zero violations expected on consistent
    testdata; the fixture suite (tests/) exercises the non-empty path.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    ).select("o_orderkey", "o_custkey")


_RANGE_ORACLE = """
SELECT p_partkey, p_size, p_brand
FROM part
WHERE p_size < 5 OR p_size > 45
"""


@register("range_check_violations", oracle=_RANGE_ORACLE)
def range_check_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range constraint: rows outside a declared numeric domain.

    The north-star analogue of the images (w,h) dimension checks —
    a pure pushed-down scan predicate: zero shuffle, parquet min/max
    row-group pruning eliminates whole row groups at scale.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter((F.col("p_size") < 5) | (F.col("p_size") > 45)).select(
        "p_partkey", "p_size", "p_brand"
    )


# ---------------------------------------------------------------------------
# D. Column statistics layer (north_rule: per-partition profiles)
# ---------------------------------------------------------------------------

_STATS_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       {davg_sql('n_chars')} AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


@register("column_stats_profile", oracle=_STATS_ORACLE)
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group column profile: count / null-rate / min / max / mean /
    distinct — the stats layer of the validation engine (north_rule),
    grouped by a partition-like key. One shuffle; every aggregate has a
    map-side partial. (`approx_count_distinct` is the scale path but is
    algorithm-specific per engine, so the oracle pins exact distinct.)
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n_null_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        davg(F.col("n_chars")).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


_QUANT_ORACLE = f"""
WITH g AS (
  SELECT lang, {sorted_vals_sql('n_chars')} AS av
  FROM documents GROUP BY lang
)
SELECT lang,
       {quantile_exact_sql('av', 0.25)} AS p25,
       {quantile_exact_sql('av', 0.50)} AS p50,
       {quantile_exact_sql('av', 0.75)} AS p75,
       {quantile_exact_sql('av', 0.95)} AS p95
FROM g
"""


@register("quantile_profile", oracle=_QUANT_ORACLE)
def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (the oracle-able twin of
    the `percentile_approx` t-digest path used at 10^12 scale — see
    pqc/stats.py for the sketch version). Integer-exact interpolation
    via pqc/exprs.py quantile_exact so both engines agree bitwise."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(sorted_vals(F.col("n_chars")).alias("av"))
    return agg.select(
        "lang",
        quantile_exact(F.col("av"), 0.25).alias("p25"),
        quantile_exact(F.col("av"), 0.50).alias("p50"),
        quantile_exact(F.col("av"), 0.75).alias("p75"),
        quantile_exact(F.col("av"), 0.95).alias("p95"),
    )
