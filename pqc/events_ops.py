"""Event-stream operator bank (batch shape; streaming twin in
pqc/streaming/). Grafts the reference's journal/heartbeat timeline
thinking (utils/durability.py) into real time-series operators:
windowed rollups, sessionization, as-of joins, and the KS drift
statistic required by the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pqc.exprs import dsum, dsum_sql
from pqc.io import load_table
from pqc.registry import register

SESSION_GAP_SECONDS = 1800

_HOURLY_ORACLE = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


@register("hourly_event_rollup", oracle=_HOURLY_ORACLE)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch form of the streaming windowed
    agg in pqc/streaming/windowed.py). Hour emitted as a formatted
    string so cross-engine timestamp hashing is moot. Single shuffle on
    (hour, type) with map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


_SESSION_ORACLE = f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {SESSION_GAP_SECONDS}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


@register("sessionization", oracle=_SESSION_ORACLE)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session.

    Classic lag + flag-sum sessionize (SURVEY §2.8 I10 maps the
    reference's OCR-row gap-grouping to exactly this shape). One
    shuffle on user_id; the window and the final groupBy share the
    partitioning, so Catalyst plans a single exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # fractional-second gap: the oracle compares epoch() DOUBLEs
    # (microsecond precision) — unix_timestamp() truncates to whole
    # seconds, so a gap in (1800, 1801] s would split differently.
    # TIMESTAMP_NTZ has no direct double cast; the intermediate
    # timestamp cast is identity under the pinned UTC session TZ.
    def _epoch(c: Column) -> Column:
        return c.cast("timestamp").cast("double")

    new_session = F.when(
        prev_ts.isNull() | (_epoch(F.col("ts")) - _epoch(prev_ts) > SESSION_GAP_SECONDS),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_ASOF_ORACLE = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_value
  FROM events
)
SELECT event_id, user_id, ROUND(value, 6) AS purchase_value,
       ROUND(last_click_value, 6) AS last_click_value
FROM t WHERE event_type = 'purchase'
"""


@register("asof_join_last_click", oracle=_ASOF_ORACLE)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the most recent strictly-prior
    click value for the same user. Spark lacks a native ASOF JOIN;
    the idiomatic distributed form is last(ignorenulls) over an
    unbounded-preceding window — one shuffle on the join key, no
    range-join blowup. (Guide pattern: as-of via window.)"""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_value", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("purchase_value"),
            F.round("last_click_value", 6).alias("last_click_value"),
        )
    )


_PIVOT_ORACLE = f"""
SELECT user_id % 10 AS user_bucket,
       {dsum_sql("CASE WHEN event_type = 'click' THEN value ELSE 0 END")} AS click_value,
       {dsum_sql("CASE WHEN event_type = 'view' THEN value ELSE 0 END")} AS view_value,
       {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value
FROM events GROUP BY 1
"""


@register("event_value_pivot", oracle=_PIVOT_ORACLE)
def event_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event types to columns (`groupBy().pivot()` — Catalyst
    rewrites to the same conditional-aggregate shape as the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(dsum(F.coalesce(F.col("value"), F.lit(0.0))))
    )
    return piv.select(
        "user_bucket",
        F.coalesce(F.col("click"), F.lit(0.0)).alias("click_value"),
        F.coalesce(F.col("view"), F.lit(0.0)).alias("view_value"),
        F.coalesce(F.col("purchase"), F.lit(0.0)).alias("purchase_value"),
    )


_CUBE_ORACLE = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(user_id % 4 AS VARCHAR), '<all>') AS user_mod,
       COUNT(*) AS n_events
FROM events
GROUP BY CUBE (event_type, CAST(user_id % 4 AS VARCHAR))
"""


@register("event_cube_rollup", oracle=_CUBE_ORACLE)
def event_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over two dimensions with null-marker folding —
    multi-granularity rollups in one pass (map-side partials per
    grouping set)."""
    ev = load_table(spark, sf_dir, "events")
    cube = ev.cube(
        "event_type", (F.col("user_id") % 4).cast("string").alias("user_mod")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return cube.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(F.col("user_mod"), F.lit("<all>")).alias("user_mod"),
        "n_events",
    )


_KS_ORACLE = """
WITH u AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
  FROM events WHERE event_type IN ('click', 'view')
),
byv AS (SELECT v, SUM(ia) AS na, SUM(ib) AS nb FROM u GROUP BY v),
cum AS (
  SELECT v,
         SUM(na) OVER (ORDER BY v) AS ca,
         SUM(nb) OVER (ORDER BY v) AS cb
  FROM byv
),
tot AS (SELECT SUM(ia) AS ta, SUM(ib) AS tb FROM u)
SELECT ROUND(MAX(ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)), 9) AS ks_stat
FROM cum, tot
"""


@register("ks_drift_statistic", oracle=_KS_ORACLE)
def ks_drift_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (click vs view values) —
    the distribution-drift primitive of the north rule, expressed
    relationally: group by value (distributed), cumulative counts over
    the *grouped* domain (small), max |ECDF diff|.

    The single-partition window only ever sees one row per distinct
    value — at 10^12 rows you'd bucket values first (pqc/constraints/
    drift.py does exactly that); here values are 2-decimal currency so
    the domain is already tiny.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ia"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("ib"),
    )
    byv = u.groupBy("v").agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    totals = u.agg(F.sum("ia").alias("ta"), F.sum("ib").alias("tb"))
    cum = byv.select(
        "v",
        F.sum("na").over(wcum).alias("ca"),
        F.sum("nb").over(wcum).alias("cb"),
    )
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.round(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("ta")
                    - F.col("cb").cast("double") / F.col("tb")
                )
            ),
            9,
        ).alias("ks_stat")
    )


# ---------------------------------------------------------------------------
# Range (interval) join: events ⋈ time windows, binned equi-join form
# ---------------------------------------------------------------------------

N_RANGE_WINDOWS = 10
RANGE_PRE_SEC = 900  # window = [busy_hour - 15 min, busy_hour + 45 min)
RANGE_POST_SEC = 2700
_BIN_SEC = 3600  # bin width ≥ window span → each window spans ≤ 2 bins

_RANGE_JOIN_ORACLE = f"""
WITH busy AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1
  ORDER BY n DESC, h ASC LIMIT {N_RANGE_WINDOWS}
),
win AS (
  SELECT strftime(h, '%Y-%m-%d %H:00:00') AS window_id,
         epoch(h) - {RANGE_PRE_SEC} AS lo,
         epoch(h) + {RANGE_POST_SEC} AS hi
  FROM busy
)
SELECT w.window_id,
       COUNT(*) AS n_events,
       {dsum_sql('e.value')} AS total_value
FROM events e JOIN win w
  ON epoch(e.ts) >= w.lo AND epoch(e.ts) < w.hi
GROUP BY w.window_id
"""


@register("interval_range_join", oracle=_RANGE_JOIN_ORACLE)
def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — the custom-operator family Spark lacks
    natively: every event joins the incident windows containing its
    timestamp (windows = the {N} busiest hours, widened to
    [h−15 min, h+45 min)), rolled up per window.

    The naive plan is a BroadcastNestedLoopJoin on the two range
    predicates — O(|events|·|windows|) comparisons and a plan test
    failure waiting to happen at corpus scale. The scale-correct shape
    implemented here is the standard BINNING rewrite: pick a bin width
    ≥ the window span (1 h), explode each window into the ≤ 2 bins it
    overlaps, bin every event by ts DIV width, EQUI-join on bin, then
    post-filter the exact range. The join becomes a hash join whose
    probe side is pruned to events in candidate bins — at 10^12 events
    the range predicates touch only the ~windows×2-bin slice, and the
    window table stays broadcastable. (Same rewrite DuckDB/Timescale
    apply internally; the oracle states the plain range join.)"""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("double")
    busy = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("h").asc())
        .limit(N_RANGE_WINDOWS)
    )
    win = busy.select(
        F.date_format("h", "yyyy-MM-dd HH:00:00").alias("window_id"),
        (F.col("h").cast("timestamp").cast("double") - RANGE_PRE_SEC).alias("lo"),
        (F.col("h").cast("timestamp").cast("double") + RANGE_POST_SEC).alias("hi"),
    )
    # explode each window into the bins it overlaps (≤ 2 at this span)
    win_binned = win.select(
        "window_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_SEC).cast("long"),
                F.floor((F.col("hi") - 1e-9) / _BIN_SEC).cast("long"),
            )
        ).alias("bin"),
    )
    ev_binned = ev.select(
        epoch.alias("ep"), "value", F.floor(epoch / _BIN_SEC).cast("long").alias("bin")
    )
    joined = (
        ev_binned.join(F.broadcast(win_binned), "bin")
        .filter((F.col("ep") >= F.col("lo")) & (F.col("ep") < F.col("hi")))
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style hierarchical rollup (continuous-aggregate shape)
# ---------------------------------------------------------------------------

_HIER_ORACLE = f"""
WITH hour AS (
  SELECT date_trunc('hour', ts) AS b,
         COUNT(*) AS n_events,
         {dsum_sql('value')} AS total_value
  FROM events GROUP BY 1
),
day AS (
  SELECT date_trunc('day', b) AS b,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         {dsum_sql('total_value')} AS total_value
  FROM hour GROUP BY 1
)
SELECT 'hour' AS level, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
       n_events, total_value
FROM hour
UNION ALL
SELECT 'day' AS level, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
       n_events, total_value
FROM day
"""


@register("hierarchical_time_rollup", oracle=_HIER_ORACLE)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the hour-level rollup is
    computed from the raw events ONCE, and the day level is maintained
    FROM the hour aggregate — an aggregate-on-aggregate whose input is
    |hours| rows, not |events|. That reuse is the entire point of
    continuous aggregates at 10^12 rows: coarser resolutions refresh
    from the materialized finer layer at negligible cost, and a query
    router picks the coarsest layer that answers the question.

    Exactness across the hierarchy: hour totals are decimal-exact sums
    of raw values; the day level is DEFINED as the decimal-exact sum
    of the hour totals (both engines mirror that two-step structure),
    so re-aggregation introduces no float-order drift."""
    ev = load_table(spark, sf_dir, "events")
    hour = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("b")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value")
    )
    day = hour.groupBy(F.date_trunc("day", F.col("b")).alias("b")).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        dsum(F.col("total_value")).alias("total_value"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hour.select(
        F.lit("hour").alias("level"),
        F.date_format("b", fmt).alias("bucket"),
        "n_events",
        "total_value",
    ).unionByName(
        day.select(
            F.lit("day").alias("level"),
            F.date_format("b", fmt).alias("bucket"),
            "n_events",
            "total_value",
        )
    )
