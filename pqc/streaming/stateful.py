"""Custom stateful streaming operator: cross-batch uniqueness.

The batch suite's uniqueness constraint needs global state, which the
windowed module deliberately leaves to the batch/ledger path. This is
the true streaming form: per-key state via ``applyInPandasWithState``
(Arrow-batched grouped state, the Python analogue of
flatMapGroupsWithState) remembering the lowest ``seq`` per
``image_id`` across micro-batches and flagging every other occurrence
— min-seq-wins (eventual) semantics matching the batch dedupe keeper
(`artwork_processing_warnings_advisory.py:240-249`), with retroactive
emission of a provisional keeper when a lower seq arrives later.

Scale notes: state is 16 bytes/key (first_seq, n_seen) managed by the
state store (RocksDB-backed on a real cluster); the shuffle is the
groupBy(image_id) hash exchange that any keyed stateful op needs, and
within a key the work is a vectorized pandas sort — no per-row Python
beyond the per-KEY state transition.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

VIOLATION_SCHEMA = "image_id string, seq long, constraint string, detail string"
STATE_SCHEMA = "first_seq long, n_seen long"


DUP_DETAIL = "duplicate image_id (kept lowest seq)"


def _dedup_transition(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Eventual min-seq-wins: the keeper is the LOWEST seq ever seen
    for the id, matching the batch dedupe keeper (lower seq wins,
    `artwork_processing_warnings_advisory.py:240-249`). If a later
    micro-batch delivers a lower seq than the provisional keeper, the
    old keeper is retroactively emitted as a duplicate — so the final
    output set is exactly "every row except min(seq)" REGARDLESS of
    file/batch arrival order. That order-independence is what makes
    the operator oracle-checkable (and correct on out-of-order
    streams, where arrival-order first-wins would be nondeterministic).
    """
    batch = [p for p in pdfs if len(p)]
    if not batch:
        return
    pdf = pd.concat(batch, ignore_index=True).sort_values("seq")
    bmin = int(pdf["seq"].iloc[0])
    if state.exists:
        first_seq, n_seen = state.get
        if bmin < first_seq:
            dup_seqs = [first_seq] + pdf["seq"].iloc[1:].tolist()
            first_seq = bmin
        else:
            dup_seqs = pdf["seq"].tolist()
    else:
        first_seq = bmin
        n_seen = 0
        dup_seqs = pdf["seq"].iloc[1:].tolist()
    state.update((first_seq, n_seen + len(pdf)))
    if dup_seqs:
        yield pd.DataFrame(
            {
                "image_id": key[0],
                "seq": pd.Series(dup_seqs, dtype="int64"),
                "constraint": "uniqueness:image_id",
                "detail": DUP_DETAIL,
            }
        )


def streaming_uniqueness_violations(
    spark: SparkSession, images_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over an arriving images directory → stateful
    min-seq-wins duplicate detection across micro-batches. Emits the
    same violation shape as the batch suite (plus the offending
    ``seq``)."""
    from pqc.fixtures import IMAGE_SCHEMA

    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(images_dir)
    )
    return (
        stream.select("image_id", "seq")
        .groupBy("image_id")
        .applyInPandasWithState(
            _dedup_transition,
            outputStructType=VIOLATION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Driver surface: the stateful operator run to completion over the
# images fixture, with a full DuckDB oracle. The transition's eventual
# min-seq-wins semantics make the final output set exactly "every row
# except min(seq) per duplicated image_id" for ANY micro-batch/file
# arrival order — so the relational oracle is exact by construction,
# not by an assumption about file layout.
# ---------------------------------------------------------------------------


def _stateful_oracle() -> str:
    from pqc.image_queries import _meta_glob

    return f"""
WITH m AS (SELECT image_id, seq FROM {_meta_glob()}),
g AS (
  SELECT image_id, MIN(seq) AS first_seq, COUNT(*) AS n
  FROM m GROUP BY image_id
)
SELECT m.image_id, m.seq,
       'uniqueness:image_id' AS constraint,
       'duplicate image_id (kept lowest seq)' AS detail
FROM m JOIN g ON g.image_id = m.image_id
WHERE g.n > 1 AND m.seq <> g.first_seq
"""


def _register_driver_query() -> None:
    from pqc.registry import register

    @register("streaming_stateful_dedup", oracle=_stateful_oracle())
    def streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """applyInPandasWithState cross-batch uniqueness, driven to
        completion over the partitioned images fixture four files per
        micro-batch (the 128 fixture files make ~32 batches — state
        genuinely crosses batch boundaries). The oracle recomputes the
        all-but-min(seq) set relationally from the payload-free meta
        projection."""
        from pqc.fixtures import cached_images_path
        from pqc.image_queries import FIXTURE_ROWS, _ensure_meta_parquet
        from pqc.streaming.windowed import run_to_completion

        _ensure_meta_parquet(spark, FIXTURE_ROWS)
        path = cached_images_path(spark, FIXTURE_ROWS)
        out = run_to_completion(
            streaming_uniqueness_violations(spark, path, max_files_per_trigger=4),
            "pqc_stateful_dedup",
        )
        return out.localCheckpoint(eager=True).orderBy("image_id", "seq")


_register_driver_query()


# ---------------------------------------------------------------------------
# Stateful streaming sessionization (eventual per-user session summary)
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = "user_id long, n_events long, n_sessions long"
SESSION_STATE_SCHEMA = "n_total long, starts array<double>, ends array<double>"


def _session_transition(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Eventual sessionization with **O(sessions) state** (r4 verdict
    #2: the previous version kept every epoch ever seen — O(events/
    user) state and an O(n log n) re-sort per arrival).

    State = the merged session *intervals* (start, end) plus the total
    event count. Each arriving batch's epochs enter the sweep as
    degenerate [t, t] intervals; intervals whose gap is ≤ the session
    gap merge. This is EXACT for any micro-batch arrival order:
    interval starts/ends are actual event times, so a merge happens
    only where two events chain within the gap, and conversely any two
    globally-consecutive events within the gap end up merged (a late
    bridging event still unions its two neighbour sessions on
    arrival — sessions are monotone under event addition, never
    split). The emission with the highest n_events therefore remains
    the batch-exact answer, which is what makes the DuckDB oracle
    valid. Per-arrival work is O((sessions + batch) log batch); a
    heavy user with millions of events in a handful of sessions
    carries a handful of interval rows in the state store instead of
    millions of epochs (tests/test_streaming.py asserts the bound)."""
    import numpy as np

    from pqc.events_ops import SESSION_GAP_SECONDS

    batch = [p for p in pdfs if len(p)]
    if not batch:
        return
    new_ts = np.sort(
        pd.concat(batch, ignore_index=True)["ts_epoch"].to_numpy(dtype="float64")
    )
    if state.exists:
        n_total, starts, ends = state.get
        s = np.concatenate([np.asarray(starts, dtype="float64"), new_ts])
        e = np.concatenate([np.asarray(ends, dtype="float64"), new_ts])
    else:
        n_total = 0
        s, e = new_ts, new_ts
    order = np.argsort(s, kind="stable")
    s, e = s[order], e[order]
    merged_s, merged_e = [s[0]], [e[0]]
    for i in range(1, len(s)):
        if s[i] - merged_e[-1] <= SESSION_GAP_SECONDS:
            if e[i] > merged_e[-1]:
                merged_e[-1] = e[i]
        else:
            merged_s.append(s[i])
            merged_e.append(e[i])
    n_total = int(n_total) + len(new_ts)
    # plain Python floats: numpy scalars break the state pickler
    state.update(
        (n_total, [float(x) for x in merged_s], [float(x) for x in merged_e])
    )
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_total],
            "n_sessions": [len(merged_s)],
        }
    )


def streaming_sessions(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over an arriving events directory → per-user session
    summaries via applyInPandasWithState. Epochs are computed as
    doubles BEFORE the keyed shuffle (identical to the batch/oracle
    arithmetic, and the state transition never touches timestamp
    dtypes)."""
    from pqc.streaming.windowed import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        stream.select(
            "user_id", F.col("ts").cast("timestamp").cast("double").alias("ts_epoch")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_transition,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _sessionization_oracle() -> str:
    from pqc.events_ops import SESSION_GAP_SECONDS

    return f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {SESSION_GAP_SECONDS}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM g GROUP BY user_id
"""


def _register_session_query() -> None:
    from pqc.registry import register

    @register("streaming_sessionization", oracle=_sessionization_oracle())
    def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The stateful streaming sessionizer driven to completion over
        the events table one file per micro-batch, keeping only each
        user's FINAL summary (max n_events — strictly increasing per
        emission, so max_by is tie-free). Because the transition is
        eventual (recompute-from-full-state), the final summaries equal
        the batch sessionization for ANY arrival order, which is what
        makes the DuckDB oracle exact rather than
        trigger-layout-dependent."""
        from pqc.streaming.windowed import run_to_completion, staged_events_dir

        out = run_to_completion(
            streaming_sessions(
                spark, staged_events_dir(sf_dir, spark, n_files=8)
            ),
            "pqc_stream_sessions",
        )
        final = (
            out.groupBy("user_id")
            .agg(
                F.expr(
                    "max_by(struct(n_events, n_sessions), n_events)"
                ).alias("s")
            )
            .select("user_id", F.col("s.n_events"), F.col("s.n_sessions"))
        )
        return final.localCheckpoint(eager=True).orderBy("user_id")


_register_session_query()
