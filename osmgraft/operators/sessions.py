"""Gap-based event sessionization: the canonical clickstream/log operator.

A session is a maximal run of a user's events where consecutive events
are no more than ``gap_seconds`` apart (industry default 30 min). This
is the workhorse of event-log curation at scale — turning a 10^12-row
raw event table into per-session training examples (user trajectories,
interaction transcripts) — and the reference-shaped analog of the
engine's label-grouping passes: partition by an entity key, order by a
monotone column, segment on a predicate over adjacent rows.

Execution shape (the one that survives 100 TB):

- ONE hash shuffle on the user key; everything after it — ``lag``,
  the gap predicate, the running ``sum`` that numbers sessions, and the
  per-session aggregate — runs inside the same partitioning, so Spark
  plans a single Exchange followed by in-partition Window + partial
  aggregation, all whole-stage codegen (no Python anywhere).
- Gap arithmetic is done on SECOND-TRUNCATED epoch values — computed
  timezone-free as ``timestamp_diff(SECOND, epoch, date_trunc(second,
  ts))``, which works for both TIMESTAMP and TIMESTAMP_NTZ columns — so
  the boundary predicate evaluates bit-identically in any engine
  (DuckDB replays it with ``date_diff('second', ...)``, which counts
  the same second-boundary crossings).
- Ordering ties are broken by ``event_id`` so session numbering is
  deterministic under retries and across engines.

Skew note: the per-user window is O(events-per-user) within one task.
Salting cannot apply here (session numbering is a running sum over the
user's full ordered history), so the rail for a pathological hot user is
time-range pre-splitting: sessionize per (user, coarse time bucket) and
merge at bucket boundaries — only sessions spanning a boundary (at most
one per bucket) need the second pass. Not implemented; at the reference
workload's event cardinality per user (thousands, not billions) the
single-window form is the right default and the bucketed form is a
mechanical extension.

Reference analog: the importer's per-entity ordered grouping of member
rows (relation assembly, ``osmpbfreader`` member walks); sessionization
is the same partition-order-segment pattern applied to the events table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

DEFAULT_GAP_SECONDS = 1800  # 30 min, the standard web-analytics cutoff


def _epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Second-truncated naive epoch of ``ts_col`` (NTZ- and LTZ-safe).

    ``timestamp_diff`` of complete seconds from an epoch literal cast to
    the column's own timestamp flavor — equals DuckDB's
    ``date_diff('second', TIMESTAMP '1970-01-01', ts)`` boundary count.
    """
    ts_type = df.schema[ts_col].dataType.simpleString()
    base = F.lit("1970-01-01 00:00:00").cast(ts_type)
    return F.timestamp_diff("SECOND", base, F.date_trunc("second", F.col(ts_col)))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Assign a per-user ``session_seq`` (1-based) to every event.

    An event opens a new session iff it is the user's first event or it
    arrives strictly more than ``gap_seconds`` after the previous event
    (measured on second-truncated epochs — an event at exactly
    ``gap_seconds`` stays in the session, matching the usual closed
    left / open right convention).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    ts_s = _epoch_seconds(events, ts_col)
    prev_s = F.lag(ts_s).over(w)
    is_new: Column = F.when(
        prev_s.isNull() | ((ts_s - prev_s) > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    # Running sum over the SAME window spec -> numbering reuses the one
    # exchange; rowsBetween makes the frame explicit (running, not full).
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_seq", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration, value sum.

    The aggregate's key ``(user, session_seq)`` is a refinement of the
    window's partitioning key, so Catalyst plans it as an in-partition
    hash aggregate after the window — the whole operator is one shuffle.
    ``duration_s`` is end - start on second-truncated epochs (identical
    to DuckDB's ``date_diff('second', min(ts), max(ts))``).
    """
    sess = sessionize(events, user_col, ts_col, order_tiebreak, gap_seconds)
    ts_s = _epoch_seconds(events, ts_col)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_s) - F.min(ts_s)).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return sess.groupBy(F.col(user_col), F.col("session_seq")).agg(*aggs)
