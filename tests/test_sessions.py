"""Gap-based sessionization: boundary exactness, determinism, rollup."""

from datetime import datetime

import pyspark.sql.functions as F

from osmgraft.operators.sessions import session_stats, sessionize


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _seqs(df):
    out = {}
    for r in df.select("event_id", "session_seq").collect():
        out[r["event_id"]] = r["session_seq"]
    return out


def test_gap_boundary_is_closed_left_open_right(spark):
    # 0 -> +1800s stays in the session; +1801s after that opens a new one
    rows = [
        (1, "2024-01-01 00:00:00", 7, 1.0),
        (2, "2024-01-01 00:30:00", 7, 1.0),  # exactly 1800s later: same
        (3, "2024-01-01 01:00:01", 7, 1.0),  # 1801s later: new session
    ]
    seqs = _seqs(sessionize(_events(spark, rows)))
    assert seqs == {1: 1, 2: 1, 3: 2}


def test_subsecond_gap_uses_second_truncation(spark):
    # truncated-epoch semantics (= DuckDB date_diff): 00:00:00.9 ->
    # 00:30:00.1 is 1800 boundary crossings -> same session, even though
    # the raw microsecond delta is < 1800s; 00:30:00.9 -> 01:00:01.0 is
    # 1801 -> new session even though the raw delta is barely over.
    rows = [
        (1, "2024-01-01 00:00:00.900000", 7, 1.0),
        (2, "2024-01-01 00:30:00.100000", 7, 1.0),
        (3, "2024-01-01 01:00:01.000000", 7, 1.0),
    ]
    seqs = _seqs(sessionize(_events(spark, rows)))
    assert seqs == {1: 1, 2: 1, 3: 2}


def test_users_are_independent_and_first_event_opens(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (2, "2024-01-01 02:00:00", 1, 1.0),
        (3, "2024-01-01 00:00:00", 2, 1.0),
    ]
    seqs = _seqs(sessionize(_events(spark, rows)))
    assert seqs == {1: 1, 2: 2, 3: 1}


def test_equal_timestamps_tiebreak_on_event_id(spark):
    # two events at the same instant sort by event_id; numbering is
    # deterministic and both land in the same session
    rows = [
        (9, "2024-01-01 00:00:00", 3, 1.0),
        (4, "2024-01-01 00:00:00", 3, 1.0),
        (5, "2024-01-01 01:00:00", 3, 1.0),
    ]
    seqs = _seqs(sessionize(_events(spark, rows)))
    assert seqs == {4: 1, 9: 1, 5: 2}


def test_session_stats_rollup(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 7, 1.5),
        (2, "2024-01-01 00:10:00", 7, 2.5),
        (3, "2024-01-01 02:00:00", 7, 4.0),
    ]
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(_events(spark, rows)).collect()
    }
    s1 = out[(7, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_s"] == 600
    assert s1["total_value"] == 4.0
    assert s1["session_start"] == datetime(2024, 1, 1, 0, 0, 0)
    assert s1["session_end"] == datetime(2024, 1, 1, 0, 10, 0)
    s2 = out[(7, 2)]
    assert (s2["n_events"], s2["duration_s"], s2["total_value"]) == (1, 0, 4.0)


def test_single_shuffle_plan(spark):
    # the window and the refined-key aggregate must share ONE exchange,
    # and nothing in the operator may fall back to Python eval
    import re

    rows = [(i, "2024-01-01 00:00:00", i % 3, 1.0) for i in range(30)]
    plan = (
        session_stats(_events(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan
