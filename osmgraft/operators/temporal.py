"""As-of (point-in-time) join: each left row matched to the closest
right row at-or-before (or at-or-after) its timestamp, per key.

The reference engine has no temporal operator (it is a batch geodata
importer), but a training-data pipeline over event streams needs this
constantly — joining model events to the latest feature snapshot,
labels to the nearest sensor reading, prices to trades. Spark has no
built-in as-of join; the naive formulations are catastrophic at scale:

- inequality theta-join (``l.ts >= r.ts``) -> BroadcastNestedLoopJoin /
  cartesian per key;
- per-key ``collect_list`` + Python bisect -> all rows of a key in one
  task AND a Python hot path.

The scale-correct shape (same trick Flink/kdb use, expressed in pure
Catalyst) is the **union-tag carry-forward**: tag both inputs, union
them into one frame, hash-shuffle ONCE on the key, sort each partition
by (ts, side), and carry the most recent right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
Every left row then holds exactly the latest right row at-or-before its
timestamp. Cost: ONE shuffle of |L|+|R| rows, no join node at all,
whole-stage codegen either side of the window sort. Skew: bounded by
rows-per-key like any keyed window (salt upstream if one key dominates).

Cross-engine parity: DuckDB ships a native ``ASOF JOIN``, so the oracle
for the backward direction is the real thing, not a replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward")


def _seconds(df: DataFrame, colname: str):
    """Epoch-seconds view of a numeric or timestamp column.

    Timestamps use the engine's second-truncated ``timestamp_diff``-from-
    epoch construction (shared with the batch sessionizer) — it is valid
    for both TIMESTAMP and TIMESTAMP_NTZ and, unlike casting NTZ through
    timestamp_ltz, is not distorted by DST transitions of the session
    timezone (an NTZ->LTZ cast shifts by a non-constant offset across a
    DST boundary, which would bend gap and bucket arithmetic by up to an
    hour)."""
    dt = dict(df.dtypes)[colname]
    if dt.startswith("timestamp"):
        from osmgraft.operators.sessions import _epoch_seconds

        return _epoch_seconds(df, colname).cast("double")
    return F.col(colname).cast("double")


def _ts_seconds_expr(col: Column, ts_type: str) -> Column:
    """Second-truncated epoch of an arbitrary timestamp EXPRESSION (e.g.
    a struct field) whose Spark type string is ``ts_type`` — same
    construction as :func:`_seconds`, usable where no frame is at hand."""
    if not ts_type.startswith("timestamp"):
        return col.cast("double")
    base = F.lit("1970-01-01 00:00:00").cast(ts_type)
    return F.timestamp_diff("SECOND", base, F.date_trunc("second", col)).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_s: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Per-``key`` as-of join of ``left`` against ``right``.

    backward: match the latest right row with ``right_ts <= left_ts``;
    forward: the earliest right row with ``right_ts >= left_ts`` (ties on
    equal timestamps match in both directions, like pandas.merge_asof).
    ``tolerance_s`` drops matches further than that many seconds away.
    ``how='left'`` keeps unmatched left rows with null right columns;
    ``'inner'`` drops them.

    Output: all left columns, then each right payload column suffixed
    ``_right`` (the right ts arrives as ``{right_ts}_right``). Right
    columns are carried as ONE struct through the window, so the carry
    is a single expression regardless of payload width.

    Determinism precondition: the right side should be unique on
    ``(key, right_ts)`` (aggregate it first, as the registry query does)
    — with duplicate right timestamps the carried row among the equals is
    unspecified, same as pandas.merge_asof's input-order dependence.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if key not in left.columns or key not in right.columns:
        raise ValueError(f"key column {key!r} must exist on both sides")

    payload_cols = [c for c in right.columns if c != key]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None)
        .cast(right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType)
        .alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    both = l_tag.unionByName(r_tag)

    # backward: ascending ts; right rows (_is_left=0) sort BEFORE left rows
    # at equal ts so ties match. forward: descending ts, same tie rule.
    order = [F.col("_ts").asc(), F.col("_is_left").asc()]
    if direction == "forward":
        order = [F.col("_ts").desc(), F.col("_is_left").asc()]
    w = Window.partitionBy("_k").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = both.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_is_left") == 1
    )

    if tolerance_s is not None:
        if tolerance_s < 0:
            raise ValueError("tolerance_s must be >= 0")
        l_sec = _ts_seconds_expr(F.col("_ts"), dict(left.dtypes)[left_ts])
        r_sec = _ts_seconds_expr(
            F.col(f"_m.{right_ts}"), dict(right.dtypes)[right_ts]
        )
        gap = F.abs(l_sec - r_sec)
        carried = carried.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_s)), F.col("_m"))
        )
    if how == "inner":
        carried = carried.where(F.col("_m").isNotNull())

    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{c}_right") for c in payload_cols
    ]
    return carried.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    key: str | None = None,
    bucket_s: float = 3600.0,
    max_span_buckets: int = 64,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start <= ts <= end`` (and equal ``key`` when given) — the 1-D
    analogue of the PIP spatial join, with the same scale treatment.

    A naive range theta-join degenerates to BroadcastNestedLoopJoin.
    Instead each interval EXPLODES to the time buckets it covers
    (``sequence(floor(start/b), floor(end/b))``), points compute their
    single bucket, and the join is a plain equi-join on (key, bucket)
    followed by the exact range filter. Each (point, interval) pair can
    meet in exactly one bucket — the point's own — so no dedup pass is
    needed. Cost: one co-partitioned shuffle; interval fan-out bounded
    by its span in buckets.

    Intervals longer than ``max_span_buckets`` buckets are routed down a
    SEPARATE rail: they are assumed rare (a handful of epoch-length
    intervals would otherwise explode), collected to a broadcast side and
    theta-joined — a nested-loop whose build side is the small long-
    interval set, which is the correct plan for that shape. The union of
    both rails equals the plain theta join.

    Output: all point columns plus each interval column suffixed
    ``_iv``."""
    if bucket_s <= 0:
        raise ValueError("bucket_s must be > 0")
    if max_span_buckets < 1:
        raise ValueError("max_span_buckets must be >= 1")
    if key is not None and (key not in points.columns or key not in intervals.columns):
        raise ValueError(f"key column {key!r} must exist on both sides")

    b = F.lit(float(bucket_s))
    p_bucket = F.floor(_seconds(points, ts) / b)
    i_lo = F.floor(_seconds(intervals, start) / b)
    i_hi = F.floor(_seconds(intervals, end) / b)

    iv_cols = [F.col(c).alias(f"{c}_iv") for c in intervals.columns]
    iv = intervals.where(F.col(start) <= F.col(end)).select(
        *iv_cols, i_lo.alias("_lo"), i_hi.alias("_hi")
    )
    short = iv.where(F.col("_hi") - F.col("_lo") < F.lit(max_span_buckets))
    long_ = iv.where(F.col("_hi") - F.col("_lo") >= F.lit(max_span_buckets)).drop(
        "_lo", "_hi"
    )

    pts = points.withColumn("_bucket", p_bucket)
    exploded = short.select(
        *[f"{c}_iv" for c in intervals.columns],
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_bucket"),
    )
    exact = (F.col(ts) >= F.col(f"{start}_iv")) & (F.col(ts) <= F.col(f"{end}_iv"))
    if key is None:
        short_join = pts.join(exploded, "_bucket").where(exact)
        long_join = pts.join(
            F.broadcast(long_),
            (F.col(ts) >= F.col(f"{start}_iv")) & (F.col(ts) <= F.col(f"{end}_iv")),
        )
    else:
        short_join = pts.join(
            exploded,
            (pts["_bucket"] == exploded["_bucket"])
            & (pts[key] == exploded[f"{key}_iv"]),
        ).where(exact)
        long_join = pts.join(
            F.broadcast(long_),
            (pts[key] == long_[f"{key}_iv"])
            & (F.col(ts) >= F.col(f"{start}_iv"))
            & (F.col(ts) <= F.col(f"{end}_iv")),
        )
    out_cols = [*points.columns, *[f"{c}_iv" for c in intervals.columns]]
    return short_join.select(*out_cols).unionByName(long_join.select(*out_cols))


def asof_oracle_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    left_cols: list[str],
    right_payload: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_s: float | None = None,
    how: str = "left",
) -> str:
    """DuckDB replica. backward/no-tolerance uses DuckDB's NATIVE
    ``ASOF JOIN`` (independent implementation, not a transcription of the
    Spark plan); forward and tolerance variants use an explicit
    greatest-timestamp window replica."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    lcols = ", ".join(f"l.{c}" for c in left_cols)
    rcols = ", ".join(f"r.{c} as {c}_right" for c in right_payload)
    if direction == "backward" and tolerance_s is None:
        jk = "join" if how == "inner" else "left join"
        return (
            f"with asof_l as ({left_sql}), asof_r as ({right_sql}) "
            f"select {lcols}, {rcols} from asof_l l asof {jk} asof_r r "
            f"on l.{key} = r.{key} and l.{left_ts} >= r.{right_ts}"
        )
    # window replica: rank right rows by closeness per left row via a
    # lateral best-match subquery (oracle scale only)
    cmp = ">=" if direction == "backward" else "<="
    ord_ = "desc" if direction == "backward" else "asc"
    tol = (
        f" and abs(date_diff('second', r.{right_ts}, l.{left_ts})) "
        f"<= {float(tolerance_s)!r}"
        if tolerance_s is not None
        else ""
    )
    sel_r = ", ".join(f"b.{c} as {c}_right" for c in right_payload)
    base = (
        f"with asof_l as ({left_sql}), asof_r as ({right_sql}) "
        f"select {lcols}, {sel_r} from asof_l l left join lateral ("
        f"select * from asof_r r where r.{key} = l.{key} "
        f"and l.{left_ts} {cmp} r.{right_ts}{tol} "
        f"order by r.{right_ts} {ord_}, 1 limit 1) b on true"
    )
    if how == "inner":
        # key the filter on the matched right TS (never null for a real
        # match) — a payload column may be legitimately NULL on a match
        return f"select * from ({base}) where {right_ts}_right is not null"
    return base
