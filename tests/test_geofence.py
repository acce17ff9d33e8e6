"""Geofence enter/exit events (operators/geofence.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.geofence import geofence_events


def _polys(spark, rows):
    # rows: (poly_id, lat0, lon0, lat1, lon1) axis boxes as rings
    data = [
        (p, [a, a, c, c], [b, d, d, b]) for p, a, b, c, d in rows
    ]
    return spark.createDataFrame(
        data, "poly_id long, ring_lats array<double>, ring_lons array<double>"
    )


def _fixes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, fid long, ts_s long, lat double, lon double"
    )


def _events(df):
    return sorted((r["user_id"], r["ts_s"], r["poly_id"], r["event"]) for r in df.collect())


def test_enter_exit_reenter(spark):
    box = _polys(spark, [(7, 0.0, 0.0, 10.0, 10.0)])
    fx = _fixes(
        spark,
        [
            (1, 0, 0, -5.0, 5.0),   # outside
            (1, 1, 60, 5.0, 5.0),   # enter
            (1, 2, 120, 6.0, 6.0),  # still in: no event
            (1, 3, 180, 15.0, 5.0), # exit
            (1, 4, 240, 5.0, 5.0),  # re-enter
        ],
    )
    assert _events(geofence_events(fx, box, strategy="broadcast")) == [
        (1, 60, 7, "enter"),
        (1, 180, 7, "exit"),
        (1, 240, 7, "enter"),
    ]


def test_first_fix_inside_fires_enter(spark):
    box = _polys(spark, [(3, 0.0, 0.0, 10.0, 10.0)])
    fx = _fixes(spark, [(1, 0, 0, 5.0, 5.0), (1, 1, 60, 5.5, 5.0)])
    assert _events(geofence_events(fx, box, strategy="broadcast")) == [(1, 0, 3, "enter")]


def test_overlapping_polygons_independent(spark):
    boxes = _polys(spark, [(1, 0.0, 0.0, 10.0, 10.0), (2, 4.0, 4.0, 14.0, 14.0)])
    fx = _fixes(
        spark,
        [
            (1, 0, 0, 5.0, 5.0),    # in both -> enter 1, enter 2
            (1, 1, 60, 12.0, 12.0), # only 2 -> exit 1
            (1, 2, 120, -1.0, 5.0), # neither -> exit 2
        ],
    )
    assert _events(geofence_events(fx, boxes, strategy="broadcast")) == [
        (1, 0, 1, "enter"),
        (1, 0, 2, "enter"),
        (1, 60, 1, "exit"),
        (1, 120, 2, "exit"),
    ]


def test_never_inside_no_events(spark):
    box = _polys(spark, [(1, 0.0, 0.0, 1.0, 1.0)])
    fx = _fixes(spark, [(1, 0, 0, 50.0, 50.0), (1, 1, 60, 51.0, 50.0)])
    assert geofence_events(fx, box, strategy="broadcast").count() == 0


def test_partitioning_and_order_invariant(spark):
    boxes = _polys(spark, [(i, float(i), 0.0, float(i) + 5.0, 20.0) for i in range(5)])
    rows = [
        (u, u * 100 + t, t * 60, (u * 7 + t * 3) % 12 - 1.5, 10.0)
        for u in range(6)
        for t in range(8)
    ]
    fx = _fixes(spark, rows)
    a = _events(geofence_events(fx.repartition(1), boxes, strategy="broadcast"))
    b = _events(geofence_events(fx.repartition(9, "fid"), boxes, strategy="broadcast"))
    assert a == b and len(a) > 0


def test_stream_geofence_matches_batch(spark, tmp_path):
    """Two-batch file stream of in-order fixes: emitted enter/exit events
    must equal the batch operator's over the full data (state carries the
    inside-set across the batch boundary)."""
    import os

    from osmgraft.streaming.ingest import stream_geofence

    fences = [
        (1, [0.0, 0.0, 10.0, 10.0], [0.0, 10.0, 10.0, 0.0]),
        (2, [4.0, 4.0, 14.0, 14.0], [4.0, 14.0, 14.0, 4.0]),
    ]
    rows1, rows2 = [], []
    for u in (1, 2):
        # walk: out -> in 1 -> in both -> only 2 (exit 1) | batch 2: out (exit 2), back in 1
        rows1 += [
            (u, u * 10 + 0, 0, -3.0 + u * 0.1, 5.0),
            (u, u * 10 + 1, 60, 5.0, 5.0 + u * 0.1),
            (u, u * 10 + 2, 120, 6.0, 6.0),
            (u, u * 10 + 3, 180, 12.0, 12.0),
        ]
        rows2 += [
            (u, u * 10 + 4, 240, -3.0, 5.0),
            (u, u * 10 + 5, 300, 5.0, 5.0),
        ]
    schema = "user_id long, fid long, ts_s long, lat double, lon double"
    src = str(tmp_path / "fx_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_geofence(stream, fences)
        .writeStream.format("memory")
        .queryName("geofence_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_gf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["ts_s"], r["poly_id"], r["event"])
        for r in spark.sql("select * from geofence_stream").collect()
    )

    polys = _polys(spark, [(1, 0.0, 0.0, 10.0, 10.0), (2, 4.0, 4.0, 14.0, 14.0)])
    full = _fixes(spark, rows1 + rows2)
    want = _events(geofence_events(full, polys, strategy="broadcast"))
    assert got == want
    assert len(got) > 0


def test_dwell_intervals_pairing(spark):
    from osmgraft.operators.geofence import dwell_intervals, geofence_events

    box = _polys(spark, [(7, 0.0, 0.0, 10.0, 10.0)])
    fx = _fixes(
        spark,
        [
            (1, 0, 0, -5.0, 5.0),
            (1, 1, 60, 5.0, 5.0),    # enter
            (1, 2, 180, 15.0, 5.0),  # exit -> dwell 120
            (1, 3, 240, 5.0, 5.0),   # re-enter, still open
        ],
    )
    out = dwell_intervals(geofence_events(fx, box, strategy="broadcast")).collect()
    rows = sorted((r["enter_s"], r["exit_s"], r["dwell_s"]) for r in out)
    assert rows == [(60, 180, 120), (240, None, None)]
