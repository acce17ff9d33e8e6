from __future__ import annotations

import re

import pytest

from osmgraft.operators.trajectory import stay_points


def _fixes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s long, lat double, lon double"
    )


def test_stay_point_detected_and_summarized(spark):
    # user 1: four fixes ~50 m apart over 700 s (a stay), then a 10 km
    # jump followed by a single fix (no stay: 1 fix, 0 dwell)
    fx = _fixes(
        spark,
        [
            (1, 1, 0, 48.0000, 9.0000),
            (1, 2, 200, 48.0004, 9.0000),
            (1, 3, 450, 48.0000, 9.0006),
            (1, 4, 700, 48.0002, 9.0002),
            (1, 5, 1000, 48.0900, 9.0000),
        ],
    )
    out = stay_points(
        fx, ts_col="ts_s", order_tiebreak="event_id", jump_m=200.0,
        min_duration_s=600, min_pts=3,
    ).collect()
    assert len(out) == 1
    s = out[0]
    assert (s["n_fixes"], s["t_start"], s["t_end"], s["dwell_s"]) == (4, 0, 700, 700)
    assert abs(s["lat"] - 48.00015) < 1e-9  # plain fix-average centroid
    assert abs(s["lon"] - 9.0002) < 1e-9


def test_short_dwell_and_few_fixes_filtered(spark):
    fx = _fixes(
        spark,
        [
            # dwell 100 s < 600 -> out
            (2, 1, 0, 10.0, 10.0),
            (2, 2, 50, 10.0001, 10.0),
            (2, 3, 100, 10.0, 10.0001),
            # 2 fixes < min_pts 3 -> out (even with long dwell)
            (3, 1, 0, 20.0, 20.0),
            (3, 2, 5000, 20.0001, 20.0),
        ],
    )
    out = stay_points(
        fx, ts_col="ts_s", order_tiebreak="event_id", jump_m=200.0,
        min_duration_s=600, min_pts=3,
    ).collect()
    assert out == []


def test_jump_splits_runs_per_user_independently(spark):
    # two stays for user 4 split by one big jump; user 5 unaffected
    rows = [(4, i, i * 300, 30.0 + (0.0001 if i % 2 else 0.0), 30.0) for i in range(1, 4)]
    rows += [(4, i, i * 300, 31.0 + (0.0001 if i % 2 else 0.0), 30.0) for i in range(4, 7)]
    rows += [(5, i, i * 300, 40.0, 40.0) for i in range(1, 4)]
    out = stay_points(
        _fixes(spark, rows), ts_col="ts_s", order_tiebreak="event_id",
        jump_m=200.0, min_duration_s=600, min_pts=3,
    ).collect()
    got = sorted((r["user_id"], r["n_fixes"]) for r in out)
    assert got == [(4, 3), (4, 3), (5, 3)]


def test_single_shuffle_plan(spark):
    fx = _fixes(spark, [(1, 1, 0, 0.0, 0.0)])
    plan = (
        stay_points(fx, ts_col="ts_s", order_tiebreak="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window + refined-key aggregate share ONE hash exchange; no joins
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert not re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert "Python" not in plan


def test_od_flows_from_stays(spark):
    from osmgraft.operators.trajectory import od_flows

    # user 1: three stays A -> B -> A; user 2: one stay (no leg)
    stays = spark.createDataFrame(
        [
            (1, 1, 0, 1000, 48.0, 9.0),
            (1, 2, 2000, 3000, 48.0, 12.5),  # different z7 tile (2.8 deg/tile)
            (1, 3, 5000, 6000, 48.0, 9.0),
            (2, 1, 0, 1000, -30.0, 100.0),
        ],
        "user_id long, stay_seq long, t_start long, t_end long, lat double, lon double",
    )
    out = od_flows(stays, z=7).collect()
    flows = {(r.from_x, r.from_y, r.to_x, r.to_y): (r.n_trips, r.avg_transit_s) for r in out}
    assert len(flows) == 2
    # legs: A->B transit 2000-1000=1000; B->A transit 5000-3000=2000
    assert sorted(v for v in flows.values()) == [(1, 1000.0), (1, 2000.0)]
    # directionality: the two flows are reverses of each other
    keys = list(flows)
    assert keys[0][:2] == keys[1][2:] and keys[0][2:] == keys[1][:2]


def test_od_flows_intra_cell_leg_kept(spark):
    from osmgraft.operators.trajectory import od_flows

    stays = spark.createDataFrame(
        [(5, 1, 0, 100, 10.0, 10.0), (5, 2, 400, 500, 10.0001, 10.0001)],
        "user_id long, stay_seq long, t_start long, t_end long, lat double, lon double",
    )
    out = od_flows(stays, z=7).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.from_x, r.from_y) == (r.to_x, r.to_y)
    assert r.n_trips == 1 and r.avg_transit_s == 300.0


def test_radius_of_gyration_values(spark):
    from osmgraft.operators.trajectory import radius_of_gyration

    fx = spark.createDataFrame(
        [
            (1, 50.0, 10.0),            # single fix -> rog 0
            (2, 0.0, 0.0), (2, 0.0, 0.2),  # symmetric pair on the equator
        ],
        "user_id long, lat double, lon double",
    )
    out = {r.user_id: (r.n_fixes, r.rog_m) for r in radius_of_gyration(fx).collect()}
    assert out[1] == (1, 0.0)
    n, rog = out[2]
    assert n == 2
    # centroid = midpoint; each fix ~11.12 km away (0.1 deg of equator lon)
    expect = 0.1 / 360.0 * 2 * 3.141592653589793 * 6371008.8
    assert abs(rog - expect) / expect < 1e-6


# --- fixed-interval resampling ----------------------------------------------


def _fx(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_s long, lat double, lon double")


def test_resample_linear_interpolation(spark):
    from osmgraft.operators.trajectory import resample_track

    # one pair spanning 100..300, grid 60: instants 120, 180, 240
    out = resample_track(_fx(spark, [(1, 100, 10.0, 20.0), (1, 300, 12.0, 24.0)]), 60)
    rows = sorted((r["ts_s"], r["lat"], r["lon"]) for r in out.collect())
    assert [t for t, _, _ in rows] == [120, 180, 240]
    for t, la, lo in rows:
        fr = (t - 100) / 200
        assert la == pytest.approx(10.0 + fr * 2.0, abs=1e-12)
        assert lo == pytest.approx(20.0 + fr * 4.0, abs=1e-12)


def test_resample_on_grid_start_included_end_excluded(spark):
    from osmgraft.operators.trajectory import resample_track

    out = resample_track(_fx(spark, [(1, 120, 1.0, 1.0), (1, 240, 2.0, 2.0)]), 60)
    ts = sorted(r["ts_s"] for r in out.collect())
    assert ts == [120, 180]  # the 240 instant belongs to the next pair (absent)


def test_resample_no_duplicates_across_pairs(spark):
    from osmgraft.operators.trajectory import resample_track

    fixes = _fx(spark, [(1, 0, 0.0, 0.0), (1, 120, 1.0, 1.0), (1, 240, 2.0, 2.0)])
    out = resample_track(fixes, 60).collect()
    ts = sorted(r["ts_s"] for r in out)
    assert ts == [0, 60, 120, 180]


def test_resample_max_gap_rail(spark):
    from osmgraft.operators.trajectory import resample_track

    fixes = _fx(
        spark,
        [(1, 0, 0.0, 0.0), (1, 120, 1.0, 1.0), (1, 100000, 2.0, 2.0)],
    )
    out = resample_track(fixes, 60, max_gap_s=600).collect()
    assert sorted(r["ts_s"] for r in out) == [0, 60]  # the hole emits nothing


def test_resample_users_independent_and_unsorted_input(spark):
    from osmgraft.operators.trajectory import resample_track

    fixes = _fx(
        spark,
        [(2, 180, 5.0, 5.0), (1, 120, 1.0, 1.0), (2, 60, 4.0, 4.0), (1, 0, 0.0, 0.0)],
    ).repartition(5)
    out = resample_track(fixes, 60).collect()
    got = sorted((r["user_id"], r["ts_s"]) for r in out)
    assert got == [(1, 0), (1, 60), (2, 60), (2, 120)]


# --- GPS spike removal -------------------------------------------------------


def test_spike_interior_teleport_dropped(spark):
    from osmgraft.operators.trajectory import spike_filter

    fixes = _fx(
        spark,
        [
            (1, 0, 10.0, 20.0),
            (1, 60, 10.0005, 20.0),   # ~55 m in 60 s: slow
            (1, 120, 30.0, 50.0),     # teleport
            (1, 180, 10.0010, 20.0),  # back on track
            (1, 240, 10.0015, 20.0),
        ],
    )
    out = sorted(r["ts_s"] for r in spike_filter(fixes, max_speed_ms=30.0).collect())
    assert out == [0, 60, 180, 240]


def test_spike_fast_vehicle_kept(spark):
    from osmgraft.operators.trajectory import spike_filter

    # every leg ~40 m/s — fast but consistent: the bridge is also fast,
    # so nothing is a spike
    fixes = _fx(spark, [(1, t * 60, 10.0 + t * 0.0215, 20.0) for t in range(6)])
    assert spike_filter(fixes, max_speed_ms=30.0).count() == 6


def test_spike_endpoints_conservative(spark):
    from osmgraft.operators.trajectory import spike_filter

    # first fix is a teleport relative to the rest: kept (no second leg)
    fixes = _fx(
        spark,
        [(1, 0, 50.0, 80.0), (1, 60, 10.0, 20.0), (1, 120, 10.0005, 20.0)],
    )
    assert spike_filter(fixes, max_speed_ms=30.0).count() == 3


def test_spike_zero_dt_displacement(spark):
    from osmgraft.operators.trajectory import spike_filter

    # same-second displaced fix between close neighbors: dropped
    fixes = _fx(
        spark,
        [(1, 0, 10.0, 20.0), (1, 60, 35.0, 20.0), (1, 60, 10.0002, 20.0), (1, 120, 10.0004, 20.0)],
    )
    # order tiebreak on lat puts the teleport between the slow fixes
    out = spike_filter(fixes, max_speed_ms=30.0, order_tiebreak="lat")
    assert sorted((r["ts_s"], r["lat"]) for r in out.collect()) == [
        (0, 10.0),
        (60, 10.0002),
        (120, 10.0004),
    ]
