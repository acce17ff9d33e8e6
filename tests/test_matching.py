"""HMM map matching (operators/matching.py): candidate completeness,
Viterbi optimality vs path enumeration, smoothness-vs-greedy behavior,
and partitioning determinism."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.matching import _trans_i, match_candidates, viterbi_match

RADIUS = 20_000.0
KW = dict(radius_m=RADIUS, sigma_m=2000.0, beta_m=2000.0, min_cos_lat=0.45)


@pytest.fixture(scope="module")
def roads(spark):
    # three parallel east-west lines 0.02 deg (~2.2 km) apart
    return spark.createDataFrame(
        [(j, 10.0 + j * 0.02, 20.0, 10.0 + j * 0.02, 20.5) for j in range(3)],
        "sid long, lat1 double, lon1 double, lat2 double, lon2 double",
    )


def _fixes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, fid long, ts_s long, lat double, lon double"
    )


def test_candidates_topk_and_radius(spark, roads):
    fixes = _fixes(spark, [(0, t, t * 60, 10.021, 20.05 + t * 0.1) for t in range(3)])
    out = match_candidates(fixes, roads, RADIUS, 2000.0, cand_k=2, min_cos_lat=0.45).collect()
    by_fix = {}
    for r in out:
        by_fix.setdefault(r["fid"], []).append(r)
    for fid, rows in by_fix.items():
        assert len(rows) <= 2
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        for r in rows:
            assert r["dist_m"] <= RADIUS
        # top-k by (distance, sid): rank 1 is the strictly nearest here
        rows.sort(key=lambda r: r["rank"])
        assert rows[0]["sid"] == 1  # the 10.02 line is nearest to lat 10.021
        assert rows[0]["dist_m"] <= rows[-1]["dist_m"]


def test_candidates_complete_vs_bruteforce(spark, roads):
    """Every (fix, segment) pair within the radius surfaces before the
    top-k cut (cell covering misses nothing)."""
    fixes = _fixes(spark, [(0, t, t * 60, 10.0 + t * 0.013, 20.1 + t * 0.07) for t in range(4)])
    out = match_candidates(fixes, roads, RADIUS, 2000.0, cand_k=10, min_cos_lat=0.45)
    got = {(r["fid"], r["sid"]) for r in out.collect()}
    segs = roads.collect()
    import math

    from osmgraft.operators.knn import DEG_M

    for f in fixes.collect():
        for s in segs:
            c = math.cos(math.radians(f["lat"]))
            ax, ay = (s["lon1"] - f["lon"]) * c, s["lat1"] - f["lat"]
            bx, by = (s["lon2"] - f["lon"]) * c, s["lat2"] - f["lat"]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            u = -(ax * dx + ay * dy)
            if u <= 0:
                d2 = ax * ax + ay * ay
            elif u >= len2:
                d2 = bx * bx + by * by
            else:
                d2 = max(0.0, ax * ax + ay * ay - u * u / len2)
            if math.sqrt(d2) * DEG_M <= RADIUS * 0.999:
                assert (f["fid"], s["sid"]) in got


def test_viterbi_smooth_vs_greedy(spark, roads):
    """A steady eastward walk along the middle line with two outlier
    fixes jittered past the midline: greedy per-fix nearest hops to the
    outer line for the outliers; the HMM with a strong transition prior
    (small beta) keeps the whole track on the line the movement fits."""
    rows = []
    for t in range(6):
        jitter = 0.012 if t in (2, 4) else 0.0  # outliers closer to line 2
        rows.append((0, t, t * 60, 10.02 + jitter, 20.05 + t * 0.08))
    fixes = _fixes(spark, rows)
    smooth = viterbi_match(
        fixes, roads, RADIUS, sigma_m=20000.0, beta_m=50.0, min_cos_lat=0.45
    ).collect()
    assert {r["sid"] for r in smooth} == {1}  # one consistent line
    greedy = viterbi_match(
        fixes, roads, RADIUS, sigma_m=5.0, beta_m=1e9, min_cos_lat=0.45
    ).collect()
    # emission-dominant decode reproduces per-fix nearest: outliers hop
    assert {r["sid"] for r in greedy} == {1, 2}
    hops = {r["ts_s"] for r in greedy if r["sid"] == 2}
    assert hops == {120, 240}


def test_viterbi_equals_path_enumeration(spark, roads):
    """The DP decode equals brute-force enumeration of every trellis path
    under the exact integer cost model and (cost, path) tie-break."""
    rows = [
        (0, t, t * 60, 10.0 + (t * 7 % 5) * 0.009, 20.03 + t * 0.06) for t in range(5)
    ] + [(1, 10 + t, t * 60, 10.04 - (t % 3) * 0.011, 20.4 - t * 0.05) for t in range(4)]
    fixes = _fixes(spark, rows)
    cand = match_candidates(fixes, roads, RADIUS, 2000.0, cand_k=3, min_cos_lat=0.45).collect()
    out = viterbi_match(fixes, roads, RADIUS, sigma_m=2000.0, beta_m=2000.0, min_cos_lat=0.45)
    got = {(r["user_id"], r["ts_s"]): r["sid"] for r in out.collect()}

    from osmgraft.operators.knn import DEG_M

    beta_deg = 2000.0 / DEG_M
    for uid in {r["user_id"] for r in cand}:
        steps = {}
        for r in (r for r in cand if r["user_id"] == uid):
            steps.setdefault((r["ts_s"], r["fid"]), []).append(r)
        keys = sorted(steps)
        best = None
        for combo in itertools.product(*(steps[k] for k in keys)):
            cost = sum(int(r["emit_i"]) for r in combo)
            for a, b in zip(combo, combo[1:]):
                cost += _trans_i(
                    a["snap_lat"], a["snap_lon"], b["snap_lat"], b["snap_lon"],
                    a["lat"], a["lon"], b["lat"], b["lon"], a["_cl"], beta_deg,
                )
            key = (cost, tuple(int(r["sid"]) for r in combo))
            if best is None or key < best:
                best = key
        for (ts, _), sid in zip(keys, best[1]):
            assert got[(uid, ts)] == sid, (uid, ts)


def test_viterbi_partitioning_invariant(spark, roads):
    rows = [(u, u * 10 + t, t * 60, 10.0 + ((u + t) % 5) * 0.01, 20.05 + t * 0.07)
            for u in range(4) for t in range(5)]
    fixes = _fixes(spark, rows)
    a = viterbi_match(fixes.repartition(1), roads, RADIUS, min_cos_lat=0.45, **{})
    b = viterbi_match(fixes.repartition(7, "fid"), roads, RADIUS, min_cos_lat=0.45)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_viterbi_drops_uncovered_fixes(spark, roads):
    rows = [(0, 0, 0, 10.02, 20.1), (0, 1, 60, -45.0, -120.0), (0, 2, 120, 10.02, 20.2)]
    out = viterbi_match(_fixes(spark, rows), roads, RADIUS, min_cos_lat=0.45).collect()
    assert sorted(r["ts_s"] for r in out) == [0, 120]
    assert all(r["sid"] == 1 for r in out)
