"""Distributed DBSCAN (operators/cluster.py): textbook role assignment,
min-label determinism, and exact agreement with a sequential brute-force
reference on a seeded random instance."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.cluster import dbscan


def _pts_df(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def _collect(df):
    return {r["pid"]: (r["cluster"], r["role"]) for r in df.collect()}


def test_textbook_roles(spark):
    # 5x5 dense blob (111 m spacing), a 3-chain too sparse to be core,
    # one isolated point
    rows = [(i, (i % 5) * 0.001, (i // 5) * 0.001) for i in range(25)]
    rows += [(100 + i, 5.0 + i * 0.001, 5.0) for i in range(3)]
    rows += [(200, 9.0, 9.0)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=4))
    for i in range(25):
        assert got[i] == (0, "core")  # min id of the blob
    for p in (100, 101, 102, 200):
        assert got[p] == (None, "noise")


def test_border_points(spark):
    # 4 mutually-close cores + one point within eps of exactly one core
    rows = [(i, i * 0.0005, 0.0) for i in range(4)]
    rows.append((10, 4 * 0.0005 + 0.0008, 0.0))  # ~90m past pid 3 only
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=4))
    assert got[10] == (0, "border")
    assert all(got[i] == (0, "core") for i in range(4))


def test_two_clusters_min_label(spark):
    rows = [(i, i * 0.0005, 0.0) for i in range(4)]
    rows += [(50 + i, 3.0 + i * 0.0005, 3.0) for i in range(4)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=200.0, min_pts=3))
    assert {got[i][0] for i in range(4)} == {0}
    assert {got[50 + i][0] for i in range(4)} == {50}


def test_singleton_core_min_pts_1(spark):
    rows = [(7, 1.0, 1.0), (9, 2.0, 2.0)]
    got = _collect(dbscan(_pts_df(spark, rows), eps_m=100.0, min_pts=1))
    assert got[7] == (7, "core") and got[9] == (9, "core")


def _hav_m(a, b):
    R = 6371008.8
    p1, p2 = math.radians(a[0]), math.radians(b[0])
    x = (
        math.sin(math.radians(b[0] - a[0]) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(math.radians(b[1] - a[1]) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(x))


def _ref_dbscan(pts, eps_m, min_pts):
    """Sequential reference of the deterministic min-label formulation."""
    ids = sorted(pts)
    nb = {i: [j for j in ids if j != i and _hav_m(pts[i], pts[j]) <= eps_m] for i in ids}
    core = {i for i in ids if len(nb[i]) + 1 >= min_pts}
    # components of the core-core graph, labeled by min id
    label = {}
    for i in sorted(core):
        if i in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in nb[x]:
                if y in core and y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cs = [label[j] for j in nb[i] if j in core]
            out[i] = (min(cs), "border") if cs else (None, "noise")
    return out


@pytest.mark.parametrize("min_pts", [3, 5])
def test_matches_bruteforce_reference(spark, min_pts):
    rng = random.Random(4242)
    pts = {}
    pid = 0
    for cx, cy, n, spread in [(0.0, 0.0, 40, 0.004), (0.05, 0.02, 30, 0.003), (-3.0, 1.0, 8, 0.02)]:
        for _ in range(n):
            pts[pid] = (cx + rng.uniform(-spread, spread), cy + rng.uniform(-spread, spread))
            pid += 1
    for _ in range(15):  # scattered noise
        pts[pid] = (rng.uniform(-5, 5), rng.uniform(-5, 5))
        pid += 1
    df = _pts_df(spark, [(i, la, lo) for i, (la, lo) in pts.items()]).repartition(6)
    got = _collect(dbscan(df, eps_m=400.0, min_pts=min_pts))
    assert got == _ref_dbscan(pts, 400.0, min_pts)


# --- convex hulls per group --------------------------------------------------


def _hull_rows(spark, rows):
    from osmgraft.operators.cluster import convex_hulls

    df = spark.createDataFrame(rows, "cluster long, pid long, lat double, lon double")
    out = convex_hulls(df).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["cluster"], []).append((r["seq"], r["pid"], r["lat"], r["lon"]))
    return {g: [t[1:] for t in sorted(v)] for g, v in by_g.items()}


def test_hull_square_collinear_and_interior(spark):
    rows = [
        (0, 1, 0.0, 0.0), (0, 2, 0.0, 4.0), (0, 3, 4.0, 4.0), (0, 4, 4.0, 0.0),
        (0, 5, 0.0, 2.0),   # collinear edge midpoint: not a corner
        (0, 6, 2.0, 2.0),   # interior
    ]
    got = _hull_rows(spark, rows)[0]
    assert sorted(p for p, _, _ in got) == [1, 2, 3, 4]
    assert got[0][1:] == (0.0, 0.0)  # starts at lexicographic min


def test_hull_degenerate_groups(spark):
    rows = [(1, 9, 5.0, 5.0), (2, 3, 1.0, 1.0), (2, 4, 2.0, 2.0)]
    got = _hull_rows(spark, rows)
    assert [p for p, _, _ in got[1]] == [9]
    assert sorted(p for p, _, _ in got[2]) == [3, 4]


def test_hull_duplicate_coords_min_id(spark):
    rows = [(0, 7, 0.0, 0.0), (0, 5, 0.0, 0.0), (0, 8, 0.0, 3.0), (0, 9, 3.0, 0.0)]
    got = _hull_rows(spark, rows)[0]
    assert sorted(p for p, _, _ in got) == [5, 8, 9]


def test_hull_matches_edge_test_reference(spark):
    import random

    rng = random.Random(7)
    rows = []
    for g in range(3):
        for i in range(40):
            # dyadic grid: exact cross products in the reference too
            rows.append(
                (g, g * 100 + i, rng.randrange(-64, 65) / 8.0, rng.randrange(-64, 65) / 8.0)
            )
    got = _hull_rows(spark, rows)
    for g in range(3):
        pts = {pid: (la, lo) for gg, pid, la, lo in rows if gg == g}
        uniq = {}
        for pid in sorted(pts):
            uniq.setdefault(pts[pid], pid)
        coords = list(uniq)

        def corner(v):
            for b in coords:
                if b == v:
                    continue
                ok = True
                for c in coords:
                    if c in (v, b):
                        continue
                    cr = (b[1] - v[1]) * (c[0] - v[0]) - (b[0] - v[0]) * (c[1] - v[1])
                    if cr > 0:
                        continue
                    if cr == 0:
                        dot = (c[1] - v[1]) * (b[1] - v[1]) + (c[0] - v[0]) * (b[0] - v[0])
                        ln = (b[1] - v[1]) ** 2 + (b[0] - v[0]) ** 2
                        if 0 <= dot <= ln:
                            continue
                    ok = False
                    break
                if ok:
                    return True
            return False

        want = sorted(uniq[v] for v in coords if corner(v))
        assert sorted(p for p, _, _ in got[g]) == want


def test_hull_vertices_enclose_all_points(spark):
    import random

    rng = random.Random(11)
    rows = [(0, i, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(200)]
    got = _hull_rows(spark, rows)[0]
    hull = [(la, lo) for _, la, lo in got]
    n = len(hull)
    assert n >= 3
    # every input point on/inside the hull polygon (all cross signs one way)
    for _, _, la, lo in rows:
        signs = []
        for i in range(n):
            a, b = hull[i], hull[(i + 1) % n]
            signs.append((b[1] - a[1]) * (la - a[0]) - (b[0] - a[0]) * (lo - a[1]))
        assert all(s >= -1e-12 for s in signs) or all(s <= 1e-12 for s in signs)
