from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.overlay import poly_intersects_join, rings_intersect


def _star(rng: np.random.Generator, cy: float, cx: float, n: int, rmin: float, rmax: float):
    """Random simple (star-shaped) polygon: sorted angles + random radii."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(rmin, rmax, n)
    return cy + rad * np.sin(ang), cx + rad * np.cos(ang)


def _brute_pairs(polys_l, polys_r):
    out = set()
    for lid, (al, ag) in polys_l.items():
        for rid, (bl, bg) in polys_r.items():
            if rings_intersect(al, ag, bl, bg):
                out.add((lid, rid))
    return out


def _mk_df(spark, polys, idc):
    rows = [(int(i), [float(v) for v in la], [float(v) for v in lo]) for i, (la, lo) in polys.items()]
    return spark.createDataFrame(rows, f"{idc} long, ring_lats array<double>, ring_lons array<double>")


# ---------- kernel unit cases ----------


def _rect(y0, x0, h, w):
    return (
        np.array([y0, y0, y0 + h, y0 + h], float),
        np.array([x0, x0 + w, x0 + w, x0], float),
    )


def test_kernel_overlap_nested_disjoint_cross():
    a = _rect(0.0, 0.0, 10.0, 10.0)
    # partial overlap
    assert rings_intersect(*a, *_rect(5.0, 5.0, 10.0, 10.0))
    # nested both directions (no edge crossings)
    assert rings_intersect(*a, *_rect(2.0, 2.0, 1.0, 1.0))
    assert rings_intersect(*_rect(2.0, 2.0, 1.0, 1.0), *a)
    # disjoint
    assert not rings_intersect(*a, *_rect(20.0, 20.0, 3.0, 3.0))
    # plus/cross shape: edges cross but NO vertex of either is inside the
    # other — the edge-crossing branch alone must catch it
    tall = _rect(-5.0, 2.0, 20.0, 6.0)
    wide = _rect(2.0, -5.0, 6.0, 20.0)
    assert rings_intersect(*tall, *wide)


def test_kernel_concave():
    # C-shaped concave polygon (opening east, notch lat 2..8 x lon 2..10)
    # with a small rect sitting in the notch: inside the C's bbox but
    # outside the polygon
    cl = np.array([0, 10, 10, 8, 8, 2, 2, 0], float)
    cg = np.array([0, 0, 10, 10, 2, 2, 10, 10], float)
    notch = _rect(4.0, 5.0, 2.0, 2.0)  # strictly inside the notch
    assert not rings_intersect(cl, cg, *notch)
    hit = _rect(4.0, -1.0, 2.0, 2.5)  # pokes through the C's spine
    assert rings_intersect(cl, cg, *hit)


# ---------- operator vs brute force ----------


@pytest.mark.parametrize("seed", [1, 7])
def test_overlay_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    nl, nr = 60, 40
    polys_l = {
        i: _star(rng, rng.uniform(-30, 30), rng.uniform(-60, 60), int(rng.integers(3, 9)), 0.5, 3.0)
        for i in range(nl)
    }
    polys_r = {
        i: _star(rng, rng.uniform(-30, 30), rng.uniform(-60, 60), int(rng.integers(3, 9)), 0.5, 3.0)
        for i in range(nr)
    }
    want = _brute_pairs(polys_l, polys_r)
    assert want, "generator produced no intersecting pairs — test would be vacuous"
    out = poly_intersects_join(
        _mk_df(spark, polys_l, "lid"), _mk_df(spark, polys_r, "rid"), "lid", "rid", res=6
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == want


def test_overlay_big_polygon_rail(spark):
    """A continent-sized polygon must route through the broadcast rail and
    still produce exactly the brute-force pairs."""
    rng = np.random.default_rng(3)
    polys_l = {0: _rect(-40.0, -90.0, 80.0, 150.0)}  # 'continent'
    polys_l.update(
        {
            i: _star(rng, rng.uniform(-30, 30), rng.uniform(-60, 60), 6, 0.5, 2.0)
            for i in range(1, 30)
        }
    )
    polys_r = {
        i: _star(rng, rng.uniform(-50, 50), rng.uniform(-120, 120), 5, 0.5, 2.0)
        for i in range(40)
    }
    want = _brute_pairs(polys_l, polys_r)
    out = poly_intersects_join(
        _mk_df(spark, polys_l, "lid"), _mk_df(spark, polys_r, "rid"), "lid", "rid",
        res=6, max_cover_cells=64,
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == want
    # the continent really is oversized at res 6 / 64 cells
    from osmgraft.operators.overlay import cover_estimate

    al, ag = polys_l[0]
    assert cover_estimate(al, ag, 6) > 64


def test_overlay_all_paths_agree(spark):
    """Forcing every polygon down the broadcast rail (max_cover_cells=0)
    must equal the cell-join path pair-for-pair."""
    rng = np.random.default_rng(11)
    polys_l = {i: _star(rng, rng.uniform(-20, 20), rng.uniform(-40, 40), 6, 0.5, 2.5) for i in range(25)}
    polys_r = {i: _star(rng, rng.uniform(-20, 20), rng.uniform(-40, 40), 7, 0.5, 2.5) for i in range(25)}
    ldf, rdf = _mk_df(spark, polys_l, "lid"), _mk_df(spark, polys_r, "rid")
    cells = {(r.lid, r.rid) for r in poly_intersects_join(ldf, rdf, "lid", "rid", res=7).collect()}
    rail = {
        (r.lid, r.rid)
        for r in poly_intersects_join(ldf, rdf, "lid", "rid", res=7, max_cover_cells=0).collect()
    }
    assert cells == rail == _brute_pairs(polys_l, polys_r)


def test_overlay_shared_cell_not_intersecting(spark):
    """Two small polygons in the same covering cell but disjoint must NOT
    pair (the exact kernel, not the candidate stage, decides)."""
    a = {0: _rect(0.1234, 0.1234, 0.2, 0.2)}
    b = {0: _rect(0.5234, 0.5234, 0.2, 0.2)}
    out = poly_intersects_join(_mk_df(spark, a, "lid"), _mk_df(spark, b, "rid"), "lid", "rid", res=3)
    assert out.count() == 0
