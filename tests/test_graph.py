"""Fixed-iteration PageRank: semantics, conservation, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.graph import pagerank, pagerank_oracle_sql


def _edges(spark, rows, partitions=None):
    df = spark.createDataFrame(rows, "src long, dst long")
    return df.repartition(partitions) if partitions else df


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_symmetric(spark):
    pr = _ranks(pagerank(_edges(spark, [(0, 1), (1, 0)]), iterations=10))
    assert pr[0] == pr[1]
    assert pr[0] == pytest.approx(0.5, abs=1e-9)


def test_star_concentrates_rank_on_hub(spark):
    # 5 leaves -> hub; hub dangles (its mass redistributes uniformly)
    pr = _ranks(pagerank(_edges(spark, [(i, 99) for i in range(1, 6)]), iterations=5))
    assert pr[99] == max(pr.values())
    leaf = [v for k, v in pr.items() if k != 99]
    assert all(v == leaf[0] for v in leaf)  # leaves are symmetric


def test_mass_conserved_with_dangling(spark):
    # chain with a dangling tail: total rank stays ~1 every config
    edges = [(i, i + 1) for i in range(20)]  # node 20 dangles
    total = (
        pagerank(_edges(spark, edges), iterations=7)
        .agg(F.sum("rank"))
        .first()[0]
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_duplicate_edges_count_once(spark):
    base = [(0, 1), (1, 2), (2, 0)]
    a = _ranks(pagerank(_edges(spark, base), iterations=4))
    b = _ranks(pagerank(_edges(spark, base * 3), iterations=4))
    assert a == b


def test_partitioning_invariance_bit_exact(spark):
    # the int64 fixed-point carries make the result independent of the
    # shuffle layout — bit-equal, not approximately equal
    rows = [(i, (i * i + 3) % 50) for i in range(50)] + [(i, (i + 11) % 50) for i in range(0, 50, 3)]
    a = _ranks(pagerank(_edges(spark, rows, partitions=1), iterations=5))
    b = _ranks(pagerank(_edges(spark, rows, partitions=8), iterations=5))
    assert a == b


def test_duckdb_oracle_bit_exact(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i, (i * 7 + 2) % 40) for i in range(40) if i % 5 != 4]
    pr = _ranks(pagerank(_edges(spark, rows), iterations=4))
    con = duckdb.connect()
    con.execute("create table edges(src bigint, dst bigint)")
    con.executemany("insert into edges values (?, ?)", rows)
    sql = pagerank_oracle_sql("select src, dst from edges", iterations=4)
    for node, rank in con.execute(sql).fetchall():
        assert pr[node] == rank  # bit-exact


def test_validates_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(0, 1)]), iterations=0)


# --- hop-bounded SSSP --------------------------------------------------------


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _srcs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _dists(df):
    return {r["id"]: r["dist"] for r in df.collect()}


def test_sssp_shortest_path_beats_greedy(spark):
    from osmgraft.operators.graph import sssp

    # 0 -> 2 direct costs 10; 0 -> 1 -> 2 costs 3
    e = _wedges(spark, [(0, 2, 10), (0, 1, 1), (1, 2, 2)])
    d = _dists(sssp(e, _srcs(spark, [0]), n_rounds=3))
    assert d == {0: 0, 1: 1, 2: 3}


def test_sssp_hop_bound(spark):
    from osmgraft.operators.graph import sssp

    e = _wedges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    d2 = _dists(sssp(e, _srcs(spark, [0]), n_rounds=2))
    assert 3 not in d2 and d2[2] == 2
    d3 = _dists(sssp(e, _srcs(spark, [0]), n_rounds=3))
    assert d3[3] == 3


def test_sssp_multi_source_and_parallel_edges(spark):
    from osmgraft.operators.graph import sssp

    e = _wedges(spark, [(0, 5, 9), (0, 5, 4), (7, 5, 3), (5, 6, 1)])
    d = _dists(sssp(e, _srcs(spark, [0, 7]), n_rounds=2))
    assert d[5] == 3  # nearest source wins, parallel edge min applies
    assert d[6] == 4


def test_sssp_matches_bellman_ford_reference(spark):
    import random

    from osmgraft.operators.graph import sssp

    rng = random.Random(99)
    n = 60
    rows = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 50)) for _ in range(300)
    ]
    sources = [0, 1, 2]
    k = 5
    # reference: synchronous <=k-hop Bellman-Ford
    INF = float("inf")
    dist = {i: (0 if i in sources else INF) for i in range(n)}
    for _ in range(k):
        nxt = dict(dist)
        for s, t, w in rows:
            if dist[s] + w < nxt[t]:
                nxt[t] = dist[s] + w
        dist = nxt
    want = {i: d for i, d in dist.items() if d < INF}
    got = _dists(sssp(_wedges(spark, rows).repartition(7), _srcs(spark, sources), n_rounds=k))
    assert got == want
