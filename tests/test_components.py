"""connected_components / dedup_survivors — pairs -> dedup clusters.

The reference has no analogue (its dedup is the spatial kNN label pass);
this is the training-pipeline step that turns near-dup PAIRS into
clusters with one canonical survivor. Semantics oracle: component =
minimum reachable id (DuckDB recursive CTE replays it in
``oracle_sql()['dedup_components']``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.dedup import connected_components, dedup_survivors


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    rows = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in rows}


def test_single_edge(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_transitive_chain_needs_multiple_hops(spark):
    # 0-1-2-...-39: one component rooted at 0; O(log n) rounds must close
    # a 40-hop path (label propagation would need 40 rounds).
    got = _cc(spark, [(i, i + 1) for i in range(39)])
    assert got == {i: 0 for i in range(40)}


def test_two_clusters_and_reversed_edges(spark):
    edges = [(5, 3), (3, 7), (20, 11), (11, 12)]
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 7: 3, 11: 11, 12: 11, 20: 11}


def test_duplicate_and_self_pairs_ignored(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (3, 3)])
    assert got == {1: 1, 2: 1}  # (3,3) is a self-pair: not a cluster


def test_string_ids_lexicographic_min(spark):
    df = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c")], "id_a string, id_b string"
    )
    rows = connected_components(df).collect()
    assert {r["id"]: r["component"] for r in rows} == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
    }


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a int, id_b int")
    assert connected_components(df).count() == 0


def test_nonconvergence_cap_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(200)], "id_a int, id_b int")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)


def test_survivors_keep_min_per_cluster_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id int, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 4), (4, 6), (2, 3)], "id_a int, id_b int"
    )
    out = dedup_survivors(docs, pairs).collect()
    comp = {r["doc_id"]: r["component"] for r in out}
    keep = sorted(r["doc_id"] for r in out if r["is_canonical"])
    assert comp == {0: 0, 4: 0, 6: 0, 2: 2, 3: 2, 1: 1, 5: 5, 7: 7}
    assert keep == [0, 1, 2, 5, 7]


def test_components_partition_by_key_not_one_task(spark):
    """Both star shuffles and joins key on u — the plan must contain no
    single-partition exchange (the 100-TB failure mode for CC)."""
    df = spark.createDataFrame([(i, i % 97) for i in range(1, 400)], "id_a int, id_b int")
    comp = connected_components(df)
    plan = comp._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # cluster of node n = its residue class; the residue IS the minimum
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got and all(v == k % 97 for k, v in got.items())
