"""HyperLogLog sketch: register parity, estimate accuracy, mergeability."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.sketch import (
    hll_count_distinct,
    hll_estimate,
    hll_oracle_sql,
    hll_registers,
    md5_low64_expr,
)


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "v string")


def test_md5_low64_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    words = ["hello", "spark", "", "ünïcode", "42"]
    got = {
        r["v"]: r["h"]
        for r in _vals(spark, words).select("v", md5_low64_expr(F.col("v")).alias("h")).collect()
    }
    for w in words:
        (expect,) = duckdb.sql(f"select md5_number_lower('{w}')").fetchone()
        # DuckDB returns ubigint; Spark carries the same bit pattern signed
        assert got[w] % (1 << 64) == expect


def test_registers_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    xs = [f"tok{i}" for i in range(5000)]
    regs = {
        r["bucket"]: r["rho"]
        for r in hll_registers(_vals(spark, xs), "v", p=10).collect()
    }
    con = duckdb.connect()
    con.execute("create table vals(v varchar)")
    con.executemany("insert into vals values (?)", [(x,) for x in xs])
    sql = hll_oracle_sql("select v from vals", p=10, registers_only=True)
    oracle = dict(con.execute(sql).fetchall())
    assert regs == oracle


def test_estimate_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("create table vals(v varchar)")
    for n, p in ((300, 12), (20000, 10)):
        xs = [f"w{i}" for i in range(n)]
        est = hll_count_distinct(_vals(spark, xs), "v", p=p).collect()[0]
        con.execute("delete from vals")
        con.executemany("insert into vals values (?)", [(x,) for x in xs])
        got = con.execute(hll_oracle_sql("select v from vals", p=p)).fetchone()
        assert (est["est"], est["v_zero"], est["m"]) == got


def test_estimate_accuracy_within_theory(spark):
    # standard error ~ 1.04/sqrt(m); assert within 4 sigma
    for n, p in ((500, 12), (50000, 12)):
        xs = [f"item-{i}" for i in range(n)]
        est = hll_count_distinct(_vals(spark, xs), "v", p=p).collect()[0]["est"]
        sigma = 1.04 / math.sqrt(1 << p)
        assert abs(est - n) / n < 4 * sigma


def test_duplicates_do_not_move_the_sketch(spark):
    xs = [f"d{i}" for i in range(1000)]
    a = hll_count_distinct(_vals(spark, xs), "v", p=11).collect()[0]
    b = hll_count_distinct(_vals(spark, xs * 5), "v", p=11).collect()[0]
    assert a == b


def test_merge_equals_single_pass(spark):
    xs = [f"m{i}" for i in range(4000)]
    whole = hll_registers(_vals(spark, xs), "v", p=10)
    half1 = hll_registers(_vals(spark, xs[:2500]), "v", p=10)
    half2 = hll_registers(_vals(spark, xs[1500:]), "v", p=10)  # overlapping
    merged = (
        half1.unionByName(half2).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    est_whole = hll_estimate(whole, p=10).collect()[0]
    est_merged = hll_estimate(merged, p=10).collect()[0]
    assert est_whole == est_merged


def test_nulls_ignored_and_p_validated(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    regs = hll_registers(df, "v", p=8)
    est = hll_estimate(regs, p=8).collect()[0]
    assert est["v_zero"] == (1 << 8) - 2  # two occupied buckets
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=3)
    with pytest.raises(ValueError):
        hll_oracle_sql("select 1 as v", p=19)
