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


def test_small_p_uses_tabulated_alpha(spark):
    """p=4..6 must use the paper's tabulated constants (0.673/0.697/0.709):
    the asymptotic 0.7213/(1+1.079/m) formula overestimates by ~6.5% at
    m=16. Checked two ways: the constant itself, and end-to-end accuracy
    outside the linear-counting regime staying within theory."""
    from osmgraft.operators.sketch import _alpha_m

    assert (_alpha_m(16), _alpha_m(32), _alpha_m(64)) == (0.673, 0.697, 0.709)
    assert abs(_alpha_m(4096) - 0.7213 / (1.0 + 1.079 / 4096)) == 0.0

    # n >> 2.5*m so the raw estimator (not linear counting) is exercised
    for n, p, sigma_mult in ((5000, 4, 4), (5000, 6, 4)):
        est = hll_count_distinct(_vals(spark, [f"s{i}" for i in range(n)]), "v", p=p)
        got = est.collect()[0]["est"]
        sigma = 1.04 / math.sqrt(1 << p)
        assert abs(got - n) / n < sigma_mult * sigma


def test_small_p_estimate_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("create table vals(v varchar)")
    for n, p in ((5000, 4), (3000, 5), (2000, 6)):
        xs = [f"q{i}" for i in range(n)]
        est = hll_count_distinct(_vals(spark, xs), "v", p=p).collect()[0]
        con.execute("delete from vals")
        con.executemany("insert into vals values (?)", [(x,) for x in xs])
        got = con.execute(hll_oracle_sql("select v from vals", p=p)).fetchone()
        assert (est["est"], est["v_zero"], est["m"]) == got


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_table_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.sketch import cms_oracle_sql, cms_table

    xs = [f"tok{i % 40}" for i in range(3000)]
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_table(_vals(spark, xs), "v", d=3, w=128).collect()
    }
    con = duckdb.connect()
    con.execute("create table vals(v varchar)")
    con.executemany("insert into vals values (?)", [(x,) for x in xs])
    sql = cms_oracle_sql("select v from vals", d=3, w=128)
    oracle = {(r, c): n for r, c, n in con.execute(sql).fetchall()}
    assert got == oracle


def test_cms_point_query_never_underestimates(spark):
    from collections import Counter

    from osmgraft.operators.sketch import cms_point_query, cms_table

    # Zipf-ish: value j appears ~3000/(j+1) times
    xs = [f"k{j}" for j in range(50) for _ in range(3000 // (j + 1))]
    truth = Counter(xs)
    table = cms_table(_vals(spark, xs), "v", d=4, w=256)
    probes = _vals(spark, [f"k{j}" for j in range(50)] + ["absent"])
    est = {r["value"]: r["est"] for r in cms_point_query(table, probes, "v", d=4, w=256).collect()}
    n = len(xs)
    for v, t in truth.items():
        assert est[v] >= t  # CMS point query never underestimates
        assert est[v] <= t + 2 * n / 256 * 4  # loose d-row union bound
    assert est["absent"] >= 0


def test_cms_point_query_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.sketch import cms_oracle_sql, cms_point_query, cms_table

    xs = [f"w{i % 23}" for i in range(1000)]
    probes = [f"w{j}" for j in range(25)]
    table = cms_table(_vals(spark, xs), "v", d=4, w=64)
    got = {
        r["value"]: r["est"]
        for r in cms_point_query(table, _vals(spark, probes), "v", d=4, w=64).collect()
    }
    con = duckdb.connect()
    con.execute("create table vals(v varchar)")
    con.executemany("insert into vals values (?)", [(x,) for x in xs])
    con.execute("create table probes(v varchar)")
    con.executemany("insert into probes values (?)", [(x,) for x in probes])
    sql = cms_oracle_sql("select v from vals", "select v from probes", d=4, w=64)
    oracle = dict(con.execute(sql).fetchall())
    assert got == oracle


def test_cms_merge_and_weighted(spark):
    from osmgraft.operators.sketch import cms_point_query, cms_table
    from pyspark.sql import functions as F2

    xs = [f"m{i % 10}" for i in range(400)]
    whole = cms_table(_vals(spark, xs), "v", d=3, w=64)
    half1 = cms_table(_vals(spark, xs[:150]), "v", d=3, w=64)
    half2 = cms_table(_vals(spark, xs[150:]), "v", d=3, w=64)
    merged = (
        half1.unionByName(half2).groupBy("row", "col").agg(F2.sum("cnt").alias("cnt"))
    )
    probes = _vals(spark, [f"m{j}" for j in range(10)])
    a = {r["value"]: r["est"] for r in cms_point_query(whole, probes, "v", d=3, w=64).collect()}
    b = {r["value"]: r["est"] for r in cms_point_query(merged, probes, "v", d=3, w=64).collect()}
    assert a == b

    # weighted: every occurrence carries weight 5 -> estimates scale by 5
    wdf = spark.createDataFrame([(x, 5) for x in xs], "v string, wt int")
    wtab = cms_table(wdf, "v", d=3, w=64, weight_col="wt")
    c = {r["value"]: r["est"] for r in cms_point_query(wtab, probes, "v", d=3, w=64).collect()}
    assert c == {k: 5 * v for k, v in a.items()}


def test_cms_validation(spark):
    from osmgraft.operators.sketch import cms_oracle_sql, cms_table

    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        cms_table(df, "v", d=0, w=64)
    with pytest.raises(ValueError):
        cms_table(df, "v", d=4, w=100)  # not a power of two
    with pytest.raises(ValueError):
        cms_oracle_sql("select 1 as v", d=9, w=64)


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles
# ---------------------------------------------------------------------------


def _ints(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "v long")


def test_hist_quantiles_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.sketch import hist_bins, hist_quantiles, hist_quantiles_oracle_sql

    xs = [(i * 37) % 1000 for i in range(5000)]
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    bins = hist_bins(_ints(spark, xs), "v", lo=0.0, hi=1000.0, nbins=64)
    got = {
        r["q"]: (r["bin"], r["value_est"])
        for r in hist_quantiles(bins, qs, lo=0.0, hi=1000.0, nbins=64).collect()
    }
    con = duckdb.connect()
    con.execute("create table vals(v bigint)")
    con.executemany("insert into vals values (?)", [(x,) for x in xs])
    sql = hist_quantiles_oracle_sql("select v from vals", qs, lo=0.0, hi=1000.0, nbins=64)
    oracle = {q: (b, v) for q, b, v in con.execute(sql).fetchall()}
    assert got == oracle


def test_hist_quantile_rank_guarantee(spark):
    """value_est is a one-sided bound: at least ceil(q*n) values <= est,
    and the previous bin's upper edge covers fewer than ceil(q*n)."""
    from osmgraft.operators.sketch import hist_bins, hist_quantiles

    xs = sorted((i * i) % 997 for i in range(2000))
    lo, hi, nbins = 0.0, 1000.0, 128
    width = (hi - lo) / nbins
    bins = hist_bins(_ints(spark, xs), "v", lo=lo, hi=hi, nbins=nbins)
    out = hist_quantiles(bins, [0.25, 0.5, 0.75, 0.95], lo=lo, hi=hi, nbins=nbins).collect()
    import math as m

    n = len(xs)
    for r in out:
        target = m.ceil(r["q"] * n)
        assert sum(1 for x in xs if x <= r["value_est"]) >= target
        assert sum(1 for x in xs if x <= r["value_est"] - width) < target


def test_hist_merge_and_clamping(spark):
    from osmgraft.operators.sketch import hist_bins, hist_quantiles
    from pyspark.sql import functions as F2

    xs = list(range(-50, 1500))  # values outside [0, 1000) clamp to edge bins
    bins = hist_bins(_ints(spark, xs), "v", lo=0.0, hi=1000.0, nbins=32)
    rows = {r["bin"]: r["cnt"] for r in bins.collect()}
    assert sum(rows.values()) == len(xs)  # total-preserving
    assert rows[0] >= 50 and rows[31] >= 500  # clamped mass in edge bins

    half1 = hist_bins(_ints(spark, xs[:700]), "v", lo=0.0, hi=1000.0, nbins=32)
    half2 = hist_bins(_ints(spark, xs[700:]), "v", lo=0.0, hi=1000.0, nbins=32)
    merged = half1.unionByName(half2).groupBy("bin").agg(F2.sum("cnt").alias("cnt"))
    a = hist_quantiles(bins, [0.5], lo=0.0, hi=1000.0, nbins=32).collect()
    b = hist_quantiles(merged, [0.5], lo=0.0, hi=1000.0, nbins=32).collect()
    assert a == b

    with pytest.raises(ValueError):
        hist_bins(_ints(spark, xs), "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        hist_quantiles(bins, [0.0], lo=0.0, hi=1000.0)


# ---------------------------------------------------------------------------
# grouped HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_grouped_equals_per_group_global(spark):
    """Slicing the input by group and running the GLOBAL sketch per slice
    must equal the grouped sketch's row for that group — same registers,
    same estimate."""
    from osmgraft.operators.sketch import hll_count_distinct, hll_count_distinct_by

    rows = [(f"g{i % 3}", f"val{i % 500}-{i % 7}") for i in range(6000)]
    df = spark.createDataFrame(rows, "g string, v string")
    grouped = {
        r["g"]: (r["est"], r["v_zero"], r["m"])
        for r in hll_count_distinct_by(df, ["g"], "v", p=10).collect()
    }
    for g in ("g0", "g1", "g2"):
        row = hll_count_distinct(df.where(F.col("g") == g), "v", p=10).collect()[0]
        assert grouped[g] == (row["est"], row["v_zero"], row["m"])


def test_hll_grouped_bit_exact_vs_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.sketch import hll_by_oracle_sql, hll_count_distinct_by

    rows = [(f"d{i % 4}", f"tok{(i * 13) % 900}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r["g"]: (f'{r["est"]:.9g}', r["v_zero"], r["m"])
        for r in hll_count_distinct_by(df, ["g"], "v", p=9).collect()
    }
    con = duckdb.connect()
    con.execute("create table vals(g varchar, v varchar)")
    con.executemany("insert into vals values (?, ?)", rows)
    sql = hll_by_oracle_sql("select g, v from vals", ["g"], p=9)
    oracle = {g: (f"{est:.9g}", vz, m) for g, est, vz, m in con.execute(sql).fetchall()}
    assert got == oracle


def test_hll_grouped_merge_and_validation(spark):
    from osmgraft.operators.sketch import (
        hll_by_oracle_sql,
        hll_estimate_by,
        hll_registers_by,
    )
    from pyspark.sql import functions as F2

    rows = [(f"s{i % 2}", f"m{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v string")
    whole = hll_registers_by(df, ["g"], "v", p=9)
    half1 = hll_registers_by(df.limit(2000), ["g"], "v", p=9)
    half2 = hll_registers_by(df.subtract(df.limit(1000)), ["g"], "v", p=9)
    merged = (
        half1.unionByName(half2)
        .groupBy("g", "bucket")
        .agg(F2.max("rho").alias("rho"))
    )
    a = sorted(map(tuple, hll_estimate_by(whole, ["g"], p=9).collect()))
    b = sorted(map(tuple, hll_estimate_by(merged, ["g"], p=9).collect()))
    assert a == b

    with pytest.raises(ValueError):
        hll_registers_by(df, [], "v")
    with pytest.raises(ValueError):
        hll_by_oracle_sql("select 1 as g, 1 as v", [], p=9)


def test_hist_grouped_equals_per_group_global_and_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from osmgraft.operators.sketch import (
        hist_bins,
        hist_bins_by,
        hist_quantiles,
        hist_quantiles_by,
        hist_quantiles_by_oracle_sql,
    )

    rows = [(f"g{i % 3}", (i * 37) % 1000) for i in range(6000)]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.25, 0.5, 0.95]
    bins = hist_bins_by(df, ["g"], "v", lo=0.0, hi=1000.0, nbins=64)
    got = {
        (r["g"], r["q"]): (r["bin"], r["value_est"])
        for r in hist_quantiles_by(bins, ["g"], qs, 0.0, 1000.0, 64).collect()
    }
    # per-slice global sketch must agree
    for g in ("g0", "g1", "g2"):
        sl = hist_bins(df.where(F.col("g") == g), "v", 0.0, 1000.0, 64)
        for r in hist_quantiles(sl, qs, 0.0, 1000.0, 64).collect():
            assert got[(g, r["q"])] == (r["bin"], r["value_est"])
    # DuckDB parity
    con = duckdb.connect()
    con.execute("create table vals(g varchar, v bigint)")
    con.executemany("insert into vals values (?, ?)", rows)
    sql = hist_quantiles_by_oracle_sql("select g, v from vals", ["g"], qs, 0.0, 1000.0, 64)
    oracle = {(g, q): (b, v) for g, q, b, v in con.execute(sql).fetchall()}
    assert got == oracle
    with pytest.raises(ValueError):
        hist_bins_by(df, [], "v", 0.0, 1.0)
    with pytest.raises(ValueError):
        hist_quantiles_by(bins, ["g"], [1.5], 0.0, 1.0)
