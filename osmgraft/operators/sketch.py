"""Mergeable sketches for corpus-scale statistics: HyperLogLog.

Counting distinct values exactly costs a full shuffle of the distinct
keys — at 10^12 tokens that is the most expensive aggregation in the
warehouse. The HyperLogLog sketch (Flajolet et al. 2007, public) gets a
~1.04/sqrt(2^p) relative-error estimate out of a 2^p-register table, and
on Spark the whole sketch is ONE tiny aggregation:

- the hash, bucket and rank (rho) of every value are pure Catalyst
  (whole-stage codegen, no UDF);
- the register table is ``groupBy(bucket).max(rho)`` — partial (map-side)
  max applies, so the only shuffle moves at most 2^p rows per partition
  regardless of input size;
- sketches MERGE by the same ``max``: union register tables from
  different corpus shards / days / engines and re-aggregate — the
  mergeability is the operational point at 100 TB.

Spark's own ``approx_count_distinct`` is HLL++ behind an opaque binary
buffer; this implementation exists because the engine's contract is
value-level SQL replayability: the hash is the md5-low-64 construction
DuckDB evaluates natively (``md5_number_lower``, same trick as the
SimHash oracle — ``osmgraft/operators/dedup.py``), every register is an
integer (bit-exact across engines by construction), and the estimator's
floating-point path is made order-free by summing the harmonic terms
``2^(SUFFIX_BITS - rho)`` as exact DECIMAL integers instead of doubles.
Classic HLL estimator with the small-range linear-counting correction;
the HLL++ empirical bias tables are omitted (documented accuracy dip in
the 2.5m-5m range — irrelevant for the corpus-scale counts this serves).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_low64_expr(col: Column) -> Column:
    """Lower 64 bits of md5 (bytes 8..16, little-endian) as a signed-long
    bit pattern — equals DuckDB's ``md5_number_lower``. Eight hex-pair
    conversions + shifts, all inside codegen; used where a SQL-replayable
    hash is required (xxhash64 is the cheaper non-replayable default
    elsewhere)."""
    hexs = F.md5(col.cast("string"))
    parts = [
        F.shiftleft(F.conv(F.substring(hexs, 17 + 2 * i, 2), 16, 10).cast("long"), 8 * i)
        for i in range(8)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def hll_bucket_rho(col: Column, p: int) -> tuple[Column, Column]:
    """The (bucket, rho) pair for one value — shared by the batch register
    pass and the streaming sketch (``osmgraft.streaming.ingest.
    stream_distinct_sketch``)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    sbits = 64 - p
    h = md5_low64_expr(col)
    bucket = F.shiftrightunsigned(h, sbits)
    suffix = h.bitwiseAND(F.lit((1 << sbits) - 1))
    # rho = sbits - bit_length(suffix) + 1; bit_length via the base-2
    # string (no clz in either engine), suffix == 0 -> all-zeros case
    rho = F.when(suffix == 0, F.lit(sbits + 1)).otherwise(
        F.lit(sbits + 1) - F.length(F.conv(suffix, 10, 2))
    )
    return bucket, rho


def hll_registers(df: DataFrame, value_col: str, p: int = 12) -> DataFrame:
    """HyperLogLog register table for the values in ``value_col``:
    ``(bucket, rho)`` with one row per OCCUPIED bucket, bucket in
    [0, 2^p), rho = 1 + leading-zero count of the (64-p)-bit hash suffix
    (max over all values landing in the bucket). Pure integers — the
    strongest possible oracle artifact. Merge sketches by unioning
    register tables and re-running ``groupBy(bucket).max(rho)``."""
    bucket, rho = hll_bucket_rho(F.col(value_col), p)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def _alpha_m(m: int) -> float:
    """Bias-correction constant per Flajolet et al. 2007 §4: the small
    register counts (m = 16/32/64, i.e. p = 4..6) need their tabulated
    constants — the asymptotic 0.7213/(1 + 1.079/m) overestimates by up
    to ~6.5% at m=16. Computed driver-side and embedded as ONE double
    literal in both engines, so cross-engine parity is by construction."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """One-row distinct-count estimate from a register table:
    ``(est, v_zero, m)``.

    Order-free float path: the harmonic sum Z = sum(2^-rho) over all m
    registers is computed as the exact integer sum of ``2^(sbits+1-rho)``
    in DECIMAL(38,0) (every term and the total are exact; empty registers
    contribute the known constant), converted to double ONCE. alpha is
    one shared double literal (:func:`_alpha_m`) embedded in both
    engines, with the paper's tabulated constants below p=7. Small
    range (E <= 2.5m, empty buckets remain) switches to linear counting
    ``m * ln(m / v_zero)`` per the original paper."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    sbits = 64 - p
    # term for rho: 2^-rho scaled by 2^(sbits+1) => 2^(sbits+1-rho), an
    # exact integer for every legal rho in [1, sbits+1]
    scale = float(1 << (sbits + 1))
    term = F.pow(F.lit(2.0), F.lit(sbits + 1) - F.col("rho")).cast("decimal(38,0)")
    agg = registers.agg(
        F.count("*").alias("n_occ"),
        F.sum(term).alias("s_occ"),
    )
    n_occ = F.col("n_occ")
    v_zero = F.lit(m) - n_occ
    # empty buckets: rho "0" => term 2^(sbits+1), exact
    s_total = (
        F.coalesce(F.col("s_occ"), F.lit(0).cast("decimal(38,0)"))
        + v_zero.cast("decimal(38,0)") * F.lit(1 << (sbits + 1)).cast("decimal(38,0)")
    )
    alpha = F.lit(_alpha_m(m))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(scale) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(est.alias("est"), v_zero.cast("long").alias("v_zero"), F.lit(m).alias("m"))


def hll_count_distinct(df: DataFrame, value_col: str, p: int = 12) -> DataFrame:
    """Convenience: registers + estimate in one call."""
    return hll_estimate(hll_registers(df, value_col, p), p)


def hll_oracle_sql(values_cte: str, p: int = 12, registers_only: bool = False) -> str:
    """DuckDB replica of the full sketch over ``values_cte`` (a SQL
    fragment yielding one column ``v``): identical hash
    (``md5_number_lower``), identical integer registers, identical
    order-free DECIMAL harmonic sum and literal-for-literal estimator."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    sbits = 64 - p
    scale = float(1 << (sbits + 1))
    mask = (1 << sbits) - 1
    regs = (
        f"with hll_v as (select v from ({values_cte}) where v is not null), "
        "hll_h as (select md5_number_lower(cast(v as varchar)) as h from hll_v), "
        f"hll_br as (select cast(h >> {sbits} as bigint) as bucket, "
        f"cast(case when (h & {mask}) = 0 then {sbits + 1} "
        f"else {sbits + 1} - length(bin(h & {mask})) end as int) as rho from hll_h), "
        "hll_regs as (select bucket, max(rho) as rho from hll_br group by bucket)"
    )
    if registers_only:
        return f"{regs} select bucket, rho from hll_regs"
    return (
        f"{regs}, "
        f"hll_a as (select count(*) as n_occ, sum(cast(pow(2.0, {sbits + 1} - rho) "
        "as decimal(38,0))) as s_occ from hll_regs), "
        f"hll_t as (select n_occ, cast({m} as bigint) - n_occ as v_zero, "
        f"coalesce(s_occ, cast(0 as decimal(38,0))) + "
        f"cast(cast({m} as bigint) - n_occ as decimal(38,0)) * "
        f"cast({1 << (sbits + 1)} as decimal(38,0)) as s_total from hll_a), "
        f"hll_e as (select v_zero, cast({_alpha_m(m)!r} as double) * {float(m)} * "
        f"{float(m)} * {scale} / cast(s_total as double) as raw from hll_t) "
        f"select case when raw <= {2.5 * m} and v_zero > 0 "
        f"then {float(m)} * ln({float(m)} / cast(v_zero as double)) else raw end as est, "
        f"cast(v_zero as bigint) as v_zero, {m} as m from hll_e"
    )
