"""Z-order (Morton) spatial data layout for scan pruning at rest.

At 10^12 rows the cheapest query is the one that never reads the data:
parquet/Iceberg files carry per-column min/max statistics, and a reader
skips any file whose stats exclude the predicate. Row order decides
whether those stats bite — files written in ingest order have every
file spanning the whole globe (min/max covers everything, zero skips),
while files CLUSTERED on a space-filling curve give each file a narrow
key interval, so a spatial box query touches only the files whose
interval intersects the box's curve ranges. This is the standard
Iceberg/Delta "Z-ORDER BY" layout rail, implemented here as pure
Catalyst bit arithmetic (replayable bit-for-bit in DuckDB) plus a
range-partitioned sorted write.

The curve: 2-D Morton interleave of the quantized (lon, lat) grid
coordinates — lon bits at even positions, lat bits at odd. A quadtree
cell at level L <= bits is exactly one CONTIGUOUS key range
(``zrange_for_quad``), which is what makes file-level min/max pruning
effective: an aligned query box = a handful of interval-overlap tests
against file footers, no data read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# part1by1 spread masks: after step k each source bit sits 2^k apart.
# All masks are < 2^63, so the same literals work for Spark's signed
# long and DuckDB's BIGINT.
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _part1by1(x: Column) -> Column:
    """Spread the low 32 bits of ``x`` to even bit positions (classic
    magic-mask interleave, 5 shift/or/and steps, all whole-stage
    codegen)."""
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def grid_xy(lat: Column, lon: Column, bits: int) -> tuple[Column, Column]:
    """Quantize lon/lat onto the 2^bits x 2^bits equirectangular grid
    (clamped; lon=180 / lat=90 land in the top cell)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    n = 1 << bits
    gx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    gy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1)).cast("long")  # noqa: E731
    return clamp(gx), clamp(gy)


def zorder_key(lat: Column, lon: Column, bits: int = 16) -> Column:
    """The Morton key: interleave(grid_x, grid_y), lon bits even / lat
    bits odd, a non-negative long in [0, 4^bits)."""
    gx, gy = grid_xy(lat, lon, bits)
    return _part1by1(gx).bitwiseOR(F.shiftleft(_part1by1(gy), 1)).alias("zkey")


def zorder_oracle_sql(pts_sql: str, bits: int = 16) -> str:
    """DuckDB replica of :func:`zorder_key` over ``pts_sql`` (columns
    ``pid, lat, lon``): identical quantization, identical spread masks
    — bigint bit ops evaluate the same in both engines."""
    n = 1 << bits

    def spread(expr: str) -> str:
        for shift, mask in _SPREAD:
            expr = f"(({expr}) | (({expr}) << {shift})) & {mask}"
        return expr

    gx = (
        f"cast(least(greatest(floor((lon + 180.0) / 360.0 * {float(n)!r}), 0), "
        f"{n - 1}) as bigint)"
    )
    gy = (
        f"cast(least(greatest(floor((lat + 90.0) / 180.0 * {float(n)!r}), 0), "
        f"{n - 1}) as bigint)"
    )
    return (
        f"with zo_g as (select pid, {gx} as gx, {gy} as gy from ({pts_sql})) "
        f"select pid, ({spread('gx')}) | (({spread('gy')}) << 1) as zkey from zo_g"
    )


def zrange_for_quad(qx: int, qy: int, level: int, bits: int = 16) -> tuple[int, int]:
    """The contiguous [lo, hi] Morton-key range of the quadtree cell
    with grid prefix (qx, qy) at ``level`` (level 0 = whole grid). Every
    key of every point inside the cell falls in this range and vice
    versa — the property file pruning relies on."""
    if not 0 <= level <= bits:
        raise ValueError("level must be in [0, bits]")
    if not (0 <= qx < 1 << level and 0 <= qy < 1 << level):
        raise ValueError("quad coords out of range for level")
    prefix = 0
    for i in range(level):
        prefix |= ((qx >> i) & 1) << (2 * i) | ((qy >> i) & 1) << (2 * i + 1)
    shift = 2 * (bits - level)
    return prefix << shift, ((prefix + 1) << shift) - 1


def zquads_for_box(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    bits: int = 16,
    max_ranges: int = 64,
) -> tuple[int, list[int]]:
    """Covering quads for a lat/lon box: ``(level, sorted key prefixes)``
    at the FINEST quadtree level whose intersecting-quad count still fits
    in ``max_ranges`` (the tightest cover under the budget — descending
    from leaf level, the first level that fits wins; coarser levels
    always fit but over-cover). A quad's prefix is its Morton key shifted right by
    ``2*(bits-level)`` — one integer per quad. Driver-side only: the box
    is a query constant, so the work is O(max_ranges), never data-sized.

    The cover is a superset of the box (quads overlap the box edges), so
    any filter built from it is a PRUNING predicate: it must be conjoined
    with the exact box predicate, never used alone."""
    if not (lat_min <= lat_max and lon_min <= lon_max):
        raise ValueError("box must have min <= max on both axes")

    def quad_of(lat: float, lon: float, level: int) -> tuple[int, int]:
        n = 1 << bits
        gx = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
        gy = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
        return gx >> (bits - level), gy >> (bits - level)

    level = bits
    for lv in range(bits, -1, -1):
        qx0, qy0 = quad_of(lat_min, lon_min, lv)
        qx1, qy1 = quad_of(lat_max, lon_max, lv)
        if (qx1 - qx0 + 1) * (qy1 - qy0 + 1) <= max_ranges:
            level = lv
            break
    qx0, qy0 = quad_of(lat_min, lon_min, level)
    qx1, qy1 = quad_of(lat_max, lon_max, level)
    shift = 2 * (bits - level)
    prefixes = sorted(
        zrange_for_quad(qx, qy, level, bits)[0] >> shift
        for qx in range(qx0, qx1 + 1)
        for qy in range(qy0, qy1 + 1)
    )
    return level, prefixes


def zranges_for_box(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    bits: int = 16,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """The :func:`zquads_for_box` cover as contiguous ``[lo, hi]`` Morton
    KEY intervals, coalesced where adjacent — the form a file-footer
    min/max pruner consumes (see the same trade in Delta/Iceberg Z-order
    readers)."""
    level, prefixes = zquads_for_box(
        lat_min, lat_max, lon_min, lon_max, bits, max_ranges
    )
    shift = 2 * (bits - level)
    merged: list[tuple[int, int]] = []
    for pre in prefixes:
        lo, hi = pre << shift, ((pre + 1) << shift) - 1
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def box_query(
    df: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    bits: int = 16,
    max_ranges: int = 64,
) -> DataFrame:
    """Exact lat/lon box filter, accelerated by the Morton cover. The
    exact box predicate keeps the result identical to a plain filter (and
    pushes to the scan as PushedFilters); the cover predicate adds the
    file-pruning handle.

    Two shapes, chosen by whether the frame carries a real ``zkey``
    column:

    - stored key (a :func:`cluster_by_zorder` layout): OR-of-range
      predicates directly on the column — simple comparisons on a stored
      column are exactly what parquet footer min/max pruning consumes;
    - computed key: ``shiftright(morton, 2*(bits-level)) IN (prefixes)``
      — the Morton expression appears ONCE. (Spelling it as 2*max_ranges
      range comparisons would inline the 5-step interleave into every
      comparison; past ~16 ranges the generated filter method exceeds
      the JIT limit and Spark silently drops to interpreted eval.)"""
    lat, lon = F.col(lat_col), F.col(lon_col)
    if "zkey" in df.columns:
        zk = F.col("zkey")
        ranges = zranges_for_box(lat_min, lat_max, lon_min, lon_max, bits, max_ranges)
        cover = None
        for lo, hi in ranges:
            p = (zk >= F.lit(lo)) & (zk <= F.lit(hi))
            cover = p if cover is None else (cover | p)
    else:
        level, prefixes = zquads_for_box(
            lat_min, lat_max, lon_min, lon_max, bits, max_ranges
        )
        cover = F.shiftright(zorder_key(lat, lon, bits), 2 * (bits - level)).isin(
            prefixes
        )
    exact = (
        (lat >= F.lit(lat_min))
        & (lat <= F.lit(lat_max))
        & (lon >= F.lit(lon_min))
        & (lon <= F.lit(lon_max))
    )
    return df.where(exact & cover)


def cluster_by_zorder(
    df: DataFrame,
    n_files: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    bits: int = 16,
) -> DataFrame:
    """Lay the frame out for writing: attach ``zkey``, range-partition
    on it into ``n_files`` splits (Spark samples the key distribution,
    so skewed geographies still get balanced files) and sort within each
    split. Writing the result with ``.write.parquet`` yields one file
    per partition whose zkey (and therefore lat/lon box) min/max span is
    ~1/n_files of the curve instead of all of it."""
    keyed = df.withColumn("zkey", zorder_key(F.col(lat_col), F.col(lon_col), bits))
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")


def file_zkey_stats(spark, path: str) -> DataFrame:
    """Per-file (file, zkey_min, zkey_max) read back from a parquet
    directory — the same numbers a pruning reader gets from footers
    alone. Used by tests/benchmarks to measure layout quality; the scan
    here reads only the zkey column."""
    return (
        spark.read.parquet(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
            "zkey",
        )
        .groupBy("file")
        .agg(F.min("zkey").alias("zkey_min"), F.max("zkey").alias("zkey_max"))
    )


def pruned_fraction(stats: list[tuple], lo: int, hi: int) -> float:
    """Fraction of files a min/max pruning reader SKIPS for the key
    range [lo, hi], given ``(file, zkey_min, zkey_max)`` rows."""
    if not stats:
        raise ValueError("no files")
    hit = sum(1 for _, mn, mx in stats if not (mx < lo or mn > hi))
    return 1.0 - hit / len(stats)


# ---------------------------------------------------------------------------
# Geohash: the third standard spatial index key (beside the S2/hex cell ids
# and the Morton zkey) — a base-32 STRING whose prefix relation encodes
# containment, which is what makes it the common join/partition key for
# interop with external geo datasets. Pure Catalyst: the bit interleave
# reuses the Morton spread above, the base-32 mapping is a fixed chain of
# substring lookups — whole-stage codegen, DuckDB-replayable bit-for-bit.

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_bits(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    lonbits = (total + 1) // 2  # lon leads the interleave
    return total, lonbits, total - lonbits


def geohash(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Standard geohash string of (lat, lon) at ``precision`` chars.

    Equivalent to the textbook bisection: after its lon/lat halvings the
    bit strings ARE the binary of the quantized grid coords, so the hash
    is interleave(gx, gy) split into 5-bit base-32 groups. gx uses
    ceil(5p/2) bits (lon takes the first bit), gy the rest."""
    total, lonbits, latbits = _gh_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits
    clampx = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(nx - 1)).cast("long")  # noqa: E731
    clampy = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(ny - 1)).cast("long")  # noqa: E731
    gx = clampx(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx))))
    gy = clampy(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny))))
    # even total: lon bits land at odd LSB positions; odd total: even
    if total % 2 == 0:
        key = F.shiftleft(_part1by1(gx), 1).bitwiseOR(_part1by1(gy))
    else:
        key = _part1by1(gx).bitwiseOR(F.shiftleft(_part1by1(gy), 1))
    chars = [
        F.substring(
            F.lit(_GH32),
            (F.shiftrightunsigned(key, 5 * (precision - 1 - g)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def geohash_oracle_sql(pts_sql: str, precision: int = 7) -> str:
    """DuckDB replica of :func:`geohash` over ``pts_sql`` (columns
    ``pid, lat, lon``) — same quantization, same spread masks, same
    base-32 substring chain."""
    total, lonbits, latbits = _gh_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits

    def spread(expr: str) -> str:
        for shift, mask in _SPREAD:
            expr = f"(({expr}) | (({expr}) << {shift})) & {mask}"
        return expr

    gx = (
        f"cast(least(greatest(floor((lon + 180.0) / 360.0 * {float(nx)!r}), 0), "
        f"{nx - 1}) as bigint)"
    )
    gy = (
        f"cast(least(greatest(floor((lat + 90.0) / 180.0 * {float(ny)!r}), 0), "
        f"{ny - 1}) as bigint)"
    )
    if total % 2 == 0:
        key = f"(({spread('gx')}) << 1) | ({spread('gy')})"
    else:
        key = f"({spread('gx')}) | (({spread('gy')}) << 1)"
    chars = " || ".join(
        f"substr('{_GH32}', cast(((gh_key >> {5 * (precision - 1 - g)}) & 31) + 1 as int), 1)"
        for g in range(precision)
    )
    return (
        f"with gh_g as (select pid, {gx} as gx, {gy} as gy from ({pts_sql})), "
        f"gh_k as (select pid, {key} as gh_key from gh_g) "
        f"select pid, {chars} as gh from gh_k"
    )


def quadkey(lat: Column, lon: Column, z: int) -> Column:
    """Bing-style quadkey string of the slippy tile containing (lat,
    lon) at zoom ``z`` — the third layout key next to Morton ints and
    geohashes: one digit per zoom level ('0'-'3', digit = 2*y_bit +
    x_bit), so a PREFIX of a quadkey is the ancestor tile. That prefix
    property is what makes it the natural clustering/partition key for
    tile sinks: a z-prefix range scan reads exactly one tile subtree.

    Same web-mercator tile math as operators/tiles.tile_xy, then a
    pure-Catalyst per-level character chain — no shuffle, no Python,
    SQL-replayable (:func:`quadkey_oracle_sql`)."""
    if not 1 <= z <= 30:
        raise ValueError("z must be in [1, 30]")
    from osmgraft.operators.tiles import tile_xy

    tx, ty = tile_xy(lat, lon, z)
    digits = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftrightunsigned(ty, k).bitwiseAND(F.lit(1)) * 2
                + F.shiftrightunsigned(tx, k).bitwiseAND(F.lit(1))
                + 1
            ).cast("int"),
            1,
        )
        for k in range(z - 1, -1, -1)
    ]
    return F.concat(*digits)


def quadkey_oracle_sql(pts_sql: str, z: int) -> str:
    """DuckDB replica of :func:`quadkey` over ``pts_sql`` (columns
    ``pid, lat, lon``): identical mercator quantization and digit
    chain."""
    n = 1 << z
    gx = f"least(cast(floor((lon+180.0)/360.0*{n}) as bigint), {n - 1})"
    gy = (
        "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())"
        f"/2.0*{n}), 0), {n - 1}) as bigint)"
    )
    digits = " || ".join(
        f"substring('0123', cast(((ty >> {k}) & 1)*2 + ((tx >> {k}) & 1) + 1 as int), 1)"
        for k in range(z - 1, -1, -1)
    )
    return (
        f"with qk_s as (select pid, lat, lon, "
        f"least(greatest(lat, -85.05112878), 85.05112878) as lc from ({pts_sql})), "
        f"qk_t as (select pid, {gx} as tx, {gy} as ty from qk_s) "
        f"select pid, {digits} as qk from qk_t"
    )
