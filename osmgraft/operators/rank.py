"""O1/O2: deterministic global importance sort + rank, scale-safe.

Reference: single-threaded ``std::sort`` over all POIs
(/root/reference/src/main.cpp:128) with key ``(level_id asc, population
asc, osm_id asc)`` (OsmPoi::operator<, osmpoi.cpp:61-77; population =
atoi(tags['population']) else 0) and a sequential index assigned at write
time (textoutputhelper.cpp:80-101).

At cluster scale a ``Window.orderBy`` without partition keys collapses to
ONE task, so the engine uses a two-phase rank:

1. range-repartition on the sort key (exactly what ``orderBy`` plans — a
   range shuffle, no single task) + tag rows with ``spark_partition_id``;
2. materialize the sorted partitions once, count rows per partition (a
   tiny job over numPartitions values), prefix-sum on the driver;
3. ``rank = offset[pid] + local index`` added as a pure codegen
   projection (array-literal offset lookup + the low 33 bits of
   ``monotonically_increasing_id``) — no Python, no extra shuffle.

The result is identical to ``row_number() OVER (ORDER BY ...)`` (tested),
with no one-task stage over data. Total order is deterministic because
osm_id breaks all ties. See ``global_rank`` for why the sorted frame must
be materialized (sampling-based range boundaries are not reproducible
across two physical executions of the same plan under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_key_columns(df: DataFrame) -> list:
    """(level_id, population, osm_id) — population from the tags map if the
    frame still carries it, else an existing population column."""
    from osmgraft.functions.names import population_expr

    if "population" in df.columns:
        pop = F.col("population")
    else:
        pop = population_expr(F.col("tags"))
    return [F.col("level_id").asc(), pop.asc(), F.col("osm_id").asc()]


def importance_sort(df: DataFrame) -> DataFrame:
    """O1: global range-partitioned sort (Spark's orderBy == the scalable
    physical plan; determinism from the osm_id tie-break)."""
    return df.orderBy(*sort_key_columns(df))


def global_rank(df: DataFrame, rank_col: str = "rank", array_literal_max: int = 4096) -> DataFrame:
    """O2 at scale: two-phase row_number over the O1 order (0-based, like
    the reference's ``importance++``).

    The sorted frame is materialized ONCE (``localCheckpoint``) before the
    counts pass. A fully-lazy variant (counts subtree + data subtree of the
    same range exchange) is NOT correct: range-partition boundaries come
    from sampling the upstream, and AQE may present the upstream to each
    physical execution with different partitioning, shifting boundary rows
    between partitions — we observed both dropped rows and wrong offsets.
    Single-execution is what RDD.zipWithIndex does too (one count job, one
    emit job). ``localCheckpoint`` rather than ``persist``: blocks are
    freed by the ContextCleaner when the frame is garbage-collected, so
    repeated pipeline runs don't accumulate cache entries. On a real
    cluster with executor churn, swap for a reliable checkpoint via the
    lineage module (plans/lineage.py) — same two-phase shape.

    The index-attach pass is PURE CODEGEN: over the materialized
    partitions, ``monotonically_increasing_id()`` is documented as
    ``(partition_id << 33) | row_index_in_partition`` with the row index
    counting in iteration (= sorted) order, so
    ``rank = offset[partition] + (mid & (2^33-1))`` — an array-literal
    lookup plus bit math, no Arrow round-trip of the data through Python
    (the previous mapInPandas emit was ~40% of pipeline wall at 1M rows).
    """
    try:
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # the conf can be non-numeric ("auto" on some platforms)
        n_part = df.sparkSession.sparkContext.defaultParallelism
    keys = sort_key_columns(df)
    sorted_df = (
        df.repartitionByRange(n_part, *keys)
        .sortWithinPartitions(*keys)
        .localCheckpoint(eager=True)
    )
    # offsets are indexed by the checkpointed frame's ACTUAL partition ids,
    # not the requested count — never trust the two to agree
    n_part = sorted_df.rdd.getNumPartitions()

    counts = {
        r["_pid"]: r["_cnt"]
        for r in sorted_df.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("_cnt"))
        .collect()
    }
    assert not counts or max(counts) < n_part, (max(counts), n_part)
    acc = 0
    offset_by_pid = []
    for pid in range(n_part):
        offset_by_pid.append(acc)
        acc += counts.get(pid, 0)

    local_idx = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    if n_part <= array_literal_max:
        # small partition counts: offsets as a codegen array literal —
        # zero extra operators in the plan
        offset_arr = F.array(*[F.lit(o).cast("long") for o in offset_by_pid])
        rank = F.element_at(offset_arr, F.spark_partition_id() + 1) + local_idx
        return sorted_df.withColumn(rank_col, rank.cast("long"))
    # large partition counts (the 100k-partition cluster case): a 100k-
    # element array literal bloats every task's codegen — broadcast-join a
    # tiny (pid, offset) frame instead; the big side is not reshuffled
    # (broadcast hash join preserves its partitioning)
    spark = sorted_df.sparkSession
    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in enumerate(offset_by_pid)], "_pid int, _offset long"
    )
    return (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lidx", local_idx)
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_lidx")).cast("long"))
        .drop("_pid", "_lidx", "_offset")
    )
