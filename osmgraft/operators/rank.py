"""O1/O2: deterministic global importance sort + rank, scale-safe.

Reference: single-threaded ``std::sort`` over all POIs
(/root/reference/src/main.cpp:128) with key ``(level_id asc, population
asc, osm_id asc)`` (OsmPoi::operator<, osmpoi.cpp:61-77; population =
atoi(tags['population']) else 0) and a sequential index assigned at write
time (textoutputhelper.cpp:80-101).

At cluster scale a ``Window.orderBy`` without partition keys collapses to
ONE task, so the engine uses a two-phase rank:

1. range-repartition + sort within partitions on the sort key (this is
   exactly what ``orderBy`` plans — a range shuffle, no single task);
2. count rows per partition (tiny job), prefix-sum the counts on the
   driver (numPartitions values, not data!), broadcast offsets;
3. add ``offset[pid] + local_row_number`` per partition in one narrow pass.

The result is identical to ``row_number() OVER (ORDER BY ...)`` (tested),
with no one-task stage. Total order is deterministic because osm_id breaks
all ties.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


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


def global_rank(df: DataFrame, rank_col: str = "rank") -> DataFrame:
    """O2 at scale: two-phase row_number over the O1 order (0-based, like
    the reference's ``importance++``)."""
    sorted_df = importance_sort(df)
    sorted_df = sorted_df.withColumn("_pid", F.spark_partition_id())
    sorted_df.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(sorted_df.schema.fields + [StructField(rank_col, LongType(), False)])

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[rank_col] = range(base + local, base + local + n)
            local += n
            yield pdf

    ranked = sorted_df.mapInPandas(add_rank, schema=out_schema, barrier=False)
    return ranked.drop("_pid")
