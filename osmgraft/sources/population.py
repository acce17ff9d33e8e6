"""S6: population TSV source (PopulationInput,
/root/reference/src/input/populationinput.cpp:42-62).

``name \\t population`` lines; ``#``-prefixed comment lines skipped;
population parsed with C atoi semantics (non-numeric -> 0). The reference
parses this file but ``main`` never consumes it; the engine keeps it as an
optional enrichment: ``apply_population`` fills a POI's sort-key
population from the table when the tags carry none (name equi-join,
broadcast — population lists are small dimension data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_population(spark: SparkSession, path: str) -> DataFrame:
    """(name, population) from a TSV; comments skipped, atoi values.

    One row per name, FIRST entry in file order winning — the reference's
    ``std::map::insert`` semantics (populationinput.cpp:56-60). File order
    is recovered by reading the text into a single partition (population
    lists are dimension-sized) where ``monotonically_increasing_id``
    counts rows in read order; ``min_by`` then picks the first entry per
    name. For a multi-file ``path`` glob the order across files follows
    Spark's file listing; pass one file when exact fidelity matters.
    """
    from osmgraft.functions.classify import atoi_expr

    raw = (
        spark.read.text(path)
        .coalesce(1)
        .withColumn("_pos", F.monotonically_increasing_id())
        .where(~F.col("value").startswith("#"))  # populationinput.cpp:53-54
    )
    parsed = raw.select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(1)).alias("name"),
        F.coalesce(
            atoi_expr(F.split_part(F.col("value"), F.lit("\t"), F.lit(2))), F.lit(0)
        ).alias("population"),
        "_pos",
    )
    return parsed.groupBy("name").agg(F.min_by("population", "_pos").alias("population"))


def apply_population(pois: DataFrame, population: DataFrame, name_col: str = "name") -> DataFrame:
    """Fill missing/zero tag-population from the table (left broadcast
    join on the resolved name; tag value wins when present, matching the
    reference where the POI's own tags drive the sort key)."""
    # defensive re-aggregation: a caller-supplied table with a repeated
    # name would otherwise fan out the join and duplicate POI rows
    pop = population.groupBy("name").agg(F.min("population").alias("population")).select(
        F.col("name").alias("_pname"), F.col("population").alias("_pop_tbl")
    )
    joined = pois.join(F.broadcast(pop), pois[name_col] == F.col("_pname"), "left")
    filled = F.when(
        (F.col("population").isNull()) | (F.col("population") == 0),
        F.coalesce(F.col("_pop_tbl"), F.lit(0)),
    ).otherwise(F.col("population"))
    return joined.withColumn("population", filled.cast("long")).drop("_pname", "_pop_tbl")
