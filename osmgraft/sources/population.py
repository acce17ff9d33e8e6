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
    """(name, population) from a TSV; comments skipped, atoi values."""
    from osmgraft.functions.classify import atoi_expr

    raw = spark.read.csv(path, sep="\t", comment="#", schema="name string, pop_raw string")
    parsed = raw.select(
        "name", F.coalesce(atoi_expr(F.col("pop_raw")), F.lit(0)).alias("population")
    )
    # one row per name: the reference's std::map::insert keeps the first
    # entry per name (populationinput.cpp:56-60); file order is not a
    # DataFrame notion, so deterministically keep the smallest population
    # of the duplicates. Without this, a repeated name would fan out the
    # broadcast join in apply_population and duplicate POI rows.
    return parsed.groupBy("name").agg(F.min("population").alias("population"))


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
