"""A4-A6: POI statistics (reference src/statistics/poistatistics.cpp).

All pure Catalyst aggregations; the detailed histogram's suppression
variants reproduce poistatistics.cpp:171-211 and add an
``approx_count_distinct`` path for the 10^12-row deployment where an
exact distinct per key would shuffle the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def level_counts(pois: DataFrame, levels: DataFrame) -> DataFrame:
    """A4 (poistatistics.cpp:66-91): per-level POI counts with names."""
    counts = pois.groupBy("level_id").agg(F.count("*").alias("poi_count"))
    return counts.join(F.broadcast(levels), "level_id", "left").select(
        "level_id", "level_name", "poi_count"
    )


def tag_histogram(pois: DataFrame) -> DataFrame:
    """A5 (poistatistics.cpp:157-169): per tag-key counts."""
    return (
        pois.select(F.explode(F.map_keys("tags")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("tag_count"))
    )


def tag_histogram_detailed(
    pois: DataFrame,
    max_distinct_values: int | None = None,
    min_avg_multiplicity: float | None = None,
    approximate: bool = False,
) -> DataFrame:
    """A6 (poistatistics.cpp:171-211): per (key, value) counts with the two
    suppression variants — drop keys with more than ``max_distinct_values``
    distinct values (:171-189) or whose average value multiplicity is below
    ``min_avg_multiplicity`` (:191-211)."""
    kv = pois.select(F.explode("tags").alias("key", "value"))
    per_value = kv.groupBy("key", "value").agg(F.count("*").alias("value_count"))
    distinct = (
        F.approx_count_distinct("value") if approximate else F.count_distinct("value")
    )
    per_key = per_value.groupBy("key").agg(
        distinct.alias("n_values"), F.sum("value_count").alias("key_count")
    )
    joined = per_value.join(per_key, "key")
    if max_distinct_values is not None:
        joined = joined.where(F.col("n_values") <= max_distinct_values)
    if min_avg_multiplicity is not None:
        joined = joined.where(
            (F.col("key_count") / F.col("n_values")) >= min_avg_multiplicity
        )
    return joined.select("key", "value", "value_count", "n_values", "key_count")
