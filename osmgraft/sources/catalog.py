"""Thin table layer: Iceberg when a runtime catalog is configured, plain
parquet-backed tables otherwise (SURVEY.md §7 preamble).

The sandbox ships no Iceberg runtime jar, so the default engine runs on a
parquet warehouse with the SAME reader/writer API the Iceberg deployment
uses; switching is a SparkSession config change, not a code change:

    spark.jars.packages = org.apache.iceberg:iceberg-spark-runtime-...
    spark.sql.catalog.osmgraft = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.osmgraft.type = hadoop
    spark.sql.catalog.osmgraft.warehouse = <path>

Writer notes for the 10^12-doc documents table (applies to both backends):
- partition the documents table by a coarse doc-kind + bucket(doc_id)
  layout so kind-filtered scans prune files;
- maintain the redundant top-level ``tag_keys array<string>`` stats column
  (SURVEY.md §4) so tag-key filters prune row groups without opening the
  nested spans column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, if any."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, _ in confs:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            name = k.rsplit(".", 1)[1]
            impl = spark.conf.get(f"spark.sql.catalog.{name}", "")
            if "iceberg" in impl.lower():
                return name
    return None


class Catalog:
    """save/load tables against Iceberg (if configured) or a parquet
    warehouse directory — identical call sites either way."""

    def __init__(self, spark: SparkSession, warehouse: str = "/tmp/osmgraft_warehouse"):
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg = _iceberg_catalog(spark)
        if self.iceberg is None:
            os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def save(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.iceberg:
            w = df.writeTo(f"{self.iceberg}.{name}")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            (w.createOrReplace() if mode == "overwrite" else w.append())
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def load(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.table(f"{self.iceberg}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"{self.iceberg}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS")) or os.path.isdir(
            self._path(name)
        )


def with_tag_keys_stats(docs: DataFrame) -> DataFrame:
    """Add the redundant top-level ``tag_keys`` column at WRITE time so
    tag-key predicates prune parquet row groups / Iceberg files without
    reading the nested spans (the engine's analogue of the reference's
    per-block filter cache skip, osminputhelper.cpp:541-544)."""
    keys = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("tag")),
        lambda s: F.split_part(s["text"], F.lit("="), F.lit(1)),
    )
    return docs.withColumn("tag_keys", F.array_distinct(keys))
