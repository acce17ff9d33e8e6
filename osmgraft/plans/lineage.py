"""Checkpoint / lineage / resume rails (north_rule: resumable at 10^12 docs).

Each pipeline stage can be materialized to Parquet with a ``_lineage.json``
sidecar holding per-partition row counts and content hashes
(``xxhash64`` folded per partition — order-insensitive SUM so the hash is
stable across task scheduling). ``resume_or_compute`` skips any stage whose
materialization is complete and verified, making re-runs idempotent: a
killed job re-executes only unfinished stages.

At cluster scale the same mechanism works per partition-range; local mode
demonstrates the stage granularity.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_FILE = "_lineage.json"


def partition_fingerprint(df: DataFrame) -> list[dict]:
    """Per-partition (count, hash-sum) fingerprints. The row hash folds all
    columns through xxhash64; the per-partition SUM is order-insensitive."""
    hashed = df.withColumn("_h", F.xxhash64(*[F.col(c) for c in df.columns])).withColumn(
        "_pid", F.spark_partition_id()
    )
    rows = (
        hashed.groupBy("_pid")
        # decimal(38,0) sum: order-insensitive and overflow-free under ANSI
        .agg(F.count("*").alias("cnt"), F.sum(F.col("_h").cast("decimal(38,0)")).alias("hsum"))
        .collect()
    )
    return [
        {"partition": r["_pid"], "rows": r["cnt"], "hash": str(r["hsum"])}
        for r in sorted(rows, key=lambda r: r["_pid"])
    ]


def materialize(df: DataFrame, path: str, stage: str, mode: str = "overwrite") -> DataFrame:
    """Write a stage to Parquet + lineage sidecar; returns the re-read frame
    (downstream reads decouple from upstream lineage -> shorter plans,
    stable resume points)."""
    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    out = spark.read.parquet(path)
    fp = partition_fingerprint(out)
    meta = {
        "stage": stage,
        "path": path,
        "written_at": time.time(),
        "total_rows": sum(p["rows"] for p in fp),
        "partitions": fp,
        "schema": out.schema.jsonValue(),
    }
    with open(os.path.join(path, LINEAGE_FILE), "w") as fh:
        json.dump(meta, fh)
    return out


def is_complete(spark: SparkSession, path: str) -> bool:
    lineage = os.path.join(path, LINEAGE_FILE)
    if not (os.path.exists(lineage) and os.path.exists(os.path.join(path, "_SUCCESS"))):
        return False
    try:
        with open(lineage) as fh:
            meta = json.load(fh)
        got = spark.read.parquet(path).count()
        return got == meta["total_rows"]
    except Exception:
        return False


def resume_or_compute(spark: SparkSession, path: str, stage: str, builder) -> DataFrame:
    """Idempotent stage execution: reuse a complete materialization, else
    build + materialize. ``builder`` is a zero-arg callable -> DataFrame."""
    if is_complete(spark, path):
        return spark.read.parquet(path)
    return materialize(builder(), path, stage)


def read_lineage(path: str) -> dict:
    with open(os.path.join(path, LINEAGE_FILE)) as fh:
        return json.load(fh)
