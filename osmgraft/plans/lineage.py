"""Checkpoint / lineage / resume rails (north_rule: resumable at 10^12 docs).

Each pipeline stage can be materialized to Parquet with a ``_lineage.json``
sidecar holding per-partition row counts and content hashes
(``xxhash64`` folded per partition — order-insensitive SUM so the hash is
stable across task scheduling). ``resume_or_compute`` skips any stage whose
materialization is complete and verified, making re-runs idempotent: a
killed job re-executes only unfinished stages.

Granularity is per partition-range ("chunk"), not only per stage: a stage
written with ``n_chunks > 1`` commits each chunk independently
(``chunk-00000/`` subdirs, each with its own ``_SUCCESS`` + sidecar), so a
job killed at 99% re-executes only the missing chunks instead of the whole
stage. Chunk membership is a pure function of row content
(``pmod(xxhash64(cols), n)``) — stable across runs, schedulers, and
cluster sizes, which is what makes a partially-written stage resumable at
all. At 10^12 rows, ``chunk_by`` should name the table's partition column
so the per-chunk filter prunes the rescan.
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


def materialize(
    df: DataFrame, path: str, stage: str, mode: str = "overwrite", extra: dict | None = None
) -> DataFrame:
    """Write a stage to Parquet + lineage sidecar; returns the re-read frame
    (downstream reads decouple from upstream lineage -> shorter plans,
    stable resume points). ``extra`` merges additional keys into the
    sidecar (chunk writes record their chunking there)."""
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
    if extra:
        meta.update(extra)
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


def chunk_expr(n_chunks: int, cols: list[str]):
    """Deterministic, content-based chunk id: stable across runs and task
    scheduling (unlike ``spark_partition_id``), so a chunk written by a
    killed job holds exactly the rows a resume would assign to it."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_chunks)).cast("int")


def _chunk_path(path: str, i: int) -> str:
    return os.path.join(path, f"chunk-{i:05d}")


def read_chunked(spark: SparkSession, path: str, n_chunks: int) -> DataFrame:
    return spark.read.parquet(*[_chunk_path(path, i) for i in range(n_chunks)])


def materialize_chunked(
    df: DataFrame,
    path: str,
    stage: str,
    n_chunks: int,
    chunk_by: list[str] | None = None,
    _existing: dict[int, dict] | None = None,
) -> DataFrame:
    """Write a stage as ``n_chunks`` independently-committed partition
    ranges. ``_existing`` (from :func:`resume_or_compute`) maps chunk index
    -> verified sidecar; those chunks are NOT rewritten — their lineage
    entries (incl. original ``written_at``) carry into the stage sidecar,
    which is the auditable proof of partial reuse."""
    existing = _existing or {}
    missing = [i for i in range(n_chunks) if i not in existing]
    src = df.withColumn("_chunk", chunk_expr(n_chunks, chunk_by or df.columns))
    if len(missing) > 1:
        # one materialization of the producing plan; each chunk write is
        # then a cheap filter. A single missing chunk skips this: one
        # filtered pass beats checkpointing the full frame.
        src = src.localCheckpoint(eager=True)
    chunk_metas: list[dict] = []
    for i in range(n_chunks):
        if i in existing:
            chunk_metas.append({**existing[i], "resumed": True})
            continue
        cpath = _chunk_path(path, i)
        materialize(
            src.where(F.col("_chunk") == i).drop("_chunk"),
            cpath,
            f"{stage}#{i}",
            # the chunk records the modulus its rows were assigned under —
            # resume refuses to mix chunks from different chunkings
            extra={"n_chunks": n_chunks, "chunk_index": i, "chunk_by": chunk_by},
        )
        chunk_metas.append(read_lineage(cpath))
    spark = df.sparkSession
    meta = {
        "stage": stage,
        "path": path,
        "written_at": time.time(),
        "n_chunks": n_chunks,
        "total_rows": sum(c["total_rows"] for c in chunk_metas),
        "chunks": chunk_metas,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, LINEAGE_FILE), "w") as fh:
        json.dump(meta, fh)
    _prune_stale_chunks(path, n_chunks)
    return read_chunked(spark, path, n_chunks)


def _prune_stale_chunks(path: str, n_chunks: int) -> None:
    """Remove orphan ``chunk-XXXXX`` dirs beyond the current chunking (left
    behind when a path is re-chunked with a smaller ``n_chunks``) so a
    later resume can never read rows assigned under a different modulus."""
    import re
    import shutil

    for name in os.listdir(path):
        m = re.fullmatch(r"chunk-(\d{5})", name)
        if m and int(m.group(1)) >= n_chunks:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def resume_or_compute(
    spark: SparkSession,
    path: str,
    stage: str,
    builder,
    n_chunks: int = 1,
    chunk_by: list[str] | None = None,
) -> DataFrame:
    """Idempotent stage execution: reuse a complete materialization, else
    build + materialize. ``builder`` is a zero-arg callable -> DataFrame.

    With ``n_chunks > 1`` the reuse is per partition-range: every chunk
    whose own sidecar verifies is kept as-is and only the missing chunks
    are computed and written (the builder runs once, filtered per missing
    chunk). All chunks verified -> the builder never runs.

    A chunk is reusable only if its sidecar records the SAME ``n_chunks``
    it is being resumed under: chunk membership is ``pmod(hash, n_chunks)``,
    so a chunk written under a different modulus holds a different row set
    — mixing chunkings would silently drop or duplicate rows. Stale chunks
    (older sidecar format or mismatched ``n_chunks``) are discarded and
    recomputed."""
    if n_chunks <= 1:
        if is_complete(spark, path):
            return spark.read.parquet(path)
        return materialize(builder(), path, stage)
    existing = {}
    for i in range(n_chunks):
        cpath = _chunk_path(path, i)
        if not is_complete(spark, cpath):
            continue
        meta = read_lineage(cpath)
        if meta.get("n_chunks") != n_chunks:
            continue  # written under a different modulus: row set differs
        if meta.get("chunk_by") != chunk_by:
            # same modulus but different hash columns: pmod(xxhash64(*cols),
            # N) assigns a different row set per chunk, so mixing would
            # drop/duplicate rows exactly like an n_chunks mismatch
            continue
        existing[i] = meta
    if len(existing) == n_chunks:
        if not os.path.exists(os.path.join(path, LINEAGE_FILE)):
            # all chunks landed but the kill hit before the stage sidecar
            meta = {
                "stage": stage,
                "path": path,
                "written_at": time.time(),
                "n_chunks": n_chunks,
                "total_rows": sum(c["total_rows"] for c in existing.values()),
                "chunks": [{**existing[i], "resumed": True} for i in range(n_chunks)],
            }
            with open(os.path.join(path, LINEAGE_FILE), "w") as fh:
                json.dump(meta, fh)
        return read_chunked(spark, path, n_chunks)
    return materialize_chunked(builder(), path, stage, n_chunks, chunk_by, _existing=existing)


def read_lineage(path: str) -> dict:
    with open(os.path.join(path, LINEAGE_FILE)) as fh:
        return json.load(fh)
