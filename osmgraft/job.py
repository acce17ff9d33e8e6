"""spark-submit entrypoint (north_rule: `spark-submit --py-files` on a
multi-executor cluster).

Build the dependency zip and submit:

    python tools/build_pyfiles.py                    # -> dist/osmgraft.zip
    spark-submit --py-files dist/osmgraft.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        osmgraft/job.py \
        --docs s3://bucket/documents --blobs s3://bucket/blobs \
        --out s3://bucket/labels --stage-dir s3://bucket/_stages \
        --tile-zoom 12 [--dedup-radius-m 2000] [--resume] \
        [--resume-chunks 64 --chunk-by osm_id]

Stages (each materialized via plans/lineage.py when --stage-dir is given,
so a killed job resumes at the first incomplete stage):

    decode+extract -> rank -> label -> [knn dedup] -> tiles -> sink

Streaming ingest mode (the documents table grows continuously):

    ... osmgraft/job.py --streaming --checkpoint s3://bucket/_ckpt \
        --docs s3://bucket/documents --blobs s3://bucket/blobs \
        --out s3://bucket/labels [--dedup-docs [--dedup-ttl "24 hours"]]

Each invocation drains the files not yet recorded in the checkpoint
(availableNow) through the full pipeline per micro-batch and lands them
under per-epoch partitions (idempotent overwrite); re-running with the
same checkpoint processes only NEW files — the streaming counterpart of
--resume.

In local mode (no cluster) the same file runs under plain `python` for
smoke testing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="osmgraft label pipeline job")
    ap.add_argument("--docs", required=True, help="documents table path/URI")
    ap.add_argument("--blobs", required=True, help="geometry blobs table path/URI")
    ap.add_argument("--out", required=True, help="output labels path")
    ap.add_argument("--config", default=None, help="labeling config JSON (default built-in)")
    ap.add_argument("--stage-dir", default=None, help="stage materialization dir (enables resume)")
    ap.add_argument("--resume", action="store_true", help="skip complete stages in --stage-dir")
    ap.add_argument(
        "--resume-chunks",
        type=int,
        default=1,
        help="commit each stage as N independently-resumable partition-range "
        "chunks (pmod(xxhash64(chunk-by), N)); a killed job re-executes only "
        "the missing chunks instead of the whole stage",
    )
    ap.add_argument(
        "--chunk-by",
        default="osm_id",
        help="comma-separated columns driving chunk membership (default "
        "osm_id — a stable natural id keeps chunking content-deterministic)",
    )
    ap.add_argument("--tile-zoom", type=int, default=12)
    ap.add_argument("--dedup-radius-m", type=float, default=0.0, help="0 = no kNN dedup")
    ap.add_argument("--text-format", action="store_true", help="emit K1 text rows instead of parquet")
    ap.add_argument("--export-hierarchy", action="store_true", help="-eh flag: level id instead of rank")
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="ingest --docs as a file stream (one availableNow pass over new "
        "files; per-epoch idempotent parquet sink). Requires --checkpoint; "
        "incompatible with --text-format/--stage-dir (streaming resume IS "
        "the checkpoint) and with --dedup-radius-m (kNN dedup is a global "
        "pass, run it batch-side after ingest)",
    )
    ap.add_argument("--checkpoint", default=None, help="streaming checkpoint dir (with --streaming)")
    ap.add_argument(
        "--dedup-docs",
        action="store_true",
        help="with --streaming: stateful cross-batch first-seen dedup of "
        "documents by span-sequence fingerprint before labeling",
    )
    ap.add_argument(
        "--dedup-ttl",
        default=None,
        help='state TTL horizon for --dedup-docs (e.g. "24 hours"; default unbounded)',
    )
    ap.add_argument(
        "--max-files-per-trigger", type=int, default=64, help="streaming micro-batch size (files)"
    )
    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    # only stop a session this entrypoint itself created: under spark-submit
    # that's the job's own session; embedded (tests, notebooks) the caller
    # keeps ownership of theirs
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("osmgraft-labels").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osmgraft.operators.tiles import assign_tiles
    from osmgraft.plans.pipeline import format_complete, label_pipeline
    from osmgraft.sources.config import default_config, load_config

    cfg = load_config(args.config) if args.config else default_config()
    blobs = spark.read.parquet(args.blobs)

    if args.streaming:
        if not args.checkpoint:
            raise SystemExit("--streaming requires --checkpoint")
        if args.text_format or args.stage_dir or args.dedup_radius_m > 0:
            raise SystemExit(
                "--streaming is incompatible with --text-format/--stage-dir/"
                "--dedup-radius-m (see --help)"
            )
        from osmgraft.streaming.ingest import (
            stream_documents,
            stream_dedup_documents,
            stream_pipeline_foreach_batch,
        )

        stream = stream_documents(spark, args.docs, max_files=args.max_files_per_trigger)
        if args.dedup_docs:
            stream = stream_dedup_documents(stream, state_ttl=args.dedup_ttl)
        q = stream_pipeline_foreach_batch(
            spark,
            stream,
            blobs,
            args.out,
            args.checkpoint,
            cfg=cfg,
            extra=lambda df: assign_tiles(df, z=args.tile_zoom),
        )
        q.awaitTermination()
        # a fully-caught-up checkpoint drains zero micro-batches, so
        # foreachBatch never creates args.out — report 0 rows instead of
        # crashing on PATH_NOT_FOUND
        n = spark.read.parquet(args.out).count() if os.path.exists(args.out) else 0
        print(json.dumps({"status": "ok", "out": args.out, "rows": n, "mode": "streaming"}))
        if owns_session:
            spark.stop()
        return

    docs = spark.read.parquet(args.docs)

    def staged(name: str, builder):
        if args.stage_dir:
            from osmgraft.plans.lineage import (
                materialize,
                materialize_chunked,
                resume_or_compute,
            )

            path = f"{args.stage_dir}/{name}"
            n_chunks = max(args.resume_chunks, 1)
            chunk_by = [c.strip() for c in args.chunk_by.split(",") if c.strip()]
            if args.resume:
                return resume_or_compute(
                    spark, path, name, builder, n_chunks=n_chunks, chunk_by=chunk_by
                )
            if n_chunks > 1:
                return materialize_chunked(builder(), path, name, n_chunks, chunk_by)
            return materialize(builder(), path, name)
        return builder()

    labels = staged("labels", lambda: label_pipeline(spark, docs, blobs, cfg=cfg))
    if args.dedup_radius_m > 0:
        from osmgraft.operators.knn import dedup_labels

        labels = staged(
            "labels_dedup", lambda: dedup_labels(labels, radius_m=args.dedup_radius_m)
        )
    tiled = assign_tiles(labels, z=args.tile_zoom)

    if args.text_format:
        format_complete(tiled, export_hierarchy=args.export_hierarchy).write.mode(
            "overwrite"
        ).text(args.out)
    else:
        tiled.write.mode("overwrite").parquet(args.out)

    n = spark.read.parquet(args.out).count() if not args.text_format else None
    print(json.dumps({"status": "ok", "out": args.out, "rows": n}))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
