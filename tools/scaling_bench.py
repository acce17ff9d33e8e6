"""Two-parallelism scaling evidence (north_rule sandbox protocol).

The north rule requires >=0.8 throughput scaling efficiency between N and
4N executors. No real cluster exists in this sandbox, so per SURVEY.md §6
we run the IDENTICAL flagship job (decode -> classify -> areas -> rank ->
label -> tile) on the IDENTICAL seeded parquet input at two local
parallelism levels (local[8] vs local[32] == N and 4N cores) and report

    efficiency = (rows/s @ 32 cores) / (4 x rows/s @ 8 cores)

Each parallelism level runs in its own child JVM/process (a SparkSession's
master cannot change in-process). Every child does one untimed warm-up run
(JIT, Python-worker spin-up, code cache) then ``--iters`` timed runs; the
best timed run is the steady-state throughput. Results land in
``BENCH/BASELINE.md`` plus a machine-readable JSON line on stdout.

Usage:  python tools/scaling_bench.py [--docs 240000] [--iters 2]
Child:  python tools/scaling_bench.py --child --cpus 8 --docs N --iters 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 42


def stage_input(n_docs: int) -> str:
    """Generate (once) the seeded interleaved docs+blobs parquet shared by
    both parallelism levels. Staging is NOT part of the measured time."""
    root = f"/tmp/osmgraft_scale_{SEED}_{n_docs}"
    docs_p, blobs_p = f"{root}/documents.parquet", f"{root}/blobs.parquet"
    if os.path.exists(f"{docs_p}/_SUCCESS") and os.path.exists(f"{blobs_p}/_SUCCESS"):
        return root
    from osmgraft.session import get_spark
    from osmgraft.sources.synth import SynthParams, write_synth

    spark = get_spark(app_name="osmgraft-scale-stage", cores=32, shuffle_partitions=32)
    # fixed partition count (64) so both parallelism levels read the same splits
    write_synth(spark, root, SynthParams(n_docs=n_docs, seed=SEED), partitions=64)
    spark.stop()
    return root


def run_child(cpus: int, n_docs: int, iters: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            "--cpus",
            str(cpus),
            "--docs",
            str(n_docs),
            "--iters",
            str(iters),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child local[{cpus}] failed")
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def child_main(cpus: int, n_docs: int, iters: int) -> None:
    from osmgraft.operators.tiles import assign_tiles
    from osmgraft.plans.pipeline import label_pipeline
    from osmgraft.session import get_spark

    root = f"/tmp/osmgraft_scale_{SEED}_{n_docs}"
    spark = get_spark(app_name=f"osmgraft-scale-{cpus}", cores=cpus, shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{root}/documents.parquet")
    blobs = spark.read.parquet(f"{root}/blobs.parquet")

    def job() -> int:
        return assign_tiles(label_pipeline(spark, docs, blobs), z=12).count()

    rows = job()  # warm-up: JIT, Arrow/pandas worker startup, broadcast build
    runs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        n = job()
        runs.append(round(time.perf_counter() - t0, 3))
        assert n == rows, "nondeterministic row count across runs"
    best = min(runs)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "poi_rows": rows,
                "runs_sec": runs,
                "best_sec": best,
                "rows_per_sec": round(rows / best, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=0)
    ap.add_argument("--docs", type=int, default=int(os.environ.get("OSMGRAFT_SCALE_DOCS", "240000")))
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    if args.child:
        child_main(args.cpus, args.docs, args.iters)
        return

    stage_input(args.docs)
    lo = run_child(8, args.docs, args.iters)
    hi = run_child(32, args.docs, args.iters)
    eff = hi["rows_per_sec"] / (4.0 * lo["rows_per_sec"])
    result = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "n_docs": args.docs,
        "poi_rows": hi["poi_rows"],
        "local8": lo,
        "local32": hi,
    }
    print(json.dumps(result))
    write_report(result)


def write_report(r: dict) -> None:
    lo, hi = r["local8"], r["local32"]
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule: >=0.8 throughput scaling efficiency from N to 4N executors.
Sandbox protocol (SURVEY.md §6): identical flagship job (decode -> classify ->
area assembly -> rank -> label-ball UDF -> slippy tiles, `label_pipeline` +
`assign_tiles`) on the identical seeded parquet input (64 fixed splits),
run at `local[8]` (N) and `local[32]` (4N) in separate JVMs; one untimed
warm-up run per JVM, then timed steady-state runs (best shown).

| parallelism | POI rows | best wall (s) | all runs (s) | rows/s |
|---|---|---|---|---|
| local[8]  (N)  | {lo['poi_rows']} | {lo['best_sec']} | {lo['runs_sec']} | {lo['rows_per_sec']} |
| local[32] (4N) | {hi['poi_rows']} | {hi['best_sec']} | {hi['runs_sec']} | {hi['rows_per_sec']} |

**Scaling efficiency = {hi['rows_per_sec']} / (4 x {lo['rows_per_sec']}) =
{r['value']:.3f}** (target >= 0.8) on a {r['n_docs']:,}-doc interleaved
documents table ({hi['poi_rows']:,} labeled+tiled POI rows).

Caveats: single machine, so "4N executors" is 4N local cores sharing one
memory bus — a real 4N-executor cluster adds network shuffle cost but also
4x aggregate memory bandwidth and page-cache; partition counts
(`spark.sql.shuffle.partitions` = core count, AQE coalescing on) and the
64-split input layout are what the job would use per-executor-count on a
cluster. Command: `python tools/scaling_bench.py --docs {r['n_docs']}`.
"""
        )


if __name__ == "__main__":
    main()
