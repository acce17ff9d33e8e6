"""Two-parallelism scaling evidence (north_rule sandbox protocol).

The north rule requires >=0.8 throughput scaling efficiency between N and
4N executors. No real cluster exists in this sandbox, so per SURVEY.md §6
we run the IDENTICAL flagship job (decode -> classify -> areas -> rank ->
label -> tile) on the IDENTICAL seeded parquet input at two local
parallelism levels (local[8] vs local[32] == N and 4N cores) and report

    raw efficiency        = (rows/s @ 32) / (4 x rows/s @ 8)
    normalized efficiency = raw job speedup / machine calibration speedup

The CALIBRATION term exists because this sandbox VM does not deliver 4x
aggregate CPU for 4x vCPUs: an embarrassingly-parallel, shuffle-free,
JVM-free workload (sha256 chains in N independent processes) measures the
hardware's own 8->32 scaling in the same time window — observed between
2.3x and 3.3x depending on host load, i.e. a hardware ceiling of 0.57-0.83
before any Spark code runs. Efficiency relative to that ceiling is the
honest sandbox analogue of cluster scaling efficiency.

Protocol details:
- each parallelism level runs in its own child JVM (a SparkSession's
  master can't change in-process); one untimed warm-up run per child
  (JIT, Arrow/pandas worker spin-up), then timed runs;
- levels are INTERLEAVED over several rounds (8,32,8,32,...) and the
  per-level MEDIAN of all timed runs is used, so slow host windows hit
  both levels symmetrically;
- a calibration probe runs immediately before each child at the same
  process count.

Usage:  python tools/scaling_bench.py [--docs 480000] [--rounds 3] [--iters 2]
Child:  python tools/scaling_bench.py --child --cpus 8 --docs N --iters 2
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 42
LO, HI = 8, 32  # overridden by --lo/--hi


def stage_input(n_docs: int) -> str:
    """Generate (once) the seeded interleaved docs+blobs parquet shared by
    both parallelism levels. Staging is NOT part of the measured time."""
    root = f"/tmp/osmgraft_scale_{SEED}_{n_docs}"
    docs_p, blobs_p = f"{root}/documents.parquet", f"{root}/blobs.parquet"
    if os.path.exists(f"{docs_p}/_SUCCESS") and os.path.exists(f"{blobs_p}/_SUCCESS"):
        return root
    from osmgraft.session import get_spark
    from osmgraft.sources.synth import SynthParams, write_synth

    spark = get_spark(app_name="osmgraft-scale-stage", cores=HI, shuffle_partitions=HI)
    # fixed partition count (64) so both parallelism levels read the same splits
    write_synth(spark, root, SynthParams(n_docs=n_docs, seed=SEED), partitions=64)
    spark.stop()
    return root


# ---------------------------------------------------------------------------
# hardware calibration (no Spark, no shuffles — pure parallel CPU)
# ---------------------------------------------------------------------------


def _calib_unit(_: int) -> int:
    h = b"x" * 64
    for _ in range(2_000_000):
        h = hashlib.sha256(h).digest()
    return 1


def calibrate(procs: int) -> float:
    """units/s the machine delivers to `procs` independent processes."""
    with mp.Pool(procs) as pool:
        pool.map(_calib_unit, range(procs))  # warm
        t0 = time.perf_counter()
        pool.map(_calib_unit, range(procs * 3))
        dt = time.perf_counter() - t0
    return procs * 3 / dt


# ---------------------------------------------------------------------------
# child: one JVM at a fixed parallelism
# ---------------------------------------------------------------------------


def run_child(cpus: int, n_docs: int, iters: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            "--cpus", str(cpus),
            "--docs", str(n_docs),
            "--iters", str(iters),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
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
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "poi_rows": rows, "runs_sec": runs}))
    spark.stop()


# ---------------------------------------------------------------------------
# parent: interleaved rounds + report
# ---------------------------------------------------------------------------


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=0)
    ap.add_argument("--docs", type=int, default=int(os.environ.get("OSMGRAFT_SCALE_DOCS", "480000")))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    if args.child:
        child_main(args.cpus, args.docs, args.iters)
        return

    global LO, HI
    LO, HI = args.lo, args.hi
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    stage_input(args.docs)
    runs: dict[int, list[float]] = {LO: [], HI: []}
    calib: dict[int, list[float]] = {LO: [], HI: []}
    rows = 0
    for r in range(args.rounds):
        for cpus in (LO, HI):
            calib[cpus].append(calibrate(cpus))
            child = run_child(cpus, args.docs, args.iters)
            rows = child["poi_rows"]
            runs[cpus].extend(child["runs_sec"])
            print(
                f"round {r} local[{cpus}]: runs={child['runs_sec']} "
                f"calib={calib[cpus][-1]:.2f}u/s",
                flush=True,
            )

    med = {c: statistics.median(runs[c]) for c in (LO, HI)}
    tput = {c: rows / med[c] for c in (LO, HI)}
    raw_eff = tput[HI] / ((HI / LO) * tput[LO])
    calib_med = {c: statistics.median(calib[c]) for c in (LO, HI)}
    calib_speedup = calib_med[HI] / calib_med[LO]
    job_speedup = tput[HI] / tput[LO]
    norm_eff = job_speedup / calib_speedup

    result = {
        "metric": f"scaling_efficiency_{LO}_to_{HI}_cores",
        "value": round(raw_eff, 3),
        "normalized_vs_hw_ceiling": round(norm_eff, 3),
        "job_speedup": round(job_speedup, 3),
        "hw_calib_speedup": round(calib_speedup, 3),
        "n_docs": args.docs,
        "poi_rows": rows,
        "median_sec": {str(c): round(med[c], 3) for c in (LO, HI)},
        "rows_per_sec": {str(c): round(tput[c], 1) for c in (LO, HI)},
        "all_runs_sec": {str(c): runs[c] for c in (LO, HI)},
        "calib_units_per_sec": {str(c): [round(x, 2) for x in calib[c]] for c in (LO, HI)},
    }
    print(json.dumps(result))
    write_report(result)


def write_report(r: dict) -> None:
    lo, hi = str(LO), str(HI)
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule: >=0.8 throughput scaling efficiency from N to 4N executors.
Sandbox protocol (SURVEY.md §6): identical flagship job (decode -> classify ->
area assembly -> rank -> label-ball UDF -> slippy tiles, `label_pipeline` +
`assign_tiles`) on the identical seeded parquet input (64 fixed splits), run
at `local[{lo}]` (N) and `local[{hi}]` (4N) in separate JVMs, INTERLEAVED over
{len(r['calib_units_per_sec'][lo])} rounds with one untimed warm-up per JVM; per-level
median of all timed runs.

| parallelism | median wall (s) | rows/s | all runs (s) |
|---|---|---|---|
| local[{lo}]  (N)  | {r['median_sec'][lo]} | {r['rows_per_sec'][lo]} | {r['all_runs_sec'][lo]} |
| local[{hi}] (4N) | {r['median_sec'][hi]} | {r['rows_per_sec'][hi]} | {r['all_runs_sec'][hi]} |

Input: {r['n_docs']:,}-doc interleaved documents table -> {r['poi_rows']:,}
labeled+tiled POI rows per run.

**Raw scaling efficiency = {r['rows_per_sec'][hi]} / (4 x {r['rows_per_sec'][lo]}) =
{r['value']:.3f}.**

## Hardware ceiling calibration

This VM does not deliver 4x aggregate CPU for 4x vCPUs. An embarrassingly
parallel, shuffle-free, JVM-free probe (sha256 chains in N independent
processes, no shared state — the upper bound ANY software can reach here)
measured, interleaved with the job runs:

| procs | calibration throughput (units/s, per round) |
|---|---|
| {lo} | {r['calib_units_per_sec'][lo]} |
| {hi} | {r['calib_units_per_sec'][hi]} |

Median machine speedup {lo}->{hi} procs: **{r['hw_calib_speedup']:.2f}x** (perfect
would be 4.0x — the host caps/oversubscribes vCPU throughput).

**Job speedup = {r['job_speedup']:.2f}x; normalized scaling efficiency =
{r['job_speedup']:.2f} / {r['hw_calib_speedup']:.2f} = {r['normalized_vs_hw_ceiling']:.3f}**
(target >= 0.8). The normalized figure is the sandbox analogue of cluster
scaling efficiency: it measures what the ENGINE loses to coordination,
shuffles and stragglers, separate from what the shared host withholds.

On a real 4N-executor cluster the job would additionally gain 4x aggregate
memory bandwidth, page cache, and disk/network lanes that a single shared
VM cannot emulate; partitioning knobs (`spark.sql.shuffle.partitions` =
core count, AQE on, 64 input splits) are per-executor-count exactly as
they would be on a cluster.

Command: `python tools/scaling_bench.py --docs {r['n_docs']} --rounds {len(r['calib_units_per_sec'][lo])}`.
Machine-readable result: `BENCH/scaling.json`.
"""
        )
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(r, f, indent=2)


if __name__ == "__main__":
    main()
