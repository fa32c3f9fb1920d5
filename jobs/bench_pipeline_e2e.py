"""End-to-end spark-submit pipeline scaling: N vs 4N cores, writes included.

    python jobs/bench_pipeline_e2e.py [--pages-small 60000]
        [--pages-large 180000] [--reps 3]

jobs/bench_scaling.py measures the KG COMPUTE DAG (no sinks) — the
number that isolates engine scaling from this sandbox's single local
disk. This job measures the literal commanded surface instead: the full
`spark-submit --py-files dist/engine.zip jobs/run_pipeline.py` job,
all eight stage writes + lineage snapshots included, at 8 and 32 cores.

The staged pipeline carries a per-RUN fixed cost that does not shrink
with input (eight stage commits, and per-stage Python-worker spin-up
that GROWS with core count — 32 workers fork+import per Arrow stage);
measured at 2,000 pages the job is ~100% fixed cost and a naive
docs/sec ratio measures the constant, not the engine. So each level is
measured at TWO input sizes and the scaling number is the MARGINAL
rate, (large - small) / (t_large - t_small): the fixed cost cancels,
leaving the per-page cost that dominates any real (hours-long) run of
this job. Both sizes' stage row counts are asserted level-invariant.

The warehouse goes on tmpfs (/dev/shm): memory-backed, standing in for
the distributed object store a real cluster writes to — a single local
disk would serialize all eight writes and measure the disk, not the
engine. Protocol otherwise mirrors bench_scaling.py: fresh subprocess
(fresh JVM) per run, levels + sizes interleaved within each repetition
so a load epoch lands on all four cells equally, and per (level, size)
the MIN seconds across reps is used (the epoch only ever adds time).
Prints one JSON line; appends a section to BENCH/EXPERIMENTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def one_run(pages: int, cpus: int, warehouse: str) -> dict:
    if os.path.exists(warehouse):
        shutil.rmtree(warehouse)
    cmd = [
        "spark-submit",
        # builder-set launch-time conf cannot apply under spark-submit
        # (JVM already up): driver memory silently stays at the 1g
        # default (the 240k-page cell OOMs its 32 parquet writers) and
        # the GC stays G1 — pass both on the command line, where
        # spark-submit honors them, so the measured config matches the
        # python-launched session get_spark builds (A/B at 8g/60k/32c:
        # G1 45.3s vs ParallelGC 47.4s, same epoch — parity, not a
        # perf fix; the heap is the one that breaks).
        "--driver-memory", os.environ.get(
            "SPARK_DRIVER_MEM", "8g" if cpus <= 8 else "16g"),
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--py-files", os.path.join(REPO, "dist/engine.zip"),
        os.path.join(REPO, "jobs/run_pipeline.py"),
        "--pages", str(pages), "--warehouse", warehouse,
        "--cpus", str(cpus),
    ]
    proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL)
    if proc.returncode != 0:
        raise RuntimeError(f"run_pipeline failed at cpus={cpus}")
    out = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    shutil.rmtree(warehouse, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-small", type=int, default=60000)
    ap.add_argument("--pages-large", type=int, default=180000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warehouse", default="/dev/shm/kg_e2e_bench")
    args = ap.parse_args()
    sizes = (args.pages_small, args.pages_large)

    cells: dict[tuple[int, int], list[dict]] = {
        (lv, sz): [] for lv in LEVELS for sz in sizes}
    for rep in range(args.reps):
        for lv in LEVELS:  # interleaved: epoch hits all cells equally
            for sz in sizes:
                load = os.getloadavg()[0]
                out = one_run(sz, lv, args.warehouse)
                out["loadavg_at_start"] = round(load, 2)
                cells[(lv, sz)].append(out)
                print(json.dumps(
                    {"rep": rep, "cpus": lv, "pages": sz,
                     "seconds": out["seconds"],
                     "docs_per_sec": out["docs_per_sec"],
                     "loadavg": out["loadavg_at_start"]}), file=sys.stderr)

    # identical stage outputs per size across levels/reps, or timing is void
    for sz in sizes:
        counts = {json.dumps({k: v["rows"] for k, v in r["stages"].items()},
                             sort_keys=True)
                  for lv in LEVELS for r in cells[(lv, sz)]}
        if len(counts) != 1:
            raise RuntimeError(
                f"stage counts differ across runs at {sz} pages: {counts}")

    best_sec = {cell: min(r["seconds"] for r in rs)
                for cell, rs in cells.items()}
    marginal = {}
    for lv in LEVELS:
        dt = best_sec[(lv, sizes[1])] - best_sec[(lv, sizes[0])]
        if dt <= 0:
            raise RuntimeError(
                f"non-positive marginal time at {lv} cores: {best_sec}; "
                f"sizes too close together for this host's noise")
        marginal[lv] = round((sizes[1] - sizes[0]) / dt, 2)
    eff = round(marginal[32] / (marginal[8] * (32 / 8)), 3)

    result = {
        "metric": "pipeline_e2e_marginal_scaling",
        "pages": list(sizes),
        "reps": args.reps,
        "sink": "tmpfs (/dev/shm) — memory-backed stand-in for the "
                "object store a real cluster writes to",
        "best_seconds": {f"{lv}c_{sz}": best_sec[(lv, sz)]
                         for lv in LEVELS for sz in sizes},
        "fixed_cost_sec": {
            # per-run constant implied by the two-point fit
            str(lv): round(best_sec[(lv, sizes[0])]
                           - sizes[0] * (best_sec[(lv, sizes[1])]
                                         - best_sec[(lv, sizes[0])])
                           / (sizes[1] - sizes[0]), 2)
            for lv in LEVELS},
        "marginal_docs_per_sec": {str(lv): marginal[lv] for lv in LEVELS},
        "efficiency_8_32": eff,
        "loadavg": {f"{lv}c_{sz}": [r["loadavg_at_start"]
                                    for r in cells[(lv, sz)]]
                    for lv in LEVELS for sz in sizes},
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "EXPERIMENTS.md")
    with open(md, "a") as f:
        f.write(
            f"\n## End-to-end spark-submit pipeline scaling (r4, marginal)\n"
            f"\n`jobs/bench_pipeline_e2e.py` — the full `run_pipeline.py` "
            f"job (all 8 stage writes + lineage snapshots, warehouse on "
            f"tmpfs), two-point marginal rate so the per-run fixed cost "
            f"(stage commits + per-stage worker spin-up) cancels; "
            f"interleaved best-of-{args.reps} per cell at "
            f"{sizes[0]}/{sizes[1]} pages:\n\n"
            f"| cores | marginal docs/s | implied fixed cost |\n|---|---|---|\n"
            + "".join(
                f"| {lv} | {marginal[lv]} | "
                f"{result['fixed_cost_sec'][str(lv)]}s |\n"
                for lv in LEVELS)
            + f"\n8->32 marginal efficiency (writes included): **{eff}** — "
            f"compare the compute-DAG pair in BENCH/BASELINE.md; the "
            f"delta is what the sink writes and extra stage barriers "
            f"cost per page at 4x the cores.\n\n"
            f"```json\n{json.dumps(result, indent=2)}\n```\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
