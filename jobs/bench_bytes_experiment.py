"""Bytes-per-doc scaling experiment (r3 verdict item 2).

    python jobs/bench_bytes_experiment.py [--pages 120000] [--reps 2]

Question to settle: is the raw 8->32 scaling efficiency (~0.65-0.72 in
r3, below the 0.8 bar) the ENGINE or the HOST's single shared memory
system? The r3 control argument showed the no-Spark ceiling moving in
lockstep with the engine; the untried lever was cutting bytes-per-doc
crossing memory. This experiment applies one concrete cut — column-
slicing the corpus to the already-extracted `text` column (the html
column dominates scan + Arrow-socket bytes; a real pipeline materializes
extracted text once and never re-reads html) — to BOTH the Spark job
and the bare-Python ceiling control, at 8 and 32 taskset-pinned cores,
interleaved and min-reduced like jobs/bench_scaling.py.

Outcome readings:
  - ceiling AND raw Spark efficiency move UP together under the cut ->
    bandwidth-relief confirmed: the wall is the host's memory system,
    which a real 4N-executor cluster does not share. The raw criterion
    can be retired in favor of the ceiling-relative one.
  - Spark moves but the ceiling does not -> the engine's socket/GC was
    a real factor; keep optimizing.

Also sweeps Arrow maxRecordsPerBatch at 32 cores (html variant): the
per-worker working set is batch_rows * bytes_per_row; smaller batches
relieve peak memory pressure at the cost of more socket round-trips.

Writes BENCH/EXPERIMENTS.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALING = os.path.join(REPO, "jobs", "bench_scaling.py")


def _child(extra: list[str], cores: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, SCALING, *extra],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    print(line, flush=True)
    return rec


def _col_bytes(pages_dir: str) -> dict:
    """Compressed parquet bytes per column — quantifies the cut."""
    import glob

    import pyarrow.parquet as pq

    sizes: dict[str, int] = {}
    for f in glob.glob(os.path.join(pages_dir, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                sizes[name] = sizes.get(name, 0) + col.total_compressed_size
    return sizes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int,
                    default=int(os.environ.get("BENCH_SCALING_PAGES",
                                               "120000")))
    ap.add_argument("--pages-dir", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--arrow-batches", default="10000,2000,500")
    args = ap.parse_args()
    if args.pages_dir is None:
        args.pages_dir = f"/tmp/bench_scaling_pages_{args.pages}"

    # same corpus layout as bench_scaling (same marker => shared input)
    marker = os.path.join(args.pages_dir, f"_GEN_{args.pages}_256")
    if not os.path.exists(marker):
        from thesis_ner_co_tri_training_spark.session import get_spark
        from thesis_ner_co_tri_training_spark.sources.pages import write_pages

        spark = get_spark("bytes_exp_gen", cpus=32)
        write_pages(spark, args.pages, args.pages_dir, partitions=256)
        spark.stop()
        open(marker, "w").close()

    base = ["--pages", str(args.pages), "--pages-dir", args.pages_dir]
    variants = ("html", "text")
    cores_levels = (8, 32)

    spark_runs = {(v, c): [] for v in variants for c in cores_levels}
    ceil_runs = {(v, c): [] for v in variants for c in cores_levels}
    for _ in range(args.reps):
        for cores in cores_levels:
            for v in variants:
                spark_runs[(v, cores)].append(_child(
                    base + ["--cores", str(cores), "--source", v], cores))
    for _ in range(args.reps):
        for cores in cores_levels:
            for v in variants:
                ceil_runs[(v, cores)].append(_child(
                    base + ["--ceiling-cores", str(cores), "--source", v],
                    cores))

    def best(runs):
        return min(runs, key=lambda r: r["seconds"])

    table = {}
    for v in variants:
        s8, s32 = best(spark_runs[(v, 8)]), best(spark_runs[(v, 32)])
        c8, c32 = best(ceil_runs[(v, 8)]), best(ceil_runs[(v, 32)])
        eff_s = (s32["docs_per_sec"] / s8["docs_per_sec"]) / 4
        eff_c = (c32["docs_per_sec"] / c8["docs_per_sec"]) / 4
        table[v] = {
            "spark_8": s8["docs_per_sec"], "spark_32": s32["docs_per_sec"],
            "ceiling_8": c8["docs_per_sec"],
            "ceiling_32": c32["docs_per_sec"],
            "spark_eff_8_32": round(eff_s, 3),
            "ceiling_eff_8_32": round(eff_c, 3),
            "spark_relative": round(eff_s / eff_c, 3),
            "mentions": s32["mentions"],
        }

    # Arrow batch sweep at 32 cores, html variant
    sweep = []
    for b in [int(x) for x in args.arrow_batches.split(",")]:
        rec = best([_child(base + ["--cores", "32", "--source", "html",
                                   "--arrow-batch", str(b)], 32)
                    for _ in range(args.reps)])
        sweep.append({"arrow_batch": b,
                      "docs_per_sec": rec["docs_per_sec"],
                      "seconds": rec["seconds"]})

    sizes = _col_bytes(args.pages_dir)
    cut = round(sizes.get("html", 0) / max(sizes.get("text", 1), 1), 2)
    out = {
        "metric": "bytes_per_doc_scaling_experiment",
        "pages": args.pages,
        "column_bytes": {k: v for k, v in sorted(sizes.items())},
        "html_over_text_bytes": cut,
        "variants": table,
        "arrow_batch_sweep_32c_html": sweep,
        "moved_together": (
            (table["text"]["spark_eff_8_32"] - table["html"]["spark_eff_8_32"])
            * (table["text"]["ceiling_eff_8_32"]
               - table["html"]["ceiling_eff_8_32"]) > 0),
    }
    print(json.dumps(out), flush=True)

    md = os.path.join(REPO, "BENCH", "EXPERIMENTS.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as fh:
        fh.write(
            "\n## Bytes-per-doc scaling experiment (r4)\n\n"
            f"Input: {args.pages} pages; html column carries {cut}x the "
            "compressed bytes of the extracted-text column.\n\n"
            "| variant | spark 8c | spark 32c | spark eff | ceiling eff "
            "(no Spark) | spark-relative |\n|---|---|---|---|---|---|\n"
            + "".join(
                f"| {v} | {t['spark_8']} | {t['spark_32']} "
                f"| **{t['spark_eff_8_32']}** | {t['ceiling_eff_8_32']} "
                f"| {t['spark_relative']} |\n"
                for v, t in table.items())
            + "\nArrow maxRecordsPerBatch sweep (32 cores, html):\n\n"
            "| batch rows | docs/sec | sec |\n|---|---|---|\n"
            + "".join(f"| {s['arrow_batch']} | {s['docs_per_sec']} "
                      f"| {s['seconds']} |\n" for s in sweep)
            + "\n```json\n" + json.dumps(out, indent=2) + "\n```\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
