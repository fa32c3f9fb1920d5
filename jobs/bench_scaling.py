"""Scaling-efficiency evidence for the north rule (BASELINE.json:2,14).

The rule demands >=0.8 throughput scaling efficiency between N- and
4N-executor clusters. No real cluster exists in this sandbox, so the
sanctioned proxy is the SAME job on the SAME input at two parallelism
levels: local[8] and local[32].

Protocol (each level runs in its own subprocess/JVM so configs are clean):
  1. parent generates the pages corpus ONCE to parquet (deterministic,
     seed-pinned, 128 files so both levels have ample tasks),
  2. child at local[N]: warmup pass (JIT/codegen + Python worker spin-up,
     excluded — on a cluster this is amortized over a long job), then the
     timed pass: scan parquet -> extract_text -> sentences -> tri-view
     tagging -> agreement vote -> mentions + triples counts,
  3. parent computes efficiency = (thr_4N / thr_N) / 4 and writes
     BENCH/BASELINE.md.

Usage:
    python jobs/bench_scaling.py                 # full protocol
    python jobs/bench_scaling.py --cores 8 ...   # child mode (internal)
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

DEFAULT_PAGES = int(os.environ.get("BENCH_SCALING_PAGES", "60000"))
INPUT_FILES = 128  # fixed task granularity at both levels


def run_level(cores: int, pages_dir: str, n_pages: int) -> None:
    """Child: one parallelism level, prints one JSON line."""
    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.mentions import (
        spans_expr, vote_mentions)
    from thesis_ner_co_tri_training_spark.operators.tagging import tag_pages_df
    from thesis_ner_co_tri_training_spark.operators.triples import triples_from_spans
    from thesis_ner_co_tri_training_spark.session import get_spark

    # One task per input file at BOTH levels (same task granularity a
    # cluster sees on a 100TB corpus where 128MB splits are plentiful;
    # default packing would coalesce this sandbox's ~130KB files into ~4
    # partitions and serialize the whole narrow pipeline).
    spark = get_spark(f"bench_scaling_{cores}", cpus=cores,
                      shuffle_partitions=max(2 * cores, 16),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(512 * 1024),
                          "spark.sql.files.openCostInBytes": str(128 * 1024),
                      })

    def job(src):
        # Single action: the span fold is evaluated once per row and
        # serves both the mention count and the triple count — no cache,
        # no second job, no fixed-overhead double-pay.
        voted = vote_mentions(tag_pages_df(src))
        row = (
            voted.withColumn("ms", spans_expr("tags", "confs"))
            .agg(
                F.sum(F.size("ms")).alias("nm"),
                F.sum(F.size(triples_from_spans("tokens", "ms"))).alias("nt"),
            )
            .collect()[0]
        )
        return int(row["nm"]), int(row["nt"])

    # Warmup = one full pass: spins up ALL N Python UDF workers (pandas
    # import + per-worker gazetteer build) and JIT/codegen. A limit()-based
    # slice would coalesce to ~1 partition and warm only one worker,
    # leaving 10-20s of fork/import system time inside the measurement.
    pages = spark.read.parquet(pages_dir).select("url", "html")
    job(pages)

    # Best-of-3: this sandbox kernel shows 2-3x run-to-run variance on
    # identical jobs (shared-host noise); min is the standard estimator
    # for the machine's actual capability.
    runs = []
    for _ in range(3):
        t0 = time.time()
        n_m, n_t = job(pages)
        runs.append(time.time() - t0)
    sec = min(runs)
    print(json.dumps({
        "cores": cores,
        "pages": n_pages,
        "seconds": round(sec, 3),
        "runs": [round(r, 3) for r in runs],
        "docs_per_sec": round(n_pages / sec, 2),
        "mentions": n_m,
        "triples": n_t,
    }), flush=True)
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--pages", type=int, default=DEFAULT_PAGES)
    ap.add_argument("--pages-dir", default=None,
                    help="defaults to /tmp/bench_scaling_pages_<pages>")
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    if args.pages_dir is None:
        args.pages_dir = f"/tmp/bench_scaling_pages_{args.pages}"

    if args.cores:
        run_level(args.cores, args.pages_dir, args.pages)
        return 0

    # Parent: generate shared input once.
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import write_pages

    marker = os.path.join(args.pages_dir, f"_GEN_{args.pages}")
    if not os.path.exists(marker):
        spark = get_spark("bench_scaling_gen", cpus=32)
        write_pages(spark, args.pages, args.pages_dir, partitions=INPUT_FILES)
        spark.stop()
        open(marker, "w").close()

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for cores in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
             "--pages", str(args.pages), "--pages-dir", args.pages_dir],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    summary = {
        "metric": "kg_pipeline_scaling_efficiency",
        "levels": results,
        "core_ratio": ratio,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary), flush=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            "# Scaling-efficiency evidence (north rule proxy)\n\n"
            "Same KG-construction job (pages parquet scan -> extract_text ->\n"
            "sentences -> tri-view tagging -> agreement vote -> mentions +\n"
            "triples) on the SAME input at two parallelism levels, each in a\n"
            "fresh JVM. Warmup pass excluded (Python-worker spin-up + codegen;\n"
            "amortized on any long-running cluster job).\n\n"
            f"Input: {lo['pages']} synthetic Common-Crawl-style pages, "
            f"{INPUT_FILES} parquet files.\n\n"
            "| parallelism | seconds | docs/sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{r['cores']}] | {r['seconds']} | {r['docs_per_sec']} |\n"
                for r in results
            )
            + f"\nSpeedup {lo['cores']}->{hi['cores']} cores: "
            f"{summary['speedup']}x over a {ratio:.0f}x core ratio\n\n"
            f"**Scaling efficiency: {summary['efficiency']}** "
            f"(target >= 0.8: {'PASS' if summary['pass'] else 'FAIL'})\n\n"
            "```json\n" + json.dumps(summary, indent=2) + "\n```\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
