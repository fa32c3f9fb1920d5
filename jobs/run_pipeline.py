"""spark-submit entry: run the full KG-construction DAG.

Usage (north rule launch mode):

    python jobs/package.py                      # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/run_pipeline.py \
        --pages 2000 --warehouse /tmp/kg_wh --cpus 8

Reads or generates the `pages` table, runs sentences -> mentions -> voted
-> triples -> entities -> nodes/edges with per-stage lineage, prints a
one-line JSON summary (docs/sec throughput).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000,
                    help="generate N synthetic pages (ignored with --input)")
    ap.add_argument("--input", default=None,
                    help="existing pages parquet dir (url/warc_ts/html/text/lang)")
    ap.add_argument("--input-warc", default=None,
                    help="dir/glob of .warc/.warc.gz files (Common-Crawl-style "
                         "ingestion via sources.warc.read_warc)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--eval-report", action="store_true",
                    help="emit <warehouse>/eval/dev_results.txt — the "
                         "seqeval-style P/R/F1 artifact vs the synthetic "
                         "corpus's gold plants (run_ner.py:558-571 mirror; "
                         "synthetic --pages mode only)")
    args = ap.parse_args()
    if args.eval_report and (args.input or args.input_warc):
        print("warning: --eval-report ignored (gold tables exist only for "
              "synthetic --pages corpora, not --input/--input-warc)",
              file=sys.stderr)

    from thesis_ner_co_tri_training_spark.plans.pipeline import run_pipeline
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    spark = get_spark("kg_pipeline", cpus=args.cpus,
                      shuffle_partitions=args.shuffle_partitions)
    if args.input_warc:
        from thesis_ner_co_tri_training_spark.sources.warc import read_warc

        pages = (read_warc(spark, args.input_warc)
                 .filter("parse_error IS NULL")
                 .select("url", "warc_ts", "html"))
        n_pages = pages.count()
    elif args.input:
        pages = spark.read.parquet(args.input)
        n_pages = pages.count()
    else:
        pages = gen_pages_df(spark, args.pages)
        n_pages = args.pages

    t0 = time.time()
    lineage = run_pipeline(spark, pages, args.warehouse, resume=not args.no_resume)
    elapsed = time.time() - t0

    summary = {
        "pages": n_pages,
        "seconds": round(elapsed, 2),
        "docs_per_sec": round(n_pages / elapsed, 2),
        "stages": {
            k: {"rows": v.get("row_count"), "resumed": v.get("resumed", False)}
            for k, v in lineage.items()
        },
    }
    # Synthetic --pages mode only: the gold tables are generated for the
    # synthetic page ids, so scoring a corpus read from --input/--input-warc
    # against them would produce an all-FP/all-FN "report".
    if args.eval_report and not args.input and not args.input_warc:
        import os

        from thesis_ner_co_tri_training_spark.plans.eval import write_prf_artifact
        from thesis_ner_co_tri_training_spark.sources import catalog
        from thesis_ner_co_tri_training_spark.sources.pages import gold_tables

        gm, _ = gold_tables(args.pages)
        gold = spark.createDataFrame(gm)
        mentions = catalog.read_table(spark, args.warehouse, "mentions")
        out = os.path.join(args.warehouse, "eval", "dev_results.txt")
        write_prf_artifact(mentions, gold,
                           keys=["url", "sent_id", "beg", "end"], out_path=out)
        summary["eval_report"] = out

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
