"""spark-submit entry: the tri-training adaptive loop (run_tritrain.py mirror).

    python jobs/package.py
    spark-submit --py-files dist/engine.zip jobs/run_tritrain.py \
        --pages 500 --warehouse /tmp/tri_wh \
        [--u 500] [--cos-threshold 0.9] [--tcfd 0.7] [--scfd 0.6] \
        [--r-t 0.1] [--r-s 0.1]

Defaults mirror the reference's run_tritrain.py:27-62. Pages are tagged
once (tri-view fused pass), then the checkpointed loop consumes pools,
relaxing (tcfd, scfd) by (r_t, r_s) per iteration until tcfd < scfd —
each iteration is a resumable warehouse stage (tri_it*), so rerunning
resumes mid-loop. Prints one JSON line: per-iteration selections + the
extended-set size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=500)
    ap.add_argument("--input", default=None,
                    help="existing pages parquet dir (overrides --pages)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--u", type=int, default=500)
    ap.add_argument("--cos-threshold", type=float, default=0.9)
    ap.add_argument("--tcfd", type=float, default=0.7)
    ap.add_argument("--scfd", type=float, default=0.6)
    ap.add_argument("--r-t", type=float, default=0.1)
    ap.add_argument("--r-s", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from thesis_ner_co_tri_training_spark.operators.tagging import tag_pages_df
    from thesis_ner_co_tri_training_spark.plans.tritrain_loop import tritrain_fit
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    spark = get_spark("tritrain", cpus=args.cpus)
    if args.input:
        pages = spark.read.parquet(args.input)
        n_pages = pages.count()
    else:
        pages = gen_pages_df(spark, args.pages)
        n_pages = args.pages

    t0 = time.time()
    views = tag_pages_df(pages.drop("text"))
    ext, lineage = tritrain_fit(
        spark, views, args.warehouse, u=args.u,
        cos_threshold=args.cos_threshold, tcfd=args.tcfd, scfd=args.scfd,
        r_t=args.r_t, r_s=args.r_s,
    )
    n_ext = ext.count()
    print(json.dumps({
        "pages": n_pages,
        "seconds": round(time.time() - t0, 2),
        "iterations": [
            {"stage": ln.get("table"),
             "tcfd": ln["params"]["tcfd"], "scfd": ln["params"]["scfd"],
             "selected": ln.get("row_count"),
             "resumed": ln.get("resumed", False)}
            for ln in lineage
        ],
        "extended_rows": n_ext,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
