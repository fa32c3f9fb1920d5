"""I5 — parameterized ablation sweeps (hack_co.py:27-106 / hack_exp.py analog).

The reference sweeps co-training hyperparameters (k pools, top_n picks,
pool size u) and records how many pseudo-labeled sentences each setting
admits. Same experiment here over the synthetic pages corpus: one Spark
session, a grid of (u, top_n, cos_threshold), each cell = pools -> top-n
per pool -> tri-view agreement gate, recording selected-row counts and
wall time as JSON lines into BENCH/sweep.jsonl.

Usage:
    python jobs/sweep.py [--pages 2000] [--out BENCH/sweep.jsonl]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

U_GRID = [50, 100, 200]          # pool sizes   (run_cotrain.py:58-61 range)
TOP_N_GRID = [5, 10, 25]         # picks/pool   (hack_co.py:56)
COS_GRID = [0.5, 0.7, 0.9]       # agreement    (run_tritrain.py defaults)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "sweep.jsonl"))
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.mentions import vote_mentions
    from thesis_ner_co_tri_training_spark.operators.selection import (
        assign_pools, shuffled_with_position, top_n_per_pool)
    from thesis_ner_co_tri_training_spark.operators.tagging import tag_pages_df
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    spark = get_spark("sweep", cpus=args.cpus)
    views = tag_pages_df(gen_pages_df(spark, args.pages).drop("text"))
    # score once; every sweep cell reuses the cached tagged corpus
    scored = shuffled_with_position(
        views.withColumn("avg_cfd", F.greatest("t1_cfd", "t2_cfd", "t3_cfd"))
    ).cache()
    n_sents = scored.count()

    if os.path.dirname(args.out):  # bare filename: dirname '' would raise
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    results = []
    with open(args.out, "w") as fh:
        for u, top_n, cos_thr in itertools.product(U_GRID, TOP_N_GRID, COS_GRID):
            t0 = time.time()
            pooled = assign_pools(scored, u=u)
            picked = top_n_per_pool(pooled, top_n=top_n)
            ext = vote_mentions(picked, cos_threshold=cos_thr)
            n_ext = ext.count()
            rec = {
                "u": u, "top_n": top_n, "cos_threshold": cos_thr,
                "pages": args.pages, "n_sentences": n_sents,
                "n_selected": n_ext,
                "seconds": round(time.time() - t0, 3),
            }
            results.append(rec)
            fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
    print(json.dumps({"cells": len(results), "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
