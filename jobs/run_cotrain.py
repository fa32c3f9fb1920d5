"""spark-submit entry: one co-training selection round (run_cotrain.py mirror).

    python jobs/package.py
    spark-submit --py-files dist/engine.zip jobs/run_cotrain.py \
        --pages 500 [--u 75] [--k 30] [--top-n 5] [--cos-threshold 0.7] \
        [--out /tmp/cotrain_ext]

Defaults mirror the reference's run_cotrain.py:50-61: shuffle the
unlabeled pool (seeded), carve k pools of u sentences, score both views'
predictions (avg confidence ignoring O), keep each pool's top_n per view,
and admit pairs whose tag-bag cosine clears the threshold. Views A/B are
the engine's deterministic taggers 1/2 over the same sentences (axes-A
replacement for model A/MT-view B). Prints one JSON line; --out also
writes the extension set as parquet.
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
    ap.add_argument("--u", type=int, default=75)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--top-n", type=int, default=5)
    ap.add_argument("--cos-threshold", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.tagging import (
        explode_sentences, tag_sentences_df)
    from thesis_ner_co_tri_training_spark.plans.cotrain import cotrain_select
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    spark = get_spark("cotrain", cpus=args.cpus)
    pages = gen_pages_df(spark, args.pages)
    t0 = time.time()
    sents = explode_sentences(pages.drop("text"))
    # globally unique sentence key for the pool shuffle
    sents = sents.withColumn(
        "sent_id", F.xxhash64("url", F.col("sent_id").cast("string")))
    tagged = tag_sentences_df(sents).localCheckpoint(eager=True)
    mk = lambda v: tagged.select("sent_id", F.col(f"v{v}_preds").alias("preds"))
    unlabeled = sents.select("sent_id", "text")
    ext = cotrain_select(
        unlabeled, mk(1), mk(2), u=args.u, k=args.k, top_n=args.top_n,
        cos_threshold=args.cos_threshold, seed=args.seed,
    )
    if args.out:
        ext.write.mode("overwrite").parquet(args.out)
        n_ext = spark.read.parquet(args.out).count()
    else:
        n_ext = ext.count()
    # stop the clock BEFORE the bookkeeping recount: unlabeled has no
    # cache, so .count() re-runs the whole explode lineage and would
    # otherwise inflate the reported round time
    elapsed = round(time.time() - t0, 2)
    print(json.dumps({
        "pages": args.pages,
        "sentences": unlabeled.count(),
        "pools": args.k, "u": args.u, "top_n": args.top_n,
        "cos_threshold": args.cos_threshold,
        "extension_rows": n_ext,
        "seconds": elapsed,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
