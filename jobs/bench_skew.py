"""Skew stress at bench scale: reducer balance with/without the salt.

    python jobs/bench_skew.py [--pages 20000] [--salt 8] [--cpus 32]

tests/test_skew.py pins correctness of salted_repartition; this records
the SCALE evidence the r3 verdict asked for (item 7): on the synthetic
corpus's power-law domains (Pareto alpha=1.1 — the hottest domain holds
~half the pages, pages.py:68-70), partition a mentions-shaped table by
domain with and without the content-hash salt and record

  - reducer balance: max/median and max/mean partition row counts
    (row balance is the straggler bound for a write stage whose per-row
    cost is uniform), and
  - the wall time of the partitioned parquet write (the actual
    mentions/triples stage operation).

Prints one JSON line. Expected shape: plain repartition(n, domain) puts
the hot domain's entire row mass in ONE task (max/median >= 10x at 32
cores); the salt bounds it near `salt` buckets of the hot domain, i.e.
max/median drops by roughly the salt factor, and the write's wall time
follows the straggler.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle partition count (default: cpus)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.plans.pipeline import (
        salted_repartition)
    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    spark = get_spark("bench_skew", cpus=args.cpus)
    n_part = args.partitions or int(
        spark.sparkContext.defaultParallelism)

    # mentions-shaped rows: one row per sentence with the domain key
    # (cheap to generate at 20k pages; the skew is in the KEY, which is
    # what the repartition sees — per-row payload size is uniform)
    pages = gen_pages_df(spark, args.pages).select(
        "url",
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain"),
        F.substring("text", 1, 200).alias("payload"),
    ).localCheckpoint(eager=True)
    total = pages.count()
    hot = (pages.groupBy("domain").count().orderBy(F.col("count").desc())
           .first())

    def measure(df, label):
        parts = [r["count"] for r in
                 df.groupBy(F.spark_partition_id().alias("pid")).count()
                 .collect()]
        med = statistics.median(parts) if parts else 0
        mean = total / max(len(parts), 1)
        out_dir = tempfile.mkdtemp(prefix=f"skew_{label}_")
        shutil.rmtree(out_dir)
        t0 = time.time()
        df.write.parquet(out_dir)
        sec = round(time.time() - t0, 3)
        shutil.rmtree(out_dir)
        return {
            "tasks": len(parts),
            "rows_max_partition": max(parts),
            "rows_median_partition": int(med),
            "max_over_median": round(max(parts) / max(med, 1), 2),
            "max_over_mean": round(max(parts) / max(mean, 1), 2),
            "write_sec": sec,
        }

    plain = measure(pages.repartition(n_part, F.col("domain")), "plain")
    salted = measure(
        salted_repartition(pages, "domain", n_part, args.salt,
                           salt_cols=["url"]),
        "salted")

    print(json.dumps({
        "metric": "skew_reducer_balance",
        "pages": args.pages,
        "rows": total,
        "partitions": n_part,
        "salt": args.salt,
        "hot_domain": hot["domain"],
        "hot_domain_share": round(hot["count"] / total, 3),
        "loadavg": round(os.getloadavg()[0], 2),
        "plain": plain,
        "salted": salted,
        "straggler_reduction": round(
            plain["max_over_median"] / max(salted["max_over_median"], 0.01),
            2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
