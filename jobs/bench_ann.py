"""Measured ANN quality/cost table: recall@10 and wall-time vs probes.

    python jobs/bench_ann.py [--sf-dir /root/testdata/sf0.1] [--queries 50]

Ground truth is brute-force cosine_topk over the embeddings table; the
approximate path is hyperplane-LSH lsh_topk at fixed bits, sweeping the
multi-probe count (0 = single bucket). Prints one JSON line per probes
value plus a summary — the r3 verdict item 9 artifact promoted into
BENCH/BASELINE.md: tests pin that recall is monotone in probes; this
records HOW MUCH recall each probe buys and at what wall-time cost.

Protocol: per variant, ONE plan is built and executed three times —
the first execution is reported as `compile_sec` (Catalyst + whole-stage
codegen of the bits*dim signature expression dominates at this scale;
paid once per job shape on a real cluster), the median of the next two
as `sec` (steady-state execution, the number that scales with data).
recall@10 = |approx ∩ exact| / (10 * n_queries) over rank<=10 pairs.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--bits", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.simsearch import (
        cosine_topk, hyperplane_signature, lsh_topk, probe_buckets)
    from thesis_ner_co_tri_training_spark.session import get_spark

    spark = get_spark("bench_ann", cpus=args.cpus)
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").cache()
    n_cand = emb.count()
    dim = len(emb.select("embedding").first()[0])
    queries = (emb.orderBy("vec_id").limit(args.queries)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .cache())
    queries.count()

    def pairs(df):
        return {(r["query_id"], r["vec_id"])
                for r in df.select("query_id", "vec_id").collect()}

    exact = cosine_topk(emb, queries, k=args.k)
    truth = pairs(exact)

    def timed(df):
        t0 = time.time()
        df.count()
        compile_sec = round(time.time() - t0, 3)
        ts = []
        for _ in range(2):
            t0 = time.time()
            df.count()
            ts.append(time.time() - t0)
        return compile_sec, round(statistics.median(ts), 3)

    def pairs_scored(probes):
        """Candidate pairs entering the cosine scorer — the pruning
        factor that decides the at-scale win (brute scores every
        candidate for every query; LSH only bucket collisions)."""
        cb = hyperplane_signature(emb, dim, args.bits)
        qb = hyperplane_signature(queries, dim, args.bits,
                                  with_margins=probes > 0)
        if probes > 0:
            qb = probe_buckets(qb, probes, args.bits)
        qb = qb.withColumnRenamed("bucket", "qbucket")
        return (cb.select("vec_id", "bucket")
                .join(F.broadcast(qb.select("query_id", "qbucket")),
                      F.col("bucket") == F.col("qbucket"))
                .dropDuplicates(["query_id", "vec_id"]).count())

    b_compile, b_sec = timed(cosine_topk(emb, queries, k=args.k))
    rows = [{"method": "brute", "probes": None, "recall_at_k": 1.0,
             "compile_sec": b_compile, "sec": b_sec,
             "pairs_scored": n_cand * args.queries,
             "speedup_vs_brute": 1.0}]
    for probes in (0, 1, 2, 4):
        approx = lsh_topk(emb, queries, dim=dim, k=args.k, bits=args.bits,
                          probes=probes)
        got = pairs(approx)
        recall = round(len(got & truth) / len(truth), 4)
        compile_sec, sec = timed(
            lsh_topk(emb, queries, dim=dim, k=args.k, bits=args.bits,
                     probes=probes))
        rows.append({"method": "lsh", "probes": probes,
                     "recall_at_k": recall,
                     "compile_sec": compile_sec, "sec": sec,
                     "pairs_scored": pairs_scored(probes),
                     "speedup_vs_brute": round(b_sec / sec, 2)})

    print(json.dumps({
        "metric": "ann_recall_vs_probes",
        "sf_dir": args.sf_dir,
        "n_candidates": n_cand,
        "n_queries": args.queries,
        "k": args.k,
        "bits": args.bits,
        "dim": dim,
        "loadavg": round(os.getloadavg()[0], 2),
        "rows": rows,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
