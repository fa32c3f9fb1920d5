"""Measured evidence for the closed crawl loop: does the apportionment
actually shift budget toward high-yield domains over cycles?

    python jobs/bench_crawl_cycle.py [--budgets 150,300,600] [--cycles 4]
        [--cpus 8]

VERDICT r4 item 6: jobs/run_crawl_cycle.py is tested but had no BENCH
artifact. This job runs >=3 cycles at each budget level (fresh
warehouse per level) and records, per cycle per domain, the realized
budget share (pages ingested, derived exactly from the cycle's pages
incremental scan) and the mention yield (new mentions per ingested
page, from the mentions incremental scan). The loop's claim is
exploitation with exploration: cycle 0 apportions uniformly (no yield
signal yet), later cycles weight domains by accumulated mention yield
(+1 exploration floor), so the share of each cycle's ingested pages
landing on the previous cycles' top-yield domains should RISE from the
uniform baseline. The summary records that share per cycle
(`top_yield_share`, vs `uniform_share` = what a uniform split would
give those domains) plus per-cycle totals; the per-domain tables for
the most active domains are appended to BENCH/EXPERIMENTS.md.

Derivations never touch run_crawl_cycle internals: ingested-per-domain
comes from the pages snapshots (batch-tagged appends), yield from the
mentions snapshots — the same lineage any operator would audit. One
Spark session; calm window; no concurrent Spark jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _per_domain(df, col="n"):
    # the scheduler's own domain extractor — the evidence must measure
    # the same domain partition the apportionment uses
    from jobs.run_crawl_cycle import _domain
    from pyspark.sql import functions as F

    return {
        r["domain"]: r[col]
        for r in df.withColumn("domain", _domain(F.col("url")))
        .groupBy("domain").agg(F.count(F.lit(1)).alias(col)).collect()
    }


def run_level(spark, budget: int, cycles: int, top_k: int) -> dict:
    from jobs.run_crawl_cycle import run_cycle
    from thesis_ner_co_tri_training_spark.sources import catalog

    wh = tempfile.mkdtemp(prefix=f"crawl_ev_{budget}_")
    per_cycle = []
    yields_before: dict[str, int] = {}
    for c in range(cycles):
        pages_prev = catalog.latest_snapshot(wh, "pages")
        mentions_prev = catalog.latest_snapshot(wh, "mentions")
        t0 = time.time()
        out = run_cycle(spark, wh, budget)
        dt = time.time() - t0

        pages_now = catalog.latest_snapshot(wh, "pages")
        if pages_prev is None:
            delta_pages = catalog.read_table(spark, wh, "pages")
        else:
            delta_pages = catalog.read_incremental(
                spark, wh, "pages",
                from_snapshot=pages_prev["snapshot_id"],
                to_snapshot=pages_now["snapshot_id"])
        ingested = _per_domain(delta_pages)

        mentions_now = catalog.latest_snapshot(wh, "mentions")
        if mentions_prev is None:
            delta_m = catalog.read_table(spark, wh, "mentions")
        else:
            delta_m = catalog.read_incremental(
                spark, wh, "mentions",
                from_snapshot=mentions_prev["snapshot_id"],
                to_snapshot=mentions_now["snapshot_id"])
        new_mentions = _per_domain(delta_m)

        total_in = sum(ingested.values())
        # the domains the scheduler SHOULD favor this cycle: top-k by
        # accumulated yield entering the cycle (empty on cycle 0)
        top_yield = sorted(yields_before, key=lambda d: (-yields_before[d], d))[:top_k]
        top_share = (sum(ingested.get(d, 0) for d in top_yield) / total_in
                     if total_in and top_yield else None)
        # what a uniform split over this cycle's ingested domains would
        # have given those same domains
        uniform_share = (len([d for d in top_yield if d in ingested])
                         / len(ingested) if ingested and top_yield else None)
        per_cycle.append({
            "cycle": c,
            "seconds": round(dt, 2),
            "crawled": out["crawled"],
            "near_dupes_dropped": out["near_dupes_dropped"],
            "ingested": out["ingested"],
            "domains_ingested": len(ingested),
            "new_mentions": sum(new_mentions.values()),
            "yield_per_page": round(
                sum(new_mentions.values()) / total_in, 3) if total_in else 0.0,
            "top_yield_domains": top_yield,
            "top_yield_share": None if top_share is None else round(top_share, 3),
            "uniform_share": None if uniform_share is None else round(uniform_share, 3),
            "per_domain": {
                d: {"ingested": ingested.get(d, 0),
                    "new_mentions": new_mentions.get(d, 0)}
                for d in sorted(ingested, key=lambda d: (-ingested[d], d))[:top_k]
            },
        })
        print(json.dumps({"budget": budget, **per_cycle[-1]}), flush=True)
        for d, m in new_mentions.items():
            yields_before[d] = yields_before.get(d, 0) + m
    return {"budget": budget, "warehouse": wh, "cycles": per_cycle}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="150,300,600")
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    from thesis_ner_co_tri_training_spark.session import get_spark

    spark = get_spark("bench_crawl_cycle", cpus=args.cpus)
    levels = [run_level(spark, int(b), args.cycles, args.top_k)
              for b in args.budgets.split(",")]
    summary = {
        "metric": "crawl_cycle_yield_evidence",
        "cycles": args.cycles,
        "top_k": args.top_k,
        "levels": [
            {
                "budget": lv["budget"],
                "top_yield_share_by_cycle": [
                    c["top_yield_share"] for c in lv["cycles"]],
                "uniform_share_by_cycle": [
                    c["uniform_share"] for c in lv["cycles"]],
                "yield_per_page_by_cycle": [
                    c["yield_per_page"] for c in lv["cycles"]],
                "ingested_by_cycle": [c["ingested"] for c in lv["cycles"]],
            }
            for lv in levels
        ],
    }
    print(json.dumps(summary), flush=True)

    if not args.no_record:
        md = os.path.join(REPO, "BENCH", "EXPERIMENTS.md")
        lines = ["", f"## Crawl-cycle yield evidence ({args.cycles} cycles "
                     f"per budget level, top-{args.top_k} prior-yield domains)",
                 "",
                 "`top share` = fraction of the cycle's ingested pages that "
                 "landed on the top prior-yield domains (the apportionment's "
                 "exploitation target); `uniform` = what a uniform split over "
                 "that cycle's domains would have given them. Cycle 0 has no "
                 "yield signal (uniform by design).",
                 ""]
        for lv in levels:
            lines += [f"### budget {lv['budget']}", "",
                      "| cycle | ingested | new mentions | yield/page | "
                      "top share | uniform |", "|---|---|---|---|---|---|"]
            for c in lv["cycles"]:
                lines.append(
                    f"| {c['cycle']} | {c['ingested']} | {c['new_mentions']} "
                    f"| {c['yield_per_page']} | {c['top_yield_share']} "
                    f"| {c['uniform_share']} |")
            lines.append("")
        lines += ["```json", json.dumps(summary), "```", ""]
        with open(md, "a") as fh:
            fh.write("\n".join(lines))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
