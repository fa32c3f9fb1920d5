"""spark-submit entry: closed-loop crawl cycles — budget -> dedup -> KG.

    python jobs/package.py
    spark-submit --py-files dist/engine.zip jobs/run_crawl_cycle.py \
        --warehouse /tmp/kg_cycle --cycles 3 --budget 300 --cpus 8

The north star's closed loop: each cycle allocates the crawl budget
over domains from what the graph has yielded so far, fetches the batch,
near-dup-gates it against the persisted MinHash index, and appends the
survivors to the incremental KG pipeline. One cycle:

  1. SCHEDULE — per-domain weights = mention yield so far + 1 (domains
     that produced mentions earn more budget; the +1 keeps zero-yield
     domains crawlable — exploration, not just exploitation; uniform on
     cycle 0), split EXACTLY with apportion_budget (largest-remainder,
     q71's operator).
  2. CRAWL — draw candidate pages from the deterministic synthetic
     frontier (ids continue from the high-water mark recorded in the
     pages snapshot params) and keep per-domain up to its allocation,
     smallest page id first.
  3. DEDUP GATE — match candidates against the persisted index with
     dedup_against_index (O(batch), q67's operator); drop near-dups.
  4. INGEST — run_pipeline_incremental(batch_tag="cycle-<start>")
     appends survivors through sentences -> tagging -> vote ->
     mentions/triples and recomputes the global entity/graph stages;
     the pages snapshot records the frontier high-water mark.
  5. INDEX MAINT — append the survivors' docs/bands/shingles to the
     index tables so the NEXT cycle sees this one as history.

Crash safety, in order of what can be lost:
  - before INGEST: nothing persisted; steps 1-3 are deterministic
    functions of the warehouse state, so the rerun recomputes the
    identical batch and tag.
  - mid-INGEST: the pipeline's own per-stage resume finishes the batch
    (every cycle first recovers an unfinished pages batch by tag).
  - after INGEST, before/mid INDEX MAINT: the index repair loop scans
    ALL cycle-tagged pages snapshots and re-derives any batch missing
    from the index tables via the pages incremental scan (per-table
    idempotent by tag) — the run_dedup.py repair shape, but re-derived
    from the warehouse instead of regenerated.
A rerun of a fully completed cycle set proceeds to the NEXT cycle
(frontier advanced); rerunning mid-crash never double-appends (tags).
Prints one JSON line per cycle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INDEX_KW = dict(n=3, num_hashes=32, bands=8, hasher="xxhash64")


def _index_kw(warehouse: str) -> dict:
    """Index params persisted with this warehouse's own index (newest
    snapshot carrying them, else the expiry ledger — the run_dedup
    `_latest_params` pattern). INDEX_KW only seeds a brand-new
    warehouse: hashing new batches with drifted defaults against an
    index built under the old params would silently stop banding
    collisions, so the persisted params always win."""
    from thesis_ner_co_tri_training_spark.sources import catalog

    for s in reversed(catalog.snapshots(warehouse, "dedup_docs")):
        if "hasher" in s.get("params", {}):
            return {k: s["params"][k] for k in INDEX_KW}
    for e in reversed(catalog.batch_ledger(warehouse, "dedup_docs")):
        if "hasher" in e.get("params", {}):
            return {k: e["params"][k] for k in INDEX_KW}
    return dict(INDEX_KW)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--budget", type=int, default=300,
                    help="pages fetched per cycle (before the dedup gate)")
    ap.add_argument("--frontier-factor", type=float, default=2.0,
                    help="candidate pages drawn per cycle = factor*budget")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from thesis_ner_co_tri_training_spark.session import get_spark

    spark = get_spark("kg_crawl_cycle", cpus=args.cpus)
    for _ in range(args.cycles):
        out = run_cycle(spark, args.warehouse, args.budget,
                        frontier_factor=args.frontier_factor,
                        threshold=args.threshold)
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


def _domain(col):
    from pyspark.sql import functions as F

    return F.regexp_extract(col, r"https?://([^/]+)/", 1)


def _pages_batches(warehouse):
    """ALL tagged pages batches, oldest first — BOTH families ('cycle-*'
    from this job and 'pages-*' from run_pipeline --append-pages; the
    two jobs may interleave on one warehouse, and a family-blind scan
    here made the frontier reset to 0 and re-append already-ingested
    pages). Live snapshots PLUS the expiry ledger, so table maintenance
    (compact + expire-keep on the pages table) never resets the
    frontier high-water mark or the already-appended set back to zero
    (ledger entries keep the full params, including frontier_end)."""
    from thesis_ner_co_tri_training_spark.sources import catalog

    by_id: dict[int, dict] = {}
    for s in (catalog.batch_ledger(warehouse, "pages")
              + catalog.snapshots(warehouse, "pages")):
        tag = str(s.get("params", {}).get("batch_tag", ""))
        if tag.startswith("cycle-") or tag.startswith("pages-"):
            by_id[s["snapshot_id"]] = s
    return [by_id[i] for i in sorted(by_id)]


def recover(spark, warehouse: str) -> dict:
    """Finish any half-done previous cycle: resume its pipeline batch,
    then repair the index tables from the warehouse (idempotent)."""
    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.dedup import (
        minhash_bands, token_shingles)
    from thesis_ner_co_tri_training_spark.plans.pipeline import (
        run_pipeline_incremental)
    from thesis_ner_co_tri_training_spark.sources import catalog

    done = {"resumed_pipeline": None, "repaired_index": []}
    batches = _pages_batches(warehouse)
    if not batches:
        return done
    last = batches[-1]
    # snapshots + ledger: an expire-keep on edges must not look like an
    # unfinished batch (re-resuming a finished one crashes append_stage)
    edges_done = {s.get("params", {}).get("pages_snapshot")
                  for s in catalog.snapshots(warehouse, "edges")}
    edges_done |= {e.get("params", {}).get("pages_snapshot")
                   for e in catalog.batch_ledger(warehouse, "edges")}
    if last["snapshot_id"] not in edges_done:
        tag = last["params"]["batch_tag"]
        run_pipeline_incremental(spark, None, warehouse, batch_tag=tag)
        done["resumed_pipeline"] = tag

    kw = _index_kw(warehouse)
    for snap in batches:
        tag = snap["params"]["batch_tag"]
        if tag in catalog.batch_tags(warehouse, "dedup_shingles") \
                and tag in catalog.batch_tags(warehouse, "dedup_index") \
                and tag in catalog.batch_tags(warehouse, "dedup_docs"):
            continue
        # An UNindexed batch whose pages snapshot was already expired
        # cannot be re-derived; read_table/read_incremental then raise
        # loudly (normal operation indexes each batch within its own
        # cycle, so only a crash-before-step-5 + maintenance-before-
        # rerun sequence can reach that state).
        parent = snap.get("parent_snapshot_id")
        if parent is None:
            delta = catalog.read_table(spark, warehouse, "pages",
                                       snapshot_id=snap["snapshot_id"])
        else:
            delta = catalog.read_incremental(
                spark, warehouse, "pages", from_snapshot=parent,
                to_snapshot=snap["snapshot_id"])
        docs = delta.select("url", "text").localCheckpoint(eager=True)
        params = {**kw, "batch_tag": tag}
        for table, build in (
            ("dedup_docs", lambda: docs),
            ("dedup_index",
             lambda: minhash_bands(docs, id_col="url", **kw)),
            ("dedup_shingles",
             lambda: token_shingles(docs, id_col="url", n=kw["n"])),
        ):
            if tag not in catalog.batch_tags(warehouse, table):
                catalog.write_table(
                    build(), warehouse, table, stage_params=params,
                    mode="append"
                    if catalog.latest_snapshot(warehouse, table) is not None
                    else "overwrite")
                done["repaired_index"].append(f"{table}:{tag}")
    return done


def run_cycle(spark, warehouse: str, budget: int,
              frontier_factor: float = 2.0,
              threshold: float = 0.8) -> dict:
    """One closed-loop cycle; see module docstring."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.operators.dedup import (
        dedup_against_index)
    from thesis_ner_co_tri_training_spark.operators.selection import (
        apportion_budget)
    from thesis_ner_co_tri_training_spark.plans.pipeline import (
        run_pipeline_incremental)
    from thesis_ner_co_tri_training_spark.sources import catalog
    from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

    t0 = time.time()
    recovered = recover(spark, warehouse)

    from thesis_ner_co_tri_training_spark.plans.pipeline import (
        pages_frontier)

    # shared generation frontier across BOTH batch families (cycle-*
    # frontier_end and pages-* tag ends): never regenerate ids that a
    # previous cycle OR a run_pipeline --append-pages batch already drew
    frontier_start = pages_frontier(warehouse)
    tag = f"cycle-{frontier_start}"

    # 1. SCHEDULE
    have_mentions = catalog.latest_snapshot(warehouse, "mentions") is not None
    n_frontier = int(budget * frontier_factor)
    frontier = (gen_pages_df(spark, n_frontier, start=frontier_start)
                .withColumn("domain", _domain(F.col("url"))))
    if have_mentions:
        yields = (
            catalog.read_table(spark, warehouse, "mentions")
            .withColumn("domain", _domain(F.col("url")))
            .groupBy("domain").agg(F.count(F.lit(1)).alias("yield"))
        )
        weights = (
            frontier.select("domain").distinct()
            .join(yields, "domain", "left")
            .select("domain",
                    (F.coalesce(F.col("yield"), F.lit(0)) + F.lit(1))
                    .alias("weight"))
        )
    else:
        weights = (frontier.select("domain").distinct()
                   .withColumn("weight", F.lit(1)))
    alloc = apportion_budget(weights, budget, key_col="domain",
                             weight_col="weight")

    # 2. CRAWL — deterministic per-domain take (id order); a domain's
    # allocation can exceed its frontier supply, so crawled <= budget
    ranked = frontier.withColumn(
        "__rk", F.row_number().over(
            W.partitionBy("domain").orderBy(
                F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))))
    batch = (ranked.join(F.broadcast(alloc), "domain")
             .filter(F.col("__rk") <= F.col("alloc"))
             .drop("__rk", "alloc"))
    n_crawled = batch.count()

    # 3. DEDUP GATE
    n_dupes = 0
    if catalog.latest_snapshot(warehouse, "dedup_index") is not None:
        matches = dedup_against_index(
            batch.select("url", "text"),
            catalog.read_table(spark, warehouse, "dedup_index"),
            catalog.read_table(spark, warehouse, "dedup_docs"),
            id_col="url", threshold=threshold,
            **_index_kw(warehouse)).localCheckpoint(eager=True)
        n_dupes = matches.select("a").distinct().count()
        batch = batch.join(
            matches.select(F.col("a").alias("url")).distinct(),
            "url", "left_anti")
    survivors = batch.drop("domain").localCheckpoint(eager=True)
    n_survivors = survivors.count()

    # 4. INGEST (exactly-once; pages snapshot carries the frontier hwm)
    lineage = run_pipeline_incremental(
        spark, survivors, warehouse, batch_tag=tag,
        pages_params={"frontier_end": frontier_start + n_frontier})

    # 5. INDEX MAINT — same repair loop; this cycle's tag is now a
    # pages batch, so the loop appends its docs/bands/shingles
    indexed = recover(spark, warehouse)

    top = {r["domain"]: r["alloc"]
           for r in alloc.orderBy(F.col("alloc").desc(), "domain")
           .limit(5).collect()}
    return {
        "cycle_tag": tag,
        "frontier": [frontier_start, frontier_start + n_frontier],
        "budget": budget,
        "crawled": n_crawled,
        "near_dupes_dropped": n_dupes,
        "ingested": n_survivors,
        "top_allocations": top,
        "recovered": recovered,
        "indexed": indexed["repaired_index"],
        "pages_total": lineage["pages"]["row_count"],
        "mentions_total": catalog.latest_snapshot(
            warehouse, "mentions")["row_count"],
        "triples_total": catalog.latest_snapshot(
            warehouse, "triples")["row_count"],
        "resumed": lineage["pages"].get("resumed", False),
        "seconds": round(time.time() - t0, 2),
    }


if __name__ == "__main__":
    sys.exit(main())
