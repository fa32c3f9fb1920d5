"""spark-submit entry: Iceberg-style table maintenance on the warehouse.

Usage (on any table the pipeline/stream wrote):

    spark-submit --py-files dist/engine.zip jobs/table_maint.py \
        --warehouse /tmp/kg_wh --table mentions \
        [--compact --target-files 4] [--expire-keep 1] [--cpus 8]

Two maintenance actions, independently switchable, in that order:

- --compact: rewrite the table's current file set into --target-files
  files as a NEW snapshot (rewrite_data_files). Row parity is asserted
  before the snapshot publishes; older snapshots stay time-travelable.
- --expire-keep K: drop all but the newest K snapshots and delete snap
  dirs no retained snapshot references (expire_snapshots + orphan GC).

Prints one JSON line: per-action before/after file + snapshot counts.
This is the small-files job a streaming/append warehouse needs on a
schedule: appends and micro-batches accumulate small parquet files;
compaction rewrites them at full cluster parallelism so every later
scan pays fewer file opens, and expiry bounds storage growth.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--target-files", type=int, default=4)
    ap.add_argument("--expire-keep", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if args.expire_keep is not None and args.expire_keep < 1:
        # fail BEFORE any mutation: --compact would otherwise publish a
        # snapshot and then expire_snapshots' ValueError would abort the
        # run half-applied with a raw traceback instead of the job's
        # one-JSON-line contract
        ap.error("--expire-keep must be >= 1")

    from thesis_ner_co_tri_training_spark.session import get_spark
    from thesis_ner_co_tri_training_spark.sources import catalog

    spark = get_spark("kg_table_maint", cpus=args.cpus,
                      shuffle_partitions=args.shuffle_partitions)
    before = catalog.latest_snapshot(args.warehouse, args.table)
    if before is None:
        print(json.dumps({"error": f"no snapshots for {args.table}"}))
        return 1
    out = {
        "table": args.table,
        "before": {"snapshot_id": before["snapshot_id"],
                   "row_count": before["row_count"],
                   "data_files": before.get("total_data_files"),
                   "data_paths": len(before.get("data_paths", []))},
    }
    if args.compact:
        snap = catalog.compact_table(spark, args.warehouse, args.table,
                                     target_files=args.target_files)
        out["compact"] = {"snapshot_id": snap["snapshot_id"],
                          "row_count": snap["row_count"],
                          "data_files": snap["total_data_files"]}
    if args.expire_keep is not None:
        res = catalog.expire_snapshots(args.warehouse, args.table,
                                       keep_last=args.expire_keep)
        out["expire"] = {"expired": res["expired_snapshots"],
                         "kept": res["kept_snapshots"],
                         "removed_dirs": res["removed_dirs"]}
    after = catalog.latest_snapshot(args.warehouse, args.table)
    out["after"] = {"snapshot_id": after["snapshot_id"],
                    "row_count": after["row_count"],
                    "data_files": after.get("total_data_files"),
                    "data_paths": len(after.get("data_paths", []))}
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
