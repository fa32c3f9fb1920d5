"""Iceberg-style table catalog shim + per-stage lineage records.

The sandbox has no iceberg-spark-runtime jars, so tables are written as
partitioned Parquet in an Iceberg-compatible layout:

    <warehouse>/<table>/data/...(partition dirs)/part-*.parquet
    <warehouse>/<table>/metadata/snapshot-<n>.json

If `spark.sql.catalog.*` ever points at a real Iceberg catalog, switch
`write_table` to `df.writeTo(name).using('iceberg')` — the call sites
don't change. Snapshot JSON carries the north rule's lineage requirement:
stage name, params, row count, AND per-partition row counts/metrics
(computed with spark_partition_id(), one aggregate pass — no collect of
data rows).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _metadata_dir(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, table, "metadata")


def _data_dir(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, table, "data")


def partition_metrics(df: DataFrame) -> list[dict[str, Any]]:
    """Per-partition row counts via one distributed aggregate."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [{"partition": r["pid"], "rows": r["count"]} for r in rows]


def write_table(
    df: DataFrame,
    warehouse: str,
    table: str,
    partition_by: list[str] | None = None,
    stage_params: dict[str, Any] | None = None,
    mode: str = "overwrite",
) -> dict[str, Any]:
    """Write Parquet in Iceberg-ish layout + snapshot/lineage JSON.

    Returns the snapshot record. The `_SUCCESS` marker written by Spark
    inside data/ is the resume gate used by plans.pipeline.
    """
    data_dir = _data_dir(warehouse, table)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    t0 = time.time()
    writer.parquet(data_dir)
    elapsed = time.time() - t0

    back = df.sparkSession.read.parquet(data_dir)
    parts = partition_metrics(back)  # one aggregate; row_count = its sum
    snapshot = {
        "table": table,
        "schema": back.schema.jsonValue(),
        "partition_by": partition_by or [],
        "row_count": sum(p["rows"] for p in parts),
        "partitions": parts,
        "write_seconds": round(elapsed, 3),
        "params": stage_params or {},
        "snapshot_ts": int(time.time() * 1000),
    }
    meta = _metadata_dir(warehouse, table)
    os.makedirs(meta, exist_ok=True)
    existing = [f for f in os.listdir(meta) if f.startswith("snapshot-")]
    snap_id = len(existing)
    snapshot["snapshot_id"] = snap_id
    with open(os.path.join(meta, f"snapshot-{snap_id}.json"), "w") as fh:
        json.dump(snapshot, fh, indent=2, default=str)
    return snapshot


def read_table(spark: SparkSession, warehouse: str, table: str) -> DataFrame:
    return spark.read.parquet(_data_dir(warehouse, table))


def table_complete(warehouse: str, table: str) -> bool:
    """Resume gate: data written (_SUCCESS) and snapshot recorded."""
    data_dir = _data_dir(warehouse, table)
    meta = _metadata_dir(warehouse, table)
    return (
        os.path.exists(os.path.join(data_dir, "_SUCCESS"))
        and os.path.isdir(meta)
        and any(f.startswith("snapshot-") for f in os.listdir(meta))
    )


def latest_snapshot(warehouse: str, table: str) -> dict[str, Any] | None:
    meta = _metadata_dir(warehouse, table)
    if not os.path.isdir(meta):
        return None
    snaps = sorted(f for f in os.listdir(meta) if f.startswith("snapshot-"))
    if not snaps:
        return None
    with open(os.path.join(meta, snaps[-1])) as fh:
        return json.load(fh)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    buckets: int = 16,
    sort_by: str | None = None,
    stage_params: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Bucketed table write (`bucketBy` + `saveAsTable`) for co-located
    joins: two tables bucketed by the same key into the same bucket
    count join WITHOUT any Exchange — each task zips bucket i with
    bucket i (plus at most a sort, elided too when both sides are
    sortBy'd). That is the hash-partitioned-storage contract Iceberg's
    bucket partition transform provides on a real cluster; Spark's
    session catalog provides it locally, with spark.sql.warehouse.dir
    deciding placement. The join-side proof is
    test_pipeline_resume.test_bucketed_join_has_no_exchange.

    Use for the big fact tables that meet repeatedly on one key across
    a pipeline (edges/mentions on entity or doc id): the shuffle is
    paid ONCE at write, every downstream same-key join/agg reads it
    back pre-partitioned.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    t0 = time.time()
    writer.saveAsTable(table)
    elapsed = time.time() - t0
    back = df.sparkSession.table(table)
    return {
        "table": table,
        "bucket_by": bucket_by,
        "buckets": buckets,
        "sort_by": sort_by,
        "row_count": back.count(),
        "write_seconds": round(elapsed, 3),
        "params": stage_params or {},
    }
