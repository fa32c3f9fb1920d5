"""The staged, checkpointed, resumable KG-construction DAG.

Formalizes what the reference does with size-prefixed pickles + config
JSON between steps (co_training.py:143-167, tri_train.py:220-247,
run_ner.py:322-324 — its de-facto checkpoint/restart mechanism):

  stage         table        op
  ------------  -----------  --------------------------------------------
  sentences     sentences    extract_text (byte-identical UDF) + split
  mentions_raw  sent_views   tri-view tagging (one Arrow pass)
  voted         voted        C1/C2 agreement vote
  mentions      mentions     BIO span extraction
  triples       triples      cue-pattern relation extraction
  entities      entities     LSH blocking + Jaccard verify + hash-min CC
  graph         nodes/edges  canonicalized graph materialization

Each stage writes an Iceberg-style table with a snapshot/lineage record
(params, row count, per-partition metrics). A rerun skips stages whose
table is complete (`_SUCCESS` + snapshot) — kill the job at any stage and
rerun to resume. Skew handling: mention/triple writes are salted-
repartitioned on the Zipf-skewed domain key before the shuffle-heavy
stages (north rule requirement); the salt factor is recorded in lineage.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linking import canonicalize_entities, surface_to_entity
from ..operators.mentions import mentions_table, vote_mentions
from ..operators.tagging import explode_sentences, tag_sentences_df
from ..operators.triples import extract_triples
from ..sources import catalog


def salted_repartition(df: DataFrame, key: str, n: int, salt: int = 8,
                       seed: int = 42,
                       salt_cols: list[str] | None = None) -> DataFrame:
    """Explicit skew-spreading repartition on a power-law key.

    Appends a deterministic per-row salt in [0, salt) so one hot domain
    (or entity) spreads across `salt` reducers instead of one. The salt
    hashes row CONTENT (salt_cols, default: all columns), never
    monotonically_increasing_id — that id changes when a task is retried
    or speculated, which would re-salt rows nondeterministically and break
    the resume/lineage reproducibility contract.
    """
    cols = salt_cols if salt_cols is not None else df.columns
    row_hash = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    # pmod: abs(Long.MIN_VALUE) overflows (ANSI throws) on the one-in-2^64
    # row whose hash is the minimum long
    return df.repartition(n, F.col(key), F.pmod(row_hash, F.lit(salt)))


DEFAULT_PARAMS: dict[str, Any] = {
    "cos_threshold": 0.7,
    "tcfd_threshold": 0.7,
    "scfd_threshold": 0.6,
    "jaccard_threshold": 0.6,
    "minhash_hashes": 16,
    "lsh_bands": 4,
    "lsh_rows_per_band": 4,
    "salt": 8,
}


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    params: dict[str, Any] | None = None,
    resume: bool = True,
    shuffle_partitions: int | None = None,
) -> dict[str, Any]:
    """Run (or resume) the full DAG. Returns {stage: snapshot} lineage."""
    p = {**DEFAULT_PARAMS, **(params or {})}
    n_shuffle = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    lineage: dict[str, Any] = {}

    def stage(name: str, build, partition_by=None, stage_params=None):
        if resume and catalog.table_complete(warehouse, name):
            lineage[name] = catalog.latest_snapshot(warehouse, name)
            lineage[name]["resumed"] = True
            return catalog.read_table(spark, warehouse, name)
        df = build()
        lineage[name] = catalog.write_table(
            df, warehouse, name, partition_by=partition_by,
            stage_params={**p, **(stage_params or {})},
        )
        return catalog.read_table(spark, warehouse, name)

    with_domain = lambda df: df.withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )

    sentences = stage(
        "sentences",
        lambda: explode_sentences(pages.select("url", "html")),
    )
    sent_views = stage(
        "sent_views",
        lambda: tag_sentences_df(sentences, flat=True),
    )
    voted = stage(
        "voted",
        lambda: vote_mentions(
            sent_views, p["cos_threshold"], p["tcfd_threshold"], p["scfd_threshold"]
        ),
    )
    mentions = stage(
        "mentions",
        lambda: salted_repartition(
            with_domain(mentions_table(voted)), "domain", n_shuffle, p["salt"],
            salt_cols=["url", "sent_id"],
        ).drop("domain"),
    )
    triples = stage(
        "triples",
        lambda: extract_triples(voted),
    )
    entities = stage(
        "entities",
        lambda: canonicalize_entities(
            mentions,
            num_hashes=p["minhash_hashes"],
            bands=p["lsh_bands"],
            rows_per_band=p["lsh_rows_per_band"],
            jaccard_threshold=p["jaccard_threshold"],
        ),
    )

    def build_nodes():
        # entity_type = majority tag over the entity's mentions (ties
        # break lexicographically) — mention tables are long-form, so
        # this is one keyed count + one row_number over the tiny
        # (entity, tag) table.
        from pyspark.sql import Window

        s2e = surface_to_entity(
            mentions.select("surface").distinct(), entities
        ).select("surface", "entity_id")
        tag_counts = (
            mentions.join(F.broadcast(s2e), "surface")
            .groupBy("entity_id", "tag")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("entity_id").orderBy(F.col("c").desc(), "tag")
        etype = (
            tag_counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("entity_id", F.col("tag").alias("entity_type"))
        )
        return entities.join(etype, "entity_id", "left").select(
            "entity_id", "canonical", "entity_type", "n_mentions"
        )

    def build_edges():
        subj_map = surface_to_entity(
            triples.select(F.col("subj").alias("surface")), entities
        ).select(
            F.col("surface").alias("subj"),
            F.col("entity_id").alias("subj_id"),
            F.col("canonical").alias("subj_canonical"),
        ).distinct()
        obj_map = surface_to_entity(
            triples.select(F.col("obj").alias("surface")), entities
        ).select(
            F.col("surface").alias("obj"),
            F.col("entity_id").alias("obj_id"),
            F.col("canonical").alias("obj_canonical"),
        ).distinct()
        return (
            triples.join(F.broadcast(subj_map), "subj", "left")
            .join(F.broadcast(obj_map), "obj", "left")
            .select(
                "subj_id", "subj_canonical", "pred", "obj_id", "obj_canonical",
                "url", "sent_id", "confidence",
            )
        )

    stage("nodes", build_nodes)
    stage("edges", build_edges, partition_by=["pred"])
    return lineage
