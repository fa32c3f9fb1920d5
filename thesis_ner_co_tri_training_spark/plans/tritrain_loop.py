"""I2 — the adaptive-threshold tri-training driver loop, checkpointed.

Reference: `TriTraining.fit` (tri_train.py:141-290): while tcfd >= scfd,
take the next pool of `u` sentences, select teachable samples with the
CURRENT thresholds, persist the extension set, then adapt
`tcfd -= r_t; scfd += r_s` (tri_train.py:287-288). The reference's
size-prefixed pickles per iteration (tri_train.py:220-226) become
catalog stages `tri_it<N>` with the thresholds in the lineage record, so
a killed run resumes mid-loop: completed iterations are read back, the
threshold schedule is a pure function of the iteration index, and the
loop continues from the first missing stage.

Unlike the co-training flattening (pools independent -> one job), this
loop is GENUINELY sequential in its *thresholds* — iteration i's gate
depends on i — so the driver loop is real; but each iteration's selection
over its pool is one narrow Spark stage, and the reference's per-student
retraining subprocess (tri_train.py:275-280) is out of scope for the
model-free engine (views are deterministic; SURVEY §7).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mentions import vote_mentions
from ..operators.selection import assign_pools, shuffled_with_position
from ..sources import catalog


def tritrain_fit(
    spark: SparkSession,
    sent_views: DataFrame,
    warehouse: str,
    u: int = 500,
    cos_threshold: float = 0.9,
    tcfd: float = 0.7,
    scfd: float = 0.6,  # reference defaults (run_tritrain.py:27-62)
    r_t: float = 0.1,
    r_s: float = 0.1,
    max_iter: int = 50,
    seed: int = 42,
    resume: bool = True,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Run (or resume) the loop. Returns (ext_union_df, per-iter lineage).

    sent_views: output of tagging (url, sent_id, tokens, v*_preds, ...).
    Pool i = rows [i*u, (i+1)*u) of the seeded shuffle — the data-parallel
    form of the reference's consume-from-the-back chunking
    (co_training.py:84-89 / tri_train.py:155-157).
    """
    pooled = assign_pools(
        shuffled_with_position(sent_views, seed=seed, id_col="sent_id"), u=u
    ).cache()
    n_pools = pooled.agg(F.max("pool_id")).collect()[0][0]
    n_pools = 0 if n_pools is None else int(n_pools) + 1

    lineage: list[dict[str, Any]] = []
    ext_parts: list[DataFrame] = []
    it, cur_t, cur_s = 0, tcfd, scfd
    while cur_t >= cur_s and it < max_iter and it < n_pools:
        stage = f"tri_it{it:03d}"
        params = {"iteration": it, "tcfd": round(cur_t, 4),
                  "scfd": round(cur_s, 4), "cos_threshold": cos_threshold,
                  "u": u, "seed": seed}
        if resume and catalog.table_complete(warehouse, stage):
            snap = catalog.latest_snapshot(warehouse, stage)
            # A completed table only resumes if it was produced under
            # THESE loop arguments: silently reusing iterations selected
            # under a different threshold schedule / pool size / seed
            # would hand back a mixed-schedule extension set labeled as
            # the current run's. Same-keys comparison (both dicts are
            # built by this function, so key drift = code change).
            stored = {k: snap.get("params", {}).get(k) for k in params}
            if stored != params:
                raise ValueError(
                    f"tritrain_fit: warehouse {warehouse!r} stage {stage} "
                    f"was written with params {stored}, current run wants "
                    f"{params} — use a fresh warehouse or resume=False")
            snap["resumed"] = True
        else:
            pool = pooled.filter(F.col("pool_id") == it).drop("pool_id", "pos")
            picked = vote_mentions(
                pool, cos_threshold=cos_threshold,
                tcfd_threshold=cur_t, scfd_threshold=cur_s,
            ).withColumn("iteration", F.lit(it))
            snap = catalog.write_table(
                picked, warehouse, stage, stage_params=params
            )
        lineage.append(snap)
        ext_parts.append(catalog.read_table(spark, warehouse, stage))
        cur_t = round(cur_t - r_t, 10)
        cur_s = round(cur_s + r_s, 10)
        it += 1
    pooled.unpersist()

    if not ext_parts:
        empty = vote_mentions(sent_views).limit(0).withColumn(
            "iteration", F.lit(0)
        )
        return empty, lineage
    out = ext_parts[0]
    for p in ext_parts[1:]:
        out = out.unionByName(p)
    return out, lineage
