"""I1 — the complete co-training selection flow as ONE Spark job.

Reference lifecycle (SURVEY §3.1, co_training.py:67-292):

  prep_unlabeled_set  S1   seeded shuffle of the unlabeled corpus (once,
                           shared by both views — co_training.py:52-65)
  k-iteration loop    I1   disjoint pools of u sentences (W2)
  per-view            A1   avg confidence ignoring O
                      W1   top-n per pool, ties broken by shuffle order
  get_agree_preds     J1   id-join of the two views' selections
                      P2   ignore-O bags
                      F5   OntoNotes->ISW rename of the B side
                      F6   bag-of-tags cosine
                      C4   cosine > threshold gate

Because pools are disjoint and selection is independent per pool, the
reference's sequential k-loop flattens into one data-parallel DAG: a
seeded distributed shuffle-with-position, a pool-id projection, one
window per view, one join. No driver loop, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.simfn import avg_cfd
from ..operators.selection import (
    agreement_join, assign_pools, shuffled_with_position, top_n_per_pool)


def cotrain_select(
    unlabeled: DataFrame,
    view_a_preds: DataFrame,
    view_b_preds: DataFrame,
    u: int = 75,
    k: int = 30,
    top_n: int = 5,
    cos_threshold: float = 0.7,
    seed: int = 42,
    rename_b: bool = True,
) -> DataFrame:
    """unlabeled(sent_id, text) + per-view preds(sent_id, preds) -> ext set.

    Defaults are the reference's (run_cotrain.py:50-61). Output: one row
    per agreeing pair: sent_id, text, pool_id, tags/avg_cfd (view A),
    tags_b/avg_cfd_b (view B), cos_score.
    """
    base = assign_pools(
        shuffled_with_position(unlabeled, seed=seed), u=u, k=k
    )

    def side(preds: DataFrame) -> DataFrame:
        d = base.join(preds, "sent_id")
        d = d.withColumn("avg_cfd", avg_cfd("preds"))
        d = top_n_per_pool(d, top_n)
        return d.withColumn(
            "tags", F.transform("preds", lambda p: p["tag"])
        ).select("sent_id", "text", "pool_id", "pos", "tags", "avg_cfd")

    a = side(view_a_preds)
    b = side(view_b_preds).select("sent_id", "tags", "avg_cfd")
    ext = agreement_join(a, b, cos_threshold, rename_b=rename_b)
    return ext.select(
        "sent_id", "text", "pool_id", "tags", "avg_cfd",
        "tags_b", "avg_cfd_b", "cos_score",
    )
