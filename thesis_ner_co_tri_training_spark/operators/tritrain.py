"""Tri-training role initialization: pairwise error rates + role pick.

Reference: `assign_teacher_student_by_e` (tri_train.py:62-139).

  A3  pairwise error rate over the first `limit` validation sentences,
      all tag lists ignore-O projected (tri_train.py:73, 91-93):
        agree_ij = cos(l_i, l_j) >= cos_threshold          (>=, not >)
        wrong_m  = cos(l_m, gold) < cos_threshold
        e_ij     = round(|agree_ij AND wrong_i AND wrong_j| / |agree_ij|, 4)
      (tri_train.py:98-112; zero agreement denominator is a
      ZeroDivisionError in the reference — we define it as 0.0 and
      record the count so callers can see the degenerate case.)

  C3  teachers = argmin over (e_12, e_13, e_23) in that fixed order
      (first match wins on ties, tri_train.py:127-139); student = the
      remaining view.

One aggregate pass computes all three rates: six conditional sums over a
single projection that evaluates the five cosines per row — no joins, no
window, fully JVM-side (cosine_tags is a pure SQL expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.simfn import cosine_tags, non_o

PAIRS = [(1, 2), (1, 3), (2, 3)]  # fixed reference order (C3 tie-break)


def pairwise_error_rates_df(
    views: DataFrame,
    cos_threshold: float = 0.9,
    limit: int | None = 1000,
    gold_col: str = "gold_tags",
) -> DataFrame:
    """A3 as a one-row DataFrame: (e12, e13, e23, n12, n13, n23).

    views: (t1_tags, t2_tags, t3_tags, gold_tags [, order cols]).
    n** is the agreement count (the reference's denominator).

    The reference takes the FIRST `limit` validation sentences
    (tri_train.py:73); a bare .limit() is an arbitrary plan-dependent
    subset, so the head is taken under a deterministic ordering on
    whichever id columns exist (sort+limit = TakeOrderedAndProject).
    With no id columns the bare limit stands — caller must pre-sort.
    """
    if limit is not None:
        order_cols = [c for c in ("url", "doc_id", "sent_id") if c in views.columns]
        views = views.orderBy(*order_cols).limit(limit) if order_cols else views.limit(limit)
    proj = views.select(
        *[non_o(f"t{i}_tags").alias(f"l{i}") for i in (1, 2, 3)],
        non_o(gold_col).alias("g"),
    )
    scored = proj.select(
        *[
            (cosine_tags(f"l{a}", f"l{b}") >= cos_threshold).alias(f"agree{a}{b}")
            for a, b in PAIRS
        ],
        *[
            (cosine_tags(f"l{i}", "g") < cos_threshold).alias(f"wrong{i}")
            for i in (1, 2, 3)
        ],
    )
    aggs = []
    for a, b in PAIRS:
        agree = F.col(f"agree{a}{b}")
        both_wrong = agree & F.col(f"wrong{a}") & F.col(f"wrong{b}")
        aggs.append(
            F.coalesce(F.sum(agree.cast("long")), F.lit(0)).alias(f"n{a}{b}")
        )
        aggs.append(
            F.coalesce(F.sum(both_wrong.cast("long")), F.lit(0)).alias(f"w{a}{b}")
        )
    agged = scored.agg(*aggs)
    return agged.select(
        *[
            F.when(F.col(f"n{a}{b}") == 0, F.lit(0.0))
            .otherwise(F.round(F.col(f"w{a}{b}") / F.col(f"n{a}{b}"), 4))
            .alias(f"e{a}{b}")
            for a, b in PAIRS
        ],
        *[F.col(f"n{a}{b}") for a, b in PAIRS],
    )


def pairwise_error_rates(
    views: DataFrame,
    cos_threshold: float = 0.9,
    limit: int | None = 1000,
    gold_col: str = "gold_tags",
) -> dict[str, float | int]:
    """Scalar form of A3 (see pairwise_error_rates_df)."""
    row = pairwise_error_rates_df(views, cos_threshold, limit, gold_col).collect()[0]
    out: dict[str, float | int] = {}
    for a, b in PAIRS:
        out[f"n{a}{b}"] = int(row[f"n{a}{b}"])
        out[f"e{a}{b}"] = float(row[f"e{a}{b}"])
    return out


def assign_roles(rates: dict[str, float | int]) -> tuple[int, int, int]:
    """C3: (teacher_a, teacher_b, student) view ids, reference tie order."""
    e = {(a, b): rates[f"e{a}{b}"] for a, b in PAIRS}
    best = min(e.values())
    for a, b in PAIRS:  # first-match-wins, as tri_train.py:127-139
        if e[(a, b)] == best:
            s = ({1, 2, 3} - {a, b}).pop()
            return a, b, s
    raise AssertionError("unreachable")
