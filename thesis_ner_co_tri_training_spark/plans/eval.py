"""Per-entity-type P/R/F1 harness (A4 — seqeval classification_report analog).

Mirrors the reference's evaluation artifact (run_ner.py:558-571, digits=4)
as a DataFrame job: explode gold and predicted entity spans, full-outer
join on the exact span identity (url, sent_id, beg, end, tag), count
TP/FP/FN per type, emit precision/recall/f1/support rounded to 4.

This is the correctness gate: pytest asserts micro P/R >= 0.95 between
engine triples/mentions and the pure-Python oracle (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prf_report(pred: DataFrame, gold: DataFrame,
               keys: list[str], type_col: str = "tag",
               digits: int | None = 4) -> DataFrame:
    """Span-exact P/R/F1 per type. `keys` identify a span uniquely.

    digits=4 mirrors the reference's seqeval report (run_ner.py:558-571).
    digits=None emits raw IEEE doubles: tp/fp/fn are integer sums, so
    p = tp/(tp+fp) etc. are correctly-rounded IEEE divisions that come out
    bit-identical in any engine given the same operand order — the form
    the cross-engine contract hash (q23) needs, where round() tie behavior
    and rounding-mode implementations differ between engines/versions.
    """
    p = pred.select(*keys, type_col).distinct().withColumn("__p", F.lit(1))
    g = gold.select(*keys, type_col).distinct().withColumn("__g", F.lit(1))
    j = p.join(g, [*keys, type_col], "full_outer")
    agg = (
        j.groupBy(type_col)
        .agg(
            F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNull(), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("__p").isNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("fn"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(2 * prec * rec / (prec + rec))
    rnd = (lambda c: F.round(c, digits)) if digits is not None else (lambda c: c)
    return agg.select(
        F.col(type_col).alias("entity_type"),
        rnd(prec).alias("precision"),
        rnd(rec).alias("recall"),
        rnd(f1).alias("f1"),
        (F.col("tp") + F.col("fn")).alias("support"),
    ).orderBy("entity_type")


def micro_prf(pred: DataFrame, gold: DataFrame, keys: list[str]) -> tuple[float, float, float]:
    """Micro-averaged P/R/F1 over exact row identity (driver-side scalars)."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.join(g, keys, "inner").count()
    np_, ng = p.count(), g.count()
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return round(prec, 4), round(rec, 4), round(f1, 4)
