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


def prf_counts(pred: DataFrame, gold: DataFrame,
               keys: list[str], type_col: str = "tag") -> DataFrame:
    """Span-exact TP/FP/FN per type: (entity_type-as-type_col, tp, fp, fn)."""
    p = pred.select(*keys, type_col).distinct().withColumn("__p", F.lit(1))
    g = gold.select(*keys, type_col).distinct().withColumn("__g", F.lit(1))
    j = p.join(g, [*keys, type_col], "full_outer")
    return (
        j.groupBy(type_col)
        .agg(
            F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNull(), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("__p").isNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("fn"),
        )
    )


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
    agg = prf_counts(pred, gold, keys, type_col)
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(2 * prec * rec / (prec + rec))
    # bround (HALF_EVEN): the digits path is in the REFERENCE-PARITY
    # rounding domain (seqeval's '%.4f' formats ties-to-even, and
    # prf_report_text must agree with this DataFrame on e.g.
    # 21/32 = 0.65625 -> 0.6562); F.round (HALF_UP) is reserved for the
    # DuckDB-oracled contract domain, which uses digits=None here anyway.
    rnd = (lambda c: F.bround(c, digits)) if digits is not None else (lambda c: c)
    return agg.select(
        F.col(type_col).alias("entity_type"),
        rnd(prec).alias("precision"),
        rnd(rec).alias("recall"),
        rnd(f1).alias("f1"),
        (F.col("tp") + F.col("fn")).alias("support"),
    ).orderBy("entity_type")


def prf_report_text(counts: list[tuple[str, int, int, int]],
                    digits: int = 4) -> str:
    """seqeval classification_report-style text from (type, tp, fp, fn)
    rows — the reference's `*_results.txt` artifact (run_ner.py:558-571,
    digits=4): one row per entity type plus micro/macro/weighted
    averages. Pure function of the counts (golden-file tested)."""
    def prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    rows = sorted(counts)
    width = max([len("weighted avg")] + [len(t) for t, *_ in rows])
    head_fmt = "{:>{width}} {:>9} {:>9} {:>9} {:>9}\n"
    row_fmt = "{:>{width}} {:>9.{digits}f} {:>9.{digits}f} {:>9.{digits}f} {:>9}\n"
    out = head_fmt.format("", "precision", "recall", "f1-score", "support",
                          width=width)
    out += "\n"
    per_type = []
    for t, tp, fp, fn in rows:
        p, r, f = prf(tp, fp, fn)
        support = tp + fn
        per_type.append((p, r, f, support))
        out += row_fmt.format(t, p, r, f, support, width=width, digits=digits)
    out += "\n"
    ttp = sum(tp for _, tp, _, _ in rows)
    tfp = sum(fp for _, _, fp, _ in rows)
    tfn = sum(fn for _, _, _, fn in rows)
    tsup = sum(s for _, _, _, s in per_type)
    mp, mr, mf = prf(ttp, tfp, tfn)
    out += row_fmt.format("micro avg", mp, mr, mf, tsup,
                          width=width, digits=digits)
    n = len(per_type) or 1
    out += row_fmt.format(
        "macro avg",
        sum(p for p, _, _, _ in per_type) / n,
        sum(r for _, r, _, _ in per_type) / n,
        sum(f for _, _, f, _ in per_type) / n,
        tsup, width=width, digits=digits)
    if tsup:
        out += row_fmt.format(
            "weighted avg",
            sum(p * s for p, _, _, s in per_type) / tsup,
            sum(r * s for _, r, _, s in per_type) / tsup,
            sum(f * s for _, _, f, s in per_type) / tsup,
            tsup, width=width, digits=digits)
    return out


def write_prf_artifact(pred: DataFrame, gold: DataFrame, keys: list[str],
                       out_path: str, type_col: str = "tag") -> str:
    """Collect prf_counts and write the `*_results.txt` mirror. Returns
    the text. The counts table is tiny (one row per entity type), so the
    collect is metadata-sized."""
    rows = [
        (r[type_col], int(r["tp"]), int(r["fp"]), int(r["fn"]))
        for r in prf_counts(pred, gold, keys, type_col).collect()
    ]
    text = prf_report_text(rows)
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(text)
    return text


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
