"""Pattern-based relation extraction: voted mentions -> (subj, pred, obj).

New surface required by the north star (no analog in the reference beyond
the mention schema it consumes). Rule: within a sentence, an ordered
mention pair (m1 before m2) with at least one relation-cue token strictly
between them yields a triple; the predicate is the FIRST cue token in the
gap, subject/object are the mention surfaces, confidence is the min of the
two mention confidences (round 4).

Implementation is pure built-in expressions: mention pairs are built
JVM-side with nested transform/flatten over the per-sentence mentions
array (no self-join, no shuffle beyond the initial groupBy that is fused
with voting when the caller keeps the array form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.corpus import CUES


def triples_from_spans(tokens_col: str = "tokens", ms_col: str = "ms",
                       cues: list[str] | None = None):
    """Per-row array<struct<subj,pred,obj,confidence>> expression.

    Pure nested HOFs (no explode, no shuffle) so callers can either
    explode it into the triples table or aggregate over its size in the
    same pass that evaluates the mention spans — one evaluation of the
    span fold serves both outputs.
    """
    if cues is None:
        cues = CUES
    if not cues:
        # array() parses as array<void> and array_contains fails
        # analysis; no cues = no triples, as an explicit empty result
        return F.expr(
            "CAST(array() AS array<struct<subj string, pred string, "
            "obj string, confidence double>>)")
    # SQL-escape each cue (double the quotes): a cue like "d'accord"
    # interpolated raw is a ParseException at plan build
    cues_arr = ("array("
                + ",".join("'" + c.replace("'", "''") + "'" for c in cues)
                + ")")
    gap = (
        f"slice({tokens_col}, m1.end + 1, greatest(m2.beg - m1.end, 0))"
    )
    return F.expr(f"""filter(
        flatten(transform({ms_col}, (m1, i) ->
            transform(slice({ms_col}, i + 2, greatest(size({ms_col}) - i - 1, 0)), m2 ->
                named_struct(
                    'subj', array_join(slice({tokens_col}, m1.beg + 1, m1.end - m1.beg), ' '),
                    'pred', lower(try_element_at(
                        filter({gap}, t -> array_contains({cues_arr}, lower(t))), 1)),
                    'obj', array_join(slice({tokens_col}, m2.beg + 1, m2.end - m2.beg), ' '),
                    'confidence', bround(least(m1.conf, m2.conf), 4))))),
        tr -> tr.pred IS NOT NULL)""")


def extract_triples(voted: DataFrame, cues: list[str] | None = None) -> DataFrame:
    """voted (url, sent_id, tokens, tags, confs) -> triples table.

    Output: subj, pred, obj, url, sent_id, confidence.
    """
    from .mentions import spans_expr

    return (
        voted.withColumn("ms", spans_expr("tags", "confs"))
        .withColumn("tr", F.explode(triples_from_spans("tokens", "ms", cues)))
        .select(
            F.col("tr.subj").alias("subj"),
            F.col("tr.pred").alias("pred"),
            F.col("tr.obj").alias("obj"),
            "url",
            "sent_id",
            F.col("tr.confidence").alias("confidence"),
        )
    )


def cooccurrence_lift(mentions: DataFrame, doc_col: str = "doc_id",
                      surface_col: str = "word") -> DataFrame:
    """Entity co-occurrence edge weighting: (a, b, n_ab, n_a, n_b, lift).

    For every unordered surface pair (a < b), n_ab = documents containing
    BOTH, n_a/n_b = each surface's document frequency, and
    lift = (n_docs * n_ab) / (n_a * n_b) — the PMI family's exp form,
    kept log-free so the score is ONE double division of exact int64
    operands (identical IEEE result in any engine; ln() would be
    libm-dependent and break cross-engine value hashes). lift > 1 means
    the pair co-occurs more than independence predicts — the standard
    edge-weight prior for KG link scoring. n_docs = documents containing
    at least one mention (both engines derive it from the same set).

    Shuffle shape at 100 TB: one distinct on (doc, surface) materialized
    ONCE via localCheckpoint (four consumers — the two self-join sides,
    the marginals, and the doc count — would otherwise each re-derive
    the distinct from the raw mention stream; same cut pattern as the
    q19/q30 plans), then one per-doc self-join (bounded by per-document
    mention count), one (a, b)-keyed aggregate, two surface-keyed
    marginal joins (AQE broadcasts the marginal side when small), and a
    broadcast scalar for n_docs — no driver-side action.
    """
    ms = (
        mentions.select(F.col(doc_col).alias("d"),
                        F.col(surface_col).alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_docs = ms.agg(F.count_distinct("d").alias("n_docs"))
    marg = ms.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    pairs = (
        ms.select("d", F.col("s").alias("a"))
        .join(ms.select("d", F.col("s").alias("b")), "d")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs
        .join(marg.select(F.col("s").alias("a"), F.col("df").alias("n_a")), "a")
        .join(marg.select(F.col("s").alias("b"), F.col("df").alias("n_b")), "b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            ((F.col("n_docs") * F.col("n_ab")).cast("double")
             / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        )
    )
