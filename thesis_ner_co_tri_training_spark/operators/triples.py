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


def extract_triples(voted: DataFrame, cues: list[str] | None = None) -> DataFrame:
    """voted (url, sent_id, tokens, tags, confs) -> triples table.

    Output: subj, pred, obj, url, sent_id, confidence.
    """
    if cues is None:
        cues = CUES
    from .mentions import spans_expr

    df = voted.withColumn("ms", spans_expr("tags", "confs"))
    # Ordered pairs (i < j) of spans, JVM-side.
    pairs = F.expr(
        "flatten(transform(ms, (m1, i) -> "
        "transform(slice(ms, i + 2, greatest(size(ms) - i - 1, 0)), "
        "m2 -> named_struct('m1', m1, 'm2', m2))))"
    )
    cues_arr = F.array(*[F.lit(c) for c in cues])
    df = (
        df.withColumn("pair", F.explode(pairs))
        .withColumn(
            "gap",
            F.slice(
                F.col("tokens"),
                F.col("pair.m1.end") + 1,
                F.greatest(F.col("pair.m2.beg") - F.col("pair.m1.end"), F.lit(0)),
            ),
        )
        .withColumn("cue_hits", F.filter("gap", lambda t: F.array_contains(cues_arr, F.lower(t))))
        .filter(F.size("cue_hits") > 0)
    )
    surface = lambda m: F.concat_ws(
        " ", F.slice(F.col("tokens"), F.col(f"pair.{m}.beg") + 1,
                     F.col(f"pair.{m}.end") - F.col(f"pair.{m}.beg"))
    )
    return df.select(
        surface("m1").alias("subj"),
        F.lower(F.element_at("cue_hits", 1)).alias("pred"),
        surface("m2").alias("obj"),
        "url",
        "sent_id",
        F.round(F.least(F.col("pair.m1.conf"), F.col("pair.m2.conf")), 4).alias("confidence"),
    )
