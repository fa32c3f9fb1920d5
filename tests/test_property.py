"""Property-based cross-engine parity: JVM expressions vs the pure-Python
reference-semantics oracles, over adversarial generated inputs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from thesis_ner_co_tri_training_spark.functions.simfn import (
    avg_confident_score, cosine_similarity, avg_cfd, cosine_tags)
from thesis_ner_co_tri_training_spark.functions.textnorm import strip_punct, strip_punct_col

TAGS = st.sampled_from(["O", "B-PER", "I-PER", "B-GPE", "B-ORG", "B-DATE"])
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
    max_size=80,
)

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])


@given(st.lists(TEXT, min_size=1, max_size=40))
@SET
def test_strip_punct_jvm_python_parity(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["s"] for r in
           df.select(strip_punct_col(F.col("t")).alias("s")).collect()]
    assert got == [strip_punct(t) for t in texts]


@given(st.lists(st.tuples(st.lists(TAGS, max_size=12),
                          st.lists(TAGS, max_size=12)),
                min_size=1, max_size=30))
@SET
def test_cosine_jvm_python_parity(spark, pairs):
    df = spark.createDataFrame(pairs, "a array<string>, b array<string>")
    got = [r["c"] for r in df.select(cosine_tags("a", "b").alias("c")).collect()]
    want = [cosine_similarity(a, b) for a, b in pairs]
    assert got == pytest.approx(want, abs=1e-9)


@given(st.lists(st.lists(
    st.tuples(TAGS, st.floats(min_value=0, max_value=1,
                              allow_nan=False, width=32)),
    max_size=10), min_size=1, max_size=30))
@SET
def test_avg_cfd_jvm_python_parity(spark, rows):
    data = [([{"word": "w", "tag": t, "confidence": float(c)} for t, c in row],)
            for row in rows]
    df = spark.createDataFrame(
        data,
        "preds array<struct<word:string,tag:string,confidence:double>>",
    )
    got = [r["a"] for r in df.select(avg_cfd("preds").alias("a")).collect()]
    want = [avg_confident_score(
        [{"tag": t, "confidence": float(c)} for t, c in row]) for row in rows]
    assert got == pytest.approx(want, abs=1e-9)
