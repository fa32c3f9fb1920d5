"""Scalar parity: cosine, avg_cfd, tag rename vs reference semantics."""

import random

from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.functions.simfn import (
    avg_cfd,
    avg_confident_score,
    cosine_similarity,
    cosine_tags,
    rename_tags,
    rename_tags_col,
)

TAGSET = ["O", "B-PER", "I-PER", "B-GPE", "B-ORG", "I-ORG", "B-DATE"]


def _rand_tags(rng, n):
    return [rng.choice(TAGSET) for _ in range(n)]


def test_cosine_oracle_edges():
    assert cosine_similarity([], []) == 0
    assert cosine_similarity(["B-PER"], []) == 0
    assert cosine_similarity(["B-PER"], ["B-PER"]) == 1.0
    assert cosine_similarity(["B-PER", "B-PER"], ["B-PER"]) == 1.0  # count vectors colinear
    assert cosine_similarity(["B-PER"], ["B-GPE"]) == 0.0


def test_cosine_spark_parity(spark):
    rng = random.Random(7)
    rows = [(_rand_tags(rng, rng.randrange(0, 8)), _rand_tags(rng, rng.randrange(0, 8)))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "a array<string>, b array<string>")
    got = [r["c"] for r in df.select(cosine_tags(F.col("a"), F.col("b")).alias("c")).collect()]
    want = [float(cosine_similarity(a, b)) for a, b in rows]
    assert got == want


def test_avg_cfd_oracle_edges():
    assert avg_confident_score([]) == 0
    assert avg_confident_score([{"tag": "O", "confidence": 0.9}]) == 0  # all-O -> empty -> 0
    preds = [{"tag": "B-PER", "confidence": 0.5}, {"tag": "O", "confidence": 0.9},
             {"tag": "I-PER", "confidence": 0.25}]
    assert avg_confident_score(preds) == round((0.5 + 0.25) / 2, 4)


def test_avg_cfd_spark_parity(spark):
    rng = random.Random(11)
    rows = []
    for _ in range(200):
        preds = [
            {"word": "w", "tag": rng.choice(TAGSET),
             "confidence": round(rng.random(), 6)}
            for _ in range(rng.randrange(0, 10))
        ]
        rows.append((preds,))
    schema = "preds array<struct<word:string,tag:string,confidence:double>>"
    df = spark.createDataFrame(rows, schema)
    got = [r["s"] for r in df.select(avg_cfd("preds").alias("s")).collect()]
    want = [float(avg_confident_score(p)) for (p,) in rows]
    assert got == want


def test_rename_order_sensitive():
    # PERSON must win over PERCENT-prefix ambiguity exactly as the
    # reference alternation does (co_training.py:205-217).
    assert rename_tags("B-PERSON") == "B-PER"
    assert rename_tags("B-PERCENT") == "B-PERC"
    assert rename_tags("B-WORK_OF_ART") == "B-ART"
    assert rename_tags("I-QUANTITY") == "I-QUAN"
    assert rename_tags("B-GPE") == "B-GPE"


def test_rename_spark_parity(spark):
    vals = ["B-PERSON", "B-PERCENT", "I-LANGUAGE", "B-WORK_OF_ART", "B-EVENT",
            "B-MONEY", "I-NORP", "B-QUANTITY", "O", "B-GPE"]
    df = spark.createDataFrame([(v,) for v in vals], ["t"])
    got = [r["s"] for r in df.select(rename_tags_col("t").alias("s")).collect()]
    assert got == [rename_tags(v) for v in vals]


def test_rename_spark_parity_adversarial(spark):
    """Single-pass alternation parity on inputs where a sequential
    replace chain diverges: PERSON->PER re-forms PERCENT in
    'PERSONCENT' (chain would cascade it to 'PERC'; the reference's
    one-pass regex leaves 'PERCENT'), and overlapping key runs pick
    the leftmost match like re.sub."""
    vals = ["PERSONCENT", "LANGUAGEVENT", "PERCENTPERSON",
            "XPERSONX", "EVENTEVENT", "WORK_OF_ARTWORK_OF_ART"]
    df = spark.createDataFrame([(v,) for v in vals], ["t"])
    got = [r["s"] for r in df.select(rename_tags_col("t").alias("s")).collect()]
    assert got == [rename_tags(v) for v in vals]
