"""End-to-end: Spark engine vs pure-Python oracle (P/R gate >= 0.95)."""

import pytest
from pyspark.sql import functions as F

from tests.oracle import bio_spans, oracle_run
from thesis_ner_co_tri_training_spark.operators.mentions import (
    mentions_table,
    spans_expr,
    vote_mentions,
)
from thesis_ner_co_tri_training_spark.operators.tagging import (
    explode_sentences,
    tag_sentences_df,
)
from thesis_ner_co_tri_training_spark.operators.triples import extract_triples
from thesis_ner_co_tri_training_spark.plans.eval import micro_prf, prf_report
from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

N_PAGES = 60


@pytest.fixture(scope="module")
def engine_out(spark):
    pages = gen_pages_df(spark, N_PAGES, partitions=4)
    sents = explode_sentences(pages.drop("text"))  # force the html path
    voted = vote_mentions(tag_sentences_df(sents))
    voted = voted.localCheckpoint(eager=True)
    mentions = mentions_table(voted)
    triples = extract_triples(voted)
    return mentions, triples


@pytest.fixture(scope="module")
def oracle_out():
    return oracle_run(range(N_PAGES))


def test_mentions_match_oracle(spark, engine_out, oracle_out):
    mentions, _ = engine_out
    o_mentions, _ = oracle_out
    got = {
        (r["url"], r["sent_id"], r["beg"], r["end"], r["surface"], r["tag"],
         r["confidence"])
        for r in mentions.collect()
    }
    want = set(o_mentions)
    assert want, "oracle produced no mentions — fixture too small"
    prec = len(got & want) / len(got)
    rec = len(got & want) / len(want)
    assert prec >= 0.95 and rec >= 0.95, (prec, rec, list(got ^ want)[:10])
    # design goal is exact parity, not just 0.95
    assert got == want


def test_triples_match_oracle(spark, engine_out, oracle_out):
    _, triples = engine_out
    _, o_triples = oracle_out
    got = {
        (r["subj"], r["pred"], r["obj"], r["url"], r["sent_id"], r["confidence"])
        for r in triples.collect()
    }
    want = set(o_triples)
    assert want, "oracle produced no triples"
    prec = len(got & want) / len(got)
    rec = len(got & want) / len(want)
    assert prec >= 0.95 and rec >= 0.95, (prec, rec, list(got ^ want)[:10])
    assert got == want


def test_prf_report_shape(spark, engine_out, oracle_out):
    mentions, _ = engine_out
    o_mentions, _ = oracle_out
    gold = spark.createDataFrame(
        o_mentions,
        "url string, sent_id int, beg int, end int, surface string, "
        "tag string, confidence double",
    )
    rep = prf_report(mentions, gold, keys=["url", "sent_id", "beg", "end"])
    rows = rep.collect()
    assert rows
    for r in rows:
        assert r["precision"] == 1.0 and r["recall"] == 1.0, r
    p, r_, f1 = micro_prf(mentions, gold, keys=["url", "sent_id", "beg", "end", "tag"])
    assert p >= 0.95 and r_ >= 0.95


def test_spans_expr_parity(spark):
    cases = [
        (["O", "B-PER", "I-PER", "O", "B-GPE"], [0.1, 0.8, 0.6, 0.1, 0.9]),
        (["B-PER", "B-PER"], [0.5, 0.7]),                 # adjacent B
        (["I-PER", "O"], [0.4, 0.1]),                     # leading I -> opens span
        (["B-PER", "I-GPE"], [0.5, 0.5]),                 # I of other type -> new span
        ([], []),
        (["O", "O"], [0.1, 0.2]),
        (["B-ORG", "I-ORG", "I-ORG"], [0.3, 0.6, 0.9]),
    ]
    df = spark.createDataFrame(cases, "tags array<string>, confs array<double>")
    got = [
        [(s["beg"], s["end"], s["tag"], s["conf"]) for s in r["sp"]]
        for r in df.select(spans_expr("tags", "confs").alias("sp")).collect()
    ]
    want = [bio_spans(t, c) for t, c in cases]
    assert got == want


def test_token_tag_alignment_invariant(spark):
    # predict.py:113 invariant: size(tokens) == size(preds) per view
    pages = gen_pages_df(spark, 10, partitions=2)
    sv = tag_sentences_df(explode_sentences(pages))
    bad = sv.filter(
        (F.size("tokens") != F.size("v1_preds"))
        | (F.size("tokens") != F.size("v2_preds"))
        | (F.size("tokens") != F.size("v3_preds"))
    ).count()
    assert bad == 0


def test_prf_report_text_golden():
    """Golden-file: the run_ner.py:558-571 `*_results.txt` mirror."""
    from thesis_ner_co_tri_training_spark.plans.eval import prf_report_text

    got = prf_report_text([("PER", 9, 1, 2), ("ORG", 5, 5, 0), ("GPE", 0, 0, 3)])
    want = (
        "             precision    recall  f1-score   support\n"
        "\n"
        "         GPE    0.0000    0.0000    0.0000         3\n"
        "         ORG    0.5000    1.0000    0.6667         5\n"
        "         PER    0.9000    0.8182    0.8571        11\n"
        "\n"
        "   micro avg    0.7000    0.7368    0.7179        19\n"
        "   macro avg    0.4667    0.6061    0.5079        19\n"
        "weighted avg    0.6526    0.7368    0.6717        19\n"
    )
    assert got == want


def test_write_prf_artifact(spark, tmp_path, engine_out, oracle_out):
    """The artifact writer emits the text mirror from real DataFrames and
    its per-type body agrees with prf_report's rounded values."""
    from thesis_ner_co_tri_training_spark.plans.eval import write_prf_artifact

    mentions, _ = engine_out
    o_mentions, _ = oracle_out
    gold = spark.createDataFrame(
        [(u, s, b, e, sf, t, c) for (u, s, b, e, sf, t, c) in o_mentions],
        "url string, sent_id long, beg int, end int, surface string, "
        "tag string, confidence double",
    )
    out = tmp_path / "eval" / "dev_results.txt"
    text = write_prf_artifact(
        mentions, gold, keys=["url", "sent_id", "beg", "end"],
        out_path=str(out))
    assert out.read_text() == text
    rep = prf_report(mentions, gold, keys=["url", "sent_id", "beg", "end"])
    for r in rep.collect():
        assert f"{r['precision']:.4f}" in text and str(r["support"]) in text


def test_cooccurrence_lift_oracle(spark):
    """cooccurrence_lift vs a brute-force pure-Python oracle on a small
    mention table with repeats (distinct-per-doc semantics), singleton
    surfaces (appear in no pair), and a doc with no co-mentions."""
    from itertools import combinations

    from thesis_ner_co_tri_training_spark.operators.triples import (
        cooccurrence_lift)

    rows = [
        (1, "spark"), (1, "hash"), (1, "spark"),   # repeat within doc
        (2, "spark"), (2, "hash"), (2, "vector"),
        (3, "vector"), (3, "spark"),
        (4, "hash"),                                # no pair partner
        (5, "stream"), (5, "spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, word string")
    got = {(r["a"], r["b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift"])
           for r in cooccurrence_lift(df).collect()}

    docs = {}
    for d, w in rows:
        docs.setdefault(d, set()).add(w)
    n_docs = len(docs)
    marg: dict[str, int] = {}
    for ws in docs.values():
        for w in ws:
            marg[w] = marg.get(w, 0) + 1
    pairs: dict[tuple[str, str], int] = {}
    for ws in docs.values():
        for a, b in combinations(sorted(ws), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = {
        (a, b): (n, marg[a], marg[b], (n_docs * n) / (marg[a] * marg[b]))
        for (a, b), n in pairs.items()
    }
    assert got == want
    assert ("hash", "spark") in got and got[("hash", "spark")][0] == 2
    assert all(a < b for a, b in got)          # canonical orientation
    assert "stream" in {x for ab in got for x in ab}  # 1-doc surface kept


def test_triples_custom_cues_quoting_and_empty(spark):
    """Cue lists are user input: quotes must not break plan parsing and
    an empty list means no triples, not an analysis error."""
    from thesis_ner_co_tri_training_spark.operators.tagging import (
        tag_and_vote_pages_df)

    pages = spark.createDataFrame(
        [("u1", "Angela Merkel visited Berlin. Peter Schmidt works at "
                "Siemens.")],
        "url string, text string")
    voted = tag_and_vote_pages_df(pages)
    quoted = extract_triples(voted, cues=["d'accord", "visited", "at"])
    baseline = extract_triples(voted, cues=["visited", "at"])
    assert quoted.count() == baseline.count()
    assert extract_triples(voted, cues=[]).count() == 0
