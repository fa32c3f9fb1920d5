"""BM25 term scoring (textstats.bm25_term_scores / top_terms_per_doc).

Value parity vs a pure-Python reference implementation (the repo's
single-source-of-truth rule): the rational-idf path must be BIT-exact
(pure +,-,*,/ over identical integer operands); the ln path is allowed
last-ulp slack (JVM Math.log vs libm log are both <=1 ulp but not
guaranteed identical). The two idf forms are NOT rank-equivalent in
general (idf multiplies a tf factor; a monotone transform of one
factor does not preserve cross-term product order) — the ln path is
value-oracled directly, and the ranking-agreement assertion below is a
property of THIS fixture, not a theorem.
"""

from __future__ import annotations

import math

from thesis_ner_co_tri_training_spark.operators.textstats import (
    bm25_term_scores,
    top_terms_per_doc,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "quantum flux capacitor the"),
    (4, "the the the the"),
    (5, ""),
]


def _py_bm25(docs, k1=1.2, b=0.75):
    toks = {i: [t for t in text.lower().strip().split() if t] for i, text in docs}
    n_docs = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n_docs
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        for t in set(ts):
            tf = ts.count(t)
            dl = len(ts)
            rational = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            denom = tf + k1 * (1.0 - b + b * dl / avgdl)
            out[(i, t)] = {
                "tf": tf,
                "dl": dl,
                "df_t": df[t],
                "rational": rational,
                "score_rational": rational * (tf * (k1 + 1.0)) / denom,
                "score_ln": math.log(1.0 + rational) * (tf * (k1 + 1.0)) / denom,
            }
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_rational_bit_exact_vs_python(spark):
    ref = _py_bm25(DOCS)
    got = bm25_term_scores(_df(spark), idf="rational").collect()
    assert {(r.doc_id, r.term) for r in got} == set(ref)
    for r in got:
        e = ref[(r.doc_id, r.term)]
        assert (r.tf, r.dl, r.df_t) == (e["tf"], e["dl"], e["df_t"])
        assert r.idf == e["rational"], (r.term, r.idf, e["rational"])
        assert r.score == e["score_rational"], (r.term,)


def test_bm25_ln_close_and_rank_identical(spark):
    ref = _py_bm25(DOCS)
    ln = bm25_term_scores(_df(spark), idf="ln")
    for r in ln.collect():
        e = ref[(r.doc_id, r.term)]
        assert math.isclose(r.score, e["score_ln"], rel_tol=1e-12)
        assert r.score >= 0.0  # BM25+ idf = ln(1 + x), x > 0
    top_ln = {
        (r.doc_id, r.rank): r.term
        for r in top_terms_per_doc(ln, k=2).collect()
    }
    top_rat = {
        (r.doc_id, r.rank): r.term
        for r in top_terms_per_doc(
            bm25_term_scores(_df(spark), idf="rational"), k=2).collect()
    }
    # On THIS fixture the two idfs agree on every doc's top-2 — a
    # fixture property, not a general monotonicity theorem (see module
    # docstring); the ln VALUES are pinned above regardless.
    assert top_ln == top_rat


def test_top_terms_min_df_and_tie_order(spark):
    scored = bm25_term_scores(_df(spark), idf="rational")
    top = top_terms_per_doc(scored, k=10, min_df=2).collect()
    assert all(r.df_t >= 2 for r in top)
    per_doc = {}
    for r in sorted(top, key=lambda r: (r.doc_id, r.rank)):
        per_doc.setdefault(r.doc_id, []).append(r)
    for rows in per_doc.values():
        for a, b in zip(rows, rows[1:]):
            assert (a.score > b.score) or (
                a.score == b.score and a.term < b.term)
