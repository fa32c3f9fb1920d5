

def test_corpus_frequency_score_replay(spark):
    """Novelty score vs a pure-Python replay: boilerplate-heavy docs
    score high avg_freq, unique docs exactly 1.0, short docs null."""
    from collections import Counter

    from thesis_ner_co_tri_training_spark.operators.textstats import (
        corpus_frequency_score)

    rows = [(1, "the cat sat on the mat"),
            (2, "the cat sat on a rug"),
            (3, "completely novel words here"),
            (4, "too short"),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_grams, r.freq_sum, r.avg_freq)
           for r in corpus_frequency_score(df).collect()}

    def tris(t):
        w = t.lower().split()
        return [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]

    cnt = Counter(g for _, t in rows for g in tris(t))
    for i, t in rows:
        g = tris(t)
        if not g:
            assert out[i] == (0, 0, None)
        else:
            fs = sum(cnt[x] for x in g)
            assert out[i] == (len(g), fs, fs / len(g))
    assert out[3][2] == 1.0                       # all-novel doc
    assert out[1][2] > out[3][2]                  # shares 'the cat sat'
