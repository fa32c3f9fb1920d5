

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


def _winnow_replay(text, k=3, w=4):
    """Pure-Python replay of the winnowing spec (NORM tokens, md5_long
    gram hashes, rightmost-window-min selection)."""
    import hashlib
    import re

    toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
    m = len(toks) - k + 1
    if m < 1:
        return set()
    h = [int(hashlib.md5(" ".join(toks[g:g + k]).encode()
                         ).hexdigest()[:15], 16) for g in range(m)]
    sel = set()
    for p in range(max(1, m - w + 1)):
        win = h[p:p + w]
        mn = min(win)
        pos = p + max(i for i, v in enumerate(win) if v == mn)
        sel.add((pos + 1, mn))
    return sel


def test_winnowing_replay(spark):
    """winnow_fingerprints == the pure-Python spec replay, including the
    rightmost tie rule and sub-window documents."""
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        winnow_fingerprints)

    rows = [
        (1, "the cat sat on the mat and the cat sat on the mat again"),
        (2, "  Mixed   CASE\twhitespace\n normalization test here ok "),
        (3, "a b c"),              # exactly k tokens -> one gram, one pick
        (4, "a b c d"),            # m=2 < w -> one whole-doc window
        (5, "x y"),                # < k tokens -> no rows
        (6, "t t t t t t t t t"),  # all-equal hashes -> tie rule everywhere
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in rows:
        assert got.get(i, set()) == _winnow_replay(t), f"doc {i}"
    assert 5 not in got and 7 not in got
    # all-equal hashes: rightmost-min of every window; distinct set is
    # one pick per window position
    assert {p for p, _ in got[6]} == {4, 5, 6, 7}


def test_winnowing_shared_passage_guarantee(spark):
    """The winnowing guarantee: any shared run of >= w + k - 1 tokens
    yields at least one shared fingerprint (the MOSS detection bound)."""
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        winnow_fingerprints)

    passage = "quick brown foxes jump over lazy sleeping dogs tonight"
    rows = [(1, "alpha beta gamma " + passage + " delta epsilon"),
            (2, "one two three four five " + passage + " six seven")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    shared = fps[1] & fps[2]
    assert shared, "shared 9-token passage must produce a shared fingerprint"


def test_winnowing_param_guard(spark):
    import pytest

    from thesis_ner_co_tri_training_spark.operators.textstats import (
        winnow_fingerprints)

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_passage_pairs_planted_copy(spark):
    """A copied passage of >= w + k - 1 tokens must surface its pair;
    n_shared equals the replay's shared-fp count and match_frac is the
    exact ratio."""
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        winnow_passage_pairs)

    passage = ("the quick brown fox jumps over the lazy dog while "
               "seven wizards brew quartz potions at midnight")
    rows = [
        (1, "intro words here " + passage + " outro text"),
        (2, "totally different lead-in before " + passage),
        (3, "unrelated document about maritime navigation routes on "
            "clear nights with stable compasses and dry charts"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.a, r.b): r for r in
           winnow_passage_pairs(df, k=3, w=4, min_shared=2).collect()}
    assert (1, 2) in out
    assert all(p == (1, 2) for p in out)          # doc 3 matches nothing
    r = out[(1, 2)]
    s1 = {fp for _, fp in _winnow_replay(rows[0][1])}
    s2 = {fp for _, fp in _winnow_replay(rows[1][1])}
    assert r.n_shared == len(s1 & s2) >= 2
    assert r.n_a == len(s1) and r.n_b == len(s2)
    assert r.match_frac == r.n_shared / min(r.n_a, r.n_b)


def test_passage_pairs_boilerplate_guard(spark):
    """A fingerprint present in > max_df documents is boilerplate: it
    must not generate pairs. With max_df=3 and the same passage in 5
    docs, only fps confined to <= 3 docs may pair."""
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        winnow_passage_pairs)

    boiler = "subscribe to our newsletter for updates and offers today"
    rows = [(i, f"unique lead {i} alpha{i} beta{i} " + boiler)
            for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unguarded = winnow_passage_pairs(df, k=3, w=4, max_df=64,
                                     min_shared=2).count()
    guarded = winnow_passage_pairs(df, k=3, w=4, max_df=3,
                                   min_shared=2).count()
    assert unguarded == 10          # all C(5,2) pairs via the boilerplate
    assert guarded == 0             # shared fps exceed max_df -> dropped
