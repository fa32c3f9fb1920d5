"""S3/S4/S5 corpus scans: pinned reference-quirk expectations + Spark
scan parity with the shared pure parsers."""

import os

from thesis_ner_co_tri_training_spark.sources.conll import (
    conll_scan, label_vocabulary, parse_isw, parse_onto, parse_tweets)

ONTO = """Der\t_\t_\tO
Kanzler\t_\t_\tB-PER
besucht\t_\t_\tO

-DOCSTART- -X- O
Berlin\t_\t_\tB-GPE
heute\t_\t_\tO
"""

ISW = """idx\tcol1\tcol2\tword\tcol4\tcol5\ttag
1\ta\tx\tDer\tb\tc\tNONE
2\ta\tx\tKanzler\tb\tc\tB-PER
3\ta\t?.\tEND\tb\tc\tNONE
4\ta\tx\tNONE\tb\tc\tB-XXX
5\ta\tx\tBerlin\tb\tc\tB-GPE
0 this raw line is skipped entirely
6\ta\tx.\tEND\tb\tc\tNONE
"""

TWEETS = """# comment
1\tHallo\t_\tNONE
2\tWelt\t_\tB-LOC
NONE\t\t\t
3\tTschüss\t_\tNONE
"""


def test_parse_onto_reference_quirks():
    got = parse_onto(ONTO.splitlines(keepends=True))
    assert got == [
        ("Der Kanzler besucht", ["O", "B-PER", "O"]),
        ("Berlin heute", ["B-GPE", "O"]),  # trailing sentence kept
    ]


def test_parse_isw_reference_quirks():
    got = parse_isw(ISW.splitlines(keepends=True))
    # header + raw '0'-prefixed lines skipped; rows dropped only when the
    # WORD (col3) is NONE; boundary on '?'/'.' in col2; NONE TAGS -> O
    assert got == [
        ("Der Kanzler", ["O", "B-PER"]),
        ("Berlin", ["B-GPE"]),
    ]


def test_parse_tweets_reference_quirks():
    got = parse_tweets(TWEETS.splitlines(keepends=True))
    assert got == [
        ("Hallo Welt", ["O", "B-LOC"]),
        ("Tschüss", ["O"]),
    ]


def test_label_vocabulary_sort_then_map_quirk():
    # ISW sorts with 'NONE' then maps -> 'O' keeps NONE's sort position
    assert label_vocabulary(["NONE", "B-PER", "NONE"], "isw") == [
        "B-PER", "O", "[CLS]", "[SEP]"]
    assert label_vocabulary(["O", "B-PER"], "onto") == [
        "B-PER", "O", "[CLS]", "[SEP]"]


def test_spark_scan_matches_parsers(spark, tmp_path):
    d = tmp_path / "corpus"
    os.makedirs(d)
    (d / "a.onto").write_text(ONTO)
    (d / "b.onto").write_text(ONTO)
    df = conll_scan(spark, str(d), fmt="onto", glob_filter="*.onto")
    got = {}
    for r in df.collect():
        got.setdefault(os.path.basename(r["path"]), []).append(
            (r["sent_id"], r["text"], list(r["tags"])))
    want_one = [(i, s, t) for i, (s, t) in
                enumerate(parse_onto(ONTO.splitlines(keepends=True)))]
    assert {k: sorted(v) for k, v in got.items()} == {
        "a.onto": want_one, "b.onto": want_one}
    # invariant: size(tokens) == size(tags) (predict.py:113)
    for rows in got.values():
        for _, s, t in rows:
            assert len(s.split(" ")) == len(t)
