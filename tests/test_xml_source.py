"""S2 XML corpus scan vs the shared pure parser (+ reference quirks)."""

import os

from thesis_ner_co_tri_training_spark.sources.xml_corpus import (
    xml_sentences, xml_to_sentences)


def _doc(words):
    body = "".join(f"<w>{w}</w>" for w in words)
    return f"<document><s>{body}</s></document>"


LONG = [f"w{i}" for i in range(12)]


def test_pure_parser_reference_quirks():
    # boundary token dropped; short buffer NOT reset at a boundary
    words = ["a", "b", "."] + LONG + ["!"]
    got = xml_to_sentences(_doc(words))
    # 'a b' (<=10) survives the '.' boundary and prefixes the long sentence
    assert got == ["a b " + " ".join(LONG)]

    # quote tokens dropped; contains-punct counts as boundary ('Mr.')
    words = LONG + ['"', "Mr."] + LONG + ["?"]
    got = xml_to_sentences(_doc(words))
    assert got == [" ".join(LONG), " ".join(LONG)]

    # trailing unterminated long sentence emitted
    assert xml_to_sentences(_doc(LONG)) == [" ".join(LONG)]
    # short doc -> nothing
    assert xml_to_sentences(_doc(["x", "y", "."])) == []


def test_spark_scan_matches_pure_parser(spark, tmp_path):
    d = tmp_path / "corpus" / "2017" / "sub"
    os.makedirs(d)
    docs = {
        "a.xml": _doc(LONG + ["."] + ["short", "one", "!"]),
        "b.xml": _doc(["x"] * 15 + ["?"]),
    }
    for name, content in docs.items():
        (d / name).write_text(content)
    (tmp_path / "corpus" / "ignore.txt").write_text("not xml")

    df = xml_sentences(spark, str(tmp_path / "corpus"))
    got = {}
    for r in df.collect():
        got.setdefault(os.path.basename(r["path"]), []).append(
            (r["sent_id"], r["text"]))
    want = {
        name: [(i, s) for i, s in enumerate(xml_to_sentences(content))]
        for name, content in docs.items()
        if xml_to_sentences(content)
    }
    got = {k: sorted(v) for k, v in got.items()}
    assert got == want
