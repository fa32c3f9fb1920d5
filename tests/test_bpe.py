"""BPE token counting: pure-Python reference loop vs the rank-sweep
replace chain (Spark AND DuckDB), on adversarial strings and the
documents table. functions/bpe.py module docstring has the equivalence
argument; these tests pin it."""

import random

import duckdb
import pytest

from thesis_ner_co_tri_training_spark.functions.bpe import (
    BPE_MERGES,
    bpe_count_col,
    bpe_count_from_enc_sql,
    bpe_encode,
    bpe_oracle_expr,
    bpe_token_count,
    validate_merges,
)


def _sweep_encode(word, merges):
    """Independent rank-sweep replay: apply each merge once, in rank
    order, merging all non-overlapping occurrences left-to-right —
    the semantics of the engine's replace chain, in plain Python."""
    syms = list(word)
    for x, y in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_validate_merges_pins_well_ordering():
    assert validate_merges(BPE_MERGES) == BPE_MERGES
    with pytest.raises(ValueError, match="not a product"):
        validate_merges([("ab", "c")])          # 'ab' never formed
    with pytest.raises(ValueError, match="duplicate"):
        validate_merges([("a", "b"), ("a", "b")])
    with pytest.raises(ValueError, match="alphabet"):
        validate_merges([("a", "B")])
    with pytest.raises(ValueError, match="alphabet"):
        validate_merges([("a", "")])


def test_encode_examples():
    assert bpe_encode("the") == ["the"]
    assert bpe_encode("nation") == ["n", "ation"]
    assert bpe_encode("thething") == ["the", "th", "ing"]
    assert bpe_encode("xyz") == ["x", "y", "z"]
    assert bpe_encode("") == []
    assert bpe_encode("1920") == ["19", "20"]


def test_sweep_equals_reference_loop():
    """Rank-sweep == lowest-rank-anywhere loop on the pinned table and
    on a custom overlapping-merge table (the well-ordering guarantee)."""
    words = ["the", "thethe", "nation", "stationing", "aaaa", "qu",
             "ingthe", "atation", "understanding", "x", "", "192020",
             "contention", "comcomcom", "thisisatest"]
    rnd = random.Random(7)
    words += ["".join(rnd.choice("theinga19") for _ in range(rnd.randrange(1, 14)))
              for _ in range(300)]
    for w in words:
        assert _sweep_encode(w, BPE_MERGES) == bpe_encode(w), w
    custom = validate_merges([("a", "a"), ("aa", "a"), ("aa", "b")])
    for w in ["aaaa", "aaaaa", "aab", "aaab", "baaaab", "abab"]:
        assert _sweep_encode(w, custom) == bpe_encode(w, custom), w


FIXTURE_TEXTS = [
    "The nation is understanding the station.",
    "  MIXED Case, punctuation!! and 1920 digits 2019  ",
    "unicode élève 漢字 mixed the-end",
    "aaaa bbbb the the the",
    "",
    None,
    "tabs\tand\nnewlines the nbsp",
    "qu quick quack 19201920",
]


def test_spark_chain_matches_python_twin(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURE_TEXTS)],
                               "id long, text string")
    got = {r["id"]: r["n"] for r in
           df.select("id", bpe_count_col("text").alias("n")).collect()}
    for i, t in enumerate(FIXTURE_TEXTS):
        assert got[i] == bpe_token_count(t), repr(t)


def test_duckdb_chain_matches_python_twin():
    con = duckdb.connect()
    enc = bpe_oracle_expr("text")
    cnt = bpe_count_from_enc_sql("e")
    for t in FIXTURE_TEXTS:
        got = con.execute(
            f"WITH v AS (SELECT ? AS text), enc AS (SELECT {enc} AS e FROM v) "
            f"SELECT {cnt} FROM enc", [t]).fetchone()[0]
        assert got == bpe_token_count(t), repr(t)


def test_documents_table_parity(spark):
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        token_counts)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = token_counts(docs, tokenizer="bpe").select("doc_id", "text", "n_bpe")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_bpe"] == bpe_token_count(r["text"]), r["doc_id"]
    # the row-by-row equality above pins n_bpe exactly to the pure-
    # Python twin, which subsumes any bpe-vs-regex-token bound — no
    # second (weaker) assertion pass needed


def test_token_counts_rejects_unknown_tokenizer(spark):
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        token_counts)

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="tokenizer"):
        token_counts(df, tokenizer="wordpiece")
