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


# ------------------------------------------------------------- learning


def test_learn_merges_py_spec():
    """Pin the learner spec on hand cases: adjacency counting includes
    overlaps ('aaa' contributes (a,a) twice) while merging is
    non-overlapping LTR; ties break by (count DESC, left, right);
    product collisions are skipped; min_count stops early."""
    from thesis_ner_co_tri_training_spark.functions.bpe import (
        learn_merges_py)

    # overlap counting: freq 1 'aaa' gives (a,a) count 2; after the
    # merge the vocab word is [aa, a], whose (aa, a) pair counts 1 and
    # falls below min_count=2
    got = learn_merges_py({"aaa": 1}, num_merges=3, min_count=2)
    assert got == [("a", "a", 2)]
    # with min_count=1 the next round merges (aa, a) -> one 'aaa' symbol
    got = learn_merges_py({"aaa": 1}, num_merges=3, min_count=1)
    assert got == [("a", "a", 2), ("aa", "a", 1)]
    # tie rule: 'ab' and 'cd' both count 2 -> (a,b) wins by left asc
    got = learn_merges_py({"ab": 2, "cd": 2}, num_merges=1)
    assert got == [("a", "b", 2)]
    # product collision: learning from 'abc' words where ('a','bc') was
    # learned first means a later ('ab','c') -> 'abc' is skipped
    wf = {"bc": 9, "abc": 5, "ab": 3, "xabcx": 2}
    merges = learn_merges_py(wf, num_merges=6, min_count=1)
    products = [x + y for x, y, _ in merges]
    assert len(products) == len(set(products))


def test_learn_merges_py_well_ordered_and_encodable():
    """The learned list always passes validate_merges, and encoding
    with it (the sweep chain == textbook loop contract) reproduces the
    learner's final vocabulary segmentation."""
    from thesis_ner_co_tri_training_spark.functions.bpe import (
        bpe_encode, learn_merges_py, validate_merges)

    wf = {"the": 50, "then": 20, "them": 10, "in": 40, "inn": 5,
          "and": 30, "android": 3, "a1b2": 7, "zzz": 4}
    learned = learn_merges_py(wf, num_merges=10, min_count=1)
    pairs = [(x, y) for x, y, _ in learned]
    assert validate_merges(pairs) == pairs
    # encoding any training word with the learned table terminates and
    # only produces symbols that are chars or learned products
    products = {x + y for x, y in pairs}
    for w in wf:
        for sym in bpe_encode(w, pairs):
            assert len(sym) == 1 or sym in products


def test_learn_bpe_merges_distributed_matches_replay(spark):
    """The distributed learner (one vocab shuffle + per-round agg/
    argmax/replace) == learn_merges_py on the same corpus, including
    pre-tokenization (ASCII fold, [a-z0-9] runs)."""
    import re

    from thesis_ner_co_tri_training_spark.functions.bpe import (
        _FOLD, learn_merges_py)
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        learn_bpe_merges)

    texts = ["The theme of the thesis", "and another anthem, then",
             "aaa the and in in in", "Testing THE-theme: 123 123 the",
             None, "", "ALL-CAPS AAA aaa 9999"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["merge_rank"], r["l"], r["r"], r["merged"],
            r["pair_count"])
           for r in learn_bpe_merges(docs, num_merges=6)
           .orderBy("merge_rank").collect()]

    wf = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").translate(_FOLD)):
            if w:
                wf[w] = wf.get(w, 0) + 1
    want = [(i + 1, x, y, x + y, c)
            for i, (x, y, c) in enumerate(learn_merges_py(wf, 6))]
    assert got == want
    assert len(got) == 6


def test_learn_bpe_merges_early_stop_and_empty(spark):
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        learn_bpe_merges)

    # singleton chars only -> no pairs -> empty merge table
    docs = spark.createDataFrame([("a b c d",)], "text string")
    assert learn_bpe_merges(docs, num_merges=4).count() == 0
    # min_count stops the loop before num_merges
    docs = spark.createDataFrame([("aaa",)], "text string")
    got = [(r["l"], r["r"], r["pair_count"])
           for r in learn_bpe_merges(docs, num_merges=4, min_count=2)
           .orderBy("merge_rank").collect()]
    assert got == [("a", "a", 2)]


def test_learned_merges_feed_the_spark_encoder(spark):
    """End-to-end: merges LEARNED distributedly drive the JVM-side
    replace-chain encoder (custom merges path of bpe_count_col) and
    match the pure-Python twin under the same learned table."""
    from pyspark.sql import functions as F

    from thesis_ner_co_tri_training_spark.functions.bpe import (
        bpe_count_col, bpe_token_count)
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        learn_bpe_merges)

    texts = ["the theme then", "in the inn", "and android antics",
             "a1b2 a1b2 zzz the"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    learned = [(r["l"], r["r"])
               for r in learn_bpe_merges(docs, num_merges=5, min_count=1)
               .orderBy("merge_rank").collect()]
    assert learned
    got = [r["n"] for r in docs.select(
        bpe_count_col("text", merges=learned).alias("n")).collect()]
    want = [bpe_token_count(t, learned) for t in texts]
    assert got == want


def test_q82_oracle_early_stop_parity(spark):
    """The q82 DuckDB oracle must stop learning exactly where the
    engine's min_count=2 stop does: its b{k} CTE carries cnt >= 2, and
    an empty b{k} empties every later round — pinned on a corpus where
    the stop triggers at round 3 of 8."""
    import pandas as pd

    import __spark_entry__ as entry
    from thesis_ner_co_tri_training_spark.operators.textstats import (
        learn_bpe_merges)

    texts = ["the aa", "the zz qq", "xy"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["merge_rank"], r["l"], r["r"], r["merged"], r["pair_count"])
           for r in learn_bpe_merges(docs, num_merges=8)
           .orderBy("merge_rank").collect()]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    want = [tuple(row) for row in
            con.execute(entry.oracle_sql()["q82_bpe_learn"]).fetchall()]
    assert got == want
    assert len(got) == 2          # stopped well before num_merges
