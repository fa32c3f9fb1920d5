"""Value-level local oracles for the two xxhash64-based contract queries.

The driver's DuckDB check is rows-only for q19/q20 (DuckDB has no
xxhash64); these tests close that blind spot: a pure-Python XXH64
(tests/xxh64.py) recomputes minhash signatures, band buckets, candidate
pairs, and simhash bits from the raw parquet text, and the Spark results
must match VALUE-exactly at sf0.001 and sf0.01.
"""

import duckdb
import pytest

from tests.xxh64 import Int32, xxhash64
from thesis_ner_co_tri_training_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _docs(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _norm_tokens(text):
    import re
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_xxh64_matches_spark(spark):
    """Pin the pure-Python XXH64 against Spark's expression on every
    argument-type path the oracles use (str, long, int literal, chains)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hello world", 7), ("", -3), ("ümlaut ß", 2**40),
         ("a" * 100, -(2**62))], "s string, l long")
    got = df.select(
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", F.lit(3)).alias("hsi"),
        F.xxhash64(F.lit(5), "l", "s").alias("chain"),
    ).collect()
    for r, (s, l) in zip(got, [("hello world", 7), ("", -3),
                               ("ümlaut ß", 2**40), ("a" * 100, -(2**62))]):
        assert r["hs"] == xxhash64(s)
        assert r["hl"] == xxhash64(l)
        assert r["hsi"] == xxhash64(s, Int32(3))
        assert r["chain"] == xxhash64(Int32(5), l, s)


def _oracle_minhash_pairs(docs, n=3, num_hashes=32, bands=8, max_bucket=64):
    rows_per_band = num_hashes // bands
    sigs = {}
    for doc_id, text in docs:
        toks = _norm_tokens(text)
        shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        if not shingles:
            continue
        sigs[doc_id] = [
            min(xxhash64(s, Int32(i)) for s in shingles)
            for i in range(num_hashes)
        ]
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = (b, xxhash64(Int32(b),
                               *sig[b * rows_per_band:(b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _oracle_simhash(docs, bits=64):
    out = {}
    for doc_id, text in docs:
        votes = [0] * bits
        for t in _norm_tokens(text):
            h = xxhash64(t) & ((1 << 64) - 1)
            for i in range(bits):
                votes[i] += 1 if (h >> i) & 1 else -1
        sim = sum(1 << i for i in range(bits) if votes[i] > 0)
        out[doc_id] = sim - (1 << 64) if sim >= (1 << 63) else sim
    return out


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_minhash_pairs_value_oracle(spark, sf_dir):
    docs = _docs(sf_dir)
    want = _oracle_minhash_pairs(docs)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(df).collect()}
    assert got == want


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_simhash_value_oracle(spark, sf_dir):
    docs = _docs(sf_dir)
    want = _oracle_simhash(docs)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert got == want


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01"])
def test_hamming_pairs_value_oracle(spark, sf_dir):
    """hamming_pairs' quarter-blocking is LOSSLESS at max_distance <= 3
    (pigeonhole over four 16-bit quarters), so a brute-force python pass
    over the oracle simhashes is the exact expected pair set."""
    from thesis_ner_co_tri_training_spark.operators.dedup import hamming_pairs

    docs = _docs(sf_dir)
    sims = _oracle_simhash(docs)
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(a, b)] = d
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in hamming_pairs(simhash(df)).collect()}
    assert got == want
