"""Entity linking / canonicalization vs pure-Python oracles.

connected_components is checked against union-find; canonicalize_entities
against union-find over the engine's OWN verified pair set (so the test
pins CC + singleton handling + alias/count aggregation without depending
on probabilistic LSH recall), plus guaranteed-recall cases: surfaces
identical after lowercasing have identical shingle sets, hence identical
minhash signatures and a guaranteed shared bucket (collision prob 1.0).
"""

import pytest
from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.operators.linking import (
    canonicalize_entities,
    connected_components,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signature,
    surface_shingles,
    surface_to_entity,
)


def union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_chain_and_island(spark):
    # chain needs 7 propagation rounds (> checkpoint cadence of 5)
    chain = [(f"s{i}", f"s{i+1}") for i in range(1, 8)]
    edges = chain + [("x1", "x2")]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    nodes = {n for e in edges for n in e}
    want = union_find(nodes, edges)
    assert got == want
    assert got["s7"] == "s1" and got["x2"] == "x1"


def test_star_cc_long_path_logarithmic(spark):
    """200-node path: star contraction closes it in <= 10 rounds
    (O(log n)); one-hop hash-min provably cannot (O(diameter)) — which is
    why star is the default for chain-shaped alias graphs."""
    names = [f"n{i:03d}" for i in range(200)]
    edges = list(zip(names, names[1:]))
    df = spark.createDataFrame(edges, "a string, b string")
    want = union_find(set(names), edges)
    got = {r["node"]: r["comp"]
           for r in connected_components(df, max_iter=10).collect()}
    assert got == want
    assert got[names[-1]] == names[0]
    hm = {r["node"]: r["comp"]
          for r in connected_components(df, max_iter=10,
                                        algorithm="hashmin").collect()}
    assert hm != want


SURFACES = [
    ("Angela Merkel", 3),
    ("angela merkel", 2),     # same shingles after lower -> guaranteed merge
    ("ANGELA MERKEL", 1),
    ("Berlin", 2),
    ("berlin", 1),
    ("Siemens AG", 4),
    ("Deutsche Bahn", 1),
]


@pytest.fixture(scope="module")
def mentions(spark):
    rows = [(s,) for s, n in SURFACES for _ in range(n)]
    return spark.createDataFrame(rows, "surface string")


def test_canonicalize_matches_union_find_over_verified_pairs(spark, mentions):
    shingled = surface_shingles(mentions)
    sigs = minhash_signature(shingled)
    verified = jaccard_verify(lsh_candidate_pairs(sigs), shingled, 0.6)
    edges = [(r["a"], r["b"]) for r in verified.collect()]
    nodes = {s for s, _ in SURFACES}
    want_map = union_find(nodes, edges)

    ents = canonicalize_entities(mentions).collect()
    got_map = {a: r["canonical"] for r in ents for a in r["aliases"]}
    assert got_map == want_map

    # guaranteed merges (identical lowercased shingles) and non-merges
    assert got_map["Angela Merkel"] == got_map["angela merkel"] == got_map["ANGELA MERKEL"]
    assert got_map["Berlin"] == got_map["berlin"]
    assert got_map["Berlin"] != got_map["Angela Merkel"]
    assert got_map["Siemens AG"] != got_map["Deutsche Bahn"]

    # n_mentions reconcile and entity_id deterministic
    by_canon = {r["canonical"]: r for r in ents}
    for canon, r in by_canon.items():
        assert r["n_mentions"] == sum(n for s, n in SURFACES
                                      if want_map[s] == canon)
    total = sum(r["n_mentions"] for r in ents)
    assert total == sum(n for _, n in SURFACES)


def test_surface_to_entity_covers_all_mentions(spark, mentions):
    ents = canonicalize_entities(mentions)
    linked = surface_to_entity(mentions, ents)
    assert linked.filter(F.col("entity_id").isNull()).count() == 0
    assert linked.count() == mentions.count()


def test_lsh_candidate_pairs_rejects_short_signature(spark):
    """bands*rows_per_band beyond the signature length fails fast at
    the driver instead of an opaque mid-stage INVALID_ARRAY_INDEX."""
    import pytest

    from thesis_ner_co_tri_training_spark.operators.linking import (
        lsh_candidate_pairs, minhash_signature, surface_shingles)

    surfaces = spark.createDataFrame(
        [("Alpha",), ("Beta",)], "surface string")
    sig = minhash_signature(surface_shingles(surfaces), num_hashes=16)
    with pytest.raises(ValueError, match="signature length"):
        lsh_candidate_pairs(sig, bands=8, rows_per_band=4)
