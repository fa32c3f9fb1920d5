"""Graph analytics vs pure-Python power-iteration oracle."""

import pytest

from thesis_ner_co_tri_training_spark.plans.graph import degree_stats, pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d has no in-edges
    ("c", "e"),            # e is dangling (no out-edges)
]


def oracle_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        in_sum = {v: 0.0 for v in nodes}
        for s, t in edges:
            in_sum[t] += rank[s] / out[s]
        dangling = sum(rank[v] for v in nodes if v not in out)
        base = (1 - d) / n + d * dangling / n
        rank = {v: base + d * in_sum[v] for v in nodes}
    return rank


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "subj_id string, obj_id string")


def test_degree_stats(spark, edges_df):
    got = {r["node"]: (r["out_deg"], r["in_deg"], r["degree"])
           for r in degree_stats(edges_df).collect()}
    assert got == {
        "a": (2, 1, 3), "b": (1, 1, 2), "c": (2, 3, 5),
        "d": (1, 0, 1), "e": (0, 1, 1),
    }


def test_pagerank_matches_power_iteration(spark, edges_df):
    got = {r["node"]: r["rank"] for r in pagerank(edges_df, iterations=10).collect()}
    want = oracle_pagerank(EDGES, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # c is the hub
    assert max(got, key=got.get) == "c"
