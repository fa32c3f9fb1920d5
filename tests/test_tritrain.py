"""A3/C3 role initialization + I2 adaptive loop vs pure-Python oracles."""

import pytest
from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.functions.simfn import cosine_similarity
from thesis_ner_co_tri_training_spark.operators.selection import extend_labeled
from thesis_ner_co_tri_training_spark.operators.tagging import tag_pages_df
from thesis_ner_co_tri_training_spark.operators.tritrain import (
    assign_roles, pairwise_error_rates)
from thesis_ner_co_tri_training_spark.plans.tritrain_loop import tritrain_fit
from thesis_ner_co_tri_training_spark.sources.pages import gen_pages_df

ROWS = [
    # (t1, t2, t3, gold) BIO tag lists; O is projected out before cosine
    (["B-PER", "O"], ["B-PER", "O"], ["O", "O"], ["B-PER", "O"]),
    (["B-GPE", "O"], ["B-GPE", "O"], ["B-GPE", "O"], ["B-ORG", "O"]),
    (["O", "O"], ["B-ORG", "O"], ["B-ORG", "O"], ["B-ORG", "O"]),
    (["B-DATE"], ["B-DATE"], ["B-DATE"], ["B-DATE"]),
    (["B-PER", "B-PER"], ["B-PER"], ["B-ORG"], ["B-PER", "B-PER"]),
    ([], [], ["B-LOC"], []),
]


def oracle_rates(rows, thr=0.9):
    out = {}
    proj = [
        tuple([t for t in tags if t != "O"] for tags in r) for r in rows
    ]
    for (a, b), name in [((0, 1), "12"), ((0, 2), "13"), ((1, 2), "23")]:
        agree = [r for r in proj
                 if cosine_similarity(r[a], r[b]) >= thr]
        wrong = [r for r in agree
                 if cosine_similarity(r[a], r[3]) < thr
                 and cosine_similarity(r[b], r[3]) < thr]
        out[f"n{name}"] = len(agree)
        out[f"e{name}"] = round(len(wrong) / len(agree), 4) if agree else 0.0
    return out


def test_pairwise_error_rates_oracle(spark):
    df = spark.createDataFrame(
        ROWS,
        "t1_tags array<string>, t2_tags array<string>, "
        "t3_tags array<string>, gold_tags array<string>",
    )
    got = pairwise_error_rates(df, cos_threshold=0.9, limit=None)
    assert got == oracle_rates(ROWS)


def test_assign_roles_first_match_tie_break(spark):
    assert assign_roles({"e12": 0.1, "e13": 0.3, "e23": 0.2}) == (1, 2, 3)
    assert assign_roles({"e12": 0.5, "e13": 0.2, "e23": 0.2}) == (1, 3, 2)
    # tie across all -> reference picks (mi, mj) i.e. views 1,2
    assert assign_roles({"e12": 0.0, "e13": 0.0, "e23": 0.0}) == (1, 2, 3)


def test_tritrain_loop_thresholds_and_resume(spark, tmp_path):
    wh = str(tmp_path / "tri_wh")
    pages = gen_pages_df(spark, 20, partitions=2)
    views = tag_pages_df(pages.drop("text"))

    ext, lineage = tritrain_fit(
        spark, views, wh, u=50, tcfd=0.7, scfd=0.3, r_t=0.1, r_s=0.1,
    )
    # threshold schedule: (0.7,0.3) (0.6,0.4) (0.5,0.5) then 0.4<0.6 stops
    assert [ln["params"]["tcfd"] for ln in lineage][:3] == [0.7, 0.6, 0.5]
    assert [ln["params"]["scfd"] for ln in lineage][:3] == [0.3, 0.4, 0.5]
    assert len(lineage) <= 3
    n1 = ext.count()
    rows1 = sorted(map(tuple, ext.select("url", "sent_id", "iteration").collect()))

    # resume: identical outputs, all iterations skipped
    ext2, lineage2 = tritrain_fit(
        spark, views, wh, u=50, tcfd=0.7, scfd=0.3, r_t=0.1, r_s=0.1,
    )
    assert all(ln.get("resumed") for ln in lineage2)
    rows2 = sorted(map(tuple, ext2.select("url", "sent_id", "iteration").collect()))
    assert rows1 == rows2 and ext2.count() == n1

    # a stricter iteration can only shrink the pick set per pool; sanity:
    # every picked sentence belongs to exactly one iteration (pools disjoint)
    per_sent = (
        ext.groupBy("url", "sent_id").agg(F.countDistinct("iteration").alias("k"))
    )
    assert per_sent.filter(F.col("k") > 1).count() == 0


def test_extend_labeled_anti_join(spark):
    labeled = spark.createDataFrame(
        [(1, "a"), (2, "b")], "sent_id long, text string")
    ext = spark.createDataFrame(
        [(2, "b"), (3, "c")], "sent_id long, text string")
    got = sorted(map(tuple, extend_labeled(labeled, ext, ["sent_id"]).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_tritrain_resume_rejects_mismatched_params(spark, tmp_path):
    """Resume must not silently mix threshold schedules: a warehouse
    written under one (tcfd, scfd, u, seed) refuses to resume under
    different loop arguments."""
    import pytest

    wh = str(tmp_path / "tri_wh_mismatch")
    pages = gen_pages_df(spark, 10, partitions=2)
    views = tag_pages_df(pages.drop("text"))
    tritrain_fit(spark, views, wh, u=50, tcfd=0.7, scfd=0.3,
                 r_t=0.1, r_s=0.1)
    with pytest.raises(ValueError, match="params"):
        tritrain_fit(spark, views, wh, u=50, tcfd=0.9, scfd=0.3,
                     r_t=0.1, r_s=0.1)
    with pytest.raises(ValueError, match="params"):
        tritrain_fit(spark, views, wh, u=25, tcfd=0.7, scfd=0.3,
                     r_t=0.1, r_s=0.1)
    # resume=False recomputes without complaint
    ext, lineage = tritrain_fit(spark, views, wh, u=25, tcfd=0.7,
                                scfd=0.3, r_t=0.1, r_s=0.1, resume=False)
    assert lineage and not any(ln.get("resumed") for ln in lineage)
