"""Co-training selection plan vs a pure-Python oracle of the reference
semantics (co_training.py:67-292), downstream of the shared shuffle."""

import random

from thesis_ner_co_tri_training_spark.functions.simfn import (
    avg_confident_score, cosine_similarity, rename_tags)
from thesis_ner_co_tri_training_spark.operators.selection import (
    shuffled_with_position)
from thesis_ner_co_tri_training_spark.plans.cotrain import cotrain_select

N, U, K, TOP_N, THR, SEED = 120, 10, 8, 3, 0.5, 42
# view A tags ISW-style, view B OntoNotes-style: after the F5 rename the
# same index sequence agrees (the real co-training vocabulary setup);
# per-view noise comes from an occasional index shift.
TAGS_A = ["O", "B-PER", "B-GPE", "B-MON", "I-PER"]
TAGS_B = ["O", "B-PERSON", "B-GPE", "B-MONEY", "I-PERSON"]


def _preds(sent_id, salt):
    rng = random.Random(sent_id * 7919 + salt)
    seq = random.Random(sent_id)  # tag indices shared across views
    vocab = TAGS_A if salt == 1 else TAGS_B
    n = 3 + seq.randrange(5)
    out = []
    for i in range(n):
        idx = seq.randrange(len(vocab))
        if rng.random() < 0.15:  # per-view disagreement noise
            idx = (idx + 1) % len(vocab)
        out.append({"word": f"w{i}", "tag": vocab[idx],
                    "confidence": round(rng.uniform(0.1, 0.99), 4)})
    return out


def oracle(positions):
    """positions: sent_id -> pos from the engine's shared shuffle."""
    by_pool = {}
    for sid, pos in positions.items():
        pool = (pos - 1) // U
        if pool < K:
            by_pool.setdefault(pool, []).append((pos, sid))
    ext = []
    for pool, members in by_pool.items():
        members.sort()  # shuffle order == stable sort base

        def pick(salt):
            scored = [
                (sid, _preds(sid, salt),
                 avg_confident_score(_preds(sid, salt)))
                for _, sid in members
            ]
            # stable sort desc by score, stable on shuffle order
            scored.sort(key=lambda t: -t[2])
            return scored[:TOP_N]

        sel_a = {sid: (p, s) for sid, p, s in pick(1)}
        sel_b = {sid: (p, s) for sid, p, s in pick(2)}
        for sid in set(sel_a) & set(sel_b):
            a_tags = [d["tag"] for d in sel_a[sid][0] if d["tag"] != "O"]
            b_tags = [rename_tags(d["tag"]) for d in sel_b[sid][0]
                      if d["tag"] != "O"]
            cos = cosine_similarity(a_tags, b_tags)
            if cos > THR:
                ext.append((sid, pool, sel_a[sid][1], sel_b[sid][1], cos))
    return sorted(ext)


def test_cotrain_select_matches_oracle(spark):
    unlabeled = spark.createDataFrame(
        [(i, f"text {i}") for i in range(N)], "sent_id long, text string")
    pa = spark.createDataFrame(
        [(i, _preds(i, 1)) for i in range(N)],
        "sent_id long, preds array<struct<word:string,tag:string,confidence:double>>")
    pb = spark.createDataFrame(
        [(i, _preds(i, 2)) for i in range(N)],
        "sent_id long, preds array<struct<word:string,tag:string,confidence:double>>")

    ext = cotrain_select(unlabeled, pa, pb, u=U, k=K, top_n=TOP_N,
                         cos_threshold=THR, seed=SEED)
    got = sorted(
        (r["sent_id"], r["pool_id"], r["avg_cfd"], r["avg_cfd_b"], r["cos_score"])
        for r in ext.collect()
    )

    positions = {
        r["sent_id"]: r["pos"]
        for r in shuffled_with_position(unlabeled, seed=SEED).collect()
    }
    assert got == oracle(positions)
    assert got, "fixture selected nothing — tune thresholds"
