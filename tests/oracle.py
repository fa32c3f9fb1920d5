"""Pure-Python oracle: the reference's selection algebra over collected rows.

Runs the SAME shared tagger/normalization functions the engine uses, but
with plain Python loops implementing the algebra exactly as the reference
does (tri_train.py:44-60, 148, 213-219; utils.py:51-88). The e2e test
asserts the Spark engine reproduces this at P/R >= 0.95 (it should be 1.0
— any gap is an engine bug, not noise).
"""

from __future__ import annotations

from thesis_ner_co_tri_training_spark.functions.simfn import (
    avg_confident_score,
    cosine_similarity,
)
from thesis_ner_co_tri_training_spark.functions.textnorm import split_sentences
from thesis_ner_co_tri_training_spark.operators.tagging import tag_all_views
from thesis_ner_co_tri_training_spark.sources.corpus import CUES
from thesis_ner_co_tri_training_spark.sources.pages import gen_page

ROTATIONS = [(1, 2, 3), (2, 3, 1), (1, 3, 2)]  # tri_train.py:148


def bio_spans(tags: list[str], confs: list[float]) -> list[tuple[int, int, str, float]]:
    """Same lenient BIO fold as operators.mentions.spans_expr."""
    spans = []
    beg, tag, csum, n = -1, "", 0.0, 0

    def close():
        nonlocal beg, tag, csum, n
        if n > 0:
            spans.append((beg, beg + n, tag, round(csum / n, 4)))
        beg, tag, csum, n = -1, "", 0.0, 0

    for i, (t, c) in enumerate(zip(tags, confs)):
        if t == "O":
            close()
        elif t.startswith("I-") and n > 0 and t[2:] == tag:
            csum += c
            n += 1
        else:
            close()
            beg, tag, csum, n = i, t[2:], c, 1
    close()
    return spans


def vote_sentence(v1, v2, v3, cos_thr=0.7, tcfd=0.7, scfd=0.6):
    """Returns (tags, confs, rule) or None if filtered out."""
    views = {1: v1, 2: v2, 3: v3}
    tags = {k: [p["tag"] for p in v] for k, v in views.items()}
    confs = {k: [p["confidence"] for p in v] for k, v in views.items()}
    cfd = {k: avg_confident_score(v, ignore_o=True) for k, v in views.items()}

    for (a, b, s) in ROTATIONS:
        cos = cosine_similarity(tags[a], tags[b])
        if cos > cos_thr and min(cfd[a], cfd[b]) > tcfd and cfd[s] < scfd:
            if tags[a] == tags[b]:
                return tags[a], confs[a], f"rot_{a}{b}_{s}"
            elif cfd[a] > cfd[b]:
                return tags[a], confs[a], f"rot_{a}{b}_{s}"
            else:
                return tags[b], confs[b], f"rot_{a}{b}_{s}"
    if tags[1] == tags[2] == tags[3]:
        return tags[1], confs[1], "unanimous"
    return None


def oracle_run(page_ids, cos_thr=0.7, tcfd=0.7, scfd=0.6):
    """-> (mentions rows, triples rows) matching the engine's table shapes."""
    mentions, triples = [], []
    cue_set = set(CUES)
    for pid in page_ids:
        page = gen_page(pid)
        for sent_id, sent in enumerate(split_sentences(page["text"])):
            tokens, v1, v2, v3 = tag_all_views(sent)
            voted = vote_sentence(v1, v2, v3, cos_thr, tcfd, scfd)
            if voted is None:
                continue
            tags, confs, rule = voted
            spans = bio_spans(tags, confs)
            for (beg, end, tag, conf) in spans:
                surface = " ".join(tokens[beg:end])
                mentions.append((page["url"], sent_id, beg, end, surface, tag, conf))
            for i in range(len(spans)):
                for j in range(i + 1, len(spans)):
                    b1, e1, t1, c1 = spans[i]
                    b2, e2, t2, c2 = spans[j]
                    gap = tokens[e1:b2]
                    hits = [t for t in gap if t.lower() in cue_set]
                    if hits:
                        triples.append((
                            " ".join(tokens[b1:e1]),
                            hits[0].lower(),
                            " ".join(tokens[b2:e2]),
                            page["url"], sent_id,
                            round(min(c1, c2), 4),
                        ))
    return mentions, triples
