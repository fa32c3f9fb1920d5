"""S9 — serving-parity shim (the reference's Flask predict API, api.py:44-60).

The reference serves POST /predict {sentence} -> [{word, tag, confidence}]
by running one model on one sentence. The engine equivalent keeps the
response contract but answers from the engine's primitives:

  predict()        one view's record-shape tagging (api.py parity)
  predict_voted()  tri-view agreement-voted mentions for the sentence —
                   what a production endpoint should actually serve

Both are driver-side conveniences over the same shared pure functions the
distributed plan uses, so serving and batch can never drift. For real
QPS-scale serving you'd front the materialized `mentions` table
(spark.sql point lookups), not per-request tagging — noted in SURVEY §2.1.
"""

from __future__ import annotations

from typing import Any

from .functions.textnorm import split_sentences, strip_punct, tokenize
from .operators.tagging import tag_all_views_flat, tag_sentence


def predict(sentence: str, view_id: int = 1) -> list[dict[str, Any]]:
    """api.py response shape: [{'word','tag','confidence'}] (predict.py:114)."""
    return tag_sentence(sentence, view_id)


def predict_voted(
    sentence: str,
    cos_threshold: float = 0.7,
    tcfd_threshold: float = 0.7,
    scfd_threshold: float = 0.6,
) -> dict[str, Any]:
    """Tri-view voted answer for one sentence (reference algebra, C1/C2).

    Returns {'tokens', 'tags', 'confidences', 'selection_rule'};
    selection_rule is None when no rotation passes and views disagree
    (the sentence would be filtered in batch).
    """
    from .functions.simfn import avg_confident_score_flat, cosine_similarity

    tokens, views = tag_all_views_flat(sentence)
    tags = [v[0] for v in views]
    confs = [v[1] for v in views]
    cfd = [avg_confident_score_flat(t, c) for t, c in views]
    cos = {
        (0, 1): cosine_similarity(tags[0], tags[1]),
        (1, 2): cosine_similarity(tags[1], tags[2]),
        (0, 2): cosine_similarity(tags[0], tags[2]),
    }
    rotations = [((0, 1), 2, "rot_12_3"), ((1, 2), 0, "rot_23_1"),
                 ((0, 2), 1, "rot_13_2")]
    for (a, b), s, rule in rotations:
        if (cos[(a, b)] > cos_threshold
                and min(cfd[a], cfd[b]) > tcfd_threshold
                and cfd[s] < scfd_threshold):
            if tags[a] == tags[b] or cfd[a] > cfd[b]:
                pick = a
            else:
                pick = b
            return {"tokens": tokens, "tags": tags[pick],
                    "confidences": confs[pick], "selection_rule": rule}
    if tags[0] == tags[1] == tags[2]:
        return {"tokens": tokens, "tags": tags[0],
                "confidences": confs[0], "selection_rule": "unanimous"}
    return {"tokens": tokens, "tags": None, "confidences": None,
            "selection_rule": None}
