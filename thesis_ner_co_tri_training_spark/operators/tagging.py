"""Three deterministic tagger views (the reference's model candidates).

Replaces BERT inference (predict.py:79-115) with model-free deterministic
taggers, per SURVEY.md §7 — the engine's contract is the selection algebra,
not weights. Views genuinely disagree (bootstrap-subsampled gazetteers,
seeds 1/2/3 — utils.py:116-134 analog), so the tri-training vote has work
to do.

Execution: ONE mapInPandas pass over sentences emits all three views'
predictions (SURVEY §2.3 J2 "preferred" form — no join needed between
views). View resources are built once per executor (module-level cache),
mirroring the reference loading models once per process
(tri_train.py:34-36). Arrow-batched; no per-row Python in the Spark plan
beyond this single vectorized stage.

Each view's per-token output is {'word','tag','confidence'} exactly as
predict.py:114; tokenization is whitespace over punctuation-stripped text
(predict.py:81).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import strip_punct, tokenize
from ..sources import corpus
from ..sources.corpus import CONTEXT_CUES, ORG_SUFFIX, _stable_conf

PRED_FIELDS = "array<struct<word:string,tag:string,confidence:double>>"
SENT_VIEWS_SCHEMA = (
    "url string, sent_id bigint, tokens array<string>, "
    f"v1_preds {PRED_FIELDS}, v2_preds {PRED_FIELDS}, v3_preds {PRED_FIELDS}, "
    "t1_cfd double, t2_cfd double, t3_cfd double, "
    "cos12 double, cos23 double, cos13 double"
)

_RESOURCES: list[dict] | None = None
_ORG_SUFFIX_SET = set(ORG_SUFFIX)
_FILLER_SET = set(corpus.FILLER) | {"müde", "für", "größe", "straße"}


def _resources() -> list[dict]:
    global _RESOURCES
    if _RESOURCES is None:
        _RESOURCES = corpus.view_gazetteers()
    return _RESOURCES


def _o_conf(word: str) -> float:
    return _stable_conf(f"o|{word}", 0.05, 0.45)


def _gaz_match(tokens: list[str], gaz: dict, out: list[dict | None]) -> None:
    """Greedy longest-match (3..1 tokens) gazetteer scan, BIO emission."""
    i, n = 0, len(tokens)
    while i < n:
        if out[i] is not None:
            i += 1
            continue
        hit = None
        for span in (3, 2, 1):
            if i + span <= n and all(out[j] is None for j in range(i, i + span)):
                surf = " ".join(t.lower() for t in tokens[i:i + span])
                if surf in gaz:
                    hit = (span, *gaz[surf])
                    break
        if hit:
            span, tag, conf = hit
            out[i] = {"word": tokens[i], "tag": f"B-{tag}", "confidence": conf}
            for j in range(i + 1, i + span):
                out[j] = {"word": tokens[j], "tag": f"I-{tag}", "confidence": conf}
            i += span
        else:
            i += 1


def tag_sentence(text: str, view_id: int) -> list[dict]:
    """Pure per-sentence tagger for one view — shared by engine and oracle.

    view 1: gazetteer only.
    view 2: gazetteer subset 2 + pattern rules (4-digit year -> DATE,
            digits -> CARDINAL, org suffix -> ORG).
    view 3: gazetteer subset 3 + context cues (previous token).
    """
    norm = strip_punct(text)
    tokens = tokenize(norm)
    out: list[dict | None] = [None] * len(tokens)
    gaz = _resources()[view_id - 1]
    _gaz_match(tokens, gaz, out)

    if view_id == 2:
        for i, tok in enumerate(tokens):
            if out[i] is not None:
                continue
            low = tok.lower()
            if low.isdigit() and len(low) == 4 and 1900 <= int(low) <= 2099:
                out[i] = {"word": tok, "tag": "B-DATE",
                          "confidence": _stable_conf(f"v2|date|{low}")}
            elif low.isdigit():
                out[i] = {"word": tok, "tag": "B-CARDINAL",
                          "confidence": _stable_conf(f"v2|card|{low}")}
            elif low in _ORG_SUFFIX_SET:
                out[i] = {"word": tok, "tag": "B-ORG",
                          "confidence": _stable_conf(f"v2|org|{low}")}
    elif view_id == 3:
        for i, tok in enumerate(tokens):
            if out[i] is not None or i == 0:
                continue
            prev = tokens[i - 1].lower()
            low = tok.lower()
            cue_tag = CONTEXT_CUES.get(prev)
            if cue_tag and low not in _FILLER_SET and not low.isdigit():
                out[i] = {"word": tok, "tag": f"B-{cue_tag}",
                          "confidence": _stable_conf(f"v3|ctx|{prev}|{low}")}

    for i, tok in enumerate(tokens):
        if out[i] is None:
            out[i] = {"word": tok, "tag": "O", "confidence": _o_conf(tok.lower())}
    return out  # type: ignore[return-value]


def tag_all_views(text: str) -> tuple[list[str], list[dict], list[dict], list[dict]]:
    tokens = tokenize(strip_punct(text))
    return (tokens, tag_sentence(text, 1), tag_sentence(text, 2), tag_sentence(text, 3))


def tag_sentences_df(sentences: DataFrame) -> DataFrame:
    """(url, sent_id, text) -> (url, sent_id, tokens, v1/v2/v3_preds).

    Single Arrow-vectorized stage; preserves size(tokens) == size(preds)
    per view (the reference's predict.py:113 invariant).
    """

    from ..functions.simfn import avg_confident_score, cosine_similarity

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _resources()  # build once per worker
        for pdf in batches:
            toks, v1, v2, v3 = [], [], [], []
            cfds: list[list[float]] = [[], [], []]
            coses: list[list[float]] = [[], [], []]
            for text in pdf["text"]:
                t, a, b, c = tag_all_views(text)
                toks.append(t)
                v1.append(a)
                v2.append(b)
                v3.append(c)
                # Precompute the vote's hot scalars with the SAME shared
                # functions the oracle uses (utils.py:51-88 semantics) —
                # the SQL fallback in vote_mentions computes identical
                # values, ~10x slower (interpreted higher-order exprs).
                for i, preds in enumerate((a, b, c)):
                    cfds[i].append(avg_confident_score(preds, ignore_o=True))
                ta = [p["tag"] for p in a]
                tb = [p["tag"] for p in b]
                tc = [p["tag"] for p in c]
                coses[0].append(cosine_similarity(ta, tb))
                coses[1].append(cosine_similarity(tb, tc))
                coses[2].append(cosine_similarity(ta, tc))
            yield pd.DataFrame({
                "url": pdf["url"], "sent_id": pdf["sent_id"], "tokens": toks,
                "v1_preds": v1, "v2_preds": v2, "v3_preds": v3,
                "t1_cfd": cfds[0], "t2_cfd": cfds[1], "t3_cfd": cfds[2],
                "cos12": coses[0], "cos23": coses[1], "cos13": coses[2],
            })

    return sentences.select("url", "sent_id", "text").mapInPandas(run, SENT_VIEWS_SCHEMA)


def explode_sentences(pages: DataFrame) -> DataFrame:
    """pages -> (url, sent_id, text) via extract/split (S1/S2 analogs).

    Uses the `text` column when present (already-extracted corpora);
    otherwise runs the byte-identical extractor over `html`.
    """
    from ..functions.textnorm import extract_text_udf, split_sentences_udf

    src = pages
    if "text" not in pages.columns:
        src = pages.withColumn("text", extract_text_udf(F.col("html")))
    sents = src.select(
        "url", F.posexplode(split_sentences_udf(F.col("text"))).alias("sent_id", "text")
    )
    return sents
