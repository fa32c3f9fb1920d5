"""Scalar functions of the selection algebra, JVM-side.

Pure-Python oracles (used by tests) and Spark Column builders for:

  - bag-of-tags cosine similarity  (reference utils.py:51-70):
    Counter both tag lists, cosine of the count vectors, zero denominator
    -> 0, round 4.
  - average confidence ignoring 'O' (utils.py:72-88): empty -> 0, round 4.
  - OntoNotes -> ISW tag rename    (co_training.py:203-217): ordered regex
    alternation; chain order preserved (PERSON before PERCENT).

The Spark builders are pure built-in expressions (higher-order array
functions) — no Python in the hot path.
"""

from __future__ import annotations


from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered exactly as the reference dict (co_training.py:205-214). Alternation
# is leftmost-alternative-first in Python re. NOTE: a sequential replace
# chain is NOT equivalent in general (PERSON->PER can re-form PERCENT for a
# later rule to consume — see rename_tags_col); both the oracle and the
# engine implement the reference's single-pass alternation. Sequential
# chains are only safe on whole-tag values (the q07 oracle's domain).
TAG_RENAME = [
    ("EVENT", "EVT"),
    ("LANGUAGE", "LAN"),
    ("MONEY", "MON"),
    ("NORP", "NRP"),
    ("PERSON", "PER"),
    ("PERCENT", "PERC"),
    ("QUANTITY", "QUAN"),
    ("WORK_OF_ART", "ART"),
]


# ----------------------------- pure-Python oracles -----------------------

def tag_counts_py(tags: list[str]) -> dict[str, int]:
    """Bag-of-tags count dict (the Counter() of reference utils.py:55)."""
    vals: dict[str, int] = {}
    for t in tags:
        vals[t] = vals.get(t, 0) + 1
    return vals


def cosine_from_counts(a_vals: dict[str, int], b_vals: dict[str, int]) -> float:
    """Cosine of two bag-of-tags count dicts — the arithmetic half of
    cosine_similarity(). Split out so the fused tri-view tagging worker
    can build each view's count dict ONCE and reuse it across the three
    pairwise cosines (halves the dict churn of the hottest worker loop —
    allocation rate is what caps 8->32 scaling on one memory system);
    cosine_similarity() composes the same two halves, so oracle and
    engine still share one code path."""
    na = 0
    for v in a_vals.values():
        na += v * v
    nb = 0
    for v in b_vals.values():
        nb += v * v
    small, big = (a_vals, b_vals) if len(a_vals) <= len(b_vals) else (b_vals, a_vals)
    dot = 0
    for t, v in small.items():
        w = big.get(t)
        if w:
            dot += v * w
    len_a = na ** 0.5
    len_b = nb ** 0.5
    try:
        cos = dot / (len_a * len_b)
    except ZeroDivisionError:
        cos = 0
    return round(cos, 4)


def cosine_similarity(a_tags: list[str], b_tags: list[str]) -> float:
    """Reference utils.py:51-70 verbatim semantics.

    Implementation is a plain-dict rewrite of the reference's
    Counter/set-union/zip form — RESULT-identical (not line-identical):
    every intermediate (counts, dot, squared norms) is a small-int sum,
    so the only float operations are the same `sqrt * sqrt` divisor and
    division the reference performs on identical integer operands —
    bit-identical output, ~3x faster in the fused tagging worker where
    this runs three times per sentence.
    """
    return cosine_from_counts(tag_counts_py(a_tags), tag_counts_py(b_tags))


def avg_confident_score(preds: list[dict], ignore_o: bool = True) -> float:
    """Reference utils.py:72-88 verbatim semantics."""
    if ignore_o:
        scores = [d["confidence"] for d in preds if d["tag"] != "O"]
    else:
        scores = [d["confidence"] for d in preds]
    try:
        avg = sum(scores) / len(scores)
    except ZeroDivisionError:
        avg = 0
    return round(avg, 4)


def avg_confident_score_flat(tags: list[str], confs: list[float],
                             ignore_o: bool = True) -> float:
    """avg_confident_score over parallel (tags, confs) arrays — identical
    arithmetic (left-to-right float sum from 0, then sum/len and one
    round-4; 0.0+x == x exactly so the accumulator form is bit-identical
    to sum(list)), without materializing the intermediate score list
    (hot-worker allocation cut)."""
    s = 0.0
    n = 0
    if ignore_o:
        for t, c in zip(tags, confs):
            if t != "O":
                s += c
                n += 1
    else:
        for c in confs:
            s += c
        n = len(confs)
    if n == 0:
        return 0
    return round(s / n, 4)


def rename_tags(text: str) -> str:
    """Oracle for the ordered rename chain."""
    import re

    regex = re.compile("(%s)" % "|".join(re.escape(k) for k, _ in TAG_RENAME))
    table = dict(TAG_RENAME)
    return regex.sub(lambda mo: table[mo.group(0)], text)


# ----------------------------- Spark Column builders ---------------------

def non_o(tags: Column | str) -> Column:
    """P2: project away 'O' tags (utils.py:79-80)."""
    return F.filter(tags, lambda t: t != F.lit("O"))


def tag_counts(tags: Column | str) -> Column:
    """A2: bag-of-tags count map (per-row, no shuffle)."""
    col = F.col(tags) if isinstance(tags, str) else tags
    ks = F.array_distinct(col)
    return F.map_from_arrays(
        ks, F.transform(ks, lambda t: F.size(F.filter(col, lambda x: x == t)))
    )


def cosine_tags(a_tags: Column | str, b_tags: Column | str) -> Column:
    """F6: bag-of-tags cosine as a single JVM-side expression.

    Count-and-multiply over distinct keys (no map churn): for short tag
    lists (sentence length) this is O(D*L) with plain array scans.
    0/0 -> 0; round 4 — bit-identical to cosine_similarity() (all
    arithmetic exact integers until the final division).
    """
    a = F.col(a_tags) if isinstance(a_tags, str) else a_tags
    b = F.col(b_tags) if isinstance(b_tags, str) else b_tags
    cnt = lambda arr, t: F.size(F.filter(arr, lambda x: x == t))
    dot = F.aggregate(
        F.array_distinct(a),
        F.lit(0).cast("long"),
        lambda acc, t: acc + (cnt(a, t) * cnt(b, t)).cast("long"),
    )
    def _n2(arr: Column) -> Column:
        return F.aggregate(
            F.array_distinct(arr),
            F.lit(0).cast("long"),
            lambda acc, t: acc + (cnt(arr, t) * cnt(arr, t)).cast("long"),
        )
    na2, nb2 = _n2(a), _n2(b)
    return F.when(
        (na2 == 0) | (nb2 == 0), F.lit(0.0)
    ).otherwise(F.bround(dot / (F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double"))), 4))


def avg_cfd(preds: Column | str, ignore_o: bool = True) -> Column:
    """A1: avg confidence over array<struct<word,tag,confidence>>.

    ignore-O, empty -> 0.0, round 4 (utils.py:72-88). Single-pass fold.
    """
    col = F.col(preds) if isinstance(preds, str) else preds
    zero = F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("n"))
    keep = (lambda p: p["tag"] != F.lit("O")) if ignore_o else (lambda p: F.lit(True))
    acc = F.aggregate(
        col,
        zero,
        lambda a, p: F.when(
            keep(p),
            F.struct((a["s"] + p["confidence"]).alias("s"), (a["n"] + 1).alias("n")),
        ).otherwise(a),
    )
    return F.when(acc["n"] == 0, F.lit(0.0)).otherwise(F.bround(acc["s"] / acc["n"], 4))


def rename_tags_col(col: Column | str) -> Column:
    """F5: SINGLE-PASS alternation rename (co_training.py:205-217 builds
    one `(EVENT|LANGUAGE|...)` regex and maps each match through the
    dict — matched spans are consumed, never rescanned).

    A naive sequential regexp_replace chain is NOT equivalent: on
    'PERSONCENT' the chain's PERSON->PER output re-forms 'PERCENT'
    which the later PERCENT rule rewrites to 'PERC', while the
    reference's single pass yields 'PERCENT' (rename_tags above is the
    pinned oracle). JVM regexp_replace cannot map per-match, so the
    single pass is emulated in two cascade-free phases: one alternation
    pass wraps every matched key in a private-use delimiter (leftmost
    position, first-listed alternative — same scan rule as re.sub /
    java.util.regex), then per-key literal passes map the delimited
    spans; produced values contain no delimiter, so nothing re-matches.
    """
    mark = "\ue000"  # private-use char: cannot occur in tag text
    out = F.col(col) if isinstance(col, str) else col
    alt = "|".join(k for k, _ in TAG_RENAME)
    out = F.regexp_replace(out, f"({alt})", f"{mark}$1{mark}")
    for k, v in TAG_RENAME:
        out = F.regexp_replace(out, f"{mark}{k}{mark}", v)
    return out
