"""Deterministic entity/vocab resources for the synthetic web corpus and
the three tagger views.

Replaces the reference's BERT models (predict.py Ner) with model-free
deterministic resources, per SURVEY.md §7: the engine's contract is the
*selection algebra*, not the weights. Every list here is fixed and seeded —
no randomness at import time, no external data.

Tag vocabulary = the reference's fine-grained ISW set (FIXTURES.md §2,
observed in /root/reference/tmp/Better+Worse Predicted Samples).
"""

from __future__ import annotations

import hashlib
import random
from functools import lru_cache

TAGS = [
    "PER", "TITLE", "AGE", "DATE", "TIME", "DUR", "FREQ", "RATE", "ORDINAL",
    "CARDINAL", "QUANT", "MON", "PERC", "LOC", "GPE", "FAC", "ORG", "NRP",
    "LAN", "ART", "EVT", "MISC", "SORD",
]

_FIRST = ["anna", "jonas", "maria", "lukas", "sofia", "felix", "laura",
          "emil", "clara", "noah", "lena", "paul", "mira", "jan", "ida",
          "oskar", "nina", "tom", "eva", "max"]
_LAST = ["mueller", "schmidt", "weber", "fischer", "wagner", "becker",
         "hoffmann", "schulz", "koch", "richter", "klein", "wolf",
         "neumann", "braun", "krause", "vogel"]
_CITY = ["berlin", "hamburg", "muenchen", "koeln", "frankfurt", "stuttgart",
         "leipzig", "dresden", "bremen", "hannover", "nuernberg", "bonn",
         "wien", "zuerich", "basel", "paris", "london", "madrid", "rom",
         "prag"]
_ORG_STEM = ["nordwind", "alpen", "hansa", "futura", "delta", "quantum",
             "silber", "adler", "kristall", "atlas", "orion", "helios"]
_ORG_SUFFIX = ["werke", "gmbh", "group", "labs", "institut", "verlag", "bank"]
_EVENTS = ["sommerfest", "buchmesse", "weltkongress", "olympiade",
           "filmfestival", "hansetag"]
_LANGS = ["deutsch", "englisch", "spanisch", "franzoesisch", "polnisch"]
_NRP = ["deutsche", "franzosen", "italiener", "spanier", "polen_volk"]

_FILLER = ("der die das und oder aber mit ohne bei nach von zu im am auf "
           "ein eine heute morgen gestern schnell langsam gross klein neu "
           "alt gut markt haus strasse projekt bericht plan system wert "
           "the a and or with without at after from to in on fast slow big "
           "small new old good market house street project report plan").split()

# Relation cue tokens: between two voted mentions they induce a triple
# (subj, cue, obj). Whitespace tokens, lowercase, punctuation-free so they
# survive predict.py:81-style normalization.
CUES = ["besucht", "leitet", "gruendet", "trifft", "verkauft", "kauft",
        "unterstuetzt", "kritisiert"]


@lru_cache(maxsize=1 << 17)
def _stable_conf(key: str, lo: float = 0.55, hi: float = 0.99) -> float:
    """Planted per-entry confidence in [lo, hi), round 4 (utils.py:70,88).

    md5-based so it is stable across processes (no PYTHONHASHSEED
    effect); pure, so memoized (bounded — webtext keys are Zipfian but
    unbounded): the tagging hot path resolves most occurrences through
    the per-rule caches in operators/tagging.py, and this cache catches
    every remaining repeat-key caller.
    """
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return round(lo + (h / 0xFFFFFFFF) * (hi - lo), 4)


def full_gazetteer() -> dict[str, str]:
    """surface (space-joined, lowercase) -> entity tag. ~400 entries."""
    gaz: dict[str, str] = {}
    for f in _FIRST:
        for l in _LAST[:8]:
            gaz[f"{f} {l}"] = "PER"
    for c in _CITY:
        gaz[c] = "GPE"
    for s in _ORG_STEM:
        for x in _ORG_SUFFIX[:4]:
            gaz[f"{s} {x}"] = "ORG"
    for e in _EVENTS:
        gaz[e] = "EVT"
    for l in _LANGS:
        gaz[l] = "LAN"
    for n in _NRP:
        gaz[n] = "NRP"
    return gaz


def view_gazetteers(fraction: float = 0.7,
                    seeds: tuple[int, int, int] = (1, 2, 3)
                    ) -> list[dict[str, tuple[str, float]]]:
    """Three bootstrap-subsampled gazetteers (R2, utils.py:116-134 analog).

    Each view sees ~`fraction` of the full gazetteer, drawn with a distinct
    seed, so views genuinely disagree on held-out surfaces and the
    agreement vote has real work to do (FIXTURES.md §3). Values carry the
    planted per-entry confidence, salted by view so confidences differ.
    """
    items = sorted(full_gazetteer().items())
    out = []
    for v, seed in enumerate(seeds, start=1):
        rng = random.Random(seed)
        n = int(len(items) * fraction)
        picked = {}
        for _ in range(n):
            k, tag = items[rng.randrange(len(items))]
            picked[k] = (tag, _stable_conf(f"v{v}|{k}"))
        out.append(picked)
    return out


# Context cues for view 3: token BEFORE a capitalizable entity head.
CONTEXT_CUES = {
    "herr": "PER", "frau": "PER", "doktor": "PER",
    "in": "GPE", "nach": "GPE", "aus": "GPE",
    "firma": "ORG", "bei": "ORG",
}

FILLER = _FILLER
CITY, FIRST, LAST = _CITY, _FIRST, _LAST
ORG_STEM, ORG_SUFFIX = _ORG_STEM, _ORG_SUFFIX
EVENTS, LANGS, NRPS = _EVENTS, _LANGS, _NRP
