"""Real greedy BPE token counting with a pinned merges fixture —
engine-portable WITHOUT Python in the hot path.

`token_counts`/`fill_token_budget` count regex tokens; real training
budgets are tokenizer tokens (VERDICT r4 item 7). This module adds a
deterministic byte-pair-encoding count over a pinned, public-format
merges list (GPT-2-style ranked pairs, Sennrich et al. 2016) as an
opt-in `tokenizer="bpe"` path.

The trick that keeps it JVM-side AND DuckDB-oracled: represent a word's
current symbol sequence as a flat string where every symbol is wrapped
as SOH+sym+STX (`\\x01h\\x02\\x01e\\x02...`), words joined by ETX
(`\\x03`). Applying merge (x, y) -> xy is then ONE literal
`replace('\\x01x\\x02\\x01y\\x02' -> '\\x01xy\\x02')`: string replace
scans left-to-right over non-overlapping occurrences in both engines,
which is exactly BPE's per-sweep merge semantics (GPT-2's encoder also
merges all non-overlapping occurrences left-to-right per rank). The
wrappers make boundary-crossing matches impossible (every symbol starts
with SOH and ends with STX, so 'b'+'c' can never match inside 'ab','c')
and adjacent matches share no characters (the "aaaa" case merges to
[aa][aa], not [aa][a][a]). The full encoder is the 2 regexp_replace
pre-tokenization steps plus len(merges) chained literal replaces — one
narrow projection, whole-stage-codegen friendly, zero Python, zero
shuffle, and the identical chain runs verbatim in DuckDB
(`bpe_oracle_expr`), so BPE-counting queries are repr-exact oracled.

Applying merges as one sweep per rank (what the replace chain does)
equals the textbook lowest-rank-anywhere loop (`bpe_encode`, the
pure-Python source of truth) whenever the merge list is WELL-ORDERED:
each side of merge r is a single alphabet char or the product of an
earlier merge, and products are distinct. Then a merge can only create
new adjacencies involving its own (later-ranked) product, so a completed
sweep at rank r stays completed. `validate_merges` enforces this at
construction time for custom tables; tests pin sweep == loop on
adversarial strings.

Pre-tokenization is deliberately locale-free: A-Z folds to a-z via
translate() (pure char map — lower() is ICU/locale-territory and its
non-ASCII edge cases differ across engines), then maximal [a-z0-9] runs
are the words; everything else separates. The pure-Python twin
(`bpe_token_count`) mirrors this byte for byte.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
SYM_OPEN, SYM_CLOSE, WORD_SEP = "\x01", "\x02", "\x03"

# Pinned merges fixture: GPT-2-merges-format ranked pairs over [a-z0-9],
# hand-ordered over frequent English digraphs/suffixes so the synthetic
# documents corpus actually exercises multi-level merges (the->th->t+h,
# ation->at+ion->i+on, ...). Well-ordered by construction (validated).
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("o", "f"), ("in", "g"), ("a", "r"), ("a", "l"), ("s", "t"),
    ("e", "d"), ("t", "o"), ("c", "on"), ("en", "t"), ("i", "on"),
    ("at", "ion"), ("l", "e"), ("c", "h"), ("s", "e"), ("m", "e"),
    ("d", "e"), ("u", "s"), ("o", "m"), ("c", "om"), ("w", "h"),
    ("l", "y"), ("t", "er"), ("er", "s"), ("1", "9"), ("2", "0"),
    ("q", "u"), ("a", "b"),
]

_ALPHABET = set(ASCII_LOWER + "0123456789")


def validate_merges(merges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Enforce the well-ordering that makes the rank-sweep encoder equal
    the lowest-rank-anywhere loop: each side is an alphabet char or an
    earlier product, products are distinct, and no side/product contains
    the separator control chars."""
    products: set[str] = set()
    for i, (x, y) in enumerate(merges):
        for side in (x, y):
            if not side or not set(side) <= _ALPHABET:
                raise ValueError(
                    f"merge {i} side {side!r} outside the [a-z0-9] alphabet")
            if len(side) > 1 and side not in products:
                raise ValueError(
                    f"merge {i} side {side!r} is not a product of an "
                    "earlier merge (merge list is not well-ordered)")
        prod = x + y
        if prod in products:
            raise ValueError(f"duplicate merge product {prod!r} at rank {i}")
        products.add(prod)
    return list(merges)


def bpe_encode(word: str, merges: list[tuple[str, str]] | None = None
               ) -> list[str]:
    """Pure-Python reference encoder — the textbook BPE loop (and the
    single source of truth the engine/oracle chains are pinned to):
    repeatedly merge ALL non-overlapping left-to-right occurrences of
    the lowest-ranked pair present, until none remains."""
    merges = BPE_MERGES if merges is None else merges
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        x, y = merges[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_FOLD = str.maketrans(ASCII_UPPER, ASCII_LOWER)


def bpe_token_count(text: str | None,
                    merges: list[tuple[str, str]] | None = None) -> int:
    """Pure-Python twin of `bpe_count_col`: ASCII case-fold, split into
    maximal [a-z0-9] runs, BPE-encode each, sum symbol counts."""
    if not text:
        return 0
    total = 0
    for w in re.split(r"[^a-z0-9]+", text.translate(_FOLD)):
        if w:
            total += len(bpe_encode(w, merges))
    return total


def learn_merges_py(word_freqs: dict[str, int], num_merges: int,
                    min_count: int = 2
                    ) -> list[tuple[str, str, int]]:
    """Pure-Python reference BPE merge LEARNER (Sennrich et al. 2016
    get_stats/merge loop, made deterministic) — the source of truth the
    distributed learner and its DuckDB oracle are pinned to.

    Per round: count adjacent symbol pairs over the current vocabulary
    (each adjacency position counts, weighted by word frequency — the
    subword-nmt stats, so [a,a,a] contributes (a,a) twice); pick the
    max by (count DESC, left ASC, right ASC); skip candidates whose
    concatenated product collides with an earlier product (keeps the
    learned list `validate_merges`-well-ordered — products stay
    distinct, and every side is an alphabet char or an earlier product
    by construction); merge all non-overlapping left-to-right
    occurrences in
    every word. Stop early when the best count falls below `min_count`.
    Returns [(left, right, count)] in learned order.
    """
    vocab = {tuple(w): int(f) for w, f in word_freqs.items() if w}
    out: list[tuple[str, str, int]] = []
    products: set[str] = set()
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        best = None
        for (x, y), c in counts.items():
            if x + y in products:
                continue
            k = (-c, x, y)
            if best is None or k < best[0]:
                best = (k, x, y, c)
        if best is None or best[3] < min_count:
            break
        _, x, y, c = best
        out.append((x, y, c))
        products.add(x + y)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == x
                        and syms[i + 1] == y):
                    merged.append(x + y)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            t = tuple(merged)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return out


def _wrapped_merge_chain(merges: list[tuple[str, str]]):
    """(search, replacement) literal pairs for the wrapped representation."""
    return [(SYM_OPEN + x + SYM_CLOSE + SYM_OPEN + y + SYM_CLOSE,
             SYM_OPEN + x + y + SYM_CLOSE) for x, y in merges]


def bpe_count_col(text_col: str = "text",
                  merges: list[tuple[str, str]] | None = None) -> Column:
    """Spark Column: exact BPE token count of `text_col` under the
    pinned (or given, validated) merges — pure built-in string
    expressions, see the module docstring for why this is both the fast
    path and the oracle-parity path."""
    merges = validate_merges(BPE_MERGES if merges is None else merges)
    s = F.translate(F.coalesce(F.col(text_col), F.lit("")),
                    ASCII_UPPER, ASCII_LOWER)
    s = F.regexp_replace(s, "[^a-z0-9]+", WORD_SEP)
    s = F.regexp_replace(s, "([a-z0-9])", SYM_OPEN + "$1" + SYM_CLOSE)
    for search, repl in _wrapped_merge_chain(merges):
        s = F.replace(s, F.lit(search), F.lit(repl))
    return (F.length(s)
            - F.length(F.replace(s, F.lit(SYM_OPEN), F.lit("")))
            ).cast("long")


def bpe_oracle_expr(col_sql: str = "text",
                    merges: list[tuple[str, str]] | None = None) -> str:
    """The identical chain as a DuckDB SQL expression producing the
    wrapped string; count it with `bpe_count_from_enc_sql`. Control
    chars ride inside the SQL literals verbatim."""
    merges = validate_merges(BPE_MERGES if merges is None else merges)
    s = (f"translate(coalesce({col_sql}, ''), "
         f"'{ASCII_UPPER}', '{ASCII_LOWER}')")
    s = f"regexp_replace({s}, '[^a-z0-9]+', '{WORD_SEP}', 'g')"
    s = (f"regexp_replace({s}, '([a-z0-9])', "
         f"'{SYM_OPEN}\\1{SYM_CLOSE}', 'g')")
    for search, repl in _wrapped_merge_chain(merges):
        s = f"replace({s}, '{search}', '{repl}')"
    return s


def bpe_count_from_enc_sql(enc_sql: str = "e") -> str:
    """BIGINT token count from a wrapped-encoding SQL column."""
    return (f"CAST(len({enc_sql}) - "
            f"len(replace({enc_sql}, '{SYM_OPEN}', '')) AS BIGINT)")
