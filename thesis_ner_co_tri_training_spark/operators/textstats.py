"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

All pure built-in expressions (one narrow projection, no shuffle, no
Python) — these run as map-side columns over a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons (n-gram heuristic class; public
# common-word lists). Deliberately small — the operator shape is the
# point; swap lexicons freely.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "with", "for", "on", "are", "as"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein",
           "eine", "zu", "den", "von", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "los",
           "se", "del", "las", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
           "que", "qui", "dans", "pour", "pas"],
}

_WORD_SPLIT = r"\s+"


def _round4_portable(c: Column) -> Column:
    """HALF-UP round to 4 digits as pure IEEE ops: floor(x*1e4 + 0.5)/1e4.

    PRECONDITION: x >= 0. For negative x this recipe rounds ties toward
    +inf (floor(-0.5+0.5)=0, not -1), diverging from BigDecimal HALF_UP
    which rounds ties away from zero. All call sites are ratios/scores
    in [0, 1]; do not apply it to signed values.

    Engine-native round() is NOT cross-engine stable on decimal ties:
    Spark rounds the exact binary value via BigDecimal HALF_UP while
    DuckDB rounds through float math — at sf0.1, 7/5000 quality scores
    landed on a tie and split the two engines (found by running the
    contract gate at 10x the driver SF). This recipe is the same IEEE
    multiply/add/floor on both sides, so bit-identical inputs give
    bit-identical rounded outputs at any scale. Every rounded column
    in the q13/q14 signal family must use it (oracle twin:
    floor(x * 10000.0 + 0.5) / 10000.0)."""
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), _WORD_SPLIT)


def token_counts(df: DataFrame, text_col: str = "text",
                 tokenizer: str = "regex") -> DataFrame:
    """n_tokens (whitespace), n_distinct_tokens, n_bpe_ish (regex splits
    that approximate sub-word boundaries: runs of letters OR digits OR a
    single other symbol — a BPE-ish upper bound).

    tokenizer="bpe" additionally emits `n_bpe`: the EXACT greedy-BPE
    token count under functions/bpe.py's pinned merges table — still
    pure JVM string expressions (the wrapped-replace chain), so budgets
    measured in real tokenizer tokens cost no Python stage (q79)."""
    if tokenizer not in ("regex", "bpe"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    toks = tokens_col(text_col)
    bpe_ish = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"(?U)(?<=\W)|(?=\W)|(?<=\d)(?=\D)|(?<=\D)(?=\d)"),
            lambda t: F.trim(t) != "",
        )
    )
    out = df.withColumns({
        "n_tokens": F.size(F.filter(toks, lambda t: t != "")),
        "n_distinct_tokens": F.size(F.array_distinct(F.filter(toks, lambda t: t != ""))),
        "n_bpe_ish": bpe_ish,
        "n_chars_measured": F.length(text_col),
    })
    if tokenizer == "bpe":
        from ..functions.bpe import bpe_count_col
        out = out.withColumn("n_bpe", bpe_count_col(text_col))
    return out


def learn_bpe_merges(docs: DataFrame, num_merges: int = 8,
                     text_col: str = "text",
                     min_count: int = 2) -> DataFrame:
    """Distributed BPE merge LEARNING (Sennrich et al. 2016) — train
    the tokenizer's merge table on the corpus itself, the companion to
    the fixed-table encoder in functions/bpe.py (q79 counts tokens
    under a PINNED table; this learns one).

    Deterministic spec (functions/bpe.learn_merges_py is the pure-
    Python source of truth; engine, oracle and replay are pinned to
    it): pre-tokenize exactly like the encoder (ASCII fold, maximal
    [a-z0-9] runs); count adjacent symbol pairs over the distinct-word
    vocabulary weighted by corpus word frequency (every adjacency
    position counts — subword-nmt's get_stats); per round take the max
    by (count DESC, left ASC, right ASC), skipping candidates whose
    product string collides with an earlier product (keeps the learned
    list validate_merges-well-ordered, so the sweep encoder applies it
    correctly); merge non-overlapping left-to-right (one literal
    replace on the wrapped representation); stop early below
    `min_count`. Output: (merge_rank, l, r, merged, pair_count) —
    strings and BIGINTs only.

    Scale shape at 100 TB: ONE corpus-wide shuffle builds the
    distinct-word frequency vocabulary (bounded by vocabulary growth —
    Heaps' law, ~10^7-10^8 rows for web corpora — orders of magnitude
    under corpus size); every learning round then runs on that vocab
    relation only: one map-side-combinable pair-count aggregate + a
    1-row argmax collect (scalar-bounded, the graph-fixpoint probe
    pattern) + one narrow literal-replace map, localCheckpointed per
    round to truncate the replace-chain lineage. num_merges rounds
    never rescan the corpus.
    """
    from ..functions.bpe import (ASCII_LOWER, ASCII_UPPER, SYM_CLOSE,
                                 SYM_OPEN, validate_merges)

    spark = docs.sparkSession
    folded = F.translate(F.coalesce(F.col(text_col), F.lit("")),
                         ASCII_UPPER, ASCII_LOWER)
    words = (
        docs.select(F.explode(F.split(folded, "[^a-z0-9]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("f"))
        .withColumn("w", F.regexp_replace(
            "word", "([a-z0-9])", SYM_OPEN + "$1" + SYM_CLOSE))
        .select("w", "f")
        .localCheckpoint(eager=True)
    )
    learned: list[tuple[int, str, str, str, int]] = []
    products: set[str] = set()
    for rank in range(1, num_merges + 1):
        syms = F.split(F.expr("substring(w, 2, length(w) - 2)"),
                       SYM_CLOSE + SYM_OPEN)
        pairs = (
            words.select(syms.alias("syms"), "f")
            .filter(F.size("syms") >= 2)
            .select(F.explode(F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS l, syms[i] AS r))"
            )).alias("p"), "f")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").alias("cnt"))
        )
        if products:
            pairs = pairs.filter(
                ~F.concat("l", "r").isin(sorted(products)))
        best = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
        if not best or int(best[0]["cnt"]) < min_count:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        learned.append((rank, left, right, left + right, cnt))
        products.add(left + right)
        words = words.withColumn("w", F.replace(
            "w",
            F.lit(SYM_OPEN + left + SYM_CLOSE + SYM_OPEN + right + SYM_CLOSE),
            F.lit(SYM_OPEN + left + right + SYM_CLOSE),
        )).localCheckpoint(eager=True)
    # internal sanity: the construction guarantees well-ordering, so
    # the learned table is directly usable by the sweep encoder
    validate_merges([(le, r) for _, le, r, _, _ in learned])
    return spark.createDataFrame(
        learned,
        "merge_rank long, l string, r string, merged string, "
        "pair_count long")


def stopword_ratios(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One ratio column per language: fraction of tokens in that
    language's stopword list (round 4)."""
    toks = F.filter(tokens_col(text_col), lambda t: t != "")
    out = df
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        ratio = F.when(F.size(toks) == 0, 0.0).otherwise(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / F.size(toks)
        )
        out = out.withColumn(f"sw_{lang}", _round4_portable(ratio))
    return out


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax stopword ratio, 'und' (undetermined)
    when every ratio is 0."""
    scored = stopword_ratios(df, text_col)
    langs = list(STOPWORDS)
    pairs = F.array(*[
        F.struct(F.col(f"sw_{l}").alias("score"), F.lit(l).alias("lang"))
        for l in langs
    ])
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return scored.withColumn(
        "lang_pred",
        F.when(best["score"] <= 0.0, F.lit("und")).otherwise(best["lang"]),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1] from cheap signals (round 4):

      length_score   saturating n_tokens/100
      alpha_ratio    alphabetic chars / all non-space chars
      stop_score     saturating max-stopword-ratio/0.3
      repeat_penalty distinct/total tokens

    score = round((length + alpha + stop + distinct) / 4, 4)
    """
    d = token_counts(df, text_col)
    d = language_id(d, text_col)
    alpha = F.length(F.regexp_replace(F.col(text_col), r"(?U)[^\p{L}]", ""))
    nonspace = F.length(F.regexp_replace(F.col(text_col), r"(?U)\s", ""))
    alpha_ratio = F.when(nonspace == 0, 0.0).otherwise(alpha / nonspace)
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    langs = list(STOPWORDS)
    max_sw = F.greatest(*[F.col(f"sw_{l}") for l in langs])
    stop_score = F.least(max_sw / F.lit(0.3), F.lit(1.0))
    distinct_ratio = F.when(F.col("n_tokens") == 0, 0.0).otherwise(
        F.col("n_distinct_tokens") / F.col("n_tokens")
    )
    return d.withColumn(
        "quality",
        _round4_portable(
            (length_score + alpha_ratio + stop_score + distinct_ratio) / 4),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                head_chars: int = 64) -> DataFrame:
    """Two document fingerprints:

      fp_head   md5 of the first `head_chars` normalized chars (cheap
                clustering key for boilerplate detection)
      fp_full   md5 of the full normalized text (exact-dup key)
    """
    # same normalization as dedup.NORM (trim + collapse + lower): the
    # fingerprint is an identity key, and 'x' vs 'x\n' must collide
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumns({
        "fp_head": F.md5(F.substring(norm, 1, head_chars)),
        "fp_full": F.md5(norm),
    })


def filter_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "es", "fr"),
    min_tokens: int = 10,
    max_tokens: int = 100000,
) -> DataFrame:
    """Training-corpus admission filter (CCNet/Gopher-style gates over the
    cheap signals above): language allowlist, token-length band, composite
    quality threshold.

    Adds `drop_reason` — the FIRST failing gate in fixed order
    (lang -> too_short -> too_long -> low_quality); null = admitted.
    Every row is carried (C5 rule: no silent drops); callers filter on
    drop_reason IS NULL and feed the grouped reasons into stage metrics.
    All gates are single-pass JVM expressions over one scan.
    """
    d = quality_score(df, text_col)
    reason = (
        F.when(~F.col("lang_pred").isin(*langs), F.lit("lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
    )
    return d.withColumn("drop_reason", reason)


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals for pretraining-data filtering:

      dup_line_frac    fraction of newline-delimited lines that are
                       repeats of an earlier line (boilerplate/template
                       pages score high),
      top_2gram_frac   share of all word 2-grams taken by the single most
                       frequent one (stuck-loop / keyword-stuffed pages).

    Relational shape: line stats are per-row array expressions (no
    shuffle); 2-gram stats ride the shared shingle stream (one keyed
    count + one per-doc aggregate, map-side partial-aggregated, same
    plan family as minhash). round 4.
    """
    from .dedup import token_shingles_long

    lines = F.split(F.col(text_col), "\n")
    base = df.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("n_distinct_lines"),
    )
    grams = token_shingles_long(df, id_col, text_col, n=2, distinct=False)
    gstats = (
        grams.groupBy(id_col, "s").count()
        .groupBy(id_col)
        .agg(F.max("count").alias("__top"), F.sum("count").alias("__tot"))
    )
    return base.join(gstats, id_col, "left").select(
        id_col,
        F.when(F.col("n_lines") == 0, F.lit(0.0)).otherwise(
            F.round((F.col("n_lines") - F.col("n_distinct_lines"))
                    / F.col("n_lines"), 4)
        ).alias("dup_line_frac"),
        F.when(F.col("__tot").isNull() | (F.col("__tot") == 0), F.lit(0.0))
        .otherwise(F.round(F.col("__top") / F.col("__tot"), 4))
        .alias("top_2gram_frac"),
    )


# PII patterns shared by the engine and the DuckDB oracle (q34): only
# constructs with identical semantics in Java regex and RE2 (character
# classes, bounded repetition, non-capturing groups, \b) — no lookaround,
# no backreferences.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9 ()./-]{7,}[0-9]"
PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Web-corpus PII scrub: emails, IPv4 literals and phone-number-
    shaped digit runs replaced with typed placeholders, plus per-row
    counts. Replacement order email -> IP -> phone is part of the
    contract: a dotted-quad LONG enough for the phone shape (e.g.
    192.168.100.200) must land as <IP>, not <PHONE> — so IPs are
    masked first, and n_phones is counted on the IP-masked text so
    counts always reconcile with the placeholders in text_redacted
    (n_emails/n_ips patterns can't overlap each other or phones' spans
    after masking). Pure JVM regexp expressions, one pass over the scan.
    """
    t = F.col(text_col)
    ip_masked = F.regexp_replace(t, PII_IP, "<IP>")
    counts = {
        "n_emails": F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(ip_masked, F.lit(PII_PHONE),
                                                F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(t, F.lit(PII_IP), F.lit(0))),
    }
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_IP, "<IP>"),
        PII_PHONE, "<PHONE>")
    return df.withColumns({**counts, "text_redacted": red})


def corpus_stats(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang",
                 exact: bool = False, rsd: float = 0.02) -> DataFrame:
    """Per-language corpus summary: docs, tokens, distinct tokens, chars.

    The 100-TB shape (default, exact=False): distinct-token cardinality
    uses approx_count_distinct — a HyperLogLog++ sketch whose state is a
    few KB per group and merges associatively in the map-side partial
    aggregation, so the shuffle carries one sketch per (partition, lang)
    instead of the token stream. An exact countDistinct would shuffle
    every (lang, token) pair — unbounded at corpus scale.

    exact=True swaps in the exact countDistinct for tests: estimates are
    engine-specific by construction (no cross-engine oracle), so the
    test contract is |approx - exact| / exact within the HLL++ error
    bound instead (test_textstats_corpus in test_property.py pins it).
    """
    base = df.select(
        F.col(lang_col).alias("lang"),
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        # same empty-filtered whitespace tokens as token_counts (q15's
        # cross-engine-proven form)
        F.filter(tokens_col(text_col), lambda t: t != "").alias("__t"),
    )
    # Single pass: posexplode_outer emits every token WITH its position
    # (and one all-null row for a token-less doc), so the doc-level
    # aggregates ride the same exploded stream gated on "first row of
    # the doc" (pos == 0 or pos IS NULL) — one scan, one tokenization,
    # one shuffle. The obvious two-leg join form (doc leg + token leg)
    # re-reads and re-tokenizes the whole corpus per leg: Catalyst has
    # no common-subplan sharing (same trap degree_stats documents).
    first = (F.col("pos") == 0) | F.col("pos").isNull()
    distinct_tokens = (
        F.count_distinct(F.col("tok")) if exact
        else F.approx_count_distinct("tok", rsd)
    )
    return (
        base.select(
            "lang", "n_chars",
            F.posexplode_outer("__t").alias("pos", "tok"),
        )
        .groupBy("lang")
        .agg(
            F.sum(F.when(first, 1).otherwise(0)).alias("n_docs"),
            F.count("tok").alias("n_tokens"),
            distinct_tokens.alias("n_distinct_tokens"),
            (F.sum(F.when(first, F.col("n_chars")).otherwise(0))
             / F.sum(F.when(first, 1).otherwise(0))).alias("avg_doc_chars"),
        )
        .orderBy("lang")
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, bench_text_col: str | None = None) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with an evaluation/benchmark set (the GPT-3/Llama-style
    n-gram overlap rule). Returns every doc as (id, n_hits,
    contaminated): n_hits = how many DISTINCT of the doc's n-gram
    shingles appear anywhere in the benchmark, contaminated = n_hits > 0.

    Shares dedup's shingle machinery (token_shingles_long: lower +
    whitespace-collapse normalization, slice/concat assembly, no
    pre-join shuffle beyond the explode) so the dedup and
    decontamination passes agree on tokenization by construction.

    Shuffle shape at 100 TB: benchmark shingles are distinct-reduced
    then joined shingle-keyed against the exploded doc shingles —
    benchmarks are small relative to the corpus, so AQE broadcasts that
    side and the doc stream never shuffles before the per-doc count
    aggregate; the final left join back to ids preserves clean docs
    with n_hits = 0.
    """
    from .dedup import token_shingles_long

    bs = (
        token_shingles_long(
            benchmark, id_col, bench_text_col or text_col, n)
        .select("s")
        .distinct()
    )
    ds = token_shingles_long(docs, id_col, text_col, n)
    hits = (
        ds.join(bs, "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bm25_term_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k1: float = 1.2,
                     b: float = 0.75, idf: str = "ln") -> DataFrame:
    """Okapi BM25 term scoring over the whole corpus: one row per
    (doc, term) with tf, dl, df_t, idf and the BM25 score — the
    retrieval-ranking primitive (top-k terms per doc = a keyword
    extractor; sum over query terms = a search scorer).

    idf="ln" (the engine default): idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    — the standard non-negative BM25+ idf. idf="rational" drops the ln,
    which makes the score a pure +,-,*,/ composition of integer-derived
    IEEE doubles — bit-exact across engines, hence the contract/oracle
    path (q58); ln is NOT correctly-rounded-guaranteed across libms, so
    it stays out of hashed columns (repo float rule). NOTE the two idfs
    are each monotone IN df but NOT rank-equivalent ACROSS terms: idf
    multiplies the tf factor, and a monotone transform of one factor
    does not preserve product order (measured: top-3 keyword sets
    differ between the idfs at sf0.01) — the ln path is therefore
    value-oracled directly against pure Python (test_bm25), not vouched
    for by the rational contract entry.

    Shuffle shape at 100 TB: explode -> ONE partial-aggregated shuffle
    on (doc, term) for tf; term-level df is a second partial agg of that
    result keyed by term (no re-read of the corpus); the df join back is
    term-keyed sort-merge (vocab is corpus-sized — deliberately NOT
    broadcast); N/avgdl is a 1-row aggregate broadcast as a scalar via
    crossJoin. Nothing touches the driver.
    """
    toks = F.filter(tokens_col(text_col), lambda t: t != "")
    base = docs.select(
        F.col(id_col),
        F.explode(toks).alias("term"),
        F.size(toks).alias("dl"),
    )
    tf = (
        base.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_tokens"),
    ).select(
        "n_docs",
        (F.col("total_tokens") / F.col("n_docs")).alias("avgdl"),
    )
    rational = (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (
        F.col("df_t") + F.lit(0.5))
    idf_col = F.log(F.lit(1.0) + rational) if idf == "ln" else rational
    return (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            F.col("df_t").cast("long").alias("df_t"),
            idf_col.alias("idf"),
            (
                idf_col
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf")
                   + F.lit(k1) * (F.lit(1.0 - b)
                                  + F.lit(b) * F.col("dl") / F.col("avgdl")))
            ).alias("score"),
        )
    )


def top_terms_per_doc(scored: DataFrame, k: int = 3,
                      id_col: str = "doc_id",
                      min_df: int = 1) -> DataFrame:
    """Top-k BM25 terms per doc (keyword extraction): rank by
    (score DESC, term ASC) — fully deterministic tie order — within each
    doc. The window partitions by doc id, so no global sort and no
    single-reducer stage; per-partition heap via row_number + filter.
    min_df drops hapax/noise terms before ranking."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.filter(F.col("df_t") >= min_df)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def prune_by_quality(docs: DataFrame, keep_frac: float = 0.5,
                     group_col: str = "lang", id_col: str = "doc_id",
                     text_col: str = "text", exact: bool = False) -> DataFrame:
    """Quality-quantile corpus pruning: keep the top `keep_frac` of docs
    by quality_score WITHIN each group (typically language, so one
    dominant language cannot crowd out the rest of the mix). Returns
    every doc as (id, group, quality, rank_in_group, kept).

    exact=False (the default — the only shape that survives 100 TB):
    the per-group keep threshold is the approx_percentile of quality
    (a t-digest sketch: one partial-aggregable pass, no global sort),
    broadcast back; kept = quality above the group's cut. Rank is not
    materialized (a total per-group rank IS a per-group global sort —
    one reducer per language at corpus scale).

    exact=True (the oracle/contract path, q53): row_number over
    (quality DESC, id ASC) per group — fully deterministic incl. tie
    order — kept while rank <= ceil(keep_frac * group size). Correct at
    thesis scale and for oracle comparison; documented NOT the default
    because the window sorts each whole group on one reducer.
    """
    q = quality_score(docs, text_col).select(id_col, group_col, "quality")
    if not exact:
        cuts = q.groupBy(group_col).agg(
            F.percentile_approx("quality", 1.0 - keep_frac).alias("__cut"))
        return (
            q.join(F.broadcast(cuts), group_col)
            .select(id_col, group_col, "quality",
                    (F.col("quality") >= F.col("__cut")).alias("kept"))
        )
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col)
         .orderBy(F.col("quality").desc(), F.col(id_col).asc()))
    sizes = q.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    return (
        q.withColumn("rank_in_group", F.row_number().over(w).cast("long"))
        .join(F.broadcast(sizes), group_col)
        .select(
            id_col, group_col, "quality", "rank_in_group",
            (F.col("rank_in_group")
             <= F.ceil(F.lit(float(keep_frac)) * F.col("__n")).cast("long")
             ).alias("kept"),
        )
    )


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", size: int = 64,
                    stride: int = 48) -> DataFrame:
    """Sliding-window token chunking — the context-window/RAG prep op a
    training-data pipeline runs over every document.

    Tokens are whitespace splits of the trimmed text (empty tokens
    dropped). Chunks start at 1-based token positions 1, 1+stride,
    1+2*stride, ... while the start is within the document; each chunk
    takes `size` tokens (the tail chunk may be shorter). stride < size
    gives overlapping windows (context continuity across chunk
    boundaries); stride == size gives a partition. Zero-token documents
    emit no chunks.

    Output: (id, chunk_id 0-based, start_token 1-based, n_chunk_tokens,
    chunk_text) — all engine-portable (ints + joined strings), so the
    whole op is DuckDB-oracled (q63 via generate_series/list_slice).

    Shape at scale: one narrow projection + one explode — no shuffle,
    no Python; chunk count per row is bounded by n_tokens/stride, so
    output size tracks corpus token count regardless of document-length
    skew.
    """
    if size < 1 or stride < 1:
        raise ValueError("chunk_documents: size and stride must be >= 1")
    toks = F.filter(F.split(F.trim(F.col(text_col)), _WORD_SPLIT),
                    lambda t: t != "")
    base = (
        df.select(F.col(id_col), toks.alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(F.col("__n") >= 1)
    )
    return (
        base.select(
            id_col, "__t", "__n",
            F.explode(
                F.sequence(F.lit(1), F.col("__n"), F.lit(stride))
            ).alias("__g"),
        )
        .select(
            F.col(id_col),
            ((F.col("__g") - 1) / F.lit(stride)).cast("long")
            .alias("chunk_id"),
            F.col("__g").cast("long").alias("start_token"),
            F.least(F.lit(size), F.col("__n") - F.col("__g") + 1)
            .cast("long").alias("n_chunk_tokens"),
            F.array_join(F.slice("__t", F.col("__g"), size), " ")
            .alias("chunk_text"),
        )
    )


def corpus_frequency_score(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           n: int = 3) -> DataFrame:
    """Corpus-frequency novelty scoring — the perplexity-proxy quality
    signal that needs no model: each document is scored by how common
    its word n-grams are in the corpus itself. Low avg_freq = novel (or
    noisy) text; high = templated/boilerplate-heavy. Used alongside
    q14's intrinsic quality score to pick training data: intrinsically
    clean AND not boilerplate.

    Exact integer arithmetic end-to-end (BIGINT occurrence counts;
    avg_freq is one double division of the same two BIGINTs on any
    engine), so the whole op is DuckDB-oracled (q70). Shingles reuse
    dedup.token_shingles_long — one tokenizer, one shingle recipe
    across dedup/BM25/novelty.

    Shape at scale: one map-side-combinable count shuffle (hot
    boilerplate shingles collapse per mapper), one shingle-keyed join
    back (the count side is 1 row per distinct shingle), one doc-keyed
    aggregate. Documents shorter than n tokens surface n_grams = 0 and
    a null avg (kept, not dropped).
    """
    from .dedup import token_shingles_long

    sh = token_shingles_long(df, id_col, text_col, n, distinct=False)
    counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (
        sh.join(counts, "s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("__c").cast("long").alias("freq_sum"),
        )
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("freq_sum", F.lit(0)).cast("long").alias("freq_sum"),
            F.when(F.col("n_grams") > 0,
                   F.col("freq_sum") / F.col("n_grams"))
            .alias("avg_freq"),
        )
    )


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003) — the position-aware local-minimum sketch that powers
    MOSS-style partial-overlap detection. Where minhash answers "are
    these documents near-identical overall?", winnowing answers "do
    these documents SHARE A PASSAGE?" with guaranteed detection of any
    match of at least w+k-1 tokens, at ~2/(w+1) of the gram count
    stored — the right sketch for quote/boilerplate provenance at
    corpus scale.

    Spec (the cross-engine contract):
      * tokens = dedup.NORM words (trim + collapse + lower — shared
        with the whole dedup family);
      * gram g (1-based) = the k-token shingle starting at token g,
        hashed with functions.hashutil.md5_long (engine-portable);
      * windows start at p = 1 .. max(1, m-w+1) (m = gram count) and
        cover grams [p, p+w-1] clipped to m — documents with fewer
        than w grams contribute one whole-document window;
      * each window selects the RIGHTMOST gram attaining the window
        minimum hash (an always-rightmost-min tie rule — a
        simplification of Schleimer et al.'s robust winnowing, which
        first prefers re-selecting the previous window's selection and
        only then falls back to rightmost-min; the simpler rule selects
        more fingerprints on repetitive text but the detection
        guarantee is unchanged, and engine, oracle, and replay all
        implement this same rule), and the output is the distinct
        selected (pos, fp) set per document.

    Output: (id, pos, fp) — 1-based token position and 60-bit BIGINT
    fingerprint, fully DuckDB-oracled (q72).

    Shape at scale: the hash array, the window scan and the argmin
    selection are ALL per-row array expressions (transform + a single
    left fold per window — one O(w) pass, no intermediate arrays) —
    one narrow projection, one explode, zero shuffles and zero Python;
    cost is O(m*w) comparisons map-side, output ~2m/(w+1) rows per doc. Matching then needs only
    one groupBy(fp) over the sketch — the same join shape as
    repeated-span dedup but over a 2/(w+1)-sampled stream.
    """
    from .dedup import NORM
    from ..functions.hashutil import md5_long

    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    toks = df.select(
        F.col(id_col), F.split(NORM(F.col(text_col)), " ").alias("__t")
    )
    base = (
        toks.withColumn("__m", F.size("__t") - F.lit(k) + 1)
        .filter(F.col("__m") >= 1)
    )
    # per-gram 60-bit hashes, one array per doc
    hashes = base.withColumn(
        "__h",
        F.transform(
            F.sequence(F.lit(1), F.col("__m")),
            lambda g: md5_long(F.array_join(F.slice("__t", g, k), " ")),
        ),
    )
    # one selected (pos, fp) struct per window start: a SINGLE left fold
    # over the window's gram indices with a (pos, fp) accumulator; `<=`
    # keeps updating on ties, which IS the rightmost-min rule. One pass,
    # no intermediate arrays (the slice/array_min/reverse/array_position
    # form scanned and allocated each window three times).
    _max_long = (1 << 63) - 1

    def _pick(p):
        return F.aggregate(
            F.sequence(p, F.least(p + F.lit(w - 1), F.col("__m"))),
            F.struct(F.lit(0).cast("long").alias("pos"),
                     F.lit(_max_long).alias("fp")),
            lambda acc, i: F.when(
                F.element_at("__h", i) <= acc["fp"],
                F.struct(i.cast("long").alias("pos"),
                         F.element_at("__h", i).alias("fp")),
            ).otherwise(acc),
        )

    win = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("__m") - F.lit(w) + 1)),
        _pick,
    )
    return (
        hashes.select(F.col(id_col),
                      F.explode(F.array_distinct(win)).alias("__s"))
        .select(F.col(id_col), F.col("__s.pos").alias("pos"),
                F.col("__s.fp").alias("fp"))
    )


def winnow_passage_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3, w: int = 4,
                         max_df: int = 64,
                         min_shared: int = 2) -> DataFrame:
    """Shared-passage detection over the winnowing sketch — the MOSS
    matching step: two documents that share a verbatim run of >=
    w + k - 1 tokens are GUARANTEED to share a fingerprint, so pair
    candidates come from one equi-join on fp, never an all-pairs scan.

    Fingerprints occurring in more than `max_df` documents are dropped
    before pairing (the standard MOSS move: ubiquitous fingerprints are
    boilerplate, not evidence of copying — and the skew guard that stops
    a hot fp from exploding the join, same role as minhash's bucket-size
    cap). Document sketch sizes are counted BEFORE the guard, so
    match_frac is honest about how much of each sketch matched.

    Output per (a, b) pair with a < b and >= min_shared shared distinct
    fingerprints: n_shared, n_a, n_b (distinct-fp sketch sizes) and
    match_frac = n_shared / min(n_a, n_b) — one double division of two
    BIGINTs, identical operands on any engine, so fully DuckDB-oracled
    (q74).

    Shape at scale: sketch (map-side, q72) -> per-doc distinct -> one
    fp-keyed frequency aggregate (map-side combinable) -> one fp-keyed
    self-join bounded by max_df^2 rows per fp -> one pair-keyed count.
    All shuffles are keyed by fp or (a, b); no window, no Python.
    """
    fps = winnow_fingerprints(df, id_col=id_col, text_col=text_col,
                              k=k, w=w)
    # materialize the sketch ONCE: d feeds four consumers (sizes, the
    # frequency guard, and BOTH self-join sides) and Catalyst re-derives
    # unshared subplans per consumer — without this cut the whole
    # tokenize+hash+winnow scan runs 4x (plan audit: 6 scans -> 1)
    d = (
        fps.select(F.col(id_col).alias("id"), "fp").distinct()
        .localCheckpoint(eager=True)
    )
    sizes = d.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    keep = (
        d.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp")
    )
    dd = d.join(keep, "fp")
    pairs = (
        dd.select("fp", F.col("id").alias("a"))
        .join(dd.select("fp", F.col("id").alias("b")), "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(sizes.select(F.col("id").alias("a"),
                                F.col("n").alias("n_a")), "a")
        .join(sizes.select(F.col("id").alias("b"),
                           F.col("n").alias("n_b")), "b")
        .select(
            "a", "b", "n_shared",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("n_shared").cast("double")
             / F.least("n_a", "n_b").cast("double")).alias("match_frac"),
        )
    )
