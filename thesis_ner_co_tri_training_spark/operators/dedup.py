"""Document deduplication suite for large-scale training-data pipelines.

Five strategies, all DataFrame-first (the LSH machinery is shared with
operators.linking — same band/bucket pattern at document granularity):

  exact          md5 of normalized text, groupBy          (hash-groupBy)
  minhash-LSH    token-shingle minhash -> banded buckets  (scale path)
  simhash        64-bit sign-aggregated token hashes      (near-dup bits)
  ngram-jaccard  exact verify on candidate pairs
  embedding      cosine >= threshold on embedding pairs   (semantic dups)

At 100 TB: exact dedup is one shuffle on a 16-byte key; minhash banding
keys the shuffle by (band, bucket) which is uniform by construction
(hash output), so no skew; verification joins only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lower + collapse whitespace runs + TRIM. The trim matters: without it
# leading/trailing whitespace leaves empty-string tokens after split
# (poisoning shingles/simhash votes) and makes 'x' vs 'x\n' hash as
# different exact-dup keys — CCNet-style normalization strips, and every
# other tokenizer in the suite (set_similarity_join, repeated_spans,
# textstats.tokens_col) already trims. DuckDB oracle twin:
# trim(lower(regexp_replace(text, '\s+', ' ', 'g'))).
NORM = lambda c: F.trim(F.lower(F.regexp_replace(c, r"\s+", " ")))


def _widen(df: DataFrame) -> DataFrame:
    """Ensure the doc scan has enough partitions for the explode stages.

    A small parquet file arrives as ONE split, so the shingle explode
    (~50x rows) and the per-bit/per-hash partial aggregations would run
    on one core. On a 100TB corpus the scan already has thousands of
    splits and this is a no-op; locally the cheap pre-explode shuffle of
    compact doc rows buys full-width partial aggregation.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalized_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("norm_text", NORM(F.col(text_col)))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Output: content_hash, n_docs, doc_ids (sorted) — only groups with >1.
    """
    return (
        normalized_text(df, text_col)
        .select(id_col, F.md5("norm_text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingle_expr(n: int) -> str:
    """SQL expr building the word-n-gram shingle array from a token
    array named __t — the single shared tokenize-to-shingles recipe
    (token_shingles_long's exploded form and minhash_bands_narrow's
    per-row form must hash identical strings)."""
    return (
        f"transform(sequence(0, size(__t) - {n}), "
        f"i -> concat_ws(' ', slice(__t, i + 1, {n})))"
    )


def _hash_fns(hasher: str):
    """(shash, bhash) for a hash family: shash(col, i) hashes one
    shingle under seed i; bhash(b, cols) hashes a band's signature
    slice. Shared by minhash_bands and minhash_bands_narrow — the byte
    recipe is the cross-engine oracle contract (hashutil docstring)."""
    if hasher == "md5":
        from ..functions.hashutil import md5_long

        def shash(c, i: int) -> F.Column:
            return md5_long(c, F.lit(str(i)))

        def bhash(b: int, cols: list) -> F.Column:
            return md5_long(F.lit(str(b)), *[c.cast("string") for c in cols])
    else:
        def shash(c, i: int) -> F.Column:
            return F.xxhash64(c, F.lit(i))

        def bhash(b: int, cols: list) -> F.Column:
            return F.xxhash64(F.lit(b), *cols)

    return shash, bhash


def token_shingles_long(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per doc, LONG form (id, s).

    Shape: no shuffle beyond _widen's conditional round-robin exchange
    (a no-op whenever the input scan already has >= defaultParallelism
    splits — always true on a real corpus, only the tiny local fixtures
    trigger it). split() lives in its own named projection, and
    CollapseProject refuses to inline a non-cheap expression referenced
    more than once (size + the transform lambda), so the tokenizer regex
    runs exactly once per row (verified: one `split(` in the physical
    plan) while shingle assembly stays a narrow slice/concat transform.
    This replaces the previous token-posexplode + window-lead form, whose
    (id, pos) window shuffled every token row.

    distinct=False skips the per-doc shingle dedup shuffle; callers whose
    aggregate is duplicate-insensitive (minhash min()) save a full
    shuffle of the exploded shingle stream.
    """
    toks = _widen(
        df.select(id_col, F.split(NORM(F.col(text_col)), " ").alias("__t"))
    )
    shingle = _shingle_expr(n)
    out = toks.select(
        id_col,
        F.explode(F.when(F.size("__t") >= n, F.expr(shingle))
                  .otherwise(F.array().cast("array<string>"))).alias("s"),
    )
    return out.distinct() if distinct else out


def token_shingles(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingle arrays per doc (distinct shingles).

    Array form over token_shingles_long; docs shorter than n tokens keep
    an empty array (not a dropped row)."""
    arr = token_shingles_long(df, id_col, text_col, n).groupBy(id_col).agg(
        F.collect_list("s").alias("shingles")
    )
    return (
        df.select(id_col).join(arr, id_col, "left")
        .withColumn(
            "shingles",
            F.coalesce(F.col("shingles"), F.array().cast("array<string>")),
        )
    )


def minhash_bands(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  num_hashes: int = 32, bands: int = 8,
                  hasher: str = "xxhash64") -> DataFrame:
    """Banded minhash rows (id, band, bucket) — the persistable LSH
    index relation. minhash_lsh_pairs self-joins this for within-corpus
    dedup; dedup_against_index writes it out once per corpus (via
    catalog.write_table) and joins each new crawl batch's bands against
    it, so an incremental batch pays O(batch) hashing instead of an
    O(corpus) recompute. hasher/n/num_hashes/bands are part of the index
    schema contract — a batch matched against an index built with
    different parameters silently finds nothing.
    """
    rows_per_band = num_hashes // bands
    # Long-form shingles + codegen'd min aggregates instead of per-row
    # interpreted higher-order folds: num_hashes parallel mins over
    # (doc, shingle) rows run in whole-stage codegen with map-side partial
    # aggregation, and the shuffle carries only num_hashes longs per doc.
    # distinct=False: min() is duplicate-insensitive, so the shingle
    # dedup shuffle would be pure waste here. (The shingle helper's own
    # _widen already spreads undersized local scans to full width.)
    _shash, _bhash = _hash_fns(hasher)

    ex = token_shingles_long(df, id_col, text_col, n, distinct=False)
    sig = ex.groupBy(id_col).agg(*[
        F.min(_shash(F.col("s"), i)).alias(f"h{i}") for i in range(num_hashes)
    ])
    # Materialize the signature table: `banded` below is referenced three
    # times (bucket sizes + both join sides), and without a cut Spark
    # re-evaluates the whole shingle pipeline per reference (~4x the cost
    # of the query). sig is the compact point — num_hashes longs per doc;
    # at corpus scale this is exactly the table a production LSH job
    # writes out before banding.
    sig = sig.localCheckpoint(eager=True)
    return sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            _bhash(b, [F.col(f"h{b * rows_per_band + r}")
                       for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band", "bucket"),
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 32, bands: int = 8,
                      max_bucket: int = 64,
                      hasher: str = "xxhash64") -> DataFrame:
    """Candidate near-duplicate doc pairs via minhash banding.

    rows_per_band = num_hashes // bands; collision prob ~ 1-(1-s^r)^b.

    hasher="xxhash64" (default): the fast JVM hash — value-checked
    locally by the pure-Python XXH64 oracle (tests/xxh64.py).
    hasher="md5": 60-bit ints from the md5 hex prefix — slower, but
    byte-reproducible in ANY engine with md5 (the DuckDB-oracled
    contract variant, q36); conv(hex,16,10) on 15 hex digits stays
    inside a signed 64-bit value.

    Skew guard (`max_bucket`): buckets larger than max_bucket are dropped
    before the pair join — an oversized bucket is non-discriminative
    (boilerplate/template collisions) and would produce |B|^2 pairs; the
    standard production mitigation is to skip it (the pairs it would
    contribute are almost all false positives the verify step would
    reject anyway). Dropped-bucket counts should be surfaced in stage
    metrics when used inside the pipeline.
    """
    banded = minhash_bands(df, id_col, text_col, n, num_hashes, bands,
                           hasher)
    sizes = banded.groupBy("band", "bucket").count()
    banded = (
        banded.join(sizes.filter(F.col("count") <= max_bucket), ["band", "bucket"])
        .drop("count")
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame | None = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact word-n-gram Jaccard on candidate pairs (or LSH candidates).

    Output: a, b, jaccard (round 4) — pairs >= threshold.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(df, id_col, text_col, n)
    sh = token_shingles(df, id_col, text_col, n)
    sa = sh.select(F.col(id_col).alias("a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingles").alias("sh_b"))
    joined = pairs.join(sa, "a").join(sb, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn(
            "jaccard",
            F.round(F.when(union == 0, 0.0).otherwise(inter / union), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def set_similarity_join(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.5) -> DataFrame:
    """Exact token-set Jaccard self-join via prefix filtering (the
    All-Pairs / SSJoin / PPJoin family) — the third blocking strategy
    next to MinHash-LSH (probabilistic) and SimHash (bitwise): EXACT
    results (no recall loss) with candidate generation still bucketed,
    never all-pairs.

    Sets are distinct whitespace tokens (the q15 tokenizer). Every set
    is sorted under one global total order — document frequency
    ascending, token ascending (rare-first; fully deterministic) — and
    only its PREFIX of length n - ceil(t*n) + 1 is exploded as join
    keys. Classic prefix-filtering guarantee: two sets with J >= t must
    share at least one token inside both prefixes under a common order,
    so the token-keyed candidate join is lossless. Size filter
    (t*|larger| <= |smaller|, a J >= t necessity) prunes before the
    verify. Output: a, b, inter, uni, jaccard (unrounded IEEE double
    from the two BIGINT operands — oracle-hashable) for pairs >= t.

    Shuffle shape at 100 TB: df-count agg (token-keyed, partial), one
    regroup to rebuild sorted sets, the candidate join keyed by PREFIX
    tokens — rare-first ordering makes prefix tokens the LOW-frequency
    ones, so bucket fan-out stays small exactly where a naive
    token-join explodes (stopword buckets are never prefix members of
    large sets); verify joins are id-keyed on candidates only. Brute
    force appears nowhere except the DuckDB oracle (q59).
    """
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                 lambda t: t != ""))
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("ts"))
        .filter(F.size("ts") > 0)
    )
    dfreq = (
        base.select(F.explode("ts").alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    ordered = (
        base.select("id", F.size("ts").alias("n"),
                    F.explode("ts").alias("tok"))
        .join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.first("n").alias("n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("ts"),
        )
    )
    # EXACT rational threshold arithmetic. ceil(t*n) computed through a
    # float rounds the wrong way on exact-product boundaries (0.55*100
    # = 55.000000000000007 -> ceil 56 -> prefix one token SHORT of the
    # lossless bound — a silent recall hole in an operator whose whole
    # contract is "no recall loss"). t is taken at its DECIMAL face
    # value (str(threshold)) as p/q; ceil(n*p/q) = (n*p + q - 1) DIV q
    # in BIGINTs, and every t-comparison below is cross-multiplied.
    from decimal import Decimal

    p_, q_ = Decimal(str(threshold)).as_integer_ratio()
    plen = (F.col("n")
            - F.expr(f"CAST((n * {p_} + {q_ - 1}) DIV {q_} AS INT)")
            + 1).cast("int")
    pref = ordered.select(
        "id", "n", F.explode(F.slice("ts", F.lit(1), plen)).alias("tok"))
    a, b = pref.alias("pa"), pref.alias("pb")
    cand = (
        a.join(b, (F.col("pa.tok") == F.col("pb.tok"))
               & (F.col("pa.id") < F.col("pb.id"))
               # size filter n_small >= t * n_large, cross-multiplied
               & (F.col("pa.n") * q_ >= F.col("pb.n") * p_)
               & (F.col("pb.n") * q_ >= F.col("pa.n") * p_))
        .select(F.col("pa.id").alias("a"), F.col("pb.id").alias("b"))
        .distinct()
    )
    fa = ordered.select(F.col("id").alias("a"), F.col("ts").alias("ts_a"))
    fb = ordered.select(F.col("id").alias("b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b")).cast("long")
    uni = (F.size("ts_a") + F.size("ts_b")).cast("long") - inter
    return (
        cand.join(fa, "a").join(fb, "b")
        .select("a", "b", inter.alias("inter"), uni.alias("uni"),
                (inter / uni).alias("jaccard"))
        # J >= t exactly: inter/uni >= p/q  <=>  inter*q >= uni*p
        .filter(F.col("inter") * q_ >= F.col("uni") * p_)
    )


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 64,
            hasher: str = "xxhash64") -> DataFrame:
    """SimHash per document, JVM-side (64-bit with the default hasher).

    For each bit i: sum over tokens of sign(bit i of hash(token));
    bit set if the sum is positive. Near-dups differ in few bits
    (compare via hamming_distance helper below).

    hasher="md5" uses the 60-bit md5 hex-prefix family (bits <= 60) —
    byte-reproducible in any engine with md5, the DuckDB-oracled
    contract variant (q37); xxhash64 stays the fast path with its local
    pure-Python oracle.
    """
    # Explode tokens -> codegen'd conditional sums per bit (relational
    # aggregation with map-side partials beats interpreted per-row
    # higher-order folds — same reasoning as minhash_lsh_pairs).
    if hasher == "md5":
        from ..functions.hashutil import md5_long

        assert bits <= 60, "md5 hex-prefix family yields 60 usable bits"
        # single arg: concat_ws adds no separator, bytes identical to md5(t)
        th = md5_long(F.col("t"))
    else:
        th = F.xxhash64("t")
    ex = _widen(df).select(
        id_col,
        F.explode(F.split(NORM(F.col(text_col)), " ")).alias("t"),
    ).withColumn("h", th)
    votes = ex.groupBy(id_col).agg(*[
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ])
    sim = None
    for i in range(bits):
        # shiftleft handles bit 63 (a Python-side 1<<63 literal overflows)
        bit = F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit  # disjoint bits: sum == OR
    return votes.select(id_col, sim.alias("simhash"))


def hamming_pairs(sim_df: DataFrame, id_col: str = "doc_id",
                  max_distance: int = 3, prefix_bits: int = 16) -> DataFrame:
    """SimHash near-dup pairs, blocked on 4 rotated 16-bit prefixes.

    With <= 3 differing bits out of 64, at least one of the four 16-bit
    quarters is identical (pigeonhole) -> block on each quarter, verify
    hamming distance via bit_count(xor).
    """
    quarters = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), q * prefix_bits)
        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
        for q in range(64 // prefix_bits)
    ])
    blocked = sim_df.select(
        id_col, "simhash", F.posexplode(quarters).alias("q", "block")
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    return (
        l.join(r, (F.col("l.q") == F.col("r.q"))
               & (F.col("l.block") == F.col("r.block"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        bucketed: bool = True,
                        dim: int | None = None,
                        bits: int = 6, bands: int = 4,
                        seed: int = 42, probes: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a, b, cosine).

    bucketed=True (the default — the only shape that survives 100 TB):
    `bands` independent random-hyperplane signatures of `bits` bits each
    (OR-banding); ids colliding in ANY band become candidates, then the
    EXACT cosine verifies within candidates. Output is therefore always a
    subset of brute force with zero false positives; recall is the
    standard 1-(1-p^bits)^bands with p = 1 - theta/pi (for cos >= 0.95,
    bits=6 x bands=4 gives ~0.95+). The shuffle is keyed by
    (band, bucket) — uniform by construction.

    probes > 0 turns on multi-probe within each band (simsearch's
    mechanism, shared): ONE join side additionally lands in the `probes`
    buckets reached by flipping its lowest-|margin| signature bits, so a
    pair split by a single near-zero-margin plane still collides
    (one-sided probing covers both directions because either member can
    be the probing side). Recall rises toward brute force at
    ~(1+probes)x candidate volume at fixed bands/bits — measured in
    test_dedup.test_embedding_near_dups_multiprobe_recall.

    bucketed=False: O(n^2) all-pairs cross join — the oracle/contract
    path (q17 compares it against a DuckDB cross join at sf0.01); never
    the default.
    """
    v = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("l.v"), F.col("r.v"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    cos = F.when(
        (F.col("l.nrm") == 0) | (F.col("r.nrm") == 0), F.lit(0.0)
    ).otherwise(dot / (F.col("l.nrm") * F.col("r.nrm")))
    l, r = v.alias("l"), v.alias("r")
    if not bucketed:
        joined = l.join(r, F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    else:
        from .simsearch import hyperplane_signature, probe_buckets

        if dim is None:
            # metadata probe: one row; on an EMPTY input any dim works
            # (every stage below is empty-safe), so don't crash. max()
            # over a non-null filter, not first(): first() can land on
            # a row with a NULL embedding (size -> null -> int(None)
            # TypeError on the driver).
            row = emb.agg(F.max(F.size(vec_col))).first()
            dim = int(row[0]) if row is not None and row[0] is not None else 1
        probe_side = exact_side = None
        for band in range(bands):
            s = hyperplane_signature(
                emb.select(id_col, vec_col), dim, bits, vec_col,
                seed + band, with_margins=probes > 0,
            )
            e_side = s.select(id_col, F.lit(band).alias("band"), "bucket")
            if probes > 0:
                p_side = probe_buckets(s, probes, bits).select(
                    id_col, F.lit(band).alias("band"), "bucket")
            else:
                p_side = e_side
            probe_side = (p_side if probe_side is None
                          else probe_side.unionByName(p_side))
            exact_side = (e_side if exact_side is None
                          else exact_side.unionByName(e_side))
        # probes=0: both sides are identical, so the asymmetric < join
        # produces each colliding pair exactly once. With probing the
        # sides differ and either member may be the prober, so the join
        # must be symmetric (!=) with least/greatest restoring canonical
        # (a < b) orientation — at 2x pre-distinct volume, which is why
        # the non-probing default keeps the cheap form.
        on = (F.col("cl.band") == F.col("cr.band")) & (
            F.col("cl.bucket") == F.col("cr.bucket"))
        if probes > 0:
            on = on & (F.col(f"cl.{id_col}") != F.col(f"cr.{id_col}"))
        else:
            on = on & (F.col(f"cl.{id_col}") < F.col(f"cr.{id_col}"))
        cand = (
            probe_side.alias("cl").join(exact_side.alias("cr"), on)
            .select(
                F.least(F.col(f"cl.{id_col}"),
                        F.col(f"cr.{id_col}")).alias("__a"),
                F.greatest(F.col(f"cl.{id_col}"),
                           F.col(f"cr.{id_col}")).alias("__b"),
            )
            .distinct()
        )
        joined = (
            cand.join(l, F.col("__a") == F.col(f"l.{id_col}"))
            .join(r, F.col("__b") == F.col(f"r.{id_col}"))
        )
    return (
        joined.select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_occurrences: int = 1) -> DataFrame:
    """Corpus-wide duplicated-paragraph removal (CCNet-style boilerplate
    filter): drop every paragraph whose normalized form occurs in more
    than `max_occurrences` documents, then reassemble each document with
    its remaining paragraphs in original order.

    Output: id, text (cleaned), n_paragraphs, n_removed.

    Shape at scale: explode -> one hash-keyed count shuffle (map-side
    partial agg; the md5 key space is uniform, no skew) -> hash join back
    -> one doc-keyed regroup. Empty documents survive as empty text.
    """
    paras = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("p_pos", "para"),
    ).withColumn("p_hash", F.md5(NORM(F.col("para"))))
    counts = paras.groupBy("p_hash").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs_with")
    )
    marked = paras.join(counts, "p_hash")
    kept = marked.filter(F.col("n_docs_with") <= max_occurrences)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p_pos"), F.col("para")))
                ),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paragraphs"))
    return (
        df.select(id_col).join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias("n_paragraphs"),
            (F.coalesce(F.col("n_paragraphs"), F.lit(0))
             - F.coalesce(F.col("__n_kept"), F.lit(0))).alias("n_removed"),
        )
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 64,
    jaccard_threshold: float = 0.8,
    hasher: str = "xxhash64",
) -> DataFrame:
    """The actionable form of near-dup detection: every doc labeled with
    its duplicate-cluster id and a keep/drop decision.

    minhash-LSH candidates -> exact n-gram Jaccard verify -> alternating
    large/small-star connected components over the verified pairs ->
    cluster_id = the cluster's minimum doc id, keep = (id == cluster_id)
    (deterministic keeper; singletons keep themselves). This is what a
    corpus-scale dedup job writes back next to the corpus — pairs alone
    are not consumable downstream.

    Output: (id_col, cluster_id, keep). Ids are zero-padded through the
    string-keyed CC and cast back, so lexicographic == numeric order.
    """
    from .linking import connected_components

    pairs = minhash_lsh_pairs(df, id_col, text_col, n, num_hashes, bands,
                              max_bucket, hasher=hasher)
    verified = ngram_jaccard_pairs(df, pairs, id_col, text_col, n,
                                   jaccard_threshold)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")
    comps = connected_components(
        verified.select(pad("a").alias("a"), pad("b").alias("b"))
    )
    m = comps.select(
        F.col("node").cast("bigint").alias(id_col),
        F.col("comp").cast("bigint").alias("cluster_id"),
    )
    return (
        df.select(id_col).join(m, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )


def repeated_spans(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", window: int = 16) -> DataFrame:
    """Verbatim repeated-span detection — the suffix-array substring
    dedup of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better") re-expressed for Spark: every
    `window`-token sliding window (stride 1, whitespace tokens as in
    textstats.chunk_documents) is hashed with md5_long; a window whose
    hash occurs more than once ANYWHERE in the corpus (cross- or
    intra-document) marks its token range [g, g+window-1] as
    duplicated; per document, overlapping-or-adjacent marked ranges
    merge into maximal spans (gaps-and-islands). Downstream, a cleaner
    cuts those token ranges (keeping one canonical occurrence is a
    policy choice layered on top — this op reports WHERE the verbatim
    duplication is).

    Output: (id, span_start 1-based, span_end inclusive, span_tokens,
    n_dup_windows) — all BIGINT, fully DuckDB-oracled (q65).

    Shape at scale: the stride-1 explode is one row per corpus token —
    the honest cost of substring-level dedup (same cardinality as any
    tokenize-explode); each row carries only (id, pos, 8-byte hash).
    Duplicate detection is groupBy(hash).count, which map-side-combines
    (a boilerplate window repeated 10^6 times collapses to one row per
    mapper before the shuffle — this is why it is NOT a window count,
    which would shuffle+sort every raw occurrence of a hot hash into
    one task), then an inner hash-join back on the uniform 60-bit key
    (AQE skew-split applies). The interval merge is one doc-keyed
    window + one aggregate.
    """
    from ..functions.hashutil import md5_long

    if window < 1:
        raise ValueError("repeated_spans: window must be >= 1")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    base = (
        df.select(F.col(id_col), toks.alias("__t"))
        .withColumn("__n", F.size("__t"))
        .filter(F.col("__n") >= window)
    )
    wins = (
        _widen(base)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.col("__n") - window + 1)
            ).alias("__g"),
            "__t",
        )
        .select(
            F.col(id_col), "__g",
            md5_long(
                F.array_join(F.slice("__t", F.col("__g"), window), " ")
            ).alias("__h"),
        )
    )
    dup = (
        wins.groupBy("__h").count()
        .filter(F.col("count") > 1)
        .select("__h", F.col("count").alias("__c"))
    )
    marked = wins.join(dup, "__h").select(
        id_col, "__g", (F.col("__g") + window - 1).alias("__e")
    )
    from pyspark.sql import Window as W

    w_doc = W.partitionBy(id_col).orderBy("__g")
    prev_end = F.max("__e").over(
        w_doc.rowsBetween(W.unboundedPreceding, -1))
    gi = (
        marked
        .withColumn(
            "__brk",
            F.when(F.col("__g") > F.coalesce(prev_end, F.lit(-1)) + 1, 1)
            .otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__brk").over(w_doc.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return (
        gi.groupBy(id_col, "__island")
        .agg(
            F.min("__g").alias("span_start"),
            F.max("__e").alias("span_end"),
            F.count("*").alias("n_dup_windows"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long").alias("span_tokens"),
            F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        )
    )


def cut_repeated_spans(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", window: int = 16,
                       spans: DataFrame | None = None) -> DataFrame:
    """Token-level span cutting — the cleaning half of substring dedup:
    remove every token position covered by a repeated_spans span and
    re-join the survivors with single spaces (token-level cleaning;
    original whitespace is not preserved, matching chunk_documents'
    token convention).

    Policy: cut-ALL — every marked occurrence goes, including the
    first. Keep-one-canonical-copy (Lee et al.'s policy) is a keeper
    rule layered on the spans relation: filter `spans` down to the
    occurrences you want cut and pass it in (the parameter exists for
    exactly that), the cutting mechanics are identical.

    Output: (id, clean_text, n_tokens bef, n_kept, n_cut) — portable,
    DuckDB-oracled end-to-end through q65's span pipeline (q66).

    Shape at scale: spans-per-doc is tiny (merged maximal intervals),
    so the cut is one span groupBy + one doc-keyed join, then pure
    JVM higher-order functions: filter tokens by position with a
    nested exists over the doc's span array — no explode back to
    token rows, no Python, no extra shuffle.
    """
    if spans is None:
        spans = repeated_spans(df, id_col, text_col, window)
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp")
    )
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__t"))
    j = base.join(sp, id_col, "left")

    def _covered(i):
        return F.coalesce(
            F.exists(
                "__sp",
                lambda s: (i + 1 >= s["span_start"])
                & (i + 1 <= s["span_end"]),
            ),
            F.lit(False),
        )

    kept = F.filter("__t", lambda t, i: ~_covered(i))
    return j.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size("__t").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_cut"),
    )


def filter_index_buckets(index: DataFrame, max_bucket: int) -> DataFrame:
    """Skew guard over a persisted band index: drop oversized (band,
    bucket) groups (boilerplate buckets — non-discriminative, as in
    minhash_lsh_pairs). Shared by the batch and streaming index-dedup
    paths so the guard's semantics can't drift between them."""
    sizes = index.groupBy("band", "bucket").count()
    return (
        index.join(sizes.filter(F.col("count") <= max_bucket),
                   ["band", "bucket"])
        .drop("count")
    )


def dedup_against_index(new_docs: DataFrame, index: DataFrame,
                        old_docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        num_hashes: int = 32, bands: int = 8,
                        max_bucket: int = 64, threshold: float = 0.8,
                        hasher: str = "xxhash64") -> DataFrame:
    """Incremental near-dup dedup of a crawl batch against the
    accumulated corpus: `index` is minhash_bands(old corpus) persisted
    once (catalog.write_table) and re-read per batch, so each batch pays
    O(batch) shingle hashing + one band-keyed join against the index —
    never an O(corpus) signature recompute or a within-corpus self-join.
    This is the batch twin of streaming/ingest's recrawl dedup, for
    history beyond any watermark.

    new_docs and old_docs must have disjoint ids (crawl batches mint new
    ids); within-batch duplicates are minhash_lsh_pairs(new_docs)'s job.
    The skew guard drops oversized INDEX buckets (boilerplate buckets;
    non-discriminative, as in minhash_lsh_pairs) — the batch side is
    small by construction. num_hashes/bands/n/hasher must match the
    index build (part of the index schema contract).

    Output: (a = new id, b = old id, jaccard round-4) — verified exact
    n-gram Jaccard >= threshold, same verify as ngram_jaccard_pairs.
    Fully DuckDB-oracled with hasher="md5" (q67).
    """
    idx = filter_index_buckets(index, max_bucket)
    new_b = minhash_bands(new_docs, id_col, text_col, n, num_hashes,
                          bands, hasher)
    cand = (
        new_b.alias("l").join(
            idx.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket")),
        )
        .select(F.col(f"l.{id_col}").alias("a"),
                F.col(f"r.{id_col}").alias("b"))
        .distinct()
        # referenced three times below (pair relation + both id prunes)
        .localCheckpoint(eager=True)
    )
    # Semi-join BOTH doc sides down to candidate ids BEFORE the verify:
    # ngram_jaccard_pairs shingles whatever corpus it is handed, and the
    # id filter cannot be pushed through its shingle groupBy — without
    # this prune every batch re-tokenized the ENTIRE old corpus,
    # violating the O(batch) contract above (candidates are O(batch) by
    # construction: each is anchored at a new doc).
    # broadcast the id sides: they are candidate-bounded (O(batch)), and
    # a shuffle semi-join would move the full old-corpus text instead
    a_ids = F.broadcast(cand.select(F.col("a").alias(id_col)).distinct())
    b_ids = F.broadcast(cand.select(F.col("b").alias(id_col)).distinct())
    corpus = (
        new_docs.join(a_ids, id_col, "left_semi").select(id_col, text_col)
        .unionByName(
            old_docs.join(b_ids, id_col, "left_semi")
            .select(id_col, text_col))
    )
    return ngram_jaccard_pairs(corpus, cand, id_col, text_col, n,
                               threshold)


def minhash_bands_narrow(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 3,
                         num_hashes: int = 32, bands: int = 8,
                         hasher: str = "xxhash64",
                         keep: tuple = (),
                         keep_shingles: bool = False) -> DataFrame:
    """Per-row, ZERO-shuffle twin of minhash_bands — identical output
    rows (pinned by test): h_i = array_min(transform(shingles,
    s -> hash(s, i))) equals the exploded groupBy-min because both are
    the min of the same hashed multiset; band hashes then use the same
    _hash_fns recipe. Docs shorter than n tokens emit no rows, as in
    the exploded form.

    Because there is no aggregation, this form runs UNCHANGED on a
    stream — no state, no watermark — which is what makes stream-static
    dedup against a persisted index possible (streaming.ingest.
    dedup_against_index_stream). `keep` passes through extra columns
    (e.g. the event-time column); `keep_shingles` adds the distinct
    shingle array (token_shingles semantics) so a downstream verify can
    compute exact Jaccard without rejoining the stream.

    Trade: num_hashes array traversals per row instead of one shuffle.
    In a micro-batch, or when the corpus scan is already wide, that is
    the right trade; for bulk index builds prefer minhash_bands (its
    exploded form partial-aggregates map-side and its signature table
    localCheckpoints for reuse).
    """
    rows_per_band = num_hashes // bands
    shash, bhash = _hash_fns(hasher)
    toks = df.select(
        id_col, *keep, F.split(NORM(F.col(text_col)), " ").alias("__t")
    )
    sh = toks.select(
        id_col, *keep,
        F.when(F.size("__t") >= n, F.expr(_shingle_expr(n)))
        .otherwise(F.array().cast("array<string>")).alias("__sh"),
    )
    # NB: the transform lambda must be single-argument — a two-arg
    # lambda would make Spark bind the second parameter to the array
    # INDEX, silently replacing the seed.
    def _minhash(i: int) -> F.Column:
        return F.array_min(F.transform("__sh", lambda s: shash(s, i)))

    extra = (
        [F.array_distinct("__sh").alias("shingles")] if keep_shingles
        else []
    )
    sig = sh.filter(F.size("__sh") > 0).select(
        id_col, *keep, *extra,
        *[_minhash(i).alias(f"h{i}") for i in range(num_hashes)],
    )
    out_extra = ["shingles"] if keep_shingles else []
    return sig.select(
        F.col(id_col), *keep, *out_extra,
        F.posexplode(F.array(*[
            bhash(b, [F.col(f"h{b * rows_per_band + r}")
                      for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band", "bucket"),
    )


def kmeans_centroids(emb: DataFrame, nlist: int = 8,
                     vec_col: str = "embedding", seed: int = 42,
                     max_iter: int = 10) -> DataFrame:
    """Production coarse quantizer for semantic_dedup: seeded MLlib
    KMeans over the embedding column (the same quantizer simsearch's
    ivf_topk fits), returned as the (cluster int, centroid
    array<double>) relation semantic_dedup consumes. One MLlib pass at
    corpus scale; the contract path substitutes a deterministic fixed
    centroid set instead (q77) because MLlib cluster centers are not
    engine-portable."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    feats = emb.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("__features"))
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter,
                featuresCol="__features").fit(feats)
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(km.clusterCenters())]
    return spark.createDataFrame(centers, "cluster int, centroid array<double>")


def semantic_dedup(emb: DataFrame, centroids: DataFrame | None = None,
                   nlist: int = 8, threshold: float = 0.82,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   seed: int = 42,
                   literal_nlist_max: int = 64) -> DataFrame:
    """SemDeDup-style embedding-cluster semantic dedup (Abbas et al.
    2023, arXiv:2303.09540): cluster the corpus embeddings, then prune
    near-duplicates WITHIN each cluster so the quadratic comparison is
    bounded by cluster size, never all-pairs.

    Rule (deterministic, engine-portable):
      1. assign each vector to the nearest centroid by squared L2
         (d2 = <v,v> - 2<v,c> + <c,c>; ties -> lowest cluster id);
      2. rank cluster members by cosine-to-centroid DESC (ties ->
         lowest id);
      3. prune a member iff some EARLIER-ranked member of its cluster
         has cosine >= threshold with it — SemDeDup's screening rule
         (sort by similarity to centroid, drop an item when its max
         cosine to the items ahead of it crosses the threshold). Each
         cluster's rank-1 member is always kept.

    centroids: (cluster int, centroid array<double>); None fits the
    seeded MLlib quantizer (kmeans_centroids — production). The q77
    contract path passes a FIXED centroid set (rows of the embeddings
    table), which makes the whole operator DuckDB-expressible: every
    dot product is the same sequential left fold on both engines (the
    q17-proven recipe), so d2 / cosine doubles are bit-identical and
    ranking + thresholding agree repr-exactly.

    Rows with NULL/empty vectors are dropped (can't be clustered), and
    so are vectors carrying a non-finite component (NaN/inf distances
    poison every comparison: a strict-< argmin never selects, and the
    pre-fix fold then crashed on element_at(..., 0) under ANSI mode —
    one bad embedding must not kill a corpus-scale job). Output:
    (id_col, cluster int, rank_in_cluster bigint, kept boolean) —
    integers/booleans only, no rounded floats in hashed columns.

    Shape at 100 TB: centroid assignment has two physical strategies,
    picked by centroid count. Up to `literal_nlist_max` centroids
    (contract scale) they are collected driver-side (scalar-bounded,
    OPERATORS.md driver-action audit) and folded as literal arrays — a
    ZERO-shuffle narrow map. Above that, literal folds are the wrong
    shape (nlist x dim expression nodes would blow up Catalyst analysis
    long before the paper's ~50k-cluster design point), so assignment
    switches to a broadcast nested-loop join against the centroid
    relation + a map-side-combinable min_by(struct(d2, cluster)) argmin
    — one keyed shuffle of N pre-reduced rows, no driver collect.
    Ranking is one cluster-keyed shuffle; the screening self-join is
    keyed by cluster, so cost is sum(|cluster|^2) — the paper's design
    point: nlist grows as N/target_cluster_size (LAION runs use ~50k
    clusters). A pathologically hot cluster is fixed by raising nlist,
    exactly like the LSH bucket guard.
    """
    from pyspark.sql import Window as W

    if centroids is None:
        centroids = kmeans_centroids(emb, nlist=nlist, vec_col=vec_col,
                                     seed=seed)
    centroids = centroids.select("cluster", "centroid")
    ncent = centroids.count()   # scalar action; centroid sets are small
    if ncent == 0:
        raise ValueError("semantic_dedup: empty centroid set")

    # drop unusable vectors: NULL/empty, and any non-finite component
    # (isnan(x - x) is true for both NaN and +/-inf)
    v0 = (
        emb.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("__v"))
        .filter(~F.exists("__v", lambda x: F.isnan(x - x)))
        .withColumn("__self", F.aggregate(
            "__v", F.lit(0.0), lambda a, x: a + x * x))
    )

    if ncent <= literal_nlist_max:
        # literal-fold path: nlist rows collected driver-side
        # (scalar-bounded, like simsearch's clusterCenters collect) buy
        # a shuffle-free assignment stage
        crows = sorted(
            ((int(r["cluster"]), [float(x) for x in r["centroid"]])
             for r in centroids.collect()),
            key=lambda t: t[0],
        )

        # <c,c> as a sequential Python fold — the same left-to-right
        # IEEE adds as the engine/oracle folds, so the literal is
        # bit-identical to DuckDB's list_dot_product(ce, ce).
        def _self_dot(vec):
            s = 0.0
            for x in vec:
                s += x * x
            return s

        cids = F.array(*[F.lit(c) for c, _ in crows])
        cselfs = F.array(*[F.lit(_self_dot(v)) for _, v in crows])

        def _dot_lit(vec):
            lits = F.array(*[F.lit(x) for x in vec])
            return F.aggregate(
                F.zip_with(F.col("__v"), lits, lambda x, y: x * y),
                F.lit(0.0), lambda a, x: a + x,
            )

        n = len(crows)
        assigned = (
            v0
            .withColumn("__dots",
                        F.array(*[_dot_lit(vec) for _, vec in crows]))
            .withColumn("__d2s", F.zip_with(
                "__dots", cselfs,
                lambda d, cs: F.col("__self") - F.lit(2.0) * d + cs))
            # argmin fold, strict < -> earliest (= lowest cluster id)
            # wins ties
            .withColumn("__best", F.aggregate(
                F.sequence(F.lit(1), F.lit(n)),
                F.struct(F.lit(0).alias("i"),
                         F.lit(float("inf")).alias("d")),
                lambda acc, i: F.when(
                    F.element_at(F.col("__d2s"), i) < acc["d"],
                    F.struct(i.alias("i"),
                             F.element_at(F.col("__d2s"), i).alias("d")),
                ).otherwise(acc)))
            # overflow guard: finite inputs can still square/sum to inf,
            # making every d2 inf or NaN so the strict-< fold never
            # fires; clamp to the first (lowest-id) centroid instead of
            # element_at(..., 0) (INVALID_INDEX_OF_ZERO under ANSI)
            .withColumn("__bi", F.greatest(F.col("__best.i"), F.lit(1)))
            .withColumn("cluster", F.element_at(cids, F.col("__bi")))
            .withColumn("__cdot", F.element_at("__dots", F.col("__bi")))
            .withColumn("__cself", F.element_at(cselfs, F.col("__bi")))
        )
    else:
        # join path: at the paper's ~50k-cluster design point, literal
        # folds would put nlist x dim nodes into one projection —
        # Catalyst fails long before that. Broadcast the centroid
        # relation, score every (vector, centroid) pair map-side, and
        # take the per-id argmin with a min(struct) aggregate: partial
        # aggregation pre-reduces each id's nlist rows before the one
        # keyed shuffle. Struct order (d2, cluster) keeps the tie rule:
        # nearest centroid, ties -> lowest cluster id (NaN d2 sorts
        # last, so a finite candidate always wins when one exists).
        cent = centroids.select(
            F.col("cluster"),
            F.col("centroid").cast("array<double>").alias("__c"),
        ).withColumn("__cself", F.aggregate(
            "__c", F.lit(0.0), lambda a, x: a + x * x))
        pair_dot = F.aggregate(
            F.zip_with("__v", "__c", lambda x, y: x * y),
            F.lit(0.0), lambda a, x: a + x,
        )
        assigned = (
            v0.join(F.broadcast(cent))
            .withColumn("__cdot", pair_dot)
            .withColumn("__d2", F.col("__self") - F.lit(2.0)
                        * F.col("__cdot") + F.col("__cself"))
            .groupBy(id_col)
            .agg(
                F.min(F.struct("__d2", "cluster", "__cdot",
                               "__cself")).alias("__b"),
                F.first("__v").alias("__v"),
                F.first("__self").alias("__self"),
            )
            .select(id_col, "__v", "__self",
                    F.col("__b.cluster").alias("cluster"),
                    F.col("__b.__cdot").alias("__cdot"),
                    F.col("__b.__cself").alias("__cself"))
        )

    v = (
        assigned
        .withColumn("__cosc", F.when(
            (F.col("__self") == 0) | (F.col("__cself") == 0), F.lit(0.0)
        ).otherwise(F.col("__cdot")
                    / (F.sqrt("__self") * F.sqrt("__cself"))))
        .select(id_col, "cluster", "__v", "__self", "__cosc")
    )
    wr = W.partitionBy("cluster").orderBy(F.col("__cosc").desc(),
                                          F.col(id_col).asc())
    # consumed three times below (two self-join sides + the final left
    # join); cut so the assignment stage runs once
    ranked = v.withColumn(
        "rank_in_cluster", F.row_number().over(wr).cast("long")
    ).localCheckpoint(eager=True)
    i, j = ranked.alias("i"), ranked.alias("j")
    pair_dot = F.aggregate(
        F.zip_with(F.col("i.__v"), F.col("j.__v"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    pair_cos = F.when(
        (F.col("i.__self") == 0) | (F.col("j.__self") == 0), F.lit(0.0)
    ).otherwise(
        pair_dot / (F.sqrt(F.col("i.__self")) * F.sqrt(F.col("j.__self"))))
    pruned = (
        i.join(j, (F.col("i.cluster") == F.col("j.cluster"))
               & (F.col("j.rank_in_cluster") < F.col("i.rank_in_cluster")))
        .filter(pair_cos >= F.lit(threshold))
        .select(F.col(f"i.{id_col}").alias("__pruned_id"))
        .distinct()
    )
    return (
        ranked.join(pruned,
                    F.col(id_col) == F.col("__pruned_id"), "left")
        .select(F.col(id_col), F.col("cluster"), F.col("rank_in_cluster"),
                F.col("__pruned_id").isNull().alias("kept"))
    )
