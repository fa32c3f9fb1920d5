"""Entity linking + cross-document canonicalization.

Generalizes the reference's agreement check (J4: equi-join then cosine
verify, co_training.py:263-265) into the scalable two-phase pattern the
north star names explicitly:

  1. MinHash-LSH blocking on character-3-gram shingles of the normalized
     surface: band signatures -> groupBy band bucket -> candidate pairs.
     All hashing is JVM-side (xxhash64 with per-row seeds); candidate
     generation touches only DISTINCT surfaces, not mention rows.
  2. Verify: exact n-gram Jaccard similarity on the candidate pairs
     (the reference's cosine-check role).
  3. Canonicalize: hash-min label propagation (GraphFrames-style
     connected components) over the verified-pair edge set, with
     checkpointing every few rounds to truncate lineage — SURVEY §4's one
     hand-rolled iterative physical strategy.

Skew: surfaces follow a power law (popular entities appear in many
documents). Blocking dedups to distinct surfaces FIRST, so bucket sizes
are bounded by vocabulary, not corpus size; the final mention->entity join
broadcasts the (small) surface->entity map when it fits, else hash-joins
on a salted key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def surface_shingles(df: DataFrame, col: str = "surface", n: int = 3) -> DataFrame:
    """Distinct surfaces -> char n-gram shingle arrays (lowercased, padded)."""
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(concat('^', lower({col}), '$')) - {n - 1}, 1)), "
        f"i -> substring(concat('^', lower({col}), '$'), i, {n})))"
    )
    return df.select(col).distinct().withColumn("shingles", grams)


def minhash_signature(df: DataFrame, num_hashes: int = 16,
                      shingles_col: str = "shingles") -> DataFrame:
    """Per-surface minhash signature: min over xxhash64(shingle, seed_i).

    JVM-side only: one array-transform + aggregate per hash function.
    """
    sigs = F.array(*[
        F.aggregate(
            F.transform(F.col(shingles_col), lambda s: F.xxhash64(s, F.lit(i))),
            F.lit(2**63 - 1).cast("long"),
            lambda acc, h: F.least(acc, h),
        )
        for i in range(num_hashes)
    ])
    return df.withColumn("sig", sigs)


def lsh_candidate_pairs(df: DataFrame, bands: int = 4, rows_per_band: int = 4,
                        key: str = "surface", max_bucket: int = 256) -> DataFrame:
    """Band the signature, bucket-join surfaces sharing a band hash.

    Output: (a, b) candidate surface pairs with a < b (dedup across bands).
    Buckets larger than max_bucket are dropped (non-discriminative — see
    dedup.minhash_lsh_pairs; |B|^2 blow-up guard for power-law surfaces).
    """
    # Cut the plan: banded is referenced three times below (bucket sizes +
    # both join sides); without materialization the minhash fold re-runs
    # per reference. The signature table is compact (num_hashes longs per
    # distinct surface).
    df = df.localCheckpoint(eager=True)
    # Fail fast at the driver: banding reads sig[b*rows_per_band + r + 1]
    # up to bands*rows_per_band — past the signature length that's an
    # opaque INVALID_ARRAY_INDEX mid-stage under ANSI (silent NULL bands
    # with ANSI off), e.g. num_hashes=16 with bands=8, rows_per_band=4.
    # One-row probe over the just-checkpointed table: metadata-cheap.
    probe = df.select(F.size("sig").alias("n")).limit(1).collect()
    if probe and probe[0]["n"] < bands * rows_per_band:
        raise ValueError(
            f"lsh_candidate_pairs: bands*rows_per_band = "
            f"{bands * rows_per_band} exceeds signature length "
            f"{probe[0]['n']} (num_hashes at signature build)")
    banded = df.select(
        key,
        F.posexplode(
            F.array(*[
                F.xxhash64(
                    F.lit(b),
                    *[F.element_at("sig", b * rows_per_band + r + 1)
                      for r in range(rows_per_band)],
                )
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    sizes = banded.groupBy("band", "bucket").count()
    banded = (
        banded.join(sizes.filter(F.col("count") <= max_bucket), ["band", "bucket"])
        .drop("count")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{key}") < F.col(f"r.{key}")),
        )
        .select(F.col(f"l.{key}").alias("a"), F.col(f"r.{key}").alias("b"))
        .distinct()
    )
    return pairs


def jaccard_verify(pairs: DataFrame, shingled: DataFrame,
                   threshold: float = 0.6) -> DataFrame:
    """Exact n-gram Jaccard on candidates (the J4 'verify' step).

    round 4 per the reference's score convention (utils.py:70).
    """
    sa = shingled.select(F.col("surface").alias("a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("surface").alias("b"), F.col("shingles").alias("sh_b"))
    joined = pairs.join(sa, "a").join(sb, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn(
            "jaccard",
            F.round(
                F.when(union == 0, F.lit(0.0)).otherwise(inter / union), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(edges: DataFrame, max_iter: int = 20,
                         checkpoint_every: int = 5,
                         algorithm: str = "star") -> DataFrame:
    """(a, b) string edges -> (node, component).

    component = min surface (lexicographic) of the connected component —
    a deterministic canonical representative.

    algorithm="star" (default): alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — converges in O(log n) rounds regardless of graph
    diameter, the right shape for cross-document canonicalization where
    alias graphs can chain (a~b~c~...). algorithm="hashmin": one-hop
    min-label propagation — O(diameter) rounds; fine for the dense
    near-dup clusters LSH verify emits, kept for comparison/tests.

    `checkpoint_every` applies to the hashmin path only: star's per-round
    fixed-point probe materializes the edge set every round anyway, so it
    always checkpoints per round (the knob would buy nothing there).
    """
    if algorithm == "star":
        return _connected_components_star(edges, max_iter)
    return _connected_components_hashmin(edges, max_iter, checkpoint_every)


def _connected_components_star(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Alternating large-star/small-star rounds.

    large-star: every node points its LARGER neighbors at the minimum of
    its closed neighborhood; small-star: every node and its smaller
    neighbors contract onto that minimum. Each pair of rounds at least
    halves tree heights, so a 2^k-long chain needs ~k rounds (the
    200-node-path test pins < 10). All joins are keyed by node id —
    uniform shuffles; per-round localCheckpoint truncates lineage.
    Converged state is a star forest rooted at each component's minimum.
    """
    u, v = F.col("u"), F.col("v")
    e = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(u != v)
        .distinct()
    )
    nodes = (
        e.select(u.alias("node")).union(e.select(v.alias("node"))).distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for i in range(max_iter):
        # large-star over the symmetrized edge set
        sym = e.union(e.select(v.alias("u"), u.alias("v"))).distinct()
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("mn"), u).alias("m"))
        e1 = (
            sym.join(mins, "u")
            .filter(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .filter(u != v)
            .distinct()
        )
        # small-star: key every edge by its larger endpoint
        dirn = e1.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        mins2 = dirn.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            dirn.join(mins2, "u")
            .select(v.alias("u"), F.col("m").alias("v"))
            .union(mins2.select(u, F.col("m").alias("v")))
            .filter(u != v)
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Fixed point: the canonical (min,max) edge set stopped changing.
        # One tiny row: (count, order-free XOR of row hashes) — bit_xor
        # never overflows (ANSI mode) and distinct edges can't cancel.
        sig_row = (
            e2.select(F.least(u, v).alias("x"), F.greatest(u, v).alias("y"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(xxhash64(x, y))").alias("h"))
            .collect()[0]
        )
        sig = (sig_row["n"], sig_row["h"])
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    # Star forest: every non-root points at its root; roots label selves.
    labels = e.groupBy(u.alias("node")).agg(F.min("v").alias("comp"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce(F.col("comp"), F.col("node")).alias("comp"))
    )


def _connected_components_hashmin(edges: DataFrame, max_iter: int = 20,
                                  checkpoint_every: int = 5) -> DataFrame:
    """One-hop min-label propagation with periodic checkpoint+convergence
    probe (GraphFrames' classic algorithm)."""
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for i in range(max_iter):
        # neighbor's current label, min over neighbors and self
        nbr = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def canonicalize_entities(mentions: DataFrame,
                          num_hashes: int = 16,
                          bands: int = 4,
                          rows_per_band: int = 4,
                          jaccard_threshold: float = 0.6) -> DataFrame:
    """mentions -> entities(entity_id, canonical, aliases, n_mentions).

    entity_id is a deterministic hash of the canonical surface (stable
    across runs and cluster sizes).
    """
    # shingled feeds both the signature path and the Jaccard verify —
    # materialize once (distinct surfaces only, so it is vocabulary-sized).
    shingled = surface_shingles(mentions).localCheckpoint(eager=True)
    sigs = minhash_signature(shingled, num_hashes=num_hashes)
    pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    verified = jaccard_verify(pairs, shingled, threshold=jaccard_threshold)
    comps = connected_components(verified)

    # Singletons (no verified edge) canonicalize to themselves.
    all_surfaces = mentions.select("surface").distinct()
    mapping = (
        all_surfaces.join(comps.withColumnRenamed("node", "surface"), "surface", "left")
        .select(
            "surface",
            F.coalesce(F.col("comp"), F.col("surface")).alias("canonical"),
        )
    )
    counts = mentions.groupBy("surface").count()
    return (
        mapping.join(counts, "surface")
        .groupBy("canonical")
        .agg(
            F.sort_array(F.collect_set("surface")).alias("aliases"),
            F.sum("count").alias("n_mentions"),
        )
        .withColumn("entity_id", F.xxhash64("canonical"))
        .select("entity_id", "canonical", "aliases", "n_mentions")
    )


def surface_to_entity(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    """Attach entity_id to every mention; broadcast the alias map."""
    alias_map = entities.select(
        F.explode("aliases").alias("surface"), "entity_id", "canonical"
    )
    return mentions.join(F.broadcast(alias_map), "surface", "left")
