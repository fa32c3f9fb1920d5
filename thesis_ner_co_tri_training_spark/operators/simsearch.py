"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one JVM-side zip_with/aggregate dot
product per (query, candidate) pair, window top-k. Scale path: random-
hyperplane LSH bucketing — queries only probe their own bucket (and
optionally neighboring buckets via multi-probe), cutting the candidate
set by ~2^bits. Hyperplanes are deterministic pseudo-random vectors
derived from xxhash64(seed, dim_index) so every executor materializes the
same planes with no broadcast of real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.withColumn("__v", v).withColumn(
        "__nrm", F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    )


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). Small query sets broadcast; the scan
    over candidates stays partition-parallel with no shuffle until the
    final per-query top-k window (keyed by query_id — uniform).
    Output: query_id, vec_id, rank, cosine(round 4).
    """
    c = with_norm(candidates, vec_col).select(id_col, "__v", "__nrm")
    q = with_norm(queries, vec_col).select(
        F.col(query_id_col), F.col("__v").alias("__qv"), F.col("__nrm").alias("__qn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__qv"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    cos = F.when((F.col("__nrm") == 0) | (F.col("__qn") == 0), F.lit(0.0)).otherwise(
        dot / (F.col("__nrm") * F.col("__qn"))
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn("cosine", cos)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("cosine", 4).alias("cosine"))
    )


def _plane_component(plane: int, dim: int, seed: int) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), F.lit(dim))
    return (h.cast("double") / F.lit(float(2**63))).cast("double")


def hyperplane_signature(df: DataFrame, dim: int, bits: int = 8,
                         vec_col: str = "embedding", seed: int = 42,
                         with_margins: bool = False) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign pattern of dots).

    with_margins additionally emits `margins` (the raw per-plane dot
    products) — the multi-probe extension flips the lowest-|margin| bits,
    because a near-zero dot means the vector sits close to that plane and
    its true neighbors plausibly landed on the other side.

    Embeddings shorter than `dim` are ZERO-PADDED (try_element_at +
    coalesce): a plain element_at past the end would abort the whole
    stage under Spark 4's ANSI default on ONE ragged row, and a silent
    NULL dot would systematically mis-bucket the vector (NULL >= 0 is
    not true -> bit 0 every plane). Zero-padding is the deterministic,
    engine-portable contract; identical to element_at on well-formed
    input.
    """
    v = _as_double(vec_col)
    bit_vals, dots = [], []
    for p in range(bits):
        dot = None
        for d in range(dim):
            term = (F.coalesce(F.try_element_at(v, F.lit(d + 1)),
                               F.lit(0.0))
                    * _plane_component(p, d, seed))
            dot = term if dot is None else dot + term
        dots.append(dot)
        bit_vals.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bit_vals[0]
    for b in bit_vals[1:]:
        bucket = bucket + b
    out = df.withColumn("bucket", bucket.cast("int"))
    if with_margins:
        out = out.withColumn("margins", F.array(*dots))
    return out


def probe_buckets(sig: DataFrame, probes: int, bits: int) -> DataFrame:
    """Expand each row into its 1+probes multi-probe buckets.

    Probe b_i = bucket with the i-th smallest |margin| bit flipped (the
    standard 1-flip multi-probe sequence). Pure JVM expressions: sort
    (|margin|, plane) structs, slice the head, XOR the plane bit.
    """
    ranked = F.slice(
        F.array_sort(F.array(*[
            F.struct(
                F.abs(F.element_at("margins", p + 1)).alias("a"),
                F.lit(p).alias("p"),
            )
            for p in range(bits)
        ])),
        1, probes,
    )
    # shiftleft needs a literal shift amount; index a powers-of-two array
    # with the plane id instead.
    powers = F.array(*[F.lit(1 << p) for p in range(bits)])
    alts = F.transform(
        ranked,
        lambda x: F.col("bucket").bitwiseXOR(F.element_at(powers, x["p"] + 1)),
    )
    return (
        sig.withColumn("bucket", F.explode(
            F.concat(F.array(F.col("bucket")), alts)))
        .drop("margins")
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket.

    Recall < 1.0 by design; raise `bits` for smaller buckets (faster,
    lower recall) or lower it for the reverse. `probes` > 0 turns on
    multi-probe: each query additionally searches the `probes` buckets
    reached by flipping its lowest-|margin| signature bits — recall rises
    toward brute force at ~(1+probes)x the candidate-scoring cost, still
    with zero shuffle on the candidate side (the probe fan-out happens on
    the broadcast query side only).

    Measured recall/cost table (recall@10 and pairs-scored vs probes in
    {0,1,2,4} at bits=6 on the sf0.1 embeddings): BENCH/BASELINE.md
    "ANN recall/cost vs multi-probe count", produced by
    jobs/bench_ann.py.
    """
    cb = hyperplane_signature(candidates, dim, bits, vec_col, seed)
    qb = hyperplane_signature(queries, dim, bits, vec_col, seed,
                              with_margins=probes > 0)
    if probes > 0:
        qb = probe_buckets(qb, probes, bits)
    qb = qb.withColumnRenamed("bucket", "qbucket")
    c = with_norm(cb, vec_col).select(id_col, "bucket", "__v", "__nrm")
    q = with_norm(qb, vec_col).select(
        query_id_col, "qbucket", F.col("__v").alias("__qv"), F.col("__nrm").alias("__qn")
    )
    joined = c.join(F.broadcast(q), c["bucket"] == q["qbucket"])
    if probes > 0:
        # a candidate can collide with the same query in several probe
        # buckets — dedupe pairs before scoring
        joined = joined.dropDuplicates([query_id_col, id_col])
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__qv"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    cos = F.when((F.col("__nrm") == 0) | (F.col("__qn") == 0), F.lit(0.0)).otherwise(
        dot / (F.col("__nrm") * F.col("__qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("cosine", 4).alias("cosine"))
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer + nprobe cluster probe.

    Index: fit KMeans (seeded) on the candidate vectors, assign each to
    its cluster (the inverted lists). Search: each query scores only the
    `nprobe` nearest centroids' lists. nprobe == nlist degenerates to
    exact brute force (the recall dial the test pins). At corpus scale
    the assignment is one MLlib pass and the probe join is keyed by
    cluster id — candidates stay partitioned by list, queries broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = candidates.sparkSession
    feats = _as_double(vec_col)
    cand = candidates.withColumn("__features", array_to_vector(feats))
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter,
                featuresCol="__features").fit(cand.select("__features"))
    assigned = (
        km.transform(cand)
        .withColumnRenamed("prediction", "cluster")
        .drop("__features")
    )
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(km.clusterCenters())]
    cdf = spark.createDataFrame(centers, "cluster int, centroid array<double>")

    q = queries.withColumn("__qv", _as_double(vec_col))
    dist2 = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("centroid"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__d2"), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("__d2", dist2)
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select(query_id_col, "cluster", "__qv")
    )

    c = with_norm(assigned, vec_col).select(id_col, "cluster", "__v", "__nrm")
    qn = with_norm(probes.withColumnRenamed("__qv", vec_col), vec_col).select(
        query_id_col, "cluster",
        F.col("__v").alias("__qv2"), F.col("__nrm").alias("__qn"),
    )
    joined = c.join(F.broadcast(qn), "cluster")
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__qv2"), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    cos = F.when((F.col("__nrm") == 0) | (F.col("__qn") == 0), F.lit(0.0)).otherwise(
        dot / (F.col("__nrm") * F.col("__qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("cosine", cos)
        .dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("cosine", 4).alias("cosine"))
    )
