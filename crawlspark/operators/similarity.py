"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (the exactness baseline) and a
random-hyperplane-LSH bucketed ANN (the scale path).

All math is JVM higher-order array functions (zip_with / aggregate):
products and sums accumulate left-to-right in double, which DuckDB's
list_zip + list_sum replays bit-identically — so the driver's oracle
can hash-compare even floating-point cosines.

Scale design: brute force is O(|Q|·|N|·d) — fine for |Q| small
(broadcast the queries), wrong for all-pairs. The LSH path buckets
vectors by the sign pattern of P seeded hyperplane projections; the
join shuffles on bucket id only, and candidate count per query is
|N| / 2^P in expectation. Recall is tunable via P, multi-probe
(``ann_topk(multiprobe=True)``, q62), or band-OR amplification
(``ann_topk_banded``, q63 — the production recall config, see
BENCH/ANN_RECALL.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..portable import md5hash60


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_topk(
    queries: DataFrame, corpus: DataFrame, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (q_id, n_id, rnk, cos).

    queries is broadcast (small set); ranking tie-breaks on n_id so the
    result is deterministic."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    n = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        n.crossJoin(F.broadcast(q))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def hyperplane_coefs(spark: SparkSession, n_planes: int, dim: int, seed: int = 7) -> DataFrame:
    """(p, d, coef): deterministic pseudo-random hyperplanes in
    [-1, 1], derived from the portable md5-60 hash so DuckDB can
    regenerate them exactly: coef = (h(seed_p_d) % 2001 - 1000)/1000."""
    grid = spark.range(n_planes).select(F.col("id").alias("p")).crossJoin(
        spark.range(dim).select(F.col("id").alias("d"))
    )
    h = md5hash60(F.concat_ws("_", F.lit(seed), F.col("p"), F.col("d")))
    return grid.withColumn("coef", ((h % 2001) - 1000) / F.lit(1000.0))


def lsh_buckets(
    emb: DataFrame, planes: DataFrame, n_planes: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): bucket = sign-bit pattern of the P projections.

    posexplode + broadcast plane join + two partial-aggregated
    groupBys; everything stays in whole-stage codegen."""
    comp = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    )
    proj = (
        comp.join(F.broadcast(planes), "d")
        .withColumn("prod", F.col("x").cast("double") * F.col("coef"))
        .groupBy("id", "p")
        .agg(F.sum("prod").alias("proj"))
    )
    return proj.withColumn(
        "bit",
        F.when(F.col("proj") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))"))
        .otherwise(F.lit(0).cast("long")),
    ).groupBy("id").agg(F.sum("bit").alias("bucket"))


def lsh_buckets_banded(
    emb: DataFrame, planes: DataFrame, planes_per_table: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, t, bucket): band-OR amplification. The global plane set is
    sliced into L tables of r = planes_per_table planes; a vector gets
    one sign-pattern bucket per table. Matching in ANY table makes a
    candidate pair, so recall = 1 − (1 − p^r)^L — tunable to ≥0.9 at
    candidate cost L·|N|/2^r per query, still ≪ all-pairs."""
    comp = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    )
    proj = (
        comp.join(F.broadcast(planes), "d")
        .withColumn("prod", F.col("x").cast("double") * F.col("coef"))
        .groupBy("id", "p")
        .agg(F.sum("prod").alias("proj"))
    )
    r = planes_per_table
    return (
        proj.withColumn("t", (F.col("p") / r).cast("int"))
        .withColumn(
            "bit",
            F.when(
                F.col("proj") > 0,
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {r} AS INT))"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("id", "t")
        .agg(F.sum("bit").alias("bucket"))
    )


def ann_topk_banded(
    queries: DataFrame, corpus: DataFrame, spark: SparkSession,
    k: int, n_tables: int = 6, planes_per_table: int = 3, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Approximate top-k with band-OR amplified LSH: candidates share
    the query's bucket in at least one of L independent tables, then
    exact cosine re-rank. The recall lever is (L, r): see
    BENCH/ANN_RECALL.md for the measured recall/candidate-cost curve
    on the driver testdata."""
    planes = hyperplane_coefs(spark, n_tables * planes_per_table, dim, seed)
    allv = queries.unionByName(corpus).dropDuplicates([id_col])
    buckets = lsh_buckets_banded(allv, planes, planes_per_table, id_col, vec_col)
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .join(buckets.withColumnRenamed("id", "q_id"), "q_id")
    )
    n = (
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
        .join(buckets.withColumnRenamed("id", "n_id"), "n_id")
    )
    cand = (
        q.join(n, ["t", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def embedding_near_dups(
    emb: DataFrame, spark: SparkSession, threshold: float,
    n_tables: int = 6, planes_per_table: int = 3, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup shape: self-join
    i < j over the whole corpus): band-OR LSH candidates → exact cosine
    verify ≥ threshold. Never all-pairs — candidate cost L·|N|²/2^r;
    the DuckDB oracle replays the identical bucketing, so results match
    bit-exactly even where LSH recall < 1."""
    planes = hyperplane_coefs(spark, n_tables * planes_per_table, dim, seed)
    buckets = lsh_buckets_banded(emb, planes, planes_per_table, id_col, vec_col)
    side = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        buckets, "id"
    )
    a = side.select(F.col("id").alias("i"), F.col("v").alias("vi"), "t", "bucket")
    b = side.select(F.col("id").alias("j"), F.col("v").alias("vj"), "t", "bucket")
    return (
        a.join(b, ["t", "bucket"])
        .filter(F.col("i") < F.col("j"))
        .dropDuplicates(["i", "j"])
        .withColumn("cos", cosine(F.col("vi"), F.col("vj")))
        .filter(F.col("cos") >= threshold)
        .select("i", "j", F.round("cos", 6).alias("cos"))
    )


def _cell_means(assigned: DataFrame, sample_per_cell: int, dim: int) -> DataFrame:
    """(cell, centroid) = mean of each cell's `sample_per_cell`
    lowest-id members, computed as a SEQUENTIAL id-ordered fold
    (array_sort + F.aggregate) — bit-exactly replayable in DuckDB
    (list(... ORDER BY id) + list_reduce), unlike a groupBy-avg whose
    partial-agg order is nondeterministic. `assigned` carries
    (id, v, cell). The bounded sample keeps the collect_list O(m·d)
    per cell regardless of cell population — scale-safe."""
    w = Window.partitionBy("cell").orderBy("id")
    sampled = assigned.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= sample_per_cell
    )
    per_cell = sampled.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("id", "v"))).alias("vs")
    )
    zero = F.expr(f"transform(sequence(1, {dim}), x -> CAST(0.0 AS DOUBLE))")
    vsum = F.aggregate(
        "vs", zero,
        lambda acc, s: F.zip_with(acc, s["v"], lambda a, b: a + b.cast("double")),
    )
    return per_cell.select(
        "cell",
        F.transform(vsum, lambda s: s / F.size("vs")).alias("centroid"),
    )


def ivf_centroids(
    corpus: DataFrame, n_cells: int, sample_per_cell: int,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
    refine_rounds: int = 1,
) -> DataFrame:
    """(cell, centroid): IVF coarse quantizer trained Spark-side with
    BIT-EXACT cross-engine replay. Init: cells seeded by the portable
    md5-60 hash (a random partition), centroid = deterministic bounded
    sample mean (:func:`_cell_means`). Then `refine_rounds` of
    Lloyd-style refinement: re-assign every vector to its nearest
    centroid (broadcast, narrow) and recompute the bounded sample
    means. The seed means differ from the global mean only by
    direction noise, so the first re-assignment splits the corpus
    along those directions and refinement turns the cells into real
    directional clusters — measured recall@3 roughly doubles vs the
    unrefined quantizer on the driver testdata. Every step is a
    sequential fold or a deterministic argmax, so DuckDB replays the
    whole training bit-for-bit."""
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    seeded = base.withColumn(
        "cell",
        (md5hash60(F.concat(F.lit("ivf_"), F.col("id").cast("string"))) % n_cells
         ).cast("int"),
    )
    cents = _cell_means(seeded, sample_per_cell, dim)
    for _ in range(refine_rounds):
        assigned = ivf_assign(base, cents, n_probe=1, id_col="id", vec_col="v")
        cents = _cell_means(assigned, sample_per_cell, dim)
    # materialize the trained quantizer (n_cells rows): every caller
    # consumes it at least twice (corpus assign + query assign), and an
    # unmaterialized return re-runs the whole training subtree — which
    # READS THE CORPUS — once per consumer. At sf0.1 this is wall-noise
    # (q64 2.7 s -> 2.5 s: the local cost is per-stage fixed overhead,
    # not recompute), but at corpus scale it halves the indexing scans.
    return cents.localCheckpoint(eager=False)


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, n_probe: int,
    id_col: str = "id", vec_col: str = "v",
) -> DataFrame:
    """Attach each vector's `n_probe` nearest cells by centroid cosine
    (deterministic tie-break on cell id). Centroids are broadcast —
    the assignment is a narrow map over the corpus, the IVF property
    that keeps indexing embarrassingly parallel at 100 TB."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "cc", cosine(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cc").desc(), F.col("cell").asc())
    return (
        scored.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= n_probe)
        .drop("centroid", "cc", "crnk")
    )


def ann_topk_ivf(
    queries: DataFrame, corpus: DataFrame, spark: SparkSession,
    k: int, n_cells: int = 16, n_probe: int = 3, sample_per_cell: int = 24,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors index
    into their single nearest coarse cell; each query probes its
    `n_probe` nearest cells and re-ranks exactly inside them. Scan
    cost per query ≈ n_probe/n_cells of the corpus — the classic ANN
    scale path alongside the LSH family (q61/q63): cells shard cleanly
    (partition by cell), centroids broadcast, and recall is tuned by
    n_probe with zero index rebuild."""
    cents = ivf_centroids(corpus, n_cells, sample_per_cell, id_col, vec_col, dim)
    n = ivf_assign(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv")),
        cents, n_probe=1, id_col="n_id", vec_col="nv",
    )
    q = ivf_assign(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")),
        cents, n_probe=n_probe, id_col="q_id", vec_col="qv",
    )
    cand = q.join(n, "cell").filter(F.col("q_id") != F.col("n_id")).dropDuplicates(
        ["q_id", "n_id"]
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def ann_topk(
    queries: DataFrame, corpus: DataFrame, spark: SparkSession,
    k: int, n_planes: int = 6, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank.

    multiprobe=True probes the query's bucket plus its n_planes 1-bit
    neighbors (the sign most likely to be wrong for a near neighbor is
    one projection) — candidate cost ×(P+1), recall close to brute
    force; still ≪ all-pairs."""
    planes = hyperplane_coefs(spark, n_planes, dim, seed)
    allv = queries.unionByName(corpus).dropDuplicates([id_col])
    buckets = lsh_buckets(allv, planes, n_planes, id_col, vec_col)
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .join(buckets.withColumnRenamed("id", "q_id"), "q_id")
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.expr(f"CAST(bucket AS BIGINT) ^ CAST({1 << p} AS BIGINT)") for p in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    n = (
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
        .join(buckets.withColumnRenamed("id", "n_id"), "n_id")
    )
    cand = (
        q.join(n, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def quantize8(v: Column) -> tuple[Column, Column]:
    """P34: symmetric per-vector int8 scalar quantization — q_i =
    round(127·x_i / max|x|) as a long. At 100 TB this cuts the
    similarity scan's memory/bandwidth 4× (the corpus-side win ANN
    engines ship as "SQ8"); every step is deterministic (round
    half-up on doubles, exact integer products after), so the DuckDB
    twin replays it bit-for-bit. Returns (quantized array, scale)."""
    s = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    )
    q = F.transform(
        v, lambda x: F.round(x.cast("double") * 127.0 / s).cast("long")
    )
    return q, s


def dot8(a: Column, b: Column) -> Column:
    """Exact integer dot product over int8-quantized arrays (long
    accumulation — no float order sensitivity at all)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine8(a: Column, b: Column) -> Column:
    """Cosine in the quantized domain: integer dot / integer norms —
    the cheap ranking pass (float enters only in one fixed-shape
    division)."""
    return dot8(a, b) / (
        F.sqrt(dot8(a, a).cast("double")) * F.sqrt(dot8(b, b).cast("double"))
    )


def quantized_topk(
    queries: DataFrame, corpus: DataFrame, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding", expand: int = 4,
) -> DataFrame:
    """P34: int8-quantized top-k with exact re-rank. Stage 1 ranks the
    corpus per query by quantized cosine (integer dot products over
    4×-smaller vectors — the bandwidth-bound pass) and keeps k·expand
    candidates; stage 2 re-ranks ONLY those with full-precision
    cosine. The contract is the operator's own two-stage semantics —
    the oracle replays the identical quantize/rank/re-rank pipeline
    (the q61–q64 replayed-bucketing discipline); recall vs the exact
    baseline is a measured property, not the contract.

    Output: (q_id, n_id, rnk, cos, cos8) — exact and quantized scores.
    """
    qq, _qs = quantize8(F.col("qv"))
    nq, _ns = quantize8(F.col("nv"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    n = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        n.withColumn("n8", nq)
        .crossJoin(F.broadcast(q.withColumn("q8", qq)))
        .withColumn("cos8", cosine8(F.col("q8"), F.col("n8")))
    )
    w8 = Window.partitionBy("q_id").orderBy(
        F.col("cos8").desc(), F.col("n_id").asc()
    )
    cand = (
        scored.withColumn("r8", F.row_number().over(w8))
        .filter(F.col("r8") <= k * expand)
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "n_id", "rnk",
            F.round("cos", 6).alias("cos"),
            F.round("cos8", 6).alias("cos8"),
        )
    )


def semantic_dedup(
    emb: DataFrame, n_cells: int = 16, tau: float = 0.42,
    sample_per_cell: int = 24, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """P54 SemDeDup (Abbas et al. 2023): embedding-space semantic
    deduplication — cluster the corpus with the IVF coarse quantizer,
    then within each cluster drop every vector that has a semantic
    duplicate (cosine >= tau) with a smaller id; the minimum-id member
    of each duplicate group survives. Catches paraphrases and
    re-renderings that token-level MinHash/SimHash (P3/P5) miss,
    because the match happens in embedding space.

    Scale shape: pairs are formed ONLY within a cell (join on `cell`,
    never all-pairs) — with n_cells grown proportionally to the corpus
    the per-cell population stays bounded, which is exactly the
    SemDeDup paper's k-means-then-local-pairs posture. The quantizer
    training is the bit-exact replayable :func:`ivf_centroids`
    (md5-seeded cells, bounded id-ordered sample-mean folds), and the
    pair cosine is the sequential-fold :func:`cosine`, so the DuckDB
    oracle hash-compares the full output including the float scores.

    Output: one row per input vector — (id, cell, keep); keep=false
    iff some smaller-id vector in the same cell has cos >= tau.
    """
    cents = ivf_centroids(
        emb, n_cells, sample_per_cell, id_col, vec_col, dim, refine_rounds=1
    )
    a = ivf_assign(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        cents, n_probe=1, id_col="id", vec_col="v",
    ).localCheckpoint(eager=False)  # assignment feeds both pair sides
    lo = a.select("cell", F.col("id").alias("jd"), F.col("v").alias("jv"))
    dup = (
        a.join(lo, "cell")
        .filter(F.col("jd") < F.col("id"))
        .withColumn("cos", cosine(F.col("v"), F.col("jv")))
        .filter(F.col("cos") >= tau)
        .select("id")
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        a.join(dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )
