"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline: broadcast the (small)
query set, score with pure array expressions (zip_with + aggregate —
JVM-side, no UDF), rank with a window. The scale path is LSH
bucketing: random-hyperplane signs computed from deterministic
per-dimension hash weights bucket vectors so the join is
within-bucket only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.fastlit import double_array_lit


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Convenience pairwise cosine (public surface). The query paths
    precompute per-side norms instead — see brute_force_topk — so the
    per-pair work is a single dot fold."""
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))


def rounded_cosine(dot: Column, norm_product: Column) -> Column:
    """Cosine rounded to the repo's 6-dp oracle precision with the
    zero-vector convention pinned explicitly: a zero-norm side yields
    -1.0 (DuckDB 1.0.0 list_cosine_similarity's convention) instead
    of try_divide's NULL. Both sort last and fail every >= threshold
    today, but when a query's candidate pool is <= k the engines
    would otherwise emit different rows/values and the driver hash
    would diverge (round-12 ADVICE) — so the equality no longer
    depends on either engine's implicit choice."""
    return F.round(
        F.coalesce(F.try_divide(dot, norm_product), F.lit(-1.0)), 6)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors. ``queries`` must be small (it is
    broadcast); the scan over ``embeddings`` is a single pass with no
    shuffle except the final per-query top-k."""
    # norms are computed ONCE per side (map), not once per pair — the
    # per-pair work is a single dot fold
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    ).withColumn("__en", norm_expr(F.col("__e")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__q"),
    ).withColumn("__qn", norm_expr(F.col("__q")))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            rounded_cosine(
                dot_expr(F.col("__e"), F.col("__q")),
                F.col("__en") * F.col("__qn")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine >= threshold, a < b. Brute-force O(n^2/2) pair join — the
    exact baseline; use lsh_bucketed_topk for the scale path (bucket
    candidates first, then exact cosine within buckets)."""
    e = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    ).withColumn("__n", norm_expr(F.col("__e")))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            rounded_cosine(
                dot_expr(F.col("a.__e"), F.col("b.__e")),
                F.col("a.__n") * F.col("b.__n")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 2048,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    init: str = "kmeans++",
):
    """Driver-side spherical k-means (k-means++ init, Lloyd) on a
    bounded deterministic sample — the IVF coarse quantizer. At 100 TB
    the training input stays a few thousand vectors (orderBy+limit is
    a top-k, not a full sort); the returned centroids are row-unit-
    normalized so dot product == cosine.  The sample is ordered by
    ``xxhash64(id)``, not by ``id``: time-ordered corpora correlate id
    with content, and a prefix sample would train the quantizer on a
    temporal slice and silently degrade recall — hash order is a
    deterministic uniform draw over the whole corpus.

    ``init="hash"`` selects the fully cross-engine-replayable trainer:
    seeds are the first ``n_centroids`` vectors in md5-hash order
    (sampling.hash_uniform — the same uniform the samplers replay in
    SQL), unit-normalized, then ``n_iters + refine_iters`` spherical
    Lloyd steps run DISTRIBUTED over the whole corpus via
    :func:`kmeans_refine` (rounded-argmax assignment, exact
    fixed-point BIGINT sums — partition-order-independent and
    replayable statement-for-statement in DuckDB). Compared with the
    default: no RNG anywhere, no driver-side design matrix, one
    bounded aggregation per iteration instead of a 2048-row collect —
    the audit-grade path when the quantizer itself must be
    reproducible bit-for-bit across engines and reruns."""
    import numpy as np

    if init == "hash":
        import math

        from .sampling import hash_uniform

        seed_rows = (
            embeddings.select(
                F.col(id_col), F.col(vec_col).cast("array<double>"))
            .orderBy(hash_uniform(F.col(id_col), "ivf"), id_col)
            .limit(n_centroids)
            .collect()
        )
        if not seed_rows:
            raise ValueError(
                "train_ivf_centroids: input has no rows — cannot seed "
                "a coarse quantizer on an empty corpus")
        seeds = []
        for r in seed_rows:
            v = [float(x) for x in r[1]]
            # sequential sum-of-squares, same fold order as the SQL
            # oracle's list_dot_product(v, v) — bit-identical norms
            nrm = math.sqrt(sum(x * x for x in v)) or 1.0
            seeds.append([x / nrm for x in v])
        return np.array(kmeans_refine(
            embeddings, seeds, n_iters=n_iters + refine_iters,
            id_col=id_col, vec_col=vec_col, spherical=True))
    if init != "kmeans++":
        raise ValueError(f"unknown init {init!r} (kmeans++ or hash)")
    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(sample_size)
        .collect()
    )
    if not rows:
        # an empty corpus can't seed a quantizer; without this guard
        # the failure surfaces as a cryptic numpy AxisError downstream
        raise ValueError(
            "train_ivf_centroids: input has no rows — cannot train a "
            "coarse quantizer on an empty corpus (pass explicit "
            "centroids= to run assignment-only paths)")
    X = np.array([r[1] for r in rows], dtype=float)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # k-means++ seeding on cosine distance (1 - dot)
    idx = [int(rng.randint(len(X)))]
    for _ in range(1, min(n_centroids, len(X))):
        d = 1.0 - np.max(X @ X[idx].T, axis=1)
        d = np.maximum(d, 0)
        p = d / d.sum() if d.sum() > 0 else None
        idx.append(int(rng.choice(len(X), p=p)))
    C = X[idx].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    if refine_iters:
        # polish the sampled solution against EVERY vector — one
        # bounded distributed aggregation per Lloyd iteration
        # (kmeans_refine); the sampled fit is the init, the corpus is
        # the objective
        C = np.array(kmeans_refine(
            embeddings, C.tolist(), n_iters=refine_iters,
            id_col=id_col, vec_col=vec_col, spherical=True))
    return C


def _centroid_dots_expr(vec: Column, centroids) -> Column:
    """array<double> of dot(vec, centroid_c) for every centroid. The
    whole centroid matrix travels as ONE nested array literal and the
    per-centroid dot is a transform lambda, so the expression tree is
    O(1) in both k and dim (it was O(k) array literals before, and
    O(k*dim) inlined terms before that, which exceeded Janino limits
    at dim 4096). Measured ~30% faster analysis+exec at k=16/dim=64,
    bit-identical dots."""
    lit = double_array_lit([[float(x) for x in c] for c in centroids])
    return F.transform(lit, lambda c: dot_expr(vec, c))


def ivf_assign_expr(vec: Column, centroids) -> Column:
    """1-based inverted-list id: argmax centroid dot product."""
    dots = _centroid_dots_expr(vec, centroids)
    return F.array_position(dots, F.array_max(dots)).cast("int")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids=None,
    refine_iters: int = 0,
    init: str = "kmeans++",
    train_iters: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: vectors are partitioned into inverted
    lists by nearest centroid (map-only expression); each query probes
    its ``n_probe`` closest lists, so the candidate join is an
    equi-join on list_id instead of a cross join — the second
    100 TB-scale ANN path next to lsh_bucketed_topk. With
    ``n_probe == n_centroids`` the search is exhaustive and matches
    brute_force_topk exactly. ``init``/``train_iters`` pass through to
    :func:`train_ivf_centroids` (init="hash" is the cross-engine-
    replayable trainer)."""
    if centroids is None:
        train_kwargs = {} if train_iters is None else {
            "n_iters": train_iters}
        centroids = train_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col,
            init=init, **train_kwargs,
            refine_iters=refine_iters)
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    ).withColumn(
        "list_id", ivf_assign_expr(F.col("__e"), centroids)
    ).withColumn("__en", norm_expr(F.col("__e")))
    n_probe = min(n_probe, len(centroids))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__q"),
    ).withColumn(
        "__probes",
        F.slice(
            F.transform(
                F.array_sort(
                    F.transform(
                        _centroid_dots_expr(F.col("__q"), centroids),
                        lambda d, i: F.struct(
                            (-d).alias("nd"), (i + 1).alias("list_id")),
                    )
                ),
                lambda s: s["list_id"],
            ),
            1, n_probe,
        ),
    ).select(
        "query_id", "__q", norm_expr(F.col("__q")).alias("__qn"),
        F.explode("__probes").alias("list_id"),
    )
    scored = (
        e.join(F.broadcast(q), "list_id")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            rounded_cosine(
                dot_expr(F.col("__e"), F.col("__q")),
                F.col("__en") * F.col("__qn")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1) for
    (plane, dimension) — md5-derived, identical to the SQL oracle's
    embedded literals, no RNG state."""
    import hashlib

    h = int(hashlib.md5(f"p{p}d{d}".encode()).hexdigest()[:8], 16)
    return h / float(2**31) - 1.0


def plane_weights(dim: int, n_planes: int) -> list[list[float]]:
    return [[plane_weight(p, d) for d in range(dim)] for p in range(n_planes)]


def hyperplane_signs_expr(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """LSH bucket key: sign pattern of dot products with n_planes
    pseudo-random hyperplanes. Each plane's weight vector is ONE array
    Literal fed through zip_with + aggregate, so codegen width is
    O(n_planes) — independent of dim (the old per-term inlining was
    O(dim * n_planes) expression nodes and fell over at dim >= 512).
    Weights are deterministic md5 functions of (plane, dim index):
    no broadcast state, reproducible in the DuckDB oracle."""
    bits = []
    for p, w in enumerate(plane_weights(dim, n_planes)):
        # one parsed array literal per plane, not dim F.lit round
        # trips (~0.25 s of pure driver socket latency at
        # dim=64 x 8 planes — the fastlit rationale)
        dot = dot_expr(vec, double_array_lit(w))
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def bucketed_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-duplicate pairs: candidates are generated by
    an equi-join on the hyperplane sign bucket (same-bucket vectors
    only), then verified with EXACT cosine — no O(n^2) theta self-join
    on the full table. Recall is traded for fan-in exactly like
    lsh_bucketed_topk; raise n_planes for smaller buckets at scale."""
    e = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    ).withColumn(
        "bucket", hyperplane_signs_expr(F.col("__e"), dim, n_planes)
    ).withColumn("__n", norm_expr(F.col("__e")))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            rounded_cosine(
                dot_expr(F.col("a.__e"), F.col("b.__e")),
                F.col("a.__n") * F.col("b.__n")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing the
    query's hyperplane bucket — the equi-join replaces the cross join,
    which is the 100 TB-scale path (recall traded for fan-in)."""
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    ).withColumn(
        "bucket", hyperplane_signs_expr(F.col("__e"), dim, n_planes)
    ).withColumn("__en", norm_expr(F.col("__e")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__q"),
    ).withColumn(
        "bucket", hyperplane_signs_expr(F.col("__q"), dim, n_planes)
    ).withColumn("__qn", norm_expr(F.col("__q")))
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            rounded_cosine(
                dot_expr(F.col("__e"), F.col("__q")),
                F.col("__en") * F.col("__qn")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def embedding_duplicate_clusters(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space duplicate groups: bucketed cosine near-dup
    pairs closed into connected components — the same
    pairs -> closure -> canonical-keep-list shape as the text-side
    ``duplicate_clusters``, on the embedding table. Vectors in no
    qualifying pair are singleton clusters of themselves;
    ``is_canonical`` (minimum id per cluster) is the keep-list."""
    from .dedup import clusters_from_pairs

    pairs = bucketed_cosine_pairs(
        embeddings, threshold, dim, n_planes, id_col, vec_col)
    return clusters_from_pairs(embeddings, pairs, id_col)


def pinned_centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """Deterministic unit-norm pseudo-random centroids — the same
    md5-derived construction as ``plane_weights`` (disjoint key
    namespace), so a data-independent quantizer whose literals the
    DuckDB oracle can embed identically at ANY scale factor. Use
    ``train_ivf_centroids`` for a data-adapted quantizer when oracle
    replay is not required."""
    import math

    cents = []
    for c in range(n_centroids):
        w = [plane_weight(100_000 + c, d) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in w)) or 1.0
        cents.append([x / n for x in w])
    return cents


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    centroids=None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 1000,
    method: str = "expr",
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with a coarse quantizer, then remove semantic
    near-duplicates WITHIN each cluster only — pairwise cosine never
    crosses cluster boundaries, which is what makes the method run at
    web scale (the paper prunes LAION/C4 with k = 50,000 clusters).

    Shape: assignment is a map-only pass (centroids travel as array
    literals, argmax-dot per row — no shuffle, no UDF); candidate
    pairing is an equi-join on ``cluster_id`` (never an all-pairs
    theta join); the keep decision is one aggregation over the pair
    list. At 100 TB the knobs are ``n_centroids`` (more clusters =
    smaller equi-join buckets; the assignment cost is O(k) per row
    and stays map-only) and ``max_cluster_size`` (skew guard: a
    cluster larger than the cap skips pairing and keeps all members —
    a too-coarse quantizer region is diagnosed, not quadratically
    joined; raise k instead of raising the cap). The cap is ON by
    default (1000, same posture as minhash_lsh_pairs'
    max_bucket_size: the production path must be skew-safe without
    opt-in — measured: k=8 over just 20k vectors is ~25M candidate
    pairs uncapped); pass None to explicitly run uncapped.

    Keep rule (deterministic SemDeDup variant): within each cluster,
    a vector is dropped iff some near-duplicate neighbor (round-6
    cosine >= ``threshold``) precedes it in (centroid_sim, id) order
    — i.e. of any duplicate group the member with the LOWEST
    similarity to its centroid survives, the paper's keep-low-sim
    choice (§3.2), with the id as a total tiebreak.

    Returns (id, cluster_id, centroid_sim, keep).

    ``centroids=None`` trains the real spherical k-means quantizer
    (``train_ivf_centroids``); pass ``pinned_centroids(k, dim)`` for
    the data-independent variant the SQL oracle replays exactly.
    ``refine_iters=0`` (the default) is a MEASURED choice for dedup,
    not an economy: corpus-refined Lloyd balances clusters, and
    balancing splits dense duplicate blobs across centroids — at a
    healthy k (clusters under the cap) the sampled quantizer
    co-clusters MORE ground-truth near-dup pairs and drops more
    duplicates (SCALING.md "SemDeDup quantizer"; the opposite of the
    IVF-search case, where refinement buys recall). Refine only when
    clusters are stuck over ``max_cluster_size`` and k cannot be
    raised.

    ``method``: ``"expr"`` (default) keeps everything in JVM column
    expressions — the oracle-replayable path, right for small k.
    ``"arrow"`` is the large-k scale path: assignment becomes ONE
    Arrow-batched numpy matmul per batch (``mapInPandas``) and the
    within-cluster dedup ONE BLAS gram matrix per cluster group
    (``applyInPandas``) — measured 138.8 s -> ~9 s at k=256 over
    200k vectors, because 256 array-literal dot folds per row (and
    one fold per candidate pair) run interpreted per element while
    the matmul is vectorized. Same semantics; float64 arithmetic on
    both paths, results equality-tested on the fixture corpus.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col,
            refine_iters=refine_iters)
    if method == "arrow":
        return _semantic_dedup_arrow(
            embeddings, threshold, centroids, id_col, vec_col,
            max_cluster_size)
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__e"),
    )
    # round the per-centroid dots BEFORE the argmax so the cluster
    # choice is replayable cross-engine (raw doubles can differ in the
    # last ulp between Spark's fold and DuckDB's list_dot_product;
    # at 6 dp they cannot)
    dots = F.transform(
        _centroid_dots_expr(F.col("__e"), centroids),
        lambda d: F.round(d, 6),
    )
    asg = (
        e.withColumn("__dots", dots)
        .withColumn(
            "cluster_id",
            F.array_position(
                F.col("__dots"), F.array_max(F.col("__dots"))).cast("int"))
        .withColumn(
            # centroids are unit-norm, so cos(v, c) == dot / |v|; the
            # "+ 0.0" normalizes a rounded -0.0 (repr-hash gotcha).
            # A zero-norm vector (failed encoder output) gets NULL on
            # every path — Spark's 0/0 is NaN but DuckDB's is NULL,
            # so without the guard the oracle diverges (fuzz-caught)
            "centroid_sim",
            F.when(norm_expr(F.col("__e")) == 0, F.lit(None)).otherwise(
                F.round(
                    F.array_max(F.col("__dots")) / norm_expr(F.col("__e")),
                    6)
                + F.lit(0.0)))
        .select("id", "__e", norm_expr(F.col("__e")).alias("__n"),
                "cluster_id", "centroid_sim")
    )
    # Materialize the assignment ONCE (r17 optimization, guide §2.4 /
    # §5): the argmax-over-k-centroid-dots subtree is the expensive
    # map work here (k x dim fold per row), and FOUR consumers read it
    # — the size guard, both sides of the pair self-join, and the
    # final keep join — so left as lineage it executes four times.
    # The repartition-by-num on the join key does two jobs at once:
    # (1) the checkpointed partitioning is preserved, so the pair
    # self-join and the size aggregation reuse it with no further
    # exchange, and (2) an explicit numPartitions is exempt from AQE
    # coalescing, whose byte-proxy (correct for byte-bound stages)
    # would otherwise funnel this compute-QUADRATIC self-join onto 1-2
    # tasks. The count mirrors what the plain join would start with
    # (spark.sql.shuffle.partitions — scale-derived in session.py).
    # Measured at sf0.1 (k=16, 2k vectors): 4.85 s -> 0.8 s,
    # identical output; the checkpointed bytes are the same rows the
    # pair-join exchange already carried.
    sess = embeddings.sparkSession
    try:
        n_part = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_part = sess.sparkContext.defaultParallelism
    asg = asg.repartition(n_part, "cluster_id").localCheckpoint(eager=True)
    if max_cluster_size is not None:
        sizes = asg.groupBy("cluster_id").agg(F.count("*").alias("__csz"))
        asg = asg.join(F.broadcast(sizes), "cluster_id").withColumn(
            "__pairable", F.col("__csz") <= max_cluster_size)
    else:
        asg = asg.withColumn("__pairable", F.lit(True))
    a, b = asg.alias("a"), asg.alias("b")
    # one direction per pair would suffice for detection, but the keep
    # rule needs each member's view of its neighbors — emit both
    # directions from the a.id < b.id join instead of joining twice
    pairs = (
        a.join(b, "cluster_id")
        .filter((F.col("a.id") < F.col("b.id"))
                & F.col("a.__pairable") & F.col("b.__pairable"))
        .select(
            "a.id", "b.id",
            rounded_cosine(
                dot_expr(F.col("a.__e"), F.col("b.__e")),
                F.col("a.__n") * F.col("b.__n")).alias("__cos"),
            F.col("a.centroid_sim").alias("__sa"),
            F.col("b.centroid_sim").alias("__sb"),
        )
        .filter(F.col("__cos") >= threshold)
    )
    # both directions of every edge from ONE evaluation of the pair
    # join (a unionByName of two selects over `pairs` would run the
    # join — the expensive stage — twice)
    edges = pairs.select(
        F.explode(F.array(
            F.struct(
                F.col("a.id").alias("id"),
                F.col("__sb").alias("nb_sim"),
                F.col("b.id").alias("nb_id"),
                F.col("__sa").alias("my_sim")),
            F.struct(
                F.col("b.id").alias("id"),
                F.col("__sa").alias("nb_sim"),
                F.col("a.id").alias("nb_id"),
                F.col("__sb").alias("my_sim")),
        )).alias("__s")
    ).select("__s.*")
    dropped = (
        edges.filter(
            (F.col("nb_sim") < F.col("my_sim"))
            | ((F.col("nb_sim") == F.col("my_sim"))
               & (F.col("nb_id") < F.col("id"))))
        .select("id").distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        asg.join(dropped, "id", "left")
        .select(
            "id", "cluster_id", "centroid_sim",
            (~F.coalesce(F.col("__drop"), F.lit(False))).alias("keep"),
        )
    )


def _semantic_dedup_arrow(
    embeddings: DataFrame,
    threshold: float,
    centroids,
    id_col: str,
    vec_col: str,
    max_cluster_size: int | None,
) -> DataFrame:
    """Large-k SemDeDup physical plan: same semantics as the expr
    path, different execution. Assignment is one numpy matmul per
    Arrow batch (X @ C^T — k array-literal folds per row run
    interpreted element-by-element in the JVM, the matmul is BLAS);
    the within-cluster dedup is one gram matrix per cluster group
    (U_ord @ U_ord^T, then a strictly-upper-triangular any() along
    columns implements "dropped iff an earlier-(centroid_sim, id)
    member is a near-dup"). One shuffle total (groupBy cluster_id);
    per-group memory is O(cap^2) = 8 MB at the default cap."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    id_type = embeddings.schema[id_col].dataType.simpleString()
    assign_schema = (f"id {id_type}, cluster_id int, "
                     "centroid_sim double, __nrm double, __e array<double>")
    out_schema = (f"id {id_type}, cluster_id int, "
                  "centroid_sim double, keep boolean")

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            dots = np.round(X @ C.T, 6)   # rounded BEFORE argmax,
            cl = dots.argmax(axis=1)      # like the expr path
            nrm = np.sqrt((X * X).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = np.round(
                    dots[np.arange(len(X)), cl] / nrm, 6) + 0.0
            # zero-norm vectors: NULL, matching the expr path and the
            # DuckDB oracle (a float NaN would survive Arrow as NaN)
            sim = pd.array(raw, dtype="Float64")
            sim[nrm == 0] = pd.NA
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "cluster_id": (cl + 1).astype("int32"),
                "centroid_sim": sim,
                "__nrm": nrm,
                "__e": X.tolist(),
            })

    asg = embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, schema=assign_schema)

    def dedup_group(pdf):
        import numpy as np  # noqa: F811 — worker-side import

        m = len(pdf)
        keep = np.ones(m, dtype=bool)
        if m > 1 and (max_cluster_size is None or m <= max_cluster_size):
            X = np.array(pdf["__e"].tolist(), dtype=np.float64)
            U = X / pdf["__nrm"].to_numpy()[:, None]
            order = np.lexsort(
                (pdf["id"].to_numpy(),
                 # NULL sims (zero-norm vectors) sort as NaN = last;
                 # they can neither drop nor be dropped (their gram
                 # entries are NaN, every >= compare is False)
                 pdf["centroid_sim"].to_numpy(
                     dtype="float64", na_value=np.nan)))
            S = np.round(U[order] @ U[order].T, 6)
            keep[order] = ~np.any(np.triu(S >= threshold, 1), axis=0)
        out = pdf[["id", "cluster_id", "centroid_sim"]].copy()
        out["keep"] = keep
        return out

    return asg.groupBy("cluster_id").applyInPandas(
        dedup_group, schema=out_schema)


# -- lexical retrieval (BM25) ---------------------------------------------

def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical top-k retrieval (Robertson-Sparck Jones idf with
    the standard +1 floor, Okapi tf saturation) — the keyword
    counterpart of the embedding ANN family:

        score(q, d) = sum_{t in q} idf(t) * tf(t,d) * (k1 + 1)
                      / (tf(t,d) + k1 * (1 - b + b * |d| / avgdl))
        idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

    Physical strategy (the 100 TB shape): ONE corpus scan total —
    tokens explode plus one NULL-token sentinel row per document
    (``split`` never yields NULL elements, so the sentinel cannot
    collide with a real term), a broadcast left-join keeps the
    sentinel and query-term rows before the (doc, term) frequency
    aggregation, and the compact result — one row per matching
    (doc, term) plus one per doc — is localCheckpoint'ed. Corpus
    N/avgdl then read off the sentinel rows of the MATERIALIZED
    table (the r16 shape paid a second full corpus tokenization for
    them), and document frequency comes from a window count over the
    term key (a second aggregation of the corpus subtree would
    evaluate the scan twice — measured 3.9s vs 2.1s at organic sf1).
    The per-term window partition holds one row per MATCHING DOC,
    the same bounded-hot-key shape as the dedup pipelines' df-cap
    window (see ngram_jaccard_pairs' A/B). Per-(query, doc) scores
    reduce with one groupBy and rank with one window over the query
    key. Ties break by doc id (deterministic).

    Returns (query_id, doc_id aliased to ``nbr_id``, score, rank).
    """
    from pyspark.sql import Window as W

    words = F.split(F.col(text_col), " ")
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(F.array_distinct(
                F.split(F.col(query_text_col), " "))).alias("t"),
        )
        .distinct()
    )
    # ONE scan: per-doc term frequencies for the query terms plus a
    # tf=1 sentinel row (t NULL) per document carrying the doc count
    # and length for the corpus stats. NULL-text docs keep their
    # sentinel row (coalesce to the empty array), matching the
    # count(*)-over-documents semantics of the previous two-scan
    # shape: N counts them, avg(__dl) skips their NULL length.
    tf_all = (
        docs.select(
            F.col(id_col),
            F.size(words).alias("__dl"),
            F.explode(F.concat(
                F.array(F.lit(None).cast("string")),
                F.coalesce(words, F.array().cast("array<string>")),
            )).alias("t"),
        )
        .join(F.broadcast(qterms.select("t").distinct()
                          .withColumn("__m", F.lit(1))), "t", "left_outer")
        .filter(F.col("t").isNull() | F.col("__m").isNotNull())
        .groupBy(id_col, "__dl", "t")
        .agg(F.count("*").alias("tf"))
        # a few rows per doc — the same bytes the df window's
        # exchange carries; trades the stats action's second full
        # corpus tokenization for one compact materialization
        .localCheckpoint(eager=True)
    )
    tf = tf_all.filter(F.col("t").isNotNull())
    stats = tf_all.filter(F.col("t").isNull()).agg(
        F.count("*").alias("N"), F.avg("__dl").alias("avgdl")).first()
    n_docs, avgdl = float(stats["N"]), float(stats["avgdl"])
    # df(t) = number of rows (= docs) per term in the filtered table
    tfd = tf.withColumn("df", F.count("*").over(W.partitionBy("t")))
    idf = F.log(F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        tfd.join(F.broadcast(qterms), "t")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (idf * F.col("tf") * (1.0 + k1)
             / (F.col("tf")
                + k1 * (1.0 - b + b * F.col("__dl") / F.lit(avgdl)))
             ).alias("__s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    return (
        scored.select(
            query_id_col,
            F.col(id_col).alias("nbr_id"),
            F.col("score"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    fraction,
    centroids=None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "cluster_sample",
    default_fraction: float = 1.0,
) -> DataFrame:
    """Topic-balanced downsampling: assign every vector to its nearest
    coarse-quantizer centroid (the SemDeDup/IVF quantizer), then keep
    a deterministic per-cluster fraction — shrinking a corpus WITHOUT
    tilting its topic mixture, the failure mode of a global uniform
    sample over topically-skewed data (the dominant topic's share is
    preserved, not amplified). ``fraction`` is one float or a
    per-cluster-id dict (a curriculum knob: e.g. downweight the
    boilerplate cluster specifically); clusters missing from the dict
    keep ``default_fraction`` of their rows — 1.0 by default, so a
    dict targets ONLY the clusters it names and cannot silently
    discard the rest of the corpus.

    Physical strategy: assignment is the map-only rounded-argmax-dot
    expression (centroid literals, no shuffle — per-centroid dots
    rounded at 6 dp before the argmax so the choice replays
    cross-engine), and the gate is the salted-md5 hash_uniform filter
    — the whole operator is ONE map-only pass, safe under retries and
    reproducible on any partitioning. ``centroids=None`` trains the
    spherical k-means quantizer on a bounded sample; pass
    ``pinned_centroids(k, dim)`` for the oracle-replayable variant.

    Returns (id_col, cluster_id). No reference counterpart
    (beyond-scope pipeline family)."""
    from .sampling import stratified_hash_sample

    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    dots = F.transform(
        _centroid_dots_expr(
            F.col(vec_col).cast("array<double>"), centroids),
        lambda d: F.round(d, 6),
    )
    asg = embeddings.withColumn("__dots", dots).select(
        F.col(id_col),
        F.array_position(F.col("__dots"), F.array_max(F.col("__dots")))
        .cast("int").alias("cluster_id"),
    )
    if isinstance(fraction, dict):
        return stratified_hash_sample(
            asg, "cluster_id", fraction,
            default_fraction=float(default_fraction),
            id_col=id_col, salt=salt)
    return stratified_hash_sample(
        asg, "cluster_id", {}, default_fraction=float(fraction),
        id_col=id_col, salt=salt)


def kmeans_refine(
    embeddings: DataFrame,
    centroids,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = True,
    quant: float = 1e6,
) -> list[list[float]]:
    """Distributed Lloyd refinement of a coarse quantizer over the
    FULL corpus: ``train_ivf_centroids`` fits on a bounded sample (the
    right cost for an IVF quantizer), but SemDeDup-style pipelines
    want centroids fit on every vector — this runs Lloyd iterations
    at corpus scale with ONE bounded aggregation per iteration.

    Physical strategy per iteration: map-only rounded-argmax
    assignment (centroid array literals — the same expression as
    semantic_dedup / cluster_balanced_sample), then per-(cluster,
    dimension) sums via posexplode + groupBy — shuffle state is
    bounded at k x dim groups (map-side partials absorb the corpus;
    the explode is linear and never materialized past the partial
    agg). Component values are quantized to ``quant`` fixed-point
    BIGINTs before summing, so the reduction is INTEGER — exact,
    partition-order-independent, retry-stable, and replayable in SQL
    (a float sum would make the refined centroids run-dependent in
    the last ulp). Empty clusters keep their previous centroid.

    Returns the refined centroids as plain lists (driver state is
    k x dim — parameters, not data)."""
    cents = [list(map(float, c)) for c in centroids]
    dim = len(cents[0])
    for _ in range(n_iters):
        dots = F.transform(
            _centroid_dots_expr(
                F.col(vec_col).cast("array<double>"), cents),
            lambda d: F.round(d, 6),
        )
        asg = embeddings.withColumn("__dots", dots).select(
            F.array_position(F.col("__dots"),
                             F.array_max(F.col("__dots")))
            .cast("int").alias("cluster_id"),
            F.posexplode(F.col(vec_col).cast("array<double>"))
            .alias("pos", "val"),
        )
        rows = (
            asg.groupBy("cluster_id", "pos")
            .agg(F.sum(F.round(F.col("val") * quant)
                       .cast("long")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in rows:
            c = int(r["cluster_id"]) - 1  # array_position is 1-based
            sums.setdefault(c, [0.0] * dim)[int(r["pos"])] = float(r["s"])
            counts[c] = int(r["n"])
        new = []
        for c, old in enumerate(cents):
            if c not in counts:
                new.append(old)  # empty cluster: keep previous
                continue
            m = [s / (quant * counts[c]) for s in sums[c]]
            if spherical:
                import math

                nrm = math.sqrt(sum(x * x for x in m)) or 1.0
                m = [x / nrm for x in m]
            new.append(m)
        cents = new
    return cents


# -- Product Quantization (PQ / IVF-PQ) ----------------------------------


def pinned_pq_codebooks(m: int, k: int, dim: int) -> list:
    """Deterministic data-independent PQ codebooks (m subspaces x k
    codes x dim/m floats) — md5-derived like ``pinned_centroids``
    (disjoint key namespace), so the DuckDB oracle can embed the SAME
    literals at any scale factor. Use :func:`train_pq_codebooks` for
    data-adapted codebooks when oracle replay is not required."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [
        [[plane_weight(200_000 + i * 1000 + j, d) for d in range(sub)]
         for j in range(k)]
        for i in range(m)
    ]


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    sample_size: int = 2048,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``m`` contiguous subspaces and k-means each subspace independently
    on a bounded deterministic sample (same hash-ordered draw as
    ``train_ivf_centroids`` — a prefix sample of a time-ordered corpus
    would train the codebooks on a temporal slice). Returns
    ``codebooks[m][k][dim/m]``; driver memory is O(m*k*dim/m) =
    O(k*dim) — parameters, never data."""
    import numpy as np

    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_pq_codebooks: input has no rows — cannot train "
            "codebooks on an empty corpus (pass pinned_pq_codebooks "
            "or explicit codebooks to run encode/search paths)")
    X = np.array([r[1] for r in rows], dtype=float)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for i in range(m):
        S = X[:, i * sub:(i + 1) * sub]
        kk = min(k, len(S))
        # k-means++ on L2
        idx = [int(rng.randint(len(S)))]
        for _ in range(1, kk):
            d2 = np.min(
                ((S[:, None, :] - S[idx][None, :, :]) ** 2).sum(-1), axis=1)
            p = d2 / d2.sum() if d2.sum() > 0 else None
            idx.append(int(rng.choice(len(S), p=p)))
        C = S[idx].copy()
        for _ in range(n_iters):
            assign = np.argmin(
                ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
            for c in range(len(C)):
                mem = S[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_code_exprs(vec: Column, codebooks) -> list:
    """One 1-based code Column per subspace: argmax over codes of
    round(dot(sub, c) - |c|^2/2, 6) — the L2-nearest code via the
    dot identity (||v-c||^2 = ||v||^2 - 2 dot + ||c||^2; the ||v||^2
    term is constant per subvector so argmin L2 == argmax of
    dot - halfnorm). The half-norms are Python-computed literals and
    the scores are rounded BEFORE the argmax, so the code choice
    replays bit-identically in the SQL oracle (same posture as
    semantic_dedup's rounded-argmax cluster assignment). Each
    codebook travels as ONE nested array literal."""
    m = len(codebooks)
    sub = len(codebooks[0][0])

    # closure factory, not default-arg lambdas: PySpark inspects the
    # lambda's parameter count, so extra bound defaults break the
    # (element, index) HOF contract
    def _score_fn(s, halfn):
        return lambda c, j: F.round(
            dot_expr(s, c) - F.element_at(halfn, j + 1), 6)

    out = []
    for i in range(m):
        cb = codebooks[i]
        halfn = double_array_lit([sum(float(x) * float(x) for x in c) / 2.0
                                  for c in cb])
        cb_lit = double_array_lit([[float(x) for x in c] for c in cb])
        s = F.slice(vec, i * sub + 1, sub)
        scores = F.transform(cb_lit, _score_fn(s, halfn))
        out.append(
            F.array_position(scores, F.array_max(scores)).cast("int"))
    return out


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoding: (id, codes array<int>, m 1-based entries).
    At 100 TB this is THE point of PQ — the encoded corpus is m small
    ints per vector instead of dim doubles (64x smaller at
    dim=64/m=4/float64), so every downstream candidate scan reads
    codes, not vectors."""
    v = F.col(vec_col).cast("array<double>")
    return embeddings.select(
        F.col(id_col),
        F.array(*pq_code_exprs(v, codebooks)).alias("codes"),
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids=None,
    n_probe: int = 4,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k by inner product: the corpus
    is scanned as codes only; each query precomputes its m x k table
    of subspace dots t[i][j] = round(dot(q_i, c_ij), 6) as a column
    expression, and the approximate dot is the fold
    sum_i t[i][code_i] — a per-candidate cost of m array lookups
    instead of a dim-length fold. Queries must be small (broadcast).

    ``centroids``: optional IVF coarse quantizer — when given, the
    candidate set is restricted to each query's ``n_probe`` closest
    inverted lists (equi-join on list_id) and the scan is IVF-PQ, the
    standard billion-scale ANN layout; with ``n_probe`` >= len(
    centroids) the candidates are exhaustive and the result equals
    plain pq_topk exactly (tested). Returns
    (query_id, nbr_id, adc_dot, rank); adc_dot approximates dot(q, x)
    — normalize vectors upstream if cosine semantics are wanted."""
    m = len(codebooks)
    qv = F.col(vec_col).cast("array<double>")
    sub = len(codebooks[0][0])

    def _tab_fn(s):
        return lambda c: F.round(dot_expr(s, c), 6)

    tabs = F.array(*[
        F.transform(
            double_array_lit([[float(x) for x in c] for c in codebooks[i]]),
            _tab_fn(F.slice(qv, i * sub + 1, sub)))
        for i in range(m)
    ])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), tabs.alias("__tabs"),
        *([qv.alias("__qv")] if centroids is not None else []))
    if centroids is not None:
        # codes AND list assignment from ONE map-only pass over the
        # corpus — no second scan, no self-join
        ev = F.col(vec_col).cast("array<double>")
        e = embeddings.select(
            F.col(id_col).alias("nbr_id"),
            F.array(*pq_code_exprs(ev, codebooks)).alias("codes"),
            ivf_assign_expr(ev, centroids).alias("list_id"),
        )
        n_probe = min(n_probe, len(centroids))
        q = q.withColumn(
            "__probes",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.transform(
                            _centroid_dots_expr(F.col("__qv"), centroids),
                            lambda d, i: F.struct(
                                (-d).alias("nd"),
                                (i + 1).alias("list_id")))),
                    lambda s: s["list_id"]),
                1, n_probe),
        ).select("query_id", "__tabs",
                 F.explode("__probes").alias("list_id"))
        scored = e.join(F.broadcast(q), "list_id")
    else:
        e = pq_encode(embeddings, codebooks, id_col,
                      vec_col).withColumnRenamed(id_col, "nbr_id")
        scored = e.crossJoin(F.broadcast(q))
    adc = F.round(
        F.aggregate(
            F.zip_with(F.col("codes"), F.col("__tabs"),
                       lambda code, tab: F.element_at(tab, code)),
            F.lit(0.0), lambda acc, x: acc + x), 6) + F.lit(0.0)
    scored = scored.filter(F.col("nbr_id") != F.col("query_id")).select(
        "query_id", "nbr_id", adc.alias("adc_dot"))
    w = W.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "adc_dot", "rank")
    )
