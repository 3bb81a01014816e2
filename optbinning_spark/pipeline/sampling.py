"""Deterministic sampling / dataset-split operators.

A 100 TB training-data pipeline needs REPRODUCIBLE sampling: the same
document must land in the same split on every run, on every cluster,
regardless of partitioning — which rules out ``rand()`` (per-task
seeds) and ``df.sample`` (partition-order dependent). Everything here
gates on a salted md5 of a stable key instead:

    u(key) = int(md5(salt | key)[:8 hex]) / 2^32   in [0, 1)

- map-only (no shuffle, no state), safe under retries/speculation;
- the salt decorrelates independent sampling decisions on the same key
  (e.g. a split gate and a downstream subsample gate);
- md5 (not xxhash) so every operator is replayable in ANSI SQL for the
  DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a stable key: the top 32 bits
    of md5(salt | key) scaled. Same key + salt -> same value anywhere."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_U32)


def split_thresholds(fractions: dict[str, float]) -> dict[str, float]:
    """Cumulative gate thresholds for :func:`hash_split`, one per
    non-final split name. Computed with ``math.fsum`` over each prefix
    (correctly-rounded, order-independent of intermediate rounding) so
    engine and oracle can gate on BIT-IDENTICAL constants: a naive
    running sum gives 0.8+0.1 = 0.9000000000000002 while an oracle
    written with the decimal literal 0.9 gates differently — sub-ulp
    today, but any doc whose u lands between the two constants would
    flip splits between engine and oracle. Oracle SQL must be
    generated from repr() of THESE values (see
    __spark_entry__.doc_split_assignment)."""
    import math

    total = math.fsum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    return {
        name: math.fsum(fractions[n] for n in names[: i + 1])
        for i, name in enumerate(names[:-1])
    }


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by
    cumulative thresholds over the key's uniform hash. Deterministic,
    disjoint, exhaustive (fractions must sum to 1 within 1e-9);
    map-only so it composes with any downstream plan at any scale.
    Thresholds come from :func:`split_thresholds` (fsum per prefix)
    so they are reproducible constants, not accumulation-order
    artifacts."""
    thresholds = split_thresholds(fractions)
    u = hash_uniform(F.col(id_col), salt)
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        acc = thresholds[name]
        expr = (F.when(u < acc, name) if expr is None
                else expr.when(u < acc, name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.select("*", expr.alias("split"))


def global_shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Reproducible corpus-wide training shuffle with (shard, pos)
    addressing — what a data loader needs to stream a 100 TB corpus
    in a uniform random order, resume mid-epoch, and re-shuffle per
    epoch (change the salt).

    The global order is (u, id) where u = hash_uniform(id, salt) — a
    deterministic uniform permutation independent of input
    partitioning. Rather than a full global sort, the permutation is
    addressed two-level: ``shard = floor(u * n_shards)`` (map-only;
    contiguous u-ranges, so concatenating shards 0..n-1 IS the global
    order) and ``pos`` = rank of u within the shard (ONE hash
    shuffle + per-shard sort — each shard sorts independently, no
    total-order range exchange, no driver coordination). Readers that
    interleave shards still see a uniform order because u is uniform
    within every shard.

    Returns ``df`` plus (shard int, pos long); pos is 0-based and
    dense within each shard.
    """
    from pyspark.sql import Window as W

    u = hash_uniform(F.col(id_col), salt)
    d = df.select("*", u.alias("__u")).withColumn(
        "shard",
        # u < 1 so floor(u * n) < n mathematically; least() guards
        # the one float edge where u * n rounds up to exactly n
        F.least(F.floor(F.col("__u") * n_shards).cast("int"),
                F.lit(n_shards - 1)))
    w = W.partitionBy("shard").orderBy(F.col("__u"), F.col(id_col))
    return (
        d.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__u")
    )


def mixture_sampling_rates(
    df: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum keep rates that realize a target token MIXTURE by
    downsampling only (the standard data-mixing step: e.g. 60/30/10
    across domains/languages). The achievable token budget without
    upsampling is B = min_s tokens_s / w_s; stratum s then keeps
    rate_s = w_s * B / tokens_s (<= 1, and exactly 1 for the binding
    stratum). Strata not in ``target_weights`` get rate 0.

    Fully distributed — one aggregation per stratum plus a 1-row
    budget aggregate joined back; NO driver collect, so the output
    composes straight into :func:`stratified_hash_sample`:

        rates = mixture_sampling_rates(docs, "lang", w)
        keep = {r["stratum"]: r["rate"] for r in rates.collect()}
        sampled = stratified_hash_sample(docs, "lang", keep)

    A stratum named in ``target_weights`` but ABSENT from ``df`` is
    emitted as a zero-token row (n_docs = n_tokens = 0) rather than
    silently dropped: with 0 available tokens its budget
    tokens_s / w_s is 0, so B = 0 and every rate is 0 — the honest
    downsample-only answer for an unrealizable mixture, and visible
    to the caller instead of a renormalized-over-the-wrong-total one.

    Returns (stratum, n_docs, n_tokens, target_weight, rate)."""
    from .text import token_count_expr

    total = sum(target_weights.values())
    if total <= 0:
        raise ValueError("target weights must sum to a positive value")
    # broadcast the (tiny) target dict and FULL outer join so both
    # unweighted data strata (rate 0) and weighted-but-absent strata
    # (zero-token row) appear in the output
    tgt = df.sparkSession.createDataFrame(
        [(k, float(v) / total) for k, v in target_weights.items()],
        ["__stratum_t", "__weight_t"],
    )
    grouped = df.groupBy(F.col(strata_col).alias("__stratum_d")).agg(
        F.count("*").alias("__n_docs"),
        F.sum(token_count_expr(F.col(text_col))).alias("__n_tokens"),
    )
    per = (
        grouped.join(F.broadcast(tgt),
                     grouped["__stratum_d"] == tgt["__stratum_t"],
                     "full_outer")
        .select(
            F.coalesce("__stratum_d", "__stratum_t").alias("stratum"),
            F.coalesce("__n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("__n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("__weight_t", F.lit(0.0)).alias("target_weight"),
        )
    )
    budget = per.filter(F.col("target_weight") > 0).agg(
        F.min(F.col("n_tokens") / F.col("target_weight")).alias("__B"))
    return (
        per.crossJoin(F.broadcast(budget))
        .select(
            "stratum", "n_docs", "n_tokens",
            F.round("target_weight", 6).alias("target_weight"),
            F.round(
                F.when(
                    (F.col("target_weight") > 0) & (F.col("n_tokens") > 0),
                    F.least(
                        F.lit(1.0),
                        F.col("target_weight") * F.col("__B")
                        / F.col("n_tokens"))).otherwise(0.0),
                6).alias("rate"),
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: stratum s
    keeps rows with u(id) < fractions.get(s, default_fraction). The
    standard quota-rebalancing step (e.g. downsample dominant
    languages, keep all of rare ones) as a pure map-side filter — no
    per-stratum counts, no shuffle, exact reproducibility."""
    u = hash_uniform(F.col(id_col), salt)
    s = F.col(strata_col)
    thr = None
    for k, frac in fractions.items():
        cond = s == F.lit(k)
        thr = (F.when(cond, float(frac)) if thr is None
               else thr.when(cond, float(frac)))
    thr = (F.lit(float(default_fraction)) if thr is None
           else thr.otherwise(float(default_fraction)))
    return df.filter(u < thr)


# -- DSIR-style importance resampling (data selection) --------------------

def _dsir_features(text: Column, n_buckets: int) -> Column:
    """Hashed n-gram features of one document: word unigrams + word
    bigrams, each mapped to a bucket id in [0, n_buckets) via the top
    32 md5 bits (md5, not xxhash, so the DuckDB oracle can replay the
    hash — same trade as hash_uniform). Docs with fewer than 2 words
    contribute unigrams only (the sequence guard matters: Spark's
    sequence(0, -1) would DESCEND, fabricating a bigram)."""
    words = F.split(text, " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - F.lit(2)),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(words, bigrams),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )


def dsir_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize the hashed-n-gram features of each document as a
    compact ``(id_col, features array<long>)`` frame — the exact
    scan-halving path for :func:`dsir_log_weights` at 100 TB with ZERO
    accuracy loss: tokenize + md5 + bucket ONCE over the raw text,
    write this frame (ints compress to a fraction of the text bytes),
    then run both the count aggregation and the scoring pass over it
    via ``features_col="features"``. One expensive text scan + two
    cheap integer scans instead of two text scans. ``keep`` carries
    extra columns through (e.g. the stratum the target slice filters
    on) so no join-back is needed."""
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep],
        _dsir_features(F.col(text_col), n_buckets).alias("features"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    raw_sample_fraction: float | None = None,
    features_col: str | None = None,
    target_flag: Column | None = None,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every ``raw`` document by how much its hashed
    n-gram feature distribution looks like the ``target`` corpus,

        log w(doc) = sum_f [ log p_target(b_f) - log p_raw(b_f) ]

    over the doc's (unigram + bigram) feature occurrences, with
    Laplace-``smoothing`` bucket probabilities. Returns
    (id_col, log_weight); feed to :func:`dsir_gumbel_sample` (the
    paper's resampling step) or threshold directly.

    Physical strategy (the 100 TB shape): two bucket-count
    aggregations — map-side partials absorb everything, output is
    BOUNDED at ``n_buckets`` rows each — collected to a driver-side
    log-ratio table that ships back as ONE array literal (the same
    trick as the fit probe's probability grid: one py4j literal, not
    n_buckets round trips). Scoring is then a map-only fold per doc
    (no join, no shuffle): features are array_sort-ed before the fold
    so the floating-point sum has ONE well-defined order — the DuckDB
    oracle folds the identically-sorted list and matches at 1e-5.

    Driver memory is O(n_buckets) — a parameter, not data-dependent.
    A NULL-text doc contributes nothing to either corpus count and
    emits a NULL log_weight (no features to score) — filter or
    coalesce downstream as the selection policy dictates.

    Two 100 TB scan-reduction paths:

    - ``features_col``: ``raw``/``target`` are compact feature frames
      from :func:`dsir_features` (one text scan total, both passes
      read integers) — ZERO accuracy loss, the preferred shape.
    - ``raw_sample_fraction`` in (0, 1): the raw count aggregation
      runs on a deterministic :func:`hash_uniform` subsample of the
      raw docs (salt ``"dsir_rawcounts"``, independent of any other
      gate on the same ids), with Horvitz-Thompson 1/fraction
      scale-up so smoothing keeps its relative weight. The estimate
      is unbiased but carries sampling variance; measured at organic
      sf1 + model-validated across 5 fractions and 2 corpus sizes
      (tools/ab_dsir_sample.py, SCALING.md): weight-ranking Spearman
      rho fits 1/sqrt(1 + c*(1-f)/f) with c = (per-doc features) /
      (fraction-invariant per-bucket mass) ~ inversely proportional
      to corpus/n_buckets. At sf1 (5.4M features, 4096 buckets)
      c=0.224 caps 10%-sample rho at ~0.58 for ANY unbiased
      subsampler; c shrinks linearly with corpus, so rho(10%) >= 0.99
      needs >= ~100x sf1 (~500M features) — comfortably met at the
      100 TB scale this knob exists for. Default None = exact counts
      (the oracle-replayable path).
    """
    import math

    # argument-combination validation (r18, ADVICE): the flag fast
    # path is gated on raw_sample_fraction is None, so a silently
    # ignored combination used to fall into the two-frame branch and
    # crash on explode_feats(None) with an opaque AttributeError
    if target_flag is not None:
        if target is not None:
            raise ValueError(
                "pass either target (a separate corpus frame) or "
                "target_flag (a predicate slice of raw), not both")
        if raw_sample_fraction is not None:
            raise ValueError(
                "target_flag is incompatible with raw_sample_fraction "
                "(the target count must stay exact); drop one")
    elif target is None:
        raise ValueError(
            "one of target or target_flag is required")

    if features_col is not None:
        feats = F.col(features_col)

        def explode_feats(df):
            return df.select(F.explode(F.col(features_col)).alias("b"))
    else:
        feats = _dsir_features(F.col(text_col), n_buckets)

        def explode_feats(df):
            return df.select(F.explode(_dsir_features(
                F.col(text_col), n_buckets)).alias("b"))

    if raw_sample_fraction is not None and not 0 < raw_sample_fraction <= 1:
        raise ValueError("raw_sample_fraction must be in (0, 1]")
    raw_for_counts, r_scale = raw, 1.0
    if raw_sample_fraction is not None and raw_sample_fraction < 1:
        raw_for_counts = raw.filter(
            hash_uniform(F.col(id_col), "dsir_rawcounts")
            < raw_sample_fraction)
        # Horvitz-Thompson scale-up: without it the sampled corpus
        # total shrinks by 1/fraction while `smoothing` stays fixed,
        # so low-count buckets read up to 1/fraction too probable — a
        # LENGTH- and rarity-correlated bias that measurably scrambles
        # the weight ranking (rho 0.58 at 10% unscaled vs >=0.99
        # scaled, organic sf1). Scaling counts by 1/fraction restores
        # the smoothing's relative weight; E[scaled count] = exact.
        r_scale = 1.0 / raw_sample_fraction
    # BOTH bucket-count aggregations in ONE job: union the exploded
    # sides under a tag and group by (side, bucket) — map-side
    # partials still bound every task at 2*n_buckets keys, and one
    # shuffle round replaces two scheduled back-to-back (integer
    # counts, so the fusion is exact, not an fp reordering)
    if target_flag is not None and raw_sample_fraction is None:
        # target is a predicate SLICE of raw (the common selection
        # shape): count both sides from ONE pass over raw's exploded
        # features — a conditional count per bucket instead of a
        # second explode of the target slice (r17; exact integer
        # counts either way). Incompatible with raw-side subsampling
        # (the target count must stay exact), hence the gate.
        rows = (
            raw.select(target_flag.alias("__t"),
                       F.explode(feats).alias("b"))
            .groupBy("b").agg(
                F.count("*").alias("rn"),
                F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("tn"))
            .collect()
        )
        tc = {int(r["b"]): int(r["tn"]) for r in rows if r["tn"]}
        rc = {int(r["b"]): int(r["rn"]) for r in rows}
    else:
        rows = (
            explode_feats(target).withColumn("__side", F.lit("t"))
            .unionByName(
                explode_feats(raw_for_counts)
                .withColumn("__side", F.lit("r")))
            .groupBy("__side", "b").agg(F.count("*").alias("n"))
            .collect()
        )
        tc = {int(r["b"]): int(r["n"]) for r in rows if r["__side"] == "t"}
        rc = {int(r["b"]): int(r["n"]) for r in rows if r["__side"] == "r"}
    t_tot = float(sum(tc.values())) + smoothing * n_buckets
    r_tot = float(sum(rc.values())) * r_scale + smoothing * n_buckets
    ratio = [
        math.log((tc.get(b, 0) + smoothing) / t_tot)
        - math.log((rc.get(b, 0) * r_scale + smoothing) / r_tot)
        for b in range(n_buckets)
    ]
    from ..operators.fastlit import double_array_lit
    ratio_lit = double_array_lit(ratio)
    log_w = F.aggregate(
        F.array_sort(feats),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(ratio_lit, b.cast("int") + 1),
    )
    return raw.select(F.col(id_col), log_w.alias("log_weight"))


def dsir_gumbel_sample(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "dsir",
) -> DataFrame:
    """The resampling step: sample ``k`` docs without replacement with
    probability proportional to exp(log_weight) via the Gumbel-top-k
    trick — key = log_w + Gumbel(0,1), take the k largest. The Gumbel
    noise is -log(-log(u)) over the deterministic per-doc uniform
    (hash_uniform), so the draw is reproducible under retries and
    repartitioning like every sampler in this module. orderBy+limit
    compiles to Spark's TakeOrderedAndProject (per-partition top-k +
    driver merge — no global sort)."""
    u = hash_uniform(F.col(id_col), salt)
    # the key is rounded to 6 dp before the sort: JVM Math.log and
    # libm log differ by 1 ulp on ~14% of md5-uniform inputs, so an
    # unrounded near-tie at the rank-k boundary could order
    # differently across engines — same round-before-boundary posture
    # as pq_code_exprs; rounding-induced ties are settled by the id
    key = F.round(F.col(weight_col) - F.log(-F.log(u)), 6)
    # id tiebreak: float-key ties are near-impossible but orderBy on
    # a non-unique key is partition-order-dependent at the boundary —
    # the determinism this sampler promises must not hinge on "near"
    return weighted.orderBy(key.desc(), F.col(id_col)).limit(k)


def stratified_top_fraction(
    df: DataFrame,
    strata_col: str,
    score_col: str,
    fraction: float | dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum quality-budget selection: keep the top ``fraction``
    of each stratum by ``score_col`` (a global cut would let one
    high-scoring domain crowd out every other — the standard
    per-domain quality filter keeps the mixture while raising the
    bar). ``fraction`` is a single float or a per-stratum dict
    (missing strata keep everything; the reference semantics of a
    budget nobody set).

    Deterministic: ties break by ``id_col``, so the same corpus
    always keeps the same rows on any cluster/partitioning.

    Physical strategy: one window rank per stratum (single shuffle on
    the stratum key; the sort spills). Rank, not percent_rank, against
    a per-stratum count carried by the same window — emitted rows are
    exactly ceil(fraction * n_stratum)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(strata_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    ranked = df.select(
        "*",
        F.row_number().over(w).alias("__rk"),
        F.count("*").over(W.partitionBy(strata_col)).alias("__n"),
    )
    if isinstance(fraction, dict):
        expr = None
        for k, v in fraction.items():
            cond = F.col(strata_col) == F.lit(k)
            expr = (F.when(cond, float(v)) if expr is None
                    else expr.when(cond, float(v)))
        frac = (F.lit(1.0) if expr is None
                else expr.otherwise(F.lit(1.0)))
    else:
        frac = F.lit(float(fraction))
    keep = F.col("__rk") <= F.ceil(frac * F.col("__n"))
    return ranked.filter(keep).drop("__rk", "__n")


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    n_shards: int,
    id_col: str = "doc_id",
    descending: bool = False,
    salt: str = "curriculum",
    exact: bool = True,
) -> DataFrame:
    """Curriculum data layout at corpus scale: shard ``s`` holds the
    s-th quantile slice of ``score_col`` (easy -> hard by default;
    ``descending`` flips it), rows WITHIN a shard in deterministic
    hash order — the standard curriculum-learning stream (coarse
    difficulty ordering with within-bucket shuffling, so the loader
    reads shards 0..n-1 in sequence and still sees i.i.d.-ish data
    inside each difficulty band). Same (shard, pos) addressing
    contract as :func:`global_shuffle_shards`: pos is dense per
    shard, resume/epoch semantics identical (new epoch = new salt for
    the WITHIN-shard order; the difficulty ordering is stable).

    Physical strategy: an (n_shards - 1)-cut percentile probe
    collected to the driver (one aggregation; ``exact=True`` uses the
    exact percentile — oracle-replayable via quantile_cont — and
    ``exact=False`` the t-digest approx_percentile for the 100 TB
    path), then a map-only bucket fold over the cut literals, then
    ONE hash shuffle for the per-shard rank — no global range
    exchange, no total sort. NULL scores raise (a curriculum needs
    every row scored; gate upstream).

    Returns ``df`` plus (shard int, pos long)."""
    from pyspark.sql import Window as W

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    s = F.col(score_col)
    nulls = df.filter(s.isNull()).limit(1).count()
    if nulls:
        raise ValueError(
            f"curriculum_shards: NULL {score_col} present — score or "
            "filter every row first")
    probs = [i / n_shards for i in range(1, n_shards)]
    if probs:
        cuts = df.agg(F.percentile(s, F.array(
            *[F.lit(p) for p in probs])) if exact
            else F.percentile_approx(s, F.array(
                *[F.lit(p) for p in probs]))).collect()[0][0]
        cuts = [float(c) for c in cuts]
    else:
        cuts = []
    shard = F.lit(0)
    for c in cuts:
        shard = shard + (s > F.lit(c)).cast("int")
    if descending:
        shard = F.lit(len(cuts)) - shard
    d = df.select("*", shard.alias("shard"),
                  hash_uniform(F.col(id_col), salt).alias("__u"))
    w = W.partitionBy("shard").orderBy(F.col("__u"), F.col(id_col))
    return (d.withColumn("pos",
                         (F.row_number().over(w) - 1).cast("long"))
            .drop("__u"))
