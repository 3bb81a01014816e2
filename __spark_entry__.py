"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator surface from SURVEY.md
§2 as (spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL for every SQL-expressible operator.
Solver-backed queries (optimal binning itself — the CP/MIP-equivalent
DP optimum) are intentionally oracle-free: the optimizer is not
SQL-expressible; the data plane feeding it is, and is covered by the
fixed-splits queries.

Conventions: every float output is rounded identically on both sides;
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# -- shared fixtures -----------------------------------------------------

PRICE_SPLITS = [20000.0, 40000.0, 60000.0, 80000.0]
ORDER_SPLITS = [100000.0, 200000.0, 300000.0, 400000.0]
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


from optbinning_spark.sources.tables import (  # noqa: E402
    documents as _documents,
    events as _events,
    lineitem as _lineitem,
    orders as _orders,
    table_path as _t,
)


def _bin_expr(col, splits):
    from optbinning_spark.operators.preprocessing import numeric_bin_expr

    return numeric_bin_expr(col, splits)


# -- SQL-checkable queries ----------------------------------------------


def q_sample_class_counts(spark, sf_dir):
    """P1-P3 + J7: sample-class routing with named special groups."""
    from optbinning_spark.operators.preprocessing import sample_class_expr

    df = _lineitem(spark, sf_dir)
    sclass = sample_class_expr(
        F.col("l_quantity"), "numerical", {"low": [1.0, 2.0], "mid": [25.0]}
    )
    return (
        df.groupBy(sclass.alias("sample_class"))
        .agg(F.count("*").alias("n_rows"), F.sum("y").alias("n_event"))
    )


def q_prebin_counts(spark, sf_dir):
    """A1: per-bin weighted binary counts on fixed splits."""
    df = _lineitem(spark, sf_dir)
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_nonevent"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n_event"),
        )
    )


def q_binning_table_fixed(spark, sf_dir):
    """M1-M2: binning table with event rate / WoE / IV on fixed splits,
    computed fully distributed (agg + broadcast of totals)."""
    df = _lineitem(spark, sf_dir)
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    agg = df.groupBy(b.alias("bin")).agg(
        F.count("*").alias("count"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_nonevent"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n_event"),
    )
    tot = agg.agg(
        F.sum("n_nonevent").alias("t_ne"), F.sum("n_event").alias("t_ev")
    )
    q = F.col("n_nonevent") / F.col("t_ne")
    p = F.col("n_event") / F.col("t_ev")
    woe = F.log(q / p)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "count",
            "n_nonevent",
            "n_event",
            F.round(F.col("n_event") / F.col("count"), 6).alias("event_rate"),
            F.round(woe, 6).alias("woe"),
            F.round((q - p) * woe, 6).alias("iv"),
        )
    )


def q_woe_transform(spark, sf_dir):
    """F1 + J1: per-row WoE transform through fitted fixed-split bins
    (fit = one agg; transform = map-only CASE, no shuffle)."""
    from optbinning_spark import OptimalBinning

    df = _lineitem(spark, sf_dir)
    ob = OptimalBinning(
        user_splits=PRICE_SPLITS, monotonic_trend=None, dtype="numerical"
    )
    ob.fit(df, "l_extendedprice", "y")
    out = ob.transform(df, "l_extendedprice", metric="woe", out_col="woe")
    return out.select(
        "l_orderkey", "l_linenumber", F.round(F.col("woe"), 6).alias("woe")
    )


def q_event_rate_order(spark, sf_dir):
    """J4/W1: categorical event-rate ordinal ordering."""
    df = _orders(spark, sf_dir)
    agg = df.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count("*").alias("n_rows"), F.sum("y").alias("n_event")
    )
    er = F.col("n_event") / F.col("n_rows")
    w = W.orderBy(er.asc(), F.col("category").asc())
    return agg.select(
        "category",
        "n_rows",
        "n_event",
        F.round(er, 6).alias("event_rate"),
        F.row_number().over(w).alias("ordinal"),
    )


def q_quantile_splits(spark, sf_dir):
    """B2 (exact variant): deterministic percentile split proposal."""
    df = _lineitem(spark, sf_dir)
    probs = [0.2, 0.4, 0.6, 0.8]
    qs = df.agg(
        F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(p) for p in probs])).alias(
            "qs"
        )
    )
    z = qs.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in probs]).alias("p"), F.col("qs").alias("v")
            )
        ).alias("z")
    )
    return z.select(
        F.col("z.p").alias("p"), F.round(F.col("z.v"), 4).alias("split_value")
    )


def q_uniform_binning_table(spark, sf_dir):
    """B3 + A1: uniform prebinning (min/max + linspace) end-to-end."""
    df = _orders(spark, sf_dir)
    row = df.agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")).first()
    mn, mx = float(row["mn"]), float(row["mx"])
    step = (mx - mn) / 8.0
    splits = [mn + i * step for i in range(1, 8)]
    b = _bin_expr(F.col("o_totalprice"), splits)
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("count"),
            F.sum("y").alias("n_event"),
        )
        .withColumn(
            "event_rate", F.round(F.col("n_event") / F.col("count"), 6)
        )
    )


def q_outlier_zscore(spark, sf_dir):
    """P6: modified Z-score outlier counts (median/MAD)."""
    df = spark.read.parquet(_t(sf_dir, "customer"))
    med = df.agg(F.percentile("c_acctbal", F.lit(0.5)).alias("m")).first()["m"]
    mad = df.agg(
        F.percentile(F.abs(F.col("c_acctbal") - F.lit(med)), F.lit(0.5)).alias("m")
    ).first()["m"]
    z = F.lit(0.6745) * F.abs(F.col("c_acctbal") - F.lit(med)) / F.lit(mad)
    return df.agg(
        F.sum(F.when(z > 3.5, 1).otherwise(0)).alias("n_outliers"),
        F.count("*").alias("n_total"),
    )


def q_outlier_iqr(spark, sf_dir):
    """P5: IQR range-detector outlier counts."""
    df = spark.read.parquet(_t(sf_dir, "customer"))
    r = df.agg(
        F.percentile("c_acctbal", F.lit(0.25)).alias("q1"),
        F.percentile("c_acctbal", F.lit(0.75)).alias("q3"),
    ).first()
    q1, q3 = float(r["q1"]), float(r["q3"])
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    return df.agg(
        F.sum(
            F.when((F.col("c_acctbal") < lo) | (F.col("c_acctbal") > hi), 1).otherwise(0)
        ).alias("n_outliers"),
        F.count("*").alias("n_total"),
    )


def q_special_missing_stats(spark, sf_dir):
    """A2: target info on missing/special partitions (missing synth'd
    from l_quantity since TPC-H columns are non-null)."""
    from optbinning_spark.operators.preprocessing import sample_class_expr

    df = _lineitem(spark, sf_dir).withColumn(
        "x",
        F.when(F.col("l_quantity") < 3, F.lit(None).cast("double")).otherwise(
            F.col("l_discount")
        ),
    )
    sclass = sample_class_expr(F.col("x"), "numerical", {"zero": [0.0]})
    return (
        df.groupBy(sclass.alias("sample_class"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("y").alias("n_event"),
        )
        .withColumn("event_rate", F.round(F.col("n_event") / F.col("n_rows"), 6))
    )


def q_doc_token_stats(spark, sf_dir):
    """Text analysis: token counting + quality scoring."""
    from optbinning_spark.pipeline.text import document_stats

    docs = _documents(spark, sf_dir)
    return document_stats(docs)


def q_lang_id(spark, sf_dir):
    """Heuristic language ID by marker-word vote."""
    from optbinning_spark.pipeline.text import lang_id_expr

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id", lang_id_expr(F.col("text")).alias("pred_lang")
    )


def q_exact_dedup(spark, sf_dir):
    """Exact dedup groups via content hash."""
    from optbinning_spark.pipeline.dedup import exact_dedup_groups

    docs = _documents(spark, sf_dir)
    return exact_dedup_groups(docs)


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (4 hash functions, word 3-shingles)."""
    from optbinning_spark.pipeline.dedup import minhash_signatures

    docs = _documents(spark, sf_dir)
    return minhash_signatures(docs, n_hashes=4)


def q_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs with hot-shingle cap."""
    from optbinning_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = _documents(spark, sf_dir)
    return ngram_jaccard_pairs(
        docs, shingle_n=3, max_doc_freq=20, min_jaccard=0.05
    )


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k similarity search."""
    from optbinning_spark.pipeline.similarity import brute_force_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return brute_force_topk(emb, queries, k=3)


def q_event_window_stats(spark, sf_dir):
    """Tumbling-window per-type event stats on the events stream table
    — the batch analog of the Structured Streaming windowed rollup
    (same plan works under readStream + watermark)."""
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 day")
    return (
        ev.groupBy(
            F.date_format(win.start, "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .drop("approx_users")  # approx differs across engines; keep exact cols
    )


def q_event_type_psi(spark, sf_dir):
    """M11 over time: PSI of the event-type mix between the first and
    second half of the stream (population drift on an event stream)."""
    ev = _events(spark, sf_dir)
    mid = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("m")
    ).first()["m"]
    pop = F.when(F.col("ts") < F.lit(mid), "E").otherwise("A")
    agg = ev.groupBy(F.col("event_type").alias("bin")).agg(
        F.sum(F.when(pop == "E", 1).otherwise(0)).alias("n_expected"),
        F.sum(F.when(pop == "A", 1).otherwise(0)).alias("n_actual"),
    )
    tot = agg.agg(F.sum("n_expected").alias("te"), F.sum("n_actual").alias("ta"))
    e = F.col("n_expected") / F.col("te")
    a = F.col("n_actual") / F.col("ta")
    return agg.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(e, 6).alias("expected_pct"),
        F.round(a, 6).alias("actual_pct"),
        F.round((a - e) * F.log(a / e), 6).alias("psi"),
    )


def q_simhash(spark, sf_dir):
    """SimHash document fingerprints (16-bit): per-bit majority vote
    over token hashes — one map-only pass, md5 computed once per
    token via a staged projection."""
    from optbinning_spark.pipeline.dedup import simhash

    docs = _documents(spark, sf_dir)
    return simhash(docs, "text", "doc_id", n_bits=16)


def q_doc_fingerprint(spark, sf_dir):
    """Rolling polynomial fingerprint of the token stream (order
    sensitive, mod 2^31-1) — map-only."""
    from optbinning_spark.pipeline.text import rolling_fingerprint_expr

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id", rolling_fingerprint_expr(F.col("text")).alias("fingerprint")
    )


def q_near_dup_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs at threshold 0.4
    (brute-force exact baseline)."""
    from optbinning_spark.pipeline.similarity import cosine_pairs

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    return cosine_pairs(emb, threshold=0.4)


def q_psi(spark, sf_dir):
    """J6 + M11: PSI between two order populations on fixed bins."""
    df = spark.read.parquet(_t(sf_dir, "orders"))
    pop = F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "E").otherwise("A")
    b = _bin_expr(F.col("o_totalprice"), ORDER_SPLITS)
    agg = (
        df.groupBy(b.alias("bin"))
        .agg(
            F.sum(F.when(pop == "E", 1).otherwise(0)).alias("n_expected"),
            F.sum(F.when(pop == "A", 1).otherwise(0)).alias("n_actual"),
        )
    )
    tot = agg.agg(
        F.sum("n_expected").alias("te"), F.sum("n_actual").alias("ta")
    )
    e_pct = F.col("n_expected") / F.col("te")
    a_pct = F.col("n_actual") / F.col("ta")
    return agg.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.round(e_pct, 6).alias("expected_pct"),
        F.round(a_pct, 6).alias("actual_pct"),
        F.round((a_pct - e_pct) * F.log(a_pct / e_pct), 6).alias("psi"),
    )


def q_ks(spark, sf_dir):
    """M6: KS statistic over ordered fixed bins (window cumsum)."""
    df = _lineitem(spark, sf_dir)
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    agg = df.groupBy(b.alias("bin")).agg(
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("ne"),
        F.sum("y").alias("ev"),
    )
    tot = agg.agg(F.sum("ne").alias("tne"), F.sum("ev").alias("tev"))
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_ev", F.sum("ev").over(w) / F.col("tev"))
        .withColumn("cum_ne", F.sum("ne").over(w) / F.col("tne"))
    )
    return cum.agg(
        F.round(F.max(F.abs(F.col("cum_ev") - F.col("cum_ne"))), 6).alias("ks")
    )


# -- solver-backed queries (no SQL oracle: the optimizer is the DP) ------


def q_optimal_binning_table(spark, sf_dir):
    from optbinning_spark import OptimalBinning

    df = _lineitem(spark, sf_dir)
    ob = OptimalBinning(prebinning_method="cart", monotonic_trend="auto")
    ob.fit(df, "l_extendedprice", "y")
    return ob.binning_table.to_spark(spark).select(
        "bin",
        "count",
        "n_nonevent",
        "n_event",
        F.round("event_rate", 6).alias("event_rate"),
        F.round("woe", 6).alias("woe"),
        F.round("iv", 6).alias("iv"),
    )


def q_optimal_woe_transform(spark, sf_dir):
    from optbinning_spark import OptimalBinning

    df = _lineitem(spark, sf_dir)
    ob = OptimalBinning(prebinning_method="cart", monotonic_trend="auto")
    ob.fit(df, "l_extendedprice", "y")
    out = ob.transform(df, "l_extendedprice", metric="woe", out_col="woe")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("woe", 6).alias("woe")
    )


def q_continuous_binning_table(spark, sf_dir):
    from optbinning_spark import ContinuousOptimalBinning

    df = spark.read.parquet(_t(sf_dir, "lineitem")).withColumn(
        "net_price", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    cb = ContinuousOptimalBinning(prebinning_method="cart", monotonic_trend="auto")
    cb.fit(df, "l_quantity", "net_price")
    return cb.binning_table.to_spark(spark).select(
        "bin",
        "count",
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        F.round("woe", 4).alias("woe"),
        F.round("iv", 4).alias("iv"),
    )


def q_categorical_optimal_binning(spark, sf_dir):
    from optbinning_spark import OptimalBinning

    df = _orders(spark, sf_dir)
    ob = OptimalBinning(monotonic_trend="ascending")
    ob.fit(df, "o_orderpriority", "y")
    return ob.binning_table.to_spark(spark).select(
        "bin",
        "count",
        "n_nonevent",
        "n_event",
        F.round("event_rate", 6).alias("event_rate"),
        F.round("woe", 6).alias("woe"),
    )


def q_lsh_candidates(spark, sf_dir):
    from optbinning_spark.pipeline.dedup import lsh_candidate_pairs

    docs = _documents(spark, sf_dir)
    return lsh_candidate_pairs(docs, n_hashes=8, band_size=2)


def q_multimodal_features(spark, sf_dir):
    from optbinning_spark.pipeline.multimodal import (
        extract_features,
        synthetic_media_df,
    )

    docs = _documents(spark, sf_dir)
    media = synthetic_media_df(spark, docs)
    return extract_features(media).select("doc_id", "media_type", "n_bytes", "content_sha")


def q_continuous_bin_stats(spark, sf_dir):
    """A3: continuous-target per-bin moments on fixed splits."""
    df = spark.read.parquet(_t(sf_dir, "lineitem")).withColumn(
        "net", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    b = _bin_expr(F.col("l_quantity"), [10.0, 20.0, 30.0, 40.0])
    return df.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n_records"),
        F.round(F.sum("net"), 4).alias("sum_y"),
        F.round(F.avg("net"), 6).alias("mean_y"),
        F.round(F.stddev_samp("net"), 6).alias("std_y"),
        F.round(F.min("net"), 4).alias("min_y"),
        F.round(F.max("net"), 4).alias("max_y"),
        F.sum(F.when(F.col("net") == 0, 1).otherwise(0)).alias("n_zeros"),
    )


def q_multiclass_bin_counts(spark, sf_dir):
    """A4: multiclass per-bin per-class counts on fixed splits."""
    df = spark.read.parquet(_t(sf_dir, "lineitem"))
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    return df.groupBy(b.alias("bin")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_class_r"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("n_class_a"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("n_class_n"),
    )


def q_binning_process_summary(spark, sf_dir):
    """BinningProcess multi-variable single-shuffle fit -> summary."""
    from optbinning_spark import BinningProcess

    df = _lineitem(spark, sf_dir)
    bp = BinningProcess(
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linestatus"],
        prebinning_method="quantile",
    )
    bp.fit(df, "y")
    pdf = bp.summary()
    for c in ("iv", "js", "gini", "ks", "quality_score"):
        pdf[c] = pdf[c].round(6)
    return spark.createDataFrame(pdf)


def q_scorecard_table(spark, sf_dir):
    """Scorecard: binning + MLlib logistic + pdo_odds points."""
    from optbinning_spark import BinningProcess
    from optbinning_spark.scorecard import Scorecard

    df = _lineitem(spark, sf_dir)
    bp = BinningProcess(
        ["l_quantity", "l_extendedprice", "l_discount"], prebinning_method="quantile"
    )
    sc = Scorecard(
        bp,
        scaling_method="pdo_odds",
        scaling_method_params={"pdo": 20, "odds": 50, "scorecard_points": 600},
        rounding=True,
    )
    sc.fit(df, "y")
    pdf = sc.table()[["variable", "bin", "count", "points"]]
    return spark.createDataFrame(pdf)


def q_scorecard_scores(spark, sf_dir):
    """Map-only scorecard scoring over every row."""
    from optbinning_spark import BinningProcess
    from optbinning_spark.scorecard import Scorecard

    df = _lineitem(spark, sf_dir)
    bp = BinningProcess(
        ["l_quantity", "l_extendedprice", "l_discount"], prebinning_method="quantile"
    )
    sc = Scorecard(
        bp,
        scaling_method="min_max",
        scaling_method_params={"min": 0, "max": 100},
    )
    sc.fit(df, "y")
    return sc.score(df).select(
        "l_orderkey", "l_linenumber", F.round("score", 4).alias("score")
    )


def q_multiclass_binning_table(spark, sf_dir):
    """Multiclass optimal binning (summed one-vs-rest JS objective)."""
    from optbinning_spark import MulticlassOptimalBinning

    df = spark.read.parquet(_t(sf_dir, "lineitem")).withColumn(
        "y3",
        F.when(F.col("l_returnflag") == "R", 0)
        .when(F.col("l_returnflag") == "A", 1)
        .otherwise(2),
    )
    mb = MulticlassOptimalBinning(prebinning_method="quantile")
    mb.fit(df, "l_extendedprice", "y3")
    pdf = mb.binning_table.build(add_totals=False)
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_sketch_binning_table(spark, sf_dir):
    """Streaming sketch path: add per batch -> merge -> solve."""
    from optbinning_spark.streaming.sketch import OptimalBinningSketch

    df = _lineitem(spark, sf_dir)
    sk1 = OptimalBinningSketch(monotonic_trend="auto")
    sk2 = OptimalBinningSketch(monotonic_trend="auto")
    sk1.add(df.filter(F.col("l_orderkey") % 2 == 0), "l_extendedprice", "y")
    sk2.add(df.filter(F.col("l_orderkey") % 2 == 1), "l_extendedprice", "y")
    sk1.merge(sk2)
    ob = sk1.solve()
    pdf = ob.binning_table.build(add_totals=False)
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_psi_variable_report(spark, sf_dir):
    """Per-variable PSI between two order populations (U4/M11)."""
    from optbinning_spark import BinningProcess
    from optbinning_spark.monitoring import ScorecardMonitoring
    from optbinning_spark.scorecard import Scorecard

    df = _lineitem(spark, sf_dir)
    bp = BinningProcess(["l_quantity", "l_extendedprice"], prebinning_method="quantile")
    sc = Scorecard(bp)
    sc.fit(df, "y")
    exp = df.filter(F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    act = df.filter(F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
    mon = ScorecardMonitoring(sc, psi_n_bins=10).fit(act, exp, "y")
    pdf = mon.variable_psi_table(act, exp)
    pdf["psi"] = pdf["psi"].round(6)
    return spark.createDataFrame(pdf)


def q_contingency_2d(spark, sf_dir):
    """A5: 2-D contingency aggregation on fixed splits (two grouping
    keys, single shuffle)."""
    df = _lineitem(spark, sf_dir)
    bx = _bin_expr(F.col("l_quantity"), [15.0, 30.0, 45.0])
    by = _bin_expr(F.col("l_extendedprice"), [30000.0, 60000.0, 90000.0])
    return df.groupBy(bx.alias("bin_x"), by.alias("bin_y")).agg(
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_nonevent"),
        F.sum("y").alias("n_event"),
    )


def q_binning_2d_table(spark, sf_dir):
    """O8: 2-D optimal binning via guillotine-partition DP."""
    from optbinning_spark.binning_2d import OptimalBinning2D

    df = _lineitem(spark, sf_dir)
    ob = OptimalBinning2D(max_n_prebins_x=6, max_n_prebins_y=6, min_bin_size=0.02)
    ob.fit(df, "l_quantity", "l_extendedprice", "y")
    pdf = ob.binning_table()
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_continuous_binning_2d_table(spark, sf_dir):
    """O8 continuous: 2-D mean-objective rectangle binning."""
    from optbinning_spark.binning_2d import ContinuousOptimalBinning2D

    df = spark.read.parquet(_t(sf_dir, "lineitem"))
    ob = ContinuousOptimalBinning2D(
        max_n_prebins_x=5, max_n_prebins_y=5, prebinning_method="quantile"
    )
    ob.fit(df, "l_quantity", "l_discount", "l_extendedprice")
    pdf = ob.binning_table()
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_piecewise_transform(spark, sf_dir):
    """O11/F6: piecewise-linear event-rate transform (continuous KKT
    fit from one aggregation)."""
    from optbinning_spark.piecewise import OptimalPWBinning

    df = _lineitem(spark, sf_dir)
    pw = OptimalPWBinning(objective="binary", degree=1,
                          prebinning_method="quantile")
    pw.fit(df, "l_extendedprice", "y")
    out = pw.transform(df, "l_extendedprice", metric="event_rate", out_col="p")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("p", 6).alias("p")
    )


def q_scenario_agg(spark, sf_dir):
    """O9 data plane: per-(scenario, bin) binary counts in one
    shuffle — the sufficient statistics of stochastic binning."""
    df = _lineitem(spark, sf_dir)
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    return df.groupBy(
        F.col("l_linestatus").alias("scenario"), b.alias("bin")
    ).agg(
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_nonevent"),
        F.sum("y").alias("n_event"),
    )


def q_scenario_binning_table(spark, sf_dir):
    """O9: shared-solution stochastic binning over linestatus
    scenarios (driver DP on the per-scenario stats)."""
    from optbinning_spark.scenario_binning import SBOptimalBinning

    df = _lineitem(spark, sf_dir)
    sb = SBOptimalBinning(max_n_prebins=8, monotonic_trend="auto_asc_desc")
    sb.fit(df, "l_extendedprice", "y", scenario_col="l_linestatus")
    pdf = sb.binning_table.build(add_totals=False)
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_counterfactual(spark, sf_dir):
    """O15: counterfactual explanations — exact branch-and-bound over
    bin assignments; Mahalanobis inputs from one Spark agg."""
    from optbinning_spark import BinningProcess, Counterfactual
    from optbinning_spark.scorecard import Scorecard

    df = _lineitem(spark, sf_dir)
    bp = BinningProcess(
        ["l_quantity", "l_extendedprice", "l_discount"],
        prebinning_method="quantile",
    )
    sc = Scorecard(bp).fit(df, "y")
    cf = Counterfactual(sc).fit(df)
    query = {"l_quantity": 10.0, "l_extendedprice": 20000.0, "l_discount": 0.01}
    # data-derived reachable target: 95% of the max attainable logit
    import numpy as np

    vals, _ = cf._candidates()
    coefs = [sc.coef_[v] for v in cf.variables_]
    s_max = sc.intercept_ + sum(
        float(max(c * v)) for c, v in zip(coefs, vals)
    )
    s_min = sc.intercept_ + sum(
        float(min(c * v)) for c, v in zip(coefs, vals)
    )
    target = 1.0 / (1.0 + np.exp(-(s_min + 0.95 * (s_max - s_min))))
    cf.generate(query, y=target, outcome_type="probability",
                hard_constraints=["min_outcome"], n_cf=3,
                objectives={"proximity": 1.0, "closeness": 0.1})
    pdf = cf.display(show_only_changes=False)
    num = pdf.select_dtypes("number").columns
    pdf[num] = pdf[num].round(6)
    return spark.createDataFrame(pdf)


def q_outlier_yquantile(spark, sf_dir):
    """P7: per-x-quantile-bin outlier counts on y."""
    from optbinning_spark.operators.outlier import YQuantileDetector

    df = spark.read.parquet(_t(sf_dir, "lineitem"))
    det = YQuantileDetector(n_bins=5).fit(df, "l_quantity", "l_extendedprice")
    pred = det.outlier_predicate(F.col("l_quantity"), F.col("l_extendedprice"))
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).alias("n_outliers"),
        F.count("*").alias("n_total"),
    )


def q_doc_quality(spark, sf_dir):
    """Text quality scoring (length band + lexical diversity +
    stopword presence) — pretraining-filter heuristic per document."""
    from optbinning_spark.pipeline.text import quality_score_expr

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.round(quality_score_expr(F.col("text"), STOPWORDS), 6).alias("quality"),
    )


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish pre-tokenizer token counts (GPT-2-style regex:
    contractions, letter/digit/punct runs) next to whitespace token
    counts — map-only."""
    from optbinning_spark.pipeline.text import (
        bpe_token_count_expr,
        token_count_expr,
    )

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_ws_tokens"),
        bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens"),
    )


def q_wide_process_fit(spark, sf_dir):
    """16-variable BinningProcess fit — the shape of the reference's
    published Home-Credit benchmark (16 vars, 307k rows, 5.09s
    single-core; README.rst:566-606) — over lineitem broadcast-joined
    with orders. Still exactly two actions regardless of variable
    count; returns the per-variable summary."""
    from optbinning_spark import BinningProcess
    from optbinning_spark.sources.tables import orders as _orders

    li = _lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir).drop("y")
    df = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    def to_days(c):
        # nanos-as-long (sf parquet with TIMESTAMP(NANOS)) or a real
        # timestamp column — both become float days since epoch
        if dict(df.dtypes)[c] == "bigint":
            return F.col(c) / F.lit(8.64e13)
        return F.datediff(
            F.to_date(F.col(c)), F.to_date(F.lit("1970-01-01"))
        ).cast("double")

    df = (
        df.withColumn("l_shipdays", to_days("l_shipdate"))
        .withColumn("o_orderdays", to_days("o_orderdate"))
        .withColumn(
            "net_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .withColumn("disc_tax", F.col("l_discount") + F.col("l_tax"))
    )
    variables = [
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdays",
        "o_custkey", "o_totalprice", "o_orderdays", "net_price",
        "disc_tax", "l_linestatus", "o_orderstatus", "o_orderpriority",
    ]
    bp = BinningProcess(variables).fit(df, "y")
    s = bp.summary()
    rows = [
        (n, d, int(b), round(float(iv), 6))
        for n, d, b, iv in zip(s["name"], s["dtype"], s["n_bins"], s["iv"])
    ]
    return spark.createDataFrame(rows, "name string, dtype string, n_bins int, iv double")


def q_class_weight_agg(spark, sf_dir):
    """A12: 'balanced' class weights (N / (k * n_class), reference
    preprocessing.py:181-186) folded into sample weights, then
    weighted per-bin target counts — one tiny agg for the weights,
    one grouped agg for the bins."""
    df = _lineitem(spark, sf_dir)
    tot = df.agg(F.count("*").alias("n"), F.sum("y").alias("n1")).first()
    n, n1 = float(tot["n"]), float(tot["n1"])
    n0 = n - n1
    w = F.when(F.col("y") == 1, F.lit(n / (2.0 * n1))).otherwise(
        F.lit(n / (2.0 * n0))
    )
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    return df.groupBy(b.alias("bin")).agg(
        F.round(F.sum(F.when(F.col("y") == 0, w).otherwise(0.0)), 4).alias(
            "w_nonevent"
        ),
        F.round(F.sum(F.when(F.col("y") == 1, w).otherwise(0.0)), 4).alias(
            "w_event"
        ),
    )


def q_classification_metrics(spark, sf_dir):
    """M12: confusion counts + TPR/TNR/balanced accuracy for a
    deterministic rule prediction."""
    from optbinning_spark.functions.perf_metrics import classification_report

    df = _lineitem(spark, sf_dir).withColumn(
        "pred", (F.col("l_discount") >= 0.05).cast("int")
    )
    rep = classification_report(df, "y", "pred")
    return rep.select(
        "tp", "fp", "fn", "tn",
        F.round("accuracy", 6).alias("accuracy"),
        F.round("tpr", 6).alias("tpr"),
        F.round("tnr", 6).alias("tnr"),
        F.round("balanced_accuracy", 6).alias("balanced_accuracy"),
    )


def q_regression_metrics(spark, sf_dir):
    """M13: MAE/MSE/RMSE/MedAE/MAPE/SMAPE/R² of a fixed linear
    predictor, one aggregation."""
    from optbinning_spark.functions.perf_metrics import regression_report

    df = _lineitem(spark, sf_dir).withColumn(
        "pred", F.col("l_quantity") * F.lit(1000.0)
    )
    rep = regression_report(df, "l_extendedprice", "pred")
    return rep.select(
        "n",
        F.round("mae", 4).alias("mae"),
        F.round(F.col("mse") / 1e6, 4).alias("mse_m"),
        F.round("rmse", 4).alias("rmse"),
        F.round("median_ae", 4).alias("median_ae"),
        F.round("mape", 6).alias("mape"),
        F.round("smape", 6).alias("smape"),
        F.round("r2", 6).alias("r2"),
    )


def q_indices_bins_transform(spark, sf_dir):
    """F2/F3: per-row bin-index and formatted bin-label transforms
    through fitted fixed splits (map-only CASE, no shuffle)."""
    from optbinning_spark import OptimalBinning

    df = _lineitem(spark, sf_dir)
    ob = OptimalBinning(
        user_splits=PRICE_SPLITS, monotonic_trend=None, dtype="numerical"
    )
    ob.fit(df, "l_extendedprice", "y")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        ob.transform_column_expr(
            F.col("l_extendedprice"), metric="indices"
        ).alias("bin_index"),
        ob.transform_column_expr(F.col("l_extendedprice"), metric="bins").alias(
            "bin_label"
        ),
    )


def q_mean_transform(spark, sf_dir):
    """F4: continuous-target metric='mean' transform through fitted
    fixed splits."""
    from optbinning_spark import ContinuousOptimalBinning

    df = spark.read.parquet(_t(sf_dir, "lineitem")).withColumn(
        "net", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    ob = ContinuousOptimalBinning(
        user_splits=[10.0, 20.0, 30.0, 40.0], monotonic_trend=None
    )
    ob.fit(df, "l_quantity", "net")
    out = ob.transform(df, "l_quantity", metric="mean", out_col="mean_net")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("mean_net", 4).alias("mean_net")
    )


def q_unknown_category_transform(spark, sf_dir):
    """J3: categories unseen at fit time fall through to the default
    WoE (0.0). Fit excludes '5-LOW'; transform covers all rows."""
    from optbinning_spark import OptimalBinning

    df = _orders(spark, sf_dir)
    groups = [["1-URGENT", "2-HIGH"], ["3-MEDIUM"], ["4-NOT SPECIFIED"]]
    ob = OptimalBinning(
        dtype="categorical", user_splits=groups, monotonic_trend=None
    )
    ob.fit(df.filter(F.col("o_orderpriority") != "5-LOW"), "o_orderpriority", "y")
    out = ob.transform(df, "o_orderpriority", metric="woe", out_col="woe")
    return out.select("o_orderkey", F.round("woe", 6).alias("woe"))


def q_chi2_tests(spark, sf_dir):
    """M9: per-bin Pearson chi2 statistic (no continuity correction)
    between two populations (reference monitoring.py:483-637 /
    metrics.py:256-275), fully as column expressions — one grouped
    aggregation, closed-form 2x2 chi2."""
    df = _lineitem(spark, sf_dir)
    is_a = F.col("l_orderkey") % 2 == 0
    b = _bin_expr(F.col("l_extendedprice"), PRICE_SPLITS)
    agg = df.groupBy(b.alias("bin")).agg(
        F.sum(F.when(is_a & (F.col("y") == 0), 1).otherwise(0)).alias("a_ne"),
        F.sum(F.when(is_a & (F.col("y") == 1), 1).otherwise(0)).alias("a_ev"),
        F.sum(F.when(~is_a & (F.col("y") == 0), 1).otherwise(0)).alias("e_ne"),
        F.sum(F.when(~is_a & (F.col("y") == 1), 1).otherwise(0)).alias("e_ev"),
    )
    a, bb, c, d = (F.col(k).cast("double") for k in ("a_ne", "a_ev", "e_ne", "e_ev"))
    t = a + bb + c + d
    stat = (t * (a * d - bb * c) * (a * d - bb * c)) / (
        (a + bb) * (c + d) * (a + c) * (bb + d)
    )
    return agg.select(
        "bin", "a_ne", "a_ev", "e_ne", "e_ev",
        F.round(stat, 6).alias("chi2"),
    )


def q_distribution_stats(spark, sf_dir):
    """A8: target distribution report per population — mean/std and
    exact quartiles in one aggregation."""
    df = _lineitem(spark, sf_dir)
    pop = F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("E")
    return df.groupBy(pop.alias("population")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


def q_cart_splits(spark, sf_dir):
    """B1: CART split proposal from exact per-distinct-value class
    stats (one agg; tree recursion on the driver — not SQL-
    expressible, hence rows-only)."""
    from optbinning_spark.operators.preprocessing import clean_value_expr
    from optbinning_spark.operators.prebinning import compute_prebins

    df = _lineitem(spark, sf_dir).withColumn(
        "__cx", clean_value_expr(F.col("l_quantity").cast("double"))
    )
    splits = compute_prebins(
        df, "__cx", "y", None, method="cart", max_n_prebins=10,
        task="classification", classes=[0, 1],
    )
    return spark.createDataFrame(
        [(i, round(float(s), 6)) for i, s in enumerate(splits)],
        "split_idx int, split double",
    )


def q_mdlp_splits(spark, sf_dir):
    """B4: MDLP (Fayyad-Irani entropy with MDL stop) split proposal —
    same single-agg sufficient stats, driver recursion."""
    from optbinning_spark.operators.preprocessing import clean_value_expr
    from optbinning_spark.operators.prebinning import compute_prebins

    df = (
        spark.read.parquet(_t(sf_dir, "lineitem"))
        .withColumn(
            "__cx", clean_value_expr(F.col("l_extendedprice").cast("double"))
        )
        .withColumn(
            "y2",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount")) > 30000.0
            ).cast("int"),
        )
    )
    splits = compute_prebins(
        df, "__cx", "y2", None, method="mdlp", max_n_prebins=10,
        task="classification", classes=[0, 1],
    )
    return spark.createDataFrame(
        [(i, round(float(s), 6)) for i, s in enumerate(splits)],
        "split_idx int, split double",
    )


def q_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k: hyperplane-bucket equi-join
    replaces the cross join — the 100 TB-scale ANN path."""
    from optbinning_spark.pipeline.similarity import lsh_bucketed_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    return lsh_bucketed_topk(emb, queries, dim=64, k=3, n_planes=4)


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: driver-trained spherical-kmeans coarse
    quantizer, inverted-list equi-join, n_probe closest lists per
    query — the second ANN scale path."""
    from optbinning_spark.pipeline.similarity import ivf_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    return ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=3)


# -- driver contract -----------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full optimal-binning fit on sf0.001."""
    return q_optimal_binning_table(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sample_class_counts": q_sample_class_counts,
        "prebin_counts": q_prebin_counts,
        "binning_table_fixed": q_binning_table_fixed,
        "woe_transform": q_woe_transform,
        "event_rate_order": q_event_rate_order,
        "quantile_splits": q_quantile_splits,
        "uniform_binning_table": q_uniform_binning_table,
        "outlier_zscore": q_outlier_zscore,
        "outlier_iqr": q_outlier_iqr,
        "special_missing_stats": q_special_missing_stats,
        "doc_token_stats": q_doc_token_stats,
        "lang_id": q_lang_id,
        "exact_dedup": q_exact_dedup,
        "minhash_signatures": q_minhash_signatures,
        "jaccard_pairs": q_jaccard_pairs,
        "embedding_topk": q_embedding_topk,
        "event_window_stats": q_event_window_stats,
        "event_type_psi": q_event_type_psi,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "near_dup_cosine": q_near_dup_cosine,
        "psi": q_psi,
        "ks": q_ks,
        "continuous_bin_stats": q_continuous_bin_stats,
        "multiclass_bin_counts": q_multiclass_bin_counts,
        "optimal_binning_table": q_optimal_binning_table,
        "optimal_woe_transform": q_optimal_woe_transform,
        "continuous_binning_table": q_continuous_binning_table,
        "categorical_optimal_binning": q_categorical_optimal_binning,
        "binning_process_summary": q_binning_process_summary,
        "scorecard_table": q_scorecard_table,
        "scorecard_scores": q_scorecard_scores,
        "multiclass_binning_table": q_multiclass_binning_table,
        "sketch_binning_table": q_sketch_binning_table,
        "psi_variable_report": q_psi_variable_report,
        "contingency_2d": q_contingency_2d,
        "binning_2d_table": q_binning_2d_table,
        "continuous_binning_2d_table": q_continuous_binning_2d_table,
        "piecewise_transform": q_piecewise_transform,
        "outlier_yquantile": q_outlier_yquantile,
        "counterfactual": q_counterfactual,
        "scenario_agg": q_scenario_agg,
        "scenario_binning_table": q_scenario_binning_table,
        "lsh_candidates": q_lsh_candidates,
        "doc_quality": q_doc_quality,
        "bpe_token_count": q_bpe_token_count,
        "wide_process_fit": q_wide_process_fit,
        "class_weight_agg": q_class_weight_agg,
        "classification_metrics": q_classification_metrics,
        "regression_metrics": q_regression_metrics,
        "indices_bins_transform": q_indices_bins_transform,
        "mean_transform": q_mean_transform,
        "unknown_category_transform": q_unknown_category_transform,
        "chi2_tests": q_chi2_tests,
        "distribution_stats": q_distribution_stats,
        "cart_splits": q_cart_splits,
        "mdlp_splits": q_mdlp_splits,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    price_case = _sql_bin_case("l_extendedprice", PRICE_SPLITS)
    order_case = _sql_bin_case("o_totalprice", ORDER_SPLITS)
    y_li = "(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
    y_o = "(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
    words = "regexp_split_to_array(text, ' ')"
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)

    shingle_cte = f"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
      ), sh AS (
        SELECT doc_id, unnest(list_distinct(
          [array_to_string(words[i:i+2], ' ')
           FOR i IN generate_series(1, len(words)-2)])) AS sh
        FROM w
      )"""

    lang_scores = ", ".join(
        f"len([x for x in {words} if x in ({', '.join(repr(m) for m in ms)})]) AS sc_{lang}"
        for lang, ms in sorted(
            __import__("optbinning_spark.pipeline.text", fromlist=["LANG_MARKERS"]).LANG_MARKERS.items()
        )
    )

    return {
        "sample_class_counts": f"""
            SELECT CASE
                     WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 'missing'
                     WHEN l_quantity IN (1.0, 2.0) THEN 'special:low'
                     WHEN l_quantity IN (25.0) THEN 'special:mid'
                     ELSE 'clean' END AS sample_class,
                   count(*) AS n_rows, CAST(sum({y_li}) AS BIGINT) AS n_event
            FROM lineitem GROUP BY 1
        """,
        "prebin_counts": f"""
            SELECT {price_case} AS bin,
                   CAST(sum(CASE WHEN {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonevent,
                   CAST(sum({y_li}) AS BIGINT) AS n_event
            FROM lineitem GROUP BY 1
        """,
        "binning_table_fixed": f"""
            WITH agg AS (
              SELECT {price_case} AS bin, count(*) AS count,
                     CAST(sum(CASE WHEN {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonevent,
                     CAST(sum({y_li}) AS BIGINT) AS n_event
              FROM lineitem GROUP BY 1
            ), tot AS (
              SELECT sum(n_nonevent) AS t_ne, sum(n_event) AS t_ev FROM agg
            )
            SELECT bin, count, n_nonevent, n_event,
                   round(n_event / CAST(count AS DOUBLE), 6) AS event_rate,
                   round(ln((n_nonevent / CAST(t_ne AS DOUBLE)) / (n_event / CAST(t_ev AS DOUBLE))), 6) AS woe,
                   round((n_nonevent / CAST(t_ne AS DOUBLE) - n_event / CAST(t_ev AS DOUBLE))
                         * ln((n_nonevent / CAST(t_ne AS DOUBLE)) / (n_event / CAST(t_ev AS DOUBLE))), 6) AS iv
            FROM agg, tot
        """,
        "woe_transform": f"""
            WITH agg AS (
              SELECT {price_case} AS bin,
                     sum(CASE WHEN {y_li} = 0 THEN 1 ELSE 0 END) AS n_nonevent,
                     sum({y_li}) AS n_event
              FROM lineitem GROUP BY 1
            ), tot AS (
              SELECT sum(n_nonevent) AS t_ne, sum(n_event) AS t_ev FROM agg
            ), woes AS (
              SELECT bin, ln((n_nonevent / CAST(t_ne AS DOUBLE)) / (n_event / CAST(t_ev AS DOUBLE))) AS woe
              FROM agg, tot
            )
            SELECT l.l_orderkey, l.l_linenumber, round(w.woe, 6) AS woe
            FROM lineitem l JOIN woes w ON {price_case.replace('l_extendedprice', 'l.l_extendedprice')} = w.bin
        """,
        "event_rate_order": f"""
            WITH agg AS (
              SELECT o_orderpriority AS category, count(*) AS n_rows,
                     CAST(sum({y_o}) AS BIGINT) AS n_event
              FROM orders GROUP BY 1
            )
            SELECT category, n_rows, n_event,
                   round(n_event / CAST(n_rows AS DOUBLE), 6) AS event_rate,
                   row_number() OVER (ORDER BY n_event / CAST(n_rows AS DOUBLE) ASC, category ASC) AS ordinal
            FROM agg
        """,
        "quantile_splits": """
            SELECT 0.2 AS p, round(quantile_cont(l_extendedprice, 0.2), 4) AS split_value FROM lineitem
            UNION ALL SELECT 0.4, round(quantile_cont(l_extendedprice, 0.4), 4) FROM lineitem
            UNION ALL SELECT 0.6, round(quantile_cont(l_extendedprice, 0.6), 4) FROM lineitem
            UNION ALL SELECT 0.8, round(quantile_cont(l_extendedprice, 0.8), 4) FROM lineitem
        """,
        "uniform_binning_table": f"""
            WITH mm AS (
              SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
            )
            SELECT CASE
                     {' '.join(f"WHEN o_totalprice < mn + {i} * ((mx - mn) / 8.0) THEN {i - 1}" for i in range(1, 8))}
                     ELSE 7 END AS bin,
                   count(*) AS count, CAST(sum({y_o}) AS BIGINT) AS n_event,
                   round(sum({y_o}) / CAST(count(*) AS DOUBLE), 6) AS event_rate
            FROM orders, mm GROUP BY 1
        """,
        "outlier_zscore": """
            WITH med AS (SELECT quantile_cont(c_acctbal, 0.5) AS m FROM customer),
            mad AS (SELECT quantile_cont(abs(c_acctbal - med.m), 0.5) AS d FROM customer, med)
            SELECT CAST(sum(CASE WHEN 0.6745 * abs(c_acctbal - med.m) / mad.d > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   count(*) AS n_total
            FROM customer, med, mad
        """,
        "outlier_iqr": """
            WITH q AS (
              SELECT quantile_cont(c_acctbal, 0.25) AS q1, quantile_cont(c_acctbal, 0.75) AS q3 FROM customer
            )
            SELECT CAST(sum(CASE WHEN c_acctbal < q1 - 1.5 * (q3 - q1) OR c_acctbal > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   count(*) AS n_total
            FROM customer, q
        """,
        "special_missing_stats": f"""
            WITH t AS (
              SELECT CASE WHEN l_quantity < 3 THEN NULL ELSE l_discount END AS x, {y_li} AS y
              FROM lineitem
            )
            SELECT CASE WHEN x IS NULL OR isnan(x) THEN 'missing'
                        WHEN x IN (0.0) THEN 'special:zero'
                        ELSE 'clean' END AS sample_class,
                   count(*) AS n_rows, CAST(sum(y) AS BIGINT) AS n_event,
                   round(sum(y) / CAST(count(*) AS DOUBLE), 6) AS event_rate
            FROM t GROUP BY 1
        """,
        "doc_token_stats": f"""
            WITH w AS (SELECT doc_id, text, {words} AS words FROM documents)
            SELECT doc_id,
                   len(words) AS n_tokens,
                   length(text) AS n_chars,
                   round(list_sum([length(x) FOR x IN words]) / CAST(len(words) AS DOUBLE), 4) AS avg_token_len,
                   round(len([x for x in words if x in ({sw})]) / CAST(len(words) AS DOUBLE), 6) AS stopword_ratio,
                   round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6) AS type_token_ratio,
                   round((least(len(words) / 100.0, 1.0)
                          + len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
                          + least(5.0 * len([x for x in words if x in ({sw})]) / CAST(len(words) AS DOUBLE), 1.0)) / 3.0, 6) AS quality_score
            FROM w
        """,
        "lang_id": f"""
            WITH s AS (SELECT doc_id, {lang_scores} FROM documents),
            g AS (SELECT *, greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) AS mx FROM s)
            SELECT doc_id, CASE WHEN mx <= 0 THEN 'unknown'
                                WHEN sc_de = mx THEN 'de'
                                WHEN sc_en = mx THEN 'en'
                                WHEN sc_es = mx THEN 'es'
                                WHEN sc_fr = mx THEN 'fr'
                                ELSE 'zh' END AS pred_lang
            FROM g
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "minhash_signatures": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            sh AS (
              SELECT doc_id, md5('s0|' || unnest([array_to_string(words[i:i+2], ' ')
                                     FOR i IN generate_series(1, len(words)-2)])) AS h
              FROM w
            )
            SELECT doc_id,
                   min(substr(h, 1, 8)) AS mh0, min(substr(h, 9, 8)) AS mh1,
                   min(substr(h, 17, 8)) AS mh2, min(substr(h, 25, 8)) AS mh3
            FROM sh GROUP BY doc_id
        """,
        "jaccard_pairs": shingle_cte + """
            , freq AS (
              SELECT sh, count(*) AS df_ FROM sh GROUP BY 1
            ), rare AS (
              SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON s.sh = f.sh WHERE f.df_ <= 20
            ), sizes AS (
              SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b, i.n_common,
                   round(i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE), 6) AS jaccard
            FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id JOIN sizes sb ON i.id_b = sb.doc_id
            WHERE i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) >= 0.05
        """,
        "event_window_stats": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "event_type_psi": """
            WITH m AS (
              SELECT to_timestamp((epoch(min(ts)) + epoch(max(ts))) / 2) AS mid
              FROM events
            ), agg AS (
              SELECT event_type AS bin,
                     sum(CASE WHEN ts < (SELECT mid FROM m) THEN 1 ELSE 0 END) AS n_expected,
                     sum(CASE WHEN ts >= (SELECT mid FROM m) THEN 1 ELSE 0 END) AS n_actual
              FROM events GROUP BY 1
            ), tot AS (SELECT sum(n_expected) AS te, sum(n_actual) AS ta FROM agg)
            SELECT bin,
                   round(n_expected / CAST(te AS DOUBLE), 6) AS expected_pct,
                   round(n_actual / CAST(ta AS DOUBLE), 6) AS actual_pct,
                   round((n_actual / CAST(ta AS DOUBLE) - n_expected / CAST(te AS DOUBLE))
                         * ln((n_actual / CAST(ta AS DOUBLE)) / (n_expected / CAST(te AS DOUBLE))), 6) AS psi
            FROM agg, tot
        """,
        "simhash": _simhash_oracle_sql(16),
        "doc_fingerprint": """
            SELECT doc_id,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       [('0x' || substr(md5(t), 1, 8))::BIGINT
                        FOR t IN string_split(text, ' ')]),
                     (a, b) -> (a * 31 + b) % 2147483647
                   ) AS fingerprint
            FROM documents
        """,
        "near_dup_cosine": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                     CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        """,
        "embedding_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id < 5
            ), scored AS (
              SELECT q.query_id, e.vec_id AS nbr_id,
                     round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cosine
              FROM embeddings e, q WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, nbr_id, cosine, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "psi": f"""
            WITH agg AS (
              SELECT {order_case} AS bin,
                     sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS n_expected,
                     sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS n_actual
              FROM orders GROUP BY 1
            ), tot AS (SELECT sum(n_expected) AS te, sum(n_actual) AS ta FROM agg)
            SELECT bin,
                   round(n_expected / CAST(te AS DOUBLE), 6) AS expected_pct,
                   round(n_actual / CAST(ta AS DOUBLE), 6) AS actual_pct,
                   round((n_actual / CAST(ta AS DOUBLE) - n_expected / CAST(te AS DOUBLE))
                         * ln((n_actual / CAST(ta AS DOUBLE)) / (n_expected / CAST(te AS DOUBLE))), 6) AS psi
            FROM agg, tot
        """,
        "continuous_bin_stats": f"""
            WITH t AS (
              SELECT l_quantity, l_extendedprice * (1 - l_discount) AS net FROM lineitem
            )
            SELECT {_sql_bin_case('l_quantity', [10.0, 20.0, 30.0, 40.0])} AS bin,
                   count(*) AS n_records,
                   round(sum(net), 4) AS sum_y,
                   round(avg(net), 6) AS mean_y,
                   round(stddev_samp(net), 6) AS std_y,
                   round(min(net), 4) AS min_y,
                   round(max(net), 4) AS max_y,
                   CAST(sum(CASE WHEN net = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zeros
            FROM t GROUP BY 1
        """,
        "multiclass_bin_counts": f"""
            SELECT {price_case} AS bin,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_class_r,
                   CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_class_a,
                   CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_class_n
            FROM lineitem GROUP BY 1
        """,
        "scenario_agg": f"""
            SELECT l_linestatus AS scenario, {price_case} AS bin,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS n_nonevent,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_event
            FROM lineitem GROUP BY 1, 2
        """,
        "contingency_2d": f"""
            SELECT {_sql_bin_case('l_quantity', [15.0, 30.0, 45.0])} AS bin_x,
                   {_sql_bin_case('l_extendedprice', [30000.0, 60000.0, 90000.0])} AS bin_y,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS n_nonevent,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_event
            FROM lineitem GROUP BY 1, 2
        """,
        "ks": f"""
            WITH agg AS (
              SELECT {price_case} AS bin,
                     sum(CASE WHEN {y_li} = 0 THEN 1 ELSE 0 END) AS ne,
                     sum({y_li}) AS ev
              FROM lineitem GROUP BY 1
            ), tot AS (SELECT sum(ne) AS tne, sum(ev) AS tev FROM agg),
            cum AS (
              SELECT bin,
                     sum(ev) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) / CAST(tev AS DOUBLE) AS cum_ev,
                     sum(ne) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) / CAST(tne AS DOUBLE) AS cum_ne
              FROM agg, tot
            )
            SELECT round(max(abs(cum_ev - cum_ne)), 6) AS ks FROM cum
        """,
        "chi2_tests": f"""
            WITH agg AS (
              SELECT {price_case} AS bin,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 0 AND {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_ne,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 0 AND {y_li} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a_ev,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 1 AND {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e_ne,
                     CAST(sum(CASE WHEN l_orderkey % 2 = 1 AND {y_li} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e_ev
              FROM lineitem GROUP BY 1
            )
            SELECT bin, a_ne, a_ev, e_ne, e_ev,
                   round(CAST(a_ne + a_ev + e_ne + e_ev AS DOUBLE)
                         * pow(CAST(a_ne AS DOUBLE) * e_ev - CAST(a_ev AS DOUBLE) * e_ne, 2)
                         / (CAST(a_ne + a_ev AS DOUBLE) * (e_ne + e_ev)
                            * (a_ne + e_ne) * (a_ev + e_ev)), 6) AS chi2
            FROM agg
        """,
        "distribution_stats": """
            SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'E' END AS population,
                   count(*) AS n,
                   round(avg(l_extendedprice), 4) AS mean,
                   round(stddev_samp(l_extendedprice), 4) AS std,
                   round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
            FROM lineitem GROUP BY 1
        """,
        # lsh_candidates: mirrors pipeline.dedup.lsh_candidate_pairs
        # (n_hashes=8, band_size=2 -> 4 bands); mh{i} = lane (i%4) of
        # md5('s{i//4}|' || shingle), band key = md5(mh_a || '|' || mh_b).
        "lsh_candidates": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            sh AS (
              SELECT doc_id, unnest([array_to_string(words[i:i+2], ' ')
                                     FOR i IN generate_series(1, len(words)-2)]) AS s
              FROM w
            ), h AS (
              SELECT doc_id, md5('s0|' || s) AS h0, md5('s1|' || s) AS h1 FROM sh
            ), sig AS (
              SELECT doc_id,
                     min(substr(h0, 1, 8)) AS mh0, min(substr(h0, 9, 8)) AS mh1,
                     min(substr(h0, 17, 8)) AS mh2, min(substr(h0, 25, 8)) AS mh3,
                     min(substr(h1, 1, 8)) AS mh4, min(substr(h1, 9, 8)) AS mh5,
                     min(substr(h1, 17, 8)) AS mh6, min(substr(h1, 25, 8)) AS mh7
              FROM h GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
              UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
              UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
              UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        """,
        "doc_quality": f"""
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
            SELECT doc_id,
                   round((least(len(words) / 100.0, 1.0)
                        + len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
                        + least(5.0 * len([x FOR x IN words IF x IN ({sw})])
                                / CAST(len(words) AS DOUBLE), 1.0)) / 3.0,
                         6) AS quality
            FROM w
        """,
        "bpe_token_count": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+',
                       0)) AS n_bpe_tokens
            FROM documents
        """,
        "class_weight_agg": f"""
            WITH t AS (
              SELECT count(*) AS n, sum({y_li}) AS n1,
                     count(*) - sum({y_li}) AS n0
              FROM lineitem
            )
            SELECT {price_case} AS bin,
                   round(sum(CASE WHEN {y_li} = 0
                                  THEN n / (2.0 * n0) ELSE 0 END), 4) AS w_nonevent,
                   round(sum(CASE WHEN {y_li} = 1
                                  THEN n / (2.0 * n1) ELSE 0 END), 4) AS w_event
            FROM lineitem, t GROUP BY 1
        """,
        "classification_metrics": f"""
            WITH c AS (
              SELECT CAST(sum(CASE WHEN l_discount >= 0.05 AND {y_li} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                     CAST(sum(CASE WHEN l_discount >= 0.05 AND {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                     CAST(sum(CASE WHEN l_discount < 0.05 AND {y_li} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                     CAST(sum(CASE WHEN l_discount < 0.05 AND {y_li} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
              FROM lineitem
            )
            SELECT tp, fp, fn, tn,
                   round((tp + tn) / CAST(tp + tn + fp + fn AS DOUBLE), 6) AS accuracy,
                   round(tp / CAST(tp + fn AS DOUBLE), 6) AS tpr,
                   round(tn / CAST(tn + fp AS DOUBLE), 6) AS tnr,
                   round((tp / CAST(tp + fn AS DOUBLE)
                        + tn / CAST(tn + fp AS DOUBLE)) / 2.0, 6) AS balanced_accuracy
            FROM c
        """,
        "regression_metrics": """
            WITH s AS (
              SELECT count(*) AS n,
                     avg(abs(l_quantity * 1000.0 - l_extendedprice)) AS mae,
                     avg(pow(l_quantity * 1000.0 - l_extendedprice, 2)) AS mse,
                     quantile_cont(abs(l_quantity * 1000.0 - l_extendedprice), 0.5) AS median_ae,
                     avg(abs(l_quantity * 1000.0 - l_extendedprice)
                         / greatest(abs(l_extendedprice), 1e-12)) AS mape,
                     avg(2.0 * abs(l_quantity * 1000.0 - l_extendedprice)
                         / greatest(abs(l_extendedprice) + abs(l_quantity * 1000.0), 1e-12)) AS smape,
                     sum(pow(l_quantity * 1000.0 - l_extendedprice, 2)) AS sse,
                     sum(l_extendedprice * l_extendedprice) AS syy,
                     sum(l_extendedprice) AS sy
              FROM lineitem
            )
            SELECT n, round(mae, 4) AS mae, round(mse / 1e6, 4) AS mse_m,
                   round(sqrt(mse), 4) AS rmse,
                   round(median_ae, 4) AS median_ae,
                   round(mape, 6) AS mape, round(smape, 6) AS smape,
                   round(1.0 - sse / (syy - sy * sy / n), 6) AS r2
            FROM s
        """,
        "indices_bins_transform": f"""
            SELECT l_orderkey, l_linenumber,
                   {price_case} AS bin_index,
                   CASE WHEN l_extendedprice < 20000.0 THEN '(-inf, 20000.00)'
                        WHEN l_extendedprice < 40000.0 THEN '[20000.00, 40000.00)'
                        WHEN l_extendedprice < 60000.0 THEN '[40000.00, 60000.00)'
                        WHEN l_extendedprice < 80000.0 THEN '[60000.00, 80000.00)'
                        ELSE '[80000.00, inf)' END AS bin_label
            FROM lineitem
        """,
        "mean_transform": f"""
            WITH b AS (
              SELECT l_orderkey, l_linenumber,
                     {_sql_bin_case('l_quantity', [10.0, 20.0, 30.0, 40.0])} AS bin,
                     l_extendedprice * (1 - l_discount) AS net
              FROM lineitem
            ), m AS (
              SELECT bin, avg(net) AS mean_net FROM b GROUP BY 1
            )
            SELECT b.l_orderkey, b.l_linenumber,
                   round(m.mean_net, 4) AS mean_net
            FROM b JOIN m USING (bin)
        """,
        "unknown_category_transform": f"""
            WITH grp AS (
              SELECT o_orderkey, o_orderpriority, {y_o} AS y,
                     CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0
                          WHEN o_orderpriority = '3-MEDIUM' THEN 1
                          WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 2
                          ELSE NULL END AS g
              FROM orders
            ), agg AS (
              SELECT g, sum(1 - y) AS ne, sum(y) AS ev
              FROM grp WHERE g IS NOT NULL GROUP BY 1
            ), tot AS (SELECT sum(ne) AS tne, sum(ev) AS tev FROM agg),
            woe AS (
              SELECT g, ln((ne / CAST(tne AS DOUBLE)) / (ev / CAST(tev AS DOUBLE))) AS w
              FROM agg, tot
            )
            SELECT grp.o_orderkey,
                   round(coalesce(woe.w, 0.0), 6) AS woe
            FROM grp LEFT JOIN woe USING (g)
        """,
        # outlier_yquantile: x binned at exact quantiles (np.quantile
        # linear interpolation == quantile_cont), per-bin modified
        # z-score (median/MAD) on y, threshold 3.5.
        "outlier_yquantile": """
            WITH e AS (
              SELECT quantile_cont(l_quantity, 0.2) AS e1,
                     quantile_cont(l_quantity, 0.4) AS e2,
                     quantile_cont(l_quantity, 0.6) AS e3,
                     quantile_cont(l_quantity, 0.8) AS e4
              FROM lineitem
            ), binned AS (
              SELECT l_extendedprice AS y,
                     (CASE WHEN l_quantity >= e1 THEN 1 ELSE 0 END
                    + CASE WHEN l_quantity >= e2 THEN 1 ELSE 0 END
                    + CASE WHEN l_quantity >= e3 THEN 1 ELSE 0 END
                    + CASE WHEN l_quantity >= e4 THEN 1 ELSE 0 END) AS bin
              FROM lineitem, e
            ), med AS (
              SELECT bin, quantile_cont(y, 0.5) AS med FROM binned GROUP BY 1
            ), mad AS (
              SELECT b.bin, quantile_cont(abs(b.y - m.med), 0.5) AS mad
              FROM binned b JOIN med m USING (bin) GROUP BY 1
            )
            SELECT CAST(sum(CASE WHEN s.mad > 0
                             AND 0.6745 * abs(b.y - m.med) / s.mad > 3.5
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   count(*) AS n_total
            FROM binned b JOIN med m USING (bin) JOIN mad s USING (bin)
        """,
    }


def _simhash_oracle_sql(n_bits: int) -> str:
    """Generate the per-bit majority-vote SQL mirroring
    pipeline.dedup.simhash_expr: h(token) = top 32 bits of md5,
    vote_b = sum(+1/-1 on bit b%32), output bit b set iff vote > 0."""
    h = "('0x' || substr(md5(t), 1, 8))::BIGINT"
    votes = []
    for b in range(n_bits):
        mask = 1 << (b % 32)
        votes.append(
            f"CASE WHEN list_sum([CASE WHEN ({h} & {mask}) != 0 THEN 1 "
            f"ELSE -1 END FOR t IN string_split(text, ' ')]) > 0 "
            f"THEN {1 << b} ELSE 0 END"
        )
    bits = " + ".join(votes)
    return f"SELECT doc_id, ({bits})::BIGINT AS simhash FROM documents"


def _sql_bin_case(col: str, splits) -> str:
    parts = []
    for i, s in enumerate(splits):
        parts.append(f"WHEN {col} < {float(s)!r} THEN {i}")
    return "CASE " + " ".join(parts) + f" ELSE {len(splits)} END"
