"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Evaluation is forced through the noop sink (full computation of every
column, no driver materialization) for row-shaped outputs; tiny
table-shaped outputs collect.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from optbinning_spark import get_spark

HEADLINE = [
    "optimal_binning_table",
    "optimal_woe_transform",
    "binning_table_fixed",
    "woe_transform",
    "uniform_binning_table",
    "event_rate_order",
    "psi",
    "ks",
    "doc_token_stats",
    "exact_dedup",
    "minhash_signatures",
    "jaccard_pairs",
    "embedding_topk",
    "continuous_binning_table",
    "categorical_optimal_binning",
    "binning_process_summary",
    "scorecard_scores",
    "sketch_binning_table",
    # 16-variable Home-Credit-shaped fit — the direct BASELINE.md
    # comparison (reference: 16 vars x 307,511 rows in 5.087s, 1 core)
    "wide_process_fit",
    # scale-path ANN: bucketed candidate equi-joins + exact verify
    "ann_topk",
    "near_dup_cosine_bucketed",
    # LSH pairs closed into duplicate groups (connected components)
    "dedup_clusters",
    # the same closure with the DISTRIBUTED large-star/small-star loop
    # forced (driver_threshold=0) — times the 100 TB path itself, so a
    # regression in the star rounds can't hide behind the driver
    # union-find fast path
    "dedup_clusters_dist",
    # exact substring-duplicate span detection (scan + window over the
    # hashed n-gram key — the newest scan-heavy pipeline family)
    "dup_ngram_spans",
]


def main():
    t_start = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark("optbinning_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM / codegen / class-loading paths with tiny-scale runs
    # of representative pipelines so measured times reflect steady-state
    # throughput rather than one-time JIT and classloader costs
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entry_mod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in ("optimal_binning_table", "minhash_signatures",
                       "scorecard_scores", "jaccard_pairs",
                       "wide_process_fit", "ann_topk",
                       "near_dup_cosine_bucketed"):
            try:
                qs[warm_q](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # best-of-3: single-JVM local mode has multi-second run-to-run
        # noise (GC, page cache) — round 3 showed unchanged sub-second
        # queries drifting +-50% under best-of-2, enough to mask a
        # real 30% regression. Cache policy: catalog cache cleared
        # after every rep so no rep can ride a previous rep's cached
        # plan/data; the minimum of 3 is the steady-state throughput.
        best = None
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            # release the py4j handles BEFORE the JVM collection:
            # every DataFrame/plan/broadcast reachable from a live
            # py4j proxy is pinned on the JVM side, so a JVM-only
            # System.gc() cannot reclaim it and the ContextCleaner
            # cannot clean its shuffles/broadcasts. Measured (r5
            # profiling, tools/profile_aging.py): with this, the
            # 16-var fit runs 4.5s as query 19 of an aged session vs
            # 6.5-9.5s without — the round-4 "session aging" gap was
            # Python-side garbage, not a plan regression.
            del df
            gc.collect()
        # GC between queries: repeated aggregation-heavy fits leave
        # enough garbage that later queries measure the collector, not
        # themselves (observed: a sub-second query reading 3s right
        # after the 16-variable fit). One forced collection puts every
        # query on the same starting line.
        spark._jvm.System.gc()
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)

    # Scale-ladder point: the stock sf0.1 parquet is single-row-group,
    # so local[N] barely parallelizes the scan and per-query times
    # understate cluster behavior. Rewrite the tables once into a
    # 32-file layout (same rows, multi-task scan) and time a
    # scan-heavy subset once each — the delta vs the single-file
    # numbers is the scan-parallelism headroom a real cluster gets.
    scale: dict = {}
    try:
        scale = _scale_section(spark, sf_dir, qs)
    except Exception as e:  # scale probe must never break the contract
        scale = {"error": str(e)[:200]}

    # sf1 ladder point: 10x replication of the input (offset keys,
    # per-copy token salt so near-dup structure scales linearly, not
    # quadratically) — gives a real sf0.1 -> sf1 scaling slope per
    # query. Deadline-guarded so bench always prints its JSON line
    # within the harness budget.
    sf1: dict = {}
    try:
        sf1 = _sf1_section(spark, sf_dir, qs, t_start)
    except Exception as e:
        sf1 = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "scale_multirowgroup": scale,
                "sf1_ladder": sf1,
            }
        )
    )
    spark.stop()


SCALE_QUERIES = [
    "wide_process_fit",
    "optimal_woe_transform",
    "exact_dedup",
    "jaccard_pairs",
    "scorecard_scores",
    "dedup_clusters",
    "ann_topk",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _scale_section(spark, sf_dir, qs, n_files=32):
    import shutil
    import tempfile

    mrg = os.path.join(tempfile.gettempdir(),
                       f"spark_graft_mrg_{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(mrg, "_READY")
    if not os.path.exists(marker):
        shutil.rmtree(mrg, ignore_errors=True)
        os.makedirs(mrg, exist_ok=True)
        for t in TABLES:
            src = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(src):
                continue
            (spark.read.parquet(src).repartition(n_files)
             .write.mode("overwrite").parquet(f"{mrg}/{t}.parquet"))
        open(marker, "w").close()
    out = {}
    for name in SCALE_QUERIES:
        best = None
        # min-of-2: single-shot scale numbers showed +-50% run-to-run
        # noise in round 4 (enough to read as a layout regression)
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, mrg).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()  # drop py4j pins so the JVM GC can clean
        spark._jvm.System.gc()
        out[name] = round(best, 3)
    return {"n_files": n_files, "queries": out,
            "total": round(sum(out.values()), 3)}


SF1_QUERIES = ["wide_process_fit", "exact_dedup", "jaccard_pairs",
               "dedup_clusters", "ann_topk"]

# tables the sf1 subset actually reads, with the key columns to offset
# per copy so join/groupBy cardinality scales instead of collapsing
_SF1_TABLES = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _sf1_section(spark, sf_dir, qs, t_start, copies=10, budget_s=420):
    """One sf1-scale timing per query (single shot — the point is the
    scaling SLOPE vs the sf0.1 best-of-3, not a tight absolute).
    Build: union `copies` shifted replicas of the sf0.1 tables.
    Documents get a per-copy suffix on EVERY token ('$1_c<i>'), which
    rewrites every shingle — copies are mutually dissimilar, so LSH
    buckets and pair counts grow linearly with data, the honest
    scale-up shape (verbatim copies would grow pair fan-out
    quadratically and time the blow-up, not the engine)."""
    from functools import reduce

    from pyspark.sql import functions as F

    if time.time() - t_start > budget_s:
        return {"skipped": f"deadline ({budget_s}s) reached before build"}
    import tempfile

    sf1 = os.path.join(tempfile.gettempdir(), "spark_graft_sf1")
    marker = os.path.join(sf1, "_READY")
    # version token: a change to the replication scheme (tables, key
    # offsets, token salting) must invalidate a cached build from an
    # earlier bench run, or the ladder would silently time stale data
    stamp = f"v2-{copies}-" + ",".join(sorted(_SF1_TABLES))
    fresh = (os.path.exists(marker)
             and open(marker).read().strip() == stamp)
    if not fresh:
        import shutil

        shutil.rmtree(sf1, ignore_errors=True)
        os.makedirs(sf1, exist_ok=True)
        for t, keys in _SF1_TABLES.items():
            src = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            parts = []
            for i in range(copies):
                c = src
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * 100_000_000))
                if t == "documents":
                    c = c.withColumn(
                        "text",
                        F.regexp_replace("text", r"(\S+)", rf"$1_c{i}"))
                parts.append(c)
            (reduce(lambda a, b: a.unionByName(b), parts)
             .repartition(32).write.mode("overwrite")
             .parquet(f"{sf1}/{t}.parquet"))
        with open(marker, "w") as fh:
            fh.write(stamp)
    out = {}
    for name in SF1_QUERIES:
        if time.time() - t_start > budget_s + 150:
            out[name] = None  # deadline: partial ladder, still honest
            continue
        # min-of-2: the first run of a freshly-written dataset mostly
        # measures page-cache population (observed 19.6s cold vs 6.7s
        # warm for the wide fit) — the slope the ladder exists to show
        # needs the warm number. NB: sf1 numbers carry HOST-level
        # noise this harness cannot remove — profiling (r5,
        # SPARK_GRAFT_FIT_DEBUG phase stamps) showed the fit's stats
        # stage swinging 2.3s..13.4s across reps with every
        # engine-side factor pinned (persist on/off/level, heap size,
        # GC algorithm), while the same stages are rep-stable when
        # the machine is quiet; /proc load avg ~10 with no local
        # process explains it. Read slopes from the MEDIAN of rounds,
        # not one artifact.
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf1).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        out[name] = round(best, 3)
    spark._jvm.System.gc()
    done = [v for v in out.values() if v is not None]
    return {"copies": copies, "queries": out,
            "total": round(sum(done), 3), "n_timed": len(done)}


if __name__ == "__main__":
    main()
