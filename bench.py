"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Evaluation is forced through the noop sink (full computation of every
column, no driver materialization) for row-shaped outputs; tiny
table-shaped outputs collect.
"""

from __future__ import annotations

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
]


def main():
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
        # best-of-2: single-JVM local mode has multi-second run-to-run
        # noise (GC, page cache); the minimum is the steady-state
        # throughput the query actually has
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
