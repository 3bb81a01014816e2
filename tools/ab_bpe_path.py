"""A/B: BPE token counting via the nested-replace EXPRESSION path vs
the Arrow-batched memoized pandas UDF, as the merge list grows.

The expression path inlines 2 x n_merges replace calls into codegen —
free of Python, but each replace is a full pass over the symbol
string, so cost grows linearly in vocab size. The UDF pays the
Arrow/Python boundary once but its per-pre-token memoization makes
vocab size nearly free on Zipf text. Somewhere they cross; this tool
locates the crossover so the docstring guidance ("expression for
pinned mini-vocabs, UDF for production vocabs") carries a number.

Usage: python tools/ab_bpe_path.py [--sizes 40 100 200 400] [--reps 2]
Prints one JSON line {n_merges: {"expr_sec": ..., "udf_sec": ...,
"equal": true}} over the organic sf1 corpus.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_sf1_organic import ensure_sf1_organic  # noqa: E402
from train_bpe_vocab import train_bpe_merges  # noqa: E402

from optbinning_spark import get_spark  # noqa: E402


def _time(spark, build, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        gc.collect()
    spark._jvm.System.gc()
    return round(best, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int,
                    default=[40, 100, 200, 400])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    import duckdb
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.bpe import (
        bpe_token_count_col,
        bpe_token_count_pandas_udf,
    )

    spark = get_spark("ab_bpe_path")
    spark.sparkContext.setLogLevel("ERROR")
    d = ensure_sf1_organic("/tmp/spark_graft_sf1_organic")
    docs = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "text")

    # a longer merge list needs a bigger training corpus than the
    # pinned sf0.001 one — train once on sf0.01 (deterministic)
    texts = [r[0] for r in duckdb.sql(
        "select text from read_parquet("
        "'/root/testdata/sf0.01/documents.parquet') order by doc_id"
    ).fetchall()]
    all_merges = train_bpe_merges(texts, max(args.sizes))

    out = {}
    for n in args.sizes:
        merges = all_merges[:n]
        if len(merges) < n:
            out[str(n)] = {"skipped": f"only {len(merges)} trainable"}
            continue
        expr_sec = _time(spark, lambda m=merges: docs.select(
            "doc_id", bpe_token_count_col(F.col("text"), m).alias("n")),
            args.reps)
        udf = bpe_token_count_pandas_udf(merges)
        udf_sec = _time(spark, lambda u=udf: docs.select(
            "doc_id", u("text").alias("n")), args.reps)
        # value identity on a slice (full corpus equality is covered
        # at sf0.001 by tests; this guards the grown vocab)
        a = {r["doc_id"]: r["n"] for r in docs.limit(200).select(
            "doc_id",
            bpe_token_count_col(F.col("text"), merges).alias("n"))
            .collect()}
        b = {r["doc_id"]: r["n"] for r in docs.limit(200).select(
            "doc_id", udf("text").alias("n")).collect()}
        out[str(n)] = {"expr_sec": expr_sec, "udf_sec": udf_sec,
                       "equal": a == b}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
