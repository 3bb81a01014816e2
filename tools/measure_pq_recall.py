"""PQ recall on the ORGANIC embedding table (r12 verdict #7).

SCALING.md's round-12 PQ recall curve was measured on near-
unstructured synthetic sf0.001 vectors — the hard case for PQ — and
predicted higher recall at equal bits on clustered corpora. This
grounds that sentence: recall@10 of trained-codebook ADC search vs
the exact-dot ranking over the 20k-vector organic embedding table
(tools/gen_sf1_organic.py output, real cluster structure).

Method: pq_topk (trained codebooks, exhaustive candidates — no IVF
in front, so the number measures QUANTIZATION loss alone) against
the exact dot ranking computed densely in numpy (20k x 64 is driver-
trivial; ties break by nbr_id like the engine). 50 hash-ordered
query vectors.

Usage: python tools/measure_pq_recall.py \
           [--src /tmp/spark_graft_sf1_organic/embeddings.parquet] \
           [--points 16x16,8x16,16x32] [--n-queries 50] [--topk 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--src", default="/tmp/spark_graft_sf1_organic/embeddings.parquet")
    ap.add_argument("--points", default="16x16,8x16,16x32")
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument(
        "--limit", type=int, default=0,
        help="restrict the corpus to a hash-ordered subset of this "
             "size (size-matched comparison against the synthetic "
             "500-vector row in SCALING.md)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from optbinning_spark import get_spark
    from optbinning_spark.pipeline.similarity import (
        pq_topk,
        train_pq_codebooks,
    )

    spark = get_spark("pq_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(args.src).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    if args.limit:
        emb = (emb.orderBy(F.xxhash64("vec_id"), "vec_id")
               .limit(args.limit).localCheckpoint(eager=True))

    # query ids: hash-ordered prefix (uniform over the corpus, same
    # idiom as the trainers — a vec_id prefix could be a temporal or
    # cluster slice)
    qids = [r["vec_id"] for r in
            emb.select("vec_id")
            .orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(args.n_queries).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids)).withColumnRenamed(
        "vec_id", "query_id")

    # exact-dot ranking, dense on the driver (n x dim is parameters-
    # scale here; the ENGINE path under test never does this)
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=float)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    id_pos = {int(v): i for i, v in enumerate(ids)}
    exact: dict[int, set] = {}
    for q in qids:
        d = X @ X[id_pos[int(q)]]
        d[id_pos[int(q)]] = -np.inf  # exclude self, engine-style
        # engine tiebreak: score desc, nbr_id asc — ids are sorted,
        # and argsort is stable, so sorting by (-d) keeps id order
        top = ids[np.argsort(-d, kind="stable")[: args.topk]]
        exact[int(q)] = set(int(t) for t in top)

    out = {"src": args.src, "n_vectors": int(len(ids)),
           "dim": int(X.shape[1]), "n_queries": len(qids),
           "topk": args.topk, "points": {}}
    for pt in args.points.split(","):
        m, k = (int(v) for v in pt.split("x"))
        books = train_pq_codebooks(emb, m=m, k=k)
        got = pq_topk(emb, queries, books, k=args.topk).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(int(r["nbr_id"]))
        rec = float(np.mean([
            len(by_q.get(q, set()) & exact[q]) / args.topk for q in exact]))
        out["points"][pt] = round(rec, 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
