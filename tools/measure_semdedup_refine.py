"""SemDeDup quantizer quality: sampled-fit vs corpus-refined centroids
(round-11 ask — the r9/r10 verdicts measured the refined quantizer's
recall payoff for IVF search only; this measures what SemDeDup itself
cares about).

Metric: PAIR RECALL of the coarse quantizer — the fraction of
ground-truth near-duplicate pairs (full all-pairs cosine >= threshold,
blocked numpy over the whole organic embedding table) whose two
members land in the SAME cluster. SemDeDup can only ever drop a
duplicate it co-clusters, so pair recall upper-bounds its drop
quality; everything downstream of assignment is identical between the
two quantizers.

Also reported: drop counts (keep=False) from the full semantic_dedup
run under each quantizer, wall time of the refine, and centroid-shift
diagnostics.

Usage: python tools/measure_semdedup_refine.py [--k 256]
           [--threshold 0.4] [--refine-iters 3]
           [--src /tmp/spark_graft_sf1_organic/embeddings.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--refine-iters", type=int, default=3)
    ap.add_argument(
        "--src", default="/tmp/spark_graft_sf1_organic/embeddings.parquet")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from optbinning_spark import get_spark
    from optbinning_spark.pipeline.similarity import (semantic_dedup,
                                                      train_ivf_centroids)

    spark = get_spark("semdedup_refine")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(args.src)
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=float)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = len(X)
    out: dict = {"n_vectors": n, "dim": X.shape[1], "k": args.k,
                 "threshold": args.threshold,
                 "refine_iters": args.refine_iters}

    # ground truth: blocked all-pairs cosine (driver-side — this is
    # the EVALUATION, not the operator; 20k x 20k x 64 is seconds)
    gt_pairs: set = set()
    B = 2048
    for i0 in range(0, n, B):
        S = X[i0:i0 + B] @ X.T
        ai, bi = np.nonzero(S >= args.threshold)
        for a, b in zip(ai, bi):
            ga, gb = i0 + a, b
            if ga < gb:
                gt_pairs.add((ga, gb))
    out["gt_pairs"] = len(gt_pairs)

    results = {}
    for label, iters in (("sampled", 0), ("refined", args.refine_iters)):
        t0 = time.time()
        C = train_ivf_centroids(emb, args.k, refine_iters=iters)
        train_s = time.time() - t0
        assign = np.argmax(X @ np.asarray(C).T, axis=1)
        co = sum(1 for a, b in gt_pairs if assign[a] == assign[b])
        recall = co / len(gt_pairs) if gt_pairs else 1.0
        t0 = time.time()
        dec = semantic_dedup(emb, args.threshold, centroids=C,
                             method="arrow")
        dropped = dec.where(~F.col("keep")).count()
        dedup_s = time.time() - t0
        sizes = np.bincount(assign, minlength=args.k)
        results[label] = {
            "pair_recall": round(recall, 4),
            "co_clustered_gt_pairs": co,
            "dropped": dropped,
            "train_sec": round(train_s, 2),
            "dedup_sec": round(dedup_s, 2),
            "max_cluster": int(sizes.max()),
            "empty_clusters": int((sizes == 0).sum()),
        }
    out["quantizers"] = results
    s, r = results["sampled"], results["refined"]
    out["recall_gain"] = round(r["pair_recall"] - s["pair_recall"], 4)
    out["drop_gain"] = r["dropped"] - s["dropped"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
