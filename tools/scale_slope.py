"""One-off scale-slope experiment: time the dedup pipeline family on
the organic corpus at 1x (50k docs) and Nx (default 5x = 250k docs,
fresh-seeded shards — NOT copies), and report the wall-time slopes.

The per-round bench stops at organic sf1; this tool answers "what is
the actual growth rate of the scan/window/join shapes when the corpus
(and its shingle space, dup structure, and band buckets) grows
organically" — the question the round-5 self-similar ladder could not.

Usage: python tools/scale_slope.py [--mult 5] [--reps 2]
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from gen_sf1_organic import (  # noqa: E402
    _documents_shard,
    _viral_docs,
    _vocab,
    _zipf_p,
)

from optbinning_spark import get_spark  # noqa: E402


def ensure_docs(out_dir: str, shards: int, seed: int = 42,
                bp_frac: float = 0.10) -> str:
    marker = os.path.join(out_dir, "_READY")
    stamp = f"docs-only-v1-{shards}-{bp_frac}-{seed}"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    tdir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(tdir, exist_ok=True)
    gseed = np.random.RandomState(seed)
    vocab = _vocab(40_000)
    zp = _zipf_p(40_000, 1.2)
    viral = _viral_docs(gseed, vocab, zp)
    for s in range(shards):
        pq.write_table(
            _documents_shard(s, seed, shards, bp_frac, vocab, zp, viral),
            os.path.join(tdir, f"shard{s:03d}.parquet"),
            row_group_size=100_000)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from optbinning_spark.pipeline.dedup import (
        duplicate_clusters,
        duplicate_ngram_spans,
        exact_dedup_groups,
        ngram_jaccard_pairs,
    )

    spark = get_spark("scale_slope")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {
        1: ensure_docs("/tmp/spark_graft_slope_x1", 10),
        args.mult: ensure_docs(
            f"/tmp/spark_graft_slope_x{args.mult}", 10 * args.mult),
    }
    pipelines = {
        "exact_dedup": lambda d: exact_dedup_groups(d),
        "jaccard_pairs": lambda d: ngram_jaccard_pairs(d),
        "dup_ngram_spans": lambda d: duplicate_ngram_spans(d, n=10),
        "dedup_clusters": lambda d: duplicate_clusters(d),
        "dedup_clusters_dist": lambda d: duplicate_clusters(
            d, driver_threshold=0),
    }
    out: dict = {}
    for mult, ddir in dirs.items():
        docs = spark.read.parquet(f"{ddir}/documents.parquet")
        sec = {"docs": docs.count()}
        for name, fn in pipelines.items():
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
                gc.collect()
            spark._jvm.System.gc()
            sec[name] = round(best, 2)
        out[f"x{mult}"] = sec
    base, big = out["x1"], out[f"x{args.mult}"]
    out["slopes"] = {
        k: round(big[k] / base[k], 2)
        for k in pipelines if base.get(k)
    }
    out["mult"] = args.mult
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
