"""Training-data pipeline: dedup -> quality -> DSIR select -> split
-> chunk -> pack -> ANN.

The LLM-data operator family over the `documents` / `embeddings`
tables: exact + near-duplicate removal with a canonical keep-list,
heuristic quality scoring, deterministic train/val/test assignment,
and embedding similarity search.

Run:  python examples/data_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from optbinning_spark import get_spark
from optbinning_spark.pipeline.dedup import duplicate_clusters
from optbinning_spark.pipeline.sampling import (
    dsir_gumbel_sample,
    dsir_log_weights,
    hash_split,
)
from optbinning_spark.pipeline.similarity import brute_force_topk
from optbinning_spark.pipeline.text import (
    chunk_documents,
    pack_sequences,
    quality_score_expr,
    redact_pii,
)


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("data_pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # PII scrubbing first — nothing downstream sees raw identifiers
    docs = redact_pii(docs).join(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .drop("text"), "doc_id")

    # near-duplicate clustering: MinHash -> LSH bands -> exact Jaccard
    # verify -> connected components; keep one doc per cluster
    clusters = duplicate_clusters(
        docs, n_hashes=8, band_size=2, jaccard_threshold=0.5)
    keep = clusters.filter("is_canonical").select("doc_id")
    deduped = docs.join(keep, "doc_id")
    print("docs:", docs.count(), "-> after dedup:", deduped.count())

    # heuristic quality score (pure expressions, map-only)
    quality = deduped.select(
        "doc_id",
        quality_score_expr(F.col("text")).alias("quality_score"))
    quality.orderBy(F.desc("quality_score")).show(5)

    # deterministic split: same doc -> same split on ANY cluster/run
    split = hash_split(deduped, "doc_id",
                       {"train": 0.9, "val": 0.05, "test": 0.05})
    split.groupBy("split").count().show()

    # DSIR data selection: weight docs toward a target distribution
    # (here: the Spanish slice), then Gumbel-top-k resample
    weights = dsir_log_weights(deduped, deduped.filter("lang = 'es'"),
                               n_buckets=2048)
    selected = dsir_gumbel_sample(weights, k=200).join(deduped, "doc_id")
    print("DSIR-selected lang mix:")
    selected.groupBy("lang").count().orderBy(F.desc("count")).show()

    # context-window chunking + per-shard sequence packing
    chunks = chunk_documents(selected, chunk_tokens=64, overlap=8)
    packed = pack_sequences(selected, seq_tokens=256, shard_col="lang")
    print("chunks:", chunks.count(), "packed slices:", packed.count(),
          "sequences:",
          packed.select("shard", "seq_id").distinct().count())

    # embedding similarity: exact cosine top-k for a few query vectors
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter("vec_id % 101 = 0")
               .withColumnRenamed("vec_id", "query_id"))
    brute_force_topk(emb, queries, k=3).show(9)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
