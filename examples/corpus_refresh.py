"""Snapshot-over-snapshot corpus refresh: the incremental dedup flow
a production crawl ingests with.

Round 0 builds the corpus AND persists the LSH band index — the
(doc_id, band, band_key) rows `lsh_bands(minhash_signatures(...))`
emits, a few small rows per document. Every later refresh reads the
index back, bands ONLY the new batch, and joins the delta against it
(`incremental_lsh_dedup`): history-vs-history is never re-paired, so
a refresh costs O(|new| + index equi-join) instead of re-clustering
the whole corpus. Surviving docs' bands are appended to the index for
the next round.

The demo splits the documents table into three "snapshots" by
doc_id % 3 and replays them as arriving batches, printing per-round
(new docs, dups vs history, dups within batch, kept, index size).

A streaming tail replays the same snapshots as a file-source stream
through ``incremental_lsh_dedup_sink`` (foreachBatch) — per
micro-batch what the loop does per round, against the same parquet
band-index format, so batch and streaming refreshes interoperate.
(Index policy differs deliberately: the loop appends SURVIVOR bands —
a canonical minimal index — while the sink appends every batch's
bands, the replay-idempotent full index.)

Run:  python examples/corpus_refresh.py [sf_dir]   (default sf0.001)
CI:   tests/test_pipeline.py::test_corpus_refresh_example_runs runs
      this at sf0.01 and asserts the invariants printed at the end.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from optbinning_spark import get_spark
from optbinning_spark.pipeline.dedup import (
    incremental_lsh_dedup,
    lsh_bands,
    minhash_signatures,
)

N_HASHES, BAND_SIZE = 8, 2


def bands_of(df):
    return lsh_bands(
        minhash_signatures(df, n_hashes=N_HASHES),
        n_hashes=N_HASHES, band_size=BAND_SIZE)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_refresh_example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    index_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_refresh_index")

    # ---- round 0: bootstrap — first snapshot seeds corpus and index
    snap0 = docs.filter(F.col("doc_id") % 3 == 0)
    bands_of(snap0).write.mode("overwrite").parquet(index_dir)
    n_hist = snap0.count()
    print(f"round 0: bootstrap {n_hist} docs, index persisted")

    total_kept = n_hist
    for rnd in (1, 2):
        batch = docs.filter(F.col("doc_id") % 3 == rnd)
        index = spark.read.parquet(index_dir)  # persisted state
        res = incremental_lsh_dedup(
            batch, index, n_hashes=N_HASHES, band_size=BAND_SIZE).cache()
        n_new = res.count()
        # dup_of < batch minimum round tag means a history collision;
        # simpler: classify by the collider's snapshot (doc_id % 3)
        n_vs_hist = res.filter(
            F.col("dup_of").isNotNull()
            & (F.col("dup_of") % 3 != rnd)).count()
        n_within = res.filter(
            F.col("dup_of").isNotNull()
            & (F.col("dup_of") % 3 == rnd)).count()
        kept = res.filter("keep")
        n_kept = kept.count()
        # append the SURVIVORS' bands — the index stays canonical
        bands_of(batch.join(kept.select(F.col("id").alias("doc_id")),
                            "doc_id")).write.mode("append").parquet(index_dir)
        idx_rows = spark.read.parquet(index_dir).count()
        total_kept += n_kept
        print(f"round {rnd}: new={n_new} dup_vs_history={n_vs_hist} "
              f"dup_within_batch={n_within} kept={n_kept} "
              f"index_rows={idx_rows}")
        res.unpersist()

    n_docs = docs.count()
    print(f"final: corpus {n_docs} docs -> {total_kept} kept "
          f"across 3 snapshots")
    # invariants the CI test greps for
    assert total_kept <= n_docs
    print("REFRESH_OK", total_kept, n_docs)

    # ---- the same refresh as a STREAM (round 11): snapshots arriving
    # as files, incremental_lsh_dedup_sink doing per-micro-batch what
    # the loop above did per round — state is the same parquet band
    # index format, so batch and streaming refreshes interoperate
    from optbinning_spark.streaming.dedup import incremental_lsh_dedup_sink

    sdir = os.path.join(tempfile.gettempdir(), "spark_graft_refresh_stream")
    import shutil

    shutil.rmtree(sdir, ignore_errors=True)
    src, idx, dec, ckpt = (os.path.join(sdir, d) for d in
                           ("in", "index", "decisions", "ckpt"))
    os.makedirs(src)
    q = (spark.readStream.schema(docs.schema).parquet(src + "/*")
         .writeStream
         .foreachBatch(incremental_lsh_dedup_sink(
             idx, dec, n_hashes=N_HASHES, band_size=BAND_SIZE))
         .option("checkpointLocation", ckpt).start())
    for rnd in (0, 1, 2):
        docs.filter(F.col("doc_id") % 3 == rnd).coalesce(1) \
            .write.parquet(os.path.join(src, f"snap{rnd}.parquet"))
        q.processAllAvailable()
    q.stop()
    decisions = spark.read.parquet(dec)
    n_stream_kept = decisions.filter("keep").count()
    print(f"streaming: {decisions.count()} docs -> {n_stream_kept} kept; "
          f"index_rows={spark.read.parquet(idx).count()}")
    print("STREAM_REFRESH_OK", n_stream_kept)
    spark.stop()


if __name__ == "__main__":
    main()
