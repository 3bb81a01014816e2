"""Streaming curation pipeline: the firehose version of
examples/data_pipeline.py.

JSONL document shards arrive as files; a Structured Streaming query
ingests them one micro-batch per shard and applies the same curation
operators the batch pipeline uses — which is the point: every
map-only stage (PII redaction, Gopher gates, the TRAINED NB quality
model) is the identical Column expression on a stream, and the only
stage that needs state (cross-batch exact dedup) uses the bounded
dropDuplicates store. The NB model is trained ONCE on a labeled batch
corpus and then gates the stream as a pure literal expression — the
deploy shape of a 100 TB ingest: train offline, score the firehose.

Run:  python examples/streaming_pipeline.py
CI:   tests/test_pipeline.py::test_streaming_pipeline_example_runs
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from optbinning_spark import get_spark
from optbinning_spark.pipeline.classify import nb_score, nb_train
from optbinning_spark.pipeline.text import (
    gopher_quality_flags,
    redact_pii,
)
from optbinning_spark.sources.corpus import (
    DOCUMENT_SCHEMA,
    write_jsonl_corpus,
)
from optbinning_spark.streaming.dedup import streaming_exact_dedup

GOOD = ("the quick brown fox jumps over the lazy dog and then the "
        "dog sleeps for a while under the old oak tree").split()
SPAM = "buy click free winner now".split()


def _make_shards(spark, in_dir: str, n_shards: int = 3,
                 docs_per_shard: int = 40):
    """Synthesize arriving JSONL shards: mostly good prose, some spam,
    some cross-shard exact duplicates, one PII-bearing doc per shard."""
    for s in range(n_shards):
        rows = []
        for i in range(docs_per_shard):
            doc_id = s * 1000 + i
            if i % 10 == 7:           # spam (fails the NB gate)
                text = " ".join(SPAM[(i + j) % 5] for j in range(12))
            elif i % 10 == 8:         # exact duplicate ACROSS shards
                text = " ".join(GOOD[:12])
            elif i % 10 == 9:         # PII-bearing
                text = ("contact me at user%d@example.com soon "
                        "please because " % i) + " ".join(GOOD[:8])
            else:
                text = (" ".join(GOOD[(i + j) % len(GOOD)]
                                 for j in range(18))
                        + f" entry{doc_id}")  # unique — not a dup
            rows.append((doc_id, text, ["es", "en"][i % 2], f"shard{s}", 0))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        write_jsonl_corpus(df.coalesce(1), os.path.join(in_dir, f"s{s}"),
                           compression="none")


def main():
    spark = get_spark("streaming_pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_pipe_")
    in_dir = os.path.join(work, "incoming")
    _make_shards(spark, in_dir)

    # 1. train the quality model OFFLINE on the first (labeled) shard:
    #    label = "reads like the reference prose", here keyed off the
    #    spam marker for a self-contained fixture
    batch0 = spark.read.schema(DOCUMENT_SCHEMA).json(
        os.path.join(in_dir, "s0"))
    labeled = batch0.withColumn(
        "y", (~F.col("text").contains("click")).cast("int"))
    model = nb_train(labeled, "y", n_buckets=1024)

    # 2. the stream: enforced schema, one shard per micro-batch
    stream = (spark.readStream.schema(DOCUMENT_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .json(os.path.join(in_dir, "s*")))

    # 3. stateless curation — the SAME column expressions as batch:
    #    PII scrubbing, Gopher length gate, trained-model quality gate
    red = redact_pii(stream, keep=("lang", "source"))
    gated = (gopher_quality_flags(red, min_words=5,
                                  min_stopword_hits=0)
             .filter("keep"))
    scored = (nb_score(gated, model, keep=("text", "lang", "source",
                                           "n_email"))
              .filter(F.col("log_odds") > 0))

    # 4. the one stateful stage: cross-batch exact dedup
    deduped = streaming_exact_dedup(scored, text_col="text")

    q = (deduped.writeStream.format("memory").queryName("curated")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM curated")
    n_in = 3 * 40
    n_out = out.count()
    # count by the spam MARKER, not by log_odds (the stream already
    # filtered on log_odds — a model regression must still be visible)
    n_spam = out.filter(F.col("text").contains("click")).count()
    n_dup = (out.groupBy("content_hash").count()
             .filter("count > 1").count())
    n_pii = out.filter(F.col("text").contains("@")).count()
    print(f"ingested {n_in} docs over 3 micro-batches -> "
          f"{n_out} curated rows | spam passing gate: {n_spam} | "
          f"duplicate content hashes: {n_dup} | "
          f"unredacted emails: {n_pii}")
    assert n_spam == 0 and n_dup == 0 and n_pii == 0
    assert 0 < n_out < n_in
    spark.stop()
    return n_out


if __name__ == "__main__":
    main()
