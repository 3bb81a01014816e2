"""Streaming deduplication operators.

Structured-Streaming counterparts of the batch dedup family
(``optbinning_spark.pipeline.dedup``): keep ONE representative per
distinct content (exact) or minhash-signature (near-dup) key as
documents arrive, suppressing duplicates. A duplicate arriving in a
later trigger is always dropped; within a single micro-batch the
surviving row is an arbitrary member of the group (dropDuplicates
makes no intra-batch ordering promise).

State management is the scale story here — a 100 TB corpus arriving as
a stream cannot keep every seen hash forever:

- With an event-time column, ``dropDuplicatesWithinWatermark`` bounds
  the state to the dedup horizon: a key's state is evicted once the
  watermark passes ``delay`` beyond its last sighting, so duplicates
  separated by more than the horizon may re-emit (the standard
  streaming-dedup contract).
- Without one, plain ``dropDuplicates`` is exact but state grows with
  the number of distinct keys — documented, for bounded corpora only.

Both operators are pure expression pipelines feeding Spark's built-in
streaming dedup state store: no UDF, no custom state, mergeable across
partitions, and the same expressions serve the batch path (tested for
agreement with ``exact_dedup_groups`` / signature equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import shingles_from_words


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup: one document per distinct content hash
    is emitted; identical documents in later triggers are dropped.

    Batch analog: ``pipeline.dedup.exact_dedup_groups`` (one survivor
    per content group; the batch keep-list pins the min id, streaming
    keeps the earliest-trigger sighting).
    """
    out = stream.select(
        "*", F.md5(F.col(text_col)).alias("content_hash"))
    if ts_col is not None:
        return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["content_hash"])
    return out.dropDuplicates(["content_hash"])


def streaming_signature_dedup(
    stream: DataFrame,
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
    ts_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Near-duplicate streaming suppression at SIGNATURE granularity:
    a document whose full MinHash signature (all ``n_hashes`` lanes)
    matches an already-seen signature is dropped.

    Signature equality is the high-precision end of the LSH dial
    (every band matches); band-level matching (higher recall) needs a
    seen-set shared across band keys — cross-key state that streaming
    per-key stores cannot express — so candidates-by-band remain the
    batch path (``duplicate_clusters``). The signature key is the
    md5 of the SAME mh0..mh{n-1} lane values as the batch
    ``minhash_signatures`` operator (per-lane mins of the salted md5
    slices), so stream and batch agree exactly on what "identical
    signature" means (tested).
    """
    n_salts = (n_hashes + 3) // 4
    # staged projection, same as the batch operator: words -> shingle
    # array -> each salted md5 array materialized ONCE (codegen
    # re-evaluates non-aliased arrays once per downstream reference)
    staged = (
        stream.select(
            "*", F.split(F.col(text_col), " ").alias("__w"))
        .select(
            "*", shingles_from_words(F.col("__w"), shingle_n).alias("__sh"))
        .select(
            "*",
            *[
                F.transform(
                    F.col("__sh"),
                    (lambda salt: lambda s: F.md5(
                        F.concat(F.lit(salt), s)))(f"s{k}|"),
                ).alias(f"__h{k}")
                for k in range(n_salts)
            ],
        )
    )
    lanes = []
    for i in range(n_hashes):
        salt, lane = divmod(i, 4)
        off = lane * 8 + 1
        lanes.append(F.array_min(F.transform(
            F.col(f"__h{salt}"), lambda h: F.substring(h, off, 8))))
    out = staged.select(
        *stream.columns,
        F.md5(F.concat_ws("|", *lanes)).alias("signature_key"))
    if ts_col is not None:
        return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["signature_key"])
    return out.dropDuplicates(["signature_key"])
