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

Both key-level operators are pure expression pipelines feeding Spark's
built-in streaming dedup state store: no UDF, no custom state,
mergeable across partitions, and the same expressions serve the batch
path (tested for agreement with ``exact_dedup_groups`` / signature
equality). Band-level (higher-recall) near-dup dedup needs cross-key
state the per-key store cannot express — that is
``incremental_lsh_dedup_sink`` below, which keeps its state in a
persisted parquet band index via foreachBatch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import minhash_lane_cols, staged_minhash_arrays


def state_store_rows(query) -> int | None:
    """Observable state size of a running dedup stream: total rows
    held across the query's stateful operators, read from the last
    progress report. This is the T5 memory-accounting hook for the
    dedup family — the documented state bounds (dedup horizon with a
    watermark, distinct-key count without) are ASSERTABLE numbers,
    not prose. Returns None before the first progress report."""
    p = query.lastProgress
    if not p:
        return None
    return sum(int(op.get("numRowsTotal", 0))
               for op in p.get("stateOperators", []))


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
    ``minhash_signatures`` operator — both are built from the shared
    staged_minhash_arrays / minhash_lane_cols helpers, so there is ONE
    definition of the salt/lane layout and stream and batch cannot
    drift (agreement also tested).

    NULL-text documents are NOT dedup candidates: they pass through
    unsuppressed with a NULL signature_key. Without this split every
    NULL-text doc would share md5('') (concat_ws skips the all-NULL
    lanes) and dropDuplicates — which treats equal keys as dups —
    would silently keep only the FIRST NULL doc in the stream: the
    streaming sibling of the r16 batch NULL-shingle find: two
    documents of UNKNOWN content must never be treated as equal. The
    blessed ingest (sources/corpus.py quarantine) never emits NULL
    text, so this is defense-in-depth for callers that bypass it;
    batch minhash_signatures drops NULL docs from the signature
    table for the same reason.
    """
    staged = staged_minhash_arrays(
        stream, text_col, shingle_n, n_hashes, ["*"])
    lanes = [c for c in minhash_lane_cols(n_hashes)]
    out = staged.select(
        *stream.columns,
        F.when(F.col(text_col).isNotNull(),
               F.md5(F.concat_ws("|", *lanes))).alias("signature_key"))
    nn = out.filter(F.col(text_col).isNotNull())
    nulls = out.filter(F.col(text_col).isNull())
    if ts_col is not None:
        nn = nn.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["signature_key"])
    else:
        nn = nn.dropDuplicates(["signature_key"])
    return nn.unionByName(nulls)


def incremental_lsh_dedup_sink(
    index_dir: str,
    decisions_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
):
    """foreachBatch sink wiring ``pipeline.dedup.incremental_lsh_dedup``
    into Structured Streaming — the streaming sibling of the batch
    corpus-refresh path (examples/corpus_refresh.py). Each micro-batch
    is banded ONCE, deduplicated against the persisted band index
    (history-vs-history is never re-paired), and then its bands are
    appended to the index; per-doc decisions (id, dup_of, keep) land
    in ``decisions_dir``.

    State story at 100 TB: the "state" is NOT in the streaming state
    store at all — it is the parquet band index, n_hashes/band_size
    rows per document ever seen, readable/compactable/queryable like
    any table and shared with the batch refresh path (the same index
    serves both). The streaming query itself is stateless, so no
    watermark is needed and a restart resumes from the checkpoint with
    the index intact.

    Exactly-once: foreachBatch may replay a batch after a failure, so
    both writes go to ``.../__batch=<batch_id>/`` subdirectories with
    mode("overwrite") — a replayed batch overwrites its own partition
    instead of double-appending, and the history read EXCLUDES the
    current batch id (a partial write of this very batch can never
    count as history). Reading the parent directory discovers
    ``__batch`` as a partition column; it is dropped before use.

    Band-cap caveat (documented divergence from the batch union run):
    ``max_bucket_size`` is applied to history + current batch only —
    a bucket that crosses the cap mid-stream stops flagging LATER
    arrivals, same as sequential batch refreshes over the same
    snapshots (the equivalence tested in tests/test_streaming.py).

    Usage::

        q = (stream.writeStream
             .foreachBatch(incremental_lsh_dedup_sink(idx, dec))
             .option("checkpointLocation", ckpt).start())
    """
    from ..pipeline.dedup import (incremental_lsh_dedup, lsh_bands,
                                  minhash_signatures)

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = lsh_bands(
            minhash_signatures(batch_df, text_col, id_col, n_hashes,
                               shingle_n),
            id_col, n_hashes, band_size)
        # the pair join and the index append both consume the bands:
        # materialize once (executor-local is fine — a replay rebuilds)
        bands = bands.localCheckpoint(eager=True)
        try:
            # "No history" is decided by an explicit existence check on
            # the index dir (Hadoop FileSystem, same resolver Spark's
            # reader uses) — NOT by absorbing AnalysisException. An
            # index dir that EXISTS but fails analysis (zero-file dir
            # after a compaction mishap, schema-merge conflict, corrupt
            # footer at schema inference) must kill the batch so the
            # stream retries from the checkpoint, never be silently
            # treated as "no history" and emit keep=True for real dups.
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
            # session-level Hadoop conf (newHadoopConf merges runtime
            # spark.conf settings, e.g. object-store credentials set
            # after session start), the SAME resolver the parquet
            # reader below authenticates with — jsc.hadoopConfiguration
            # would check with stale context-level settings
            fs = hpath.getFileSystem(
                spark._jsparkSession.sessionState().newHadoopConf())
            has_history = False
            if fs.exists(hpath):
                # committed data = at least one file whose path (rel.
                # to the index dir) has no hidden component. A dir
                # that exists with ONLY _temporary/_SUCCESS debris —
                # the state this sink itself leaves after a crash
                # mid-first-write — is "no history"; treating it as
                # broken would wedge the stream forever on replay.
                base = fs.makeQualified(hpath).toString().rstrip("/") + "/"
                it = fs.listFiles(hpath, True)

                def _hidden(seg: str) -> bool:
                    # Spark's InMemoryFileIndex rule: "_"/"." prefixed
                    # names are metadata EXCEPT partition dirs (they
                    # contain "=") — this sink's own partition column
                    # is __batch, so "__batch=7" must count as data
                    return seg.startswith(("_", ".")) and "=" not in seg

                while it.hasNext():
                    p = it.next().getPath().toString()
                    rel = p[len(base):] if p.startswith(base) else p
                    if not any(_hidden(seg) for seg in rel.split("/")):
                        has_history = True
                        break
            if has_history:
                hist = (spark.read.parquet(index_dir)
                        .where(F.col("__batch") != batch_id)
                        .drop("__batch"))
            else:
                # first batch: no index yet (or only uncommitted debris)
                hist = bands.limit(0)
            decisions = incremental_lsh_dedup(
                batch_df, hist, text_col, id_col, n_hashes, band_size,
                shingle_n, max_bucket_size, new_bands=bands)
            decisions.write.mode("overwrite").parquet(
                f"{decisions_dir}/__batch={batch_id}")
            bands.write.mode("overwrite").parquet(
                f"{index_dir}/__batch={batch_id}")
        finally:
            # a long-running stream runs thousands of batches: release
            # the checkpoint blocks now instead of waiting for the
            # driver GC to collect the py4j proxy
            bands.unpersist()

    return _fn
