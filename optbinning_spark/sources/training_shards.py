"""Training-shard sink — the pipeline's last mile: materialize packed
token-id sequences and write them as shard-partitioned parquet with an
integrity manifest.

``pack_sequences`` (pipeline/text.py) emits the packing PLAN (which
token span of which document lands where); a trainer consumes
MATERIALIZED fixed-length ``input_ids`` rows plus two operational
guarantees a 100 TB run cannot skip:

- **provenance**: every sequence carries the (doc_id, doc_start,
  seq_offset, n_tokens) spans that built it, so any training example
  is attributable back to source documents (takedown/audit path);
- **a manifest**: per-shard sequence/token counts and an
  order-insensitive content hash, written beside the data, so a
  resumed or mirrored copy of the dataset is verifiable without
  re-deriving it from the raw corpus (``validate_training_shards``).

Physical strategy: the packing plan is the per-shard window cumsum of
``pack_sequences``; materialization joins the plan's span rows back to
per-doc BPE token-id arrays (one id-equi-join) and assembles each
sequence with ONE bounded aggregation (a sequence holds at most
``seq_tokens`` ids, so per-group state is a parameter, not data).
Shards write in parallel via ``partitionBy``; the manifest is one
bounded per-shard aggregation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.bpe import bpe_token_ids_col, bpe_token_ids_pandas_udf
from ..pipeline.text import pack_sequences


def build_training_sequences(
    df: DataFrame,
    seq_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    merges=None,
    materialize_ids: bool = True,
    checkpoint_dir: str | None = None,
    tokenizer: str = "expr",
) -> DataFrame:
    """Materialize packed sequences as one row per (shard, seq_id):

        (shard, seq_id, input_ids array<int>, n_tokens,
         provenance array<struct<seq_offset, doc_id, doc_start,
                                 n_tokens>>)

    Token ids are BPE ids under ``merges`` (pipeline.bpe pinned mini
    vocab by default; pass ``load_merges_txt(...)`` output for a real
    GPT-2 vocabulary). Every sequence except each shard's last is
    exactly ``seq_tokens`` long — the pack-then-chop contract.

    The corpus is tokenized ONCE: the compact (id, token-id array)
    frame feeds both the pack plan (counts = F.size of the array, via
    pack_sequences' token_count_col) and the slice join — the same
    scan-halving shape as dsir_features. ``materialize_ids`` (default)
    materializes that frame so the plan's two consumers don't each
    re-run the BPE merge cascade; pass False to keep pure lineage.

    Materialization tier (same posture as connected_components'
    ``checkpoint_dir``): with ``checkpoint_dir`` set, the id frame
    checkpoints to RELIABLE storage (HDFS/S3 on a real cluster — an
    executor loss replays the sink job from the checkpoint instead of
    failing it, which is the right default for a 100 TB last-mile
    sink). Default None uses localCheckpoint in local mode (executor
    == driver, nothing to lose) but falls back to a persist +
    lineage-kept materialization on a real cluster, where
    localCheckpoint's executor-local blocks are unrecoverable.

    ``tokenizer``: "expr" (default) inlines the merge cascade into
    whole-stage codegen — right for pinned mini-vocabularies; "arrow"
    tokenizes via :func:`bpe_token_ids_pandas_udf` — the production
    path for real (32k+ merge) vocabularies, where the expression
    cascade is not constructible. Identical ids (asserted in
    tests/test_training_shards.py on the pinned vocab)."""
    if tokenizer not in ("expr", "arrow"):
        raise ValueError(f"tokenizer must be 'expr' or 'arrow': {tokenizer}")
    if tokenizer == "arrow":
        ids_expr = bpe_token_ids_pandas_udf(merges)(F.col(text_col))
    else:
        ids_expr = bpe_token_ids_col(text_col, merges)
    ids = df.select(
        F.col(id_col),
        *([F.col(shard_col)] if shard_col else []),
        ids_expr.alias("__ids"))
    if materialize_ids:
        sc = df.sparkSession.sparkContext
        if checkpoint_dir is not None:
            # setCheckpointDir mutates global SparkContext state;
            # capture and restore the previous dir so later unrelated
            # .checkpoint() users (e.g. connected_components) do not
            # silently inherit this sink's directory
            prev = sc._jsc.sc().getCheckpointDir()
            prev_dir = prev.get() if prev.isDefined() else None
            sc.setCheckpointDir(checkpoint_dir)
            try:
                ids = ids.checkpoint(eager=True)
            finally:
                if prev_dir is not None:
                    sc.setCheckpointDir(prev_dir)
                else:
                    # no prior dir: clear the Option field directly so
                    # a later unrelated .checkpoint() fails with
                    # "checkpoint directory has not been set" instead
                    # of silently inheriting this sink's directory.
                    # The setter is a private[spark] var reached via
                    # its bytecode-public name — a Spark upgrade that
                    # renames it must NOT turn this cleanup into an
                    # error that masks the sink's successful result,
                    # so degrade to leaving the dir set with a warning
                    try:
                        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                            sc._jvm.scala.Option.empty())
                    except Exception as exc:  # pragma: no cover
                        import warnings
                        warnings.warn(
                            "could not clear the SparkContext "
                            f"checkpoint dir ({exc!r}); later "
                            ".checkpoint() calls will inherit "
                            f"{checkpoint_dir!r}")
        elif sc.master.startswith("local"):
            ids = ids.localCheckpoint(eager=True)
        else:
            # cluster without reliable dir: keep lineage, cache the
            # tokenized frame so both consumers reuse it when present
            from pyspark import StorageLevel

            ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
            ids.count()  # eager, same contract as the checkpoint path
    counted = ids.withColumn("__n_tok", F.size("__ids"))
    spans = pack_sequences(counted, seq_tokens, text_col=text_col,
                           id_col=id_col, shard_col=shard_col,
                           token_count_col="__n_tok", merges=merges)
    if shard_col is None:
        spans = spans.select(F.lit(0).alias("shard"), "*")
    pieces = spans.join(ids.select(id_col, "__ids"), id_col).select(
        "shard", "seq_id", "seq_offset",
        # doc_start is 0-based; slice() is 1-based
        F.slice(F.col("__ids"), F.col("doc_start").cast("int") + 1,
                F.col("n_tokens").cast("int")).alias("piece"),
        F.struct("seq_offset", F.col(id_col).alias("doc_id"),
                 "doc_start", "n_tokens").alias("prov"),
    )
    assembled = pieces.groupBy("shard", "seq_id").agg(
        # array_sort on struct arrays orders by the first field
        # (seq_offset, unique within a sequence), so the flatten
        # concatenates pieces in position order
        F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("seq_offset", "piece"))),
            lambda x: x["piece"])).alias("input_ids"),
        F.array_sort(F.collect_list("prov")).alias("provenance"),
    )
    return assembled.select(
        "shard", "seq_id", "input_ids",
        F.size("input_ids").cast("long").alias("n_tokens"),
        "provenance")


def _seq_hash() -> F.Column:
    """Order-insensitive per-shard content hash: sum over sequences of
    the top-32-md5-bits of "seq_id:ids|provenance" (bigint sum of
    32-bit values cannot overflow before ~2^31 sequences per shard).
    Provenance spans are IN the key — the attribution path is part of
    the integrity guarantee, so a copy whose provenance was truncated
    or rewritten fails validation even with intact input_ids."""
    prov = F.concat_ws(";", F.transform(
        F.col("provenance"),
        lambda p: F.concat_ws(
            ":", p["seq_offset"].cast("string"),
            p["doc_id"].cast("string"), p["doc_start"].cast("string"),
            p["n_tokens"].cast("string"))))
    key = F.concat_ws(
        "|",
        F.concat_ws(
            ":", F.col("seq_id").cast("string"),
            F.concat_ws(",", F.transform(F.col("input_ids"),
                                         lambda x: x.cast("string")))),
        prov)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    seq_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    merges=None,
    checkpoint_dir: str | None = None,
) -> dict:
    """Materialize (see :func:`build_training_sequences`) and write
    ``out_dir/sequences/shard=*/...parquet`` plus
    ``out_dir/manifest.json``. Returns the manifest dict:

        {"seq_tokens": ..., "shards": {shard: {"n_sequences": ...,
         "n_tokens": ..., "content_hash": ...}}, "totals": {...}}

    ``checkpoint_dir`` passes through to build_training_sequences
    (reliable checkpoint of the tokenized frame on real clusters).
    """
    seqs = build_training_sequences(
        df, seq_tokens, text_col=text_col, id_col=id_col,
        shard_col=shard_col, merges=merges, checkpoint_dir=checkpoint_dir)
    (seqs.write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(out_dir, "sequences")))
    # aggregate the parquet just WRITTEN, not the lineage: the
    # manifest then attests to the bytes on disk (and the expensive
    # materialization DAG runs once, not twice)
    spark = df.sparkSession
    rows = (
        read_training_shards(spark, out_dir).groupBy("shard").agg(
            F.count("*").alias("n_sequences"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(_seq_hash()).alias("content_hash"))
        .collect())
    manifest = {
        "seq_tokens": seq_tokens,
        "shards": {
            str(r["shard"]): {
                "n_sequences": int(r["n_sequences"]),
                "n_tokens": int(r["n_tokens"]),
                "content_hash": int(r["content_hash"]),
            } for r in rows},
        "totals": {
            "n_sequences": sum(int(r["n_sequences"]) for r in rows),
            "n_tokens": sum(int(r["n_tokens"]) for r in rows),
        },
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def read_training_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "sequences"))


def validate_training_shards(spark: SparkSession, out_dir: str) -> dict:
    """Recompute per-shard counts + content hash from the parquet on
    disk and compare with manifest.json. Returns
    {shard: {"ok": bool, ...expected/actual on mismatch}}; a shard
    present in only one side reports ok=False. This is the resume /
    mirror integrity check — it never touches the raw corpus."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    actual = {
        str(r["shard"]): (int(r["n_sequences"]), int(r["n_tokens"]),
                          int(r["content_hash"]))
        for r in read_training_shards(spark, out_dir)
        .groupBy("shard").agg(
            F.count("*").alias("n_sequences"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(_seq_hash()).alias("content_hash"))
        .collect()}
    report = {}
    for shard in sorted(set(manifest["shards"]) | set(actual)):
        want = manifest["shards"].get(shard)
        got = actual.get(shard)
        want_t = ((want["n_sequences"], want["n_tokens"],
                   want["content_hash"]) if want else None)
        ok = want_t is not None and got is not None and want_t == got
        entry = {"ok": ok}
        if not ok:
            entry["expected"] = want_t
            entry["actual"] = got
        report[shard] = entry
    return report
