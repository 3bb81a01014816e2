"""Training-shard sink: exact reconstruction of the token stream,
span-level provenance, and manifest integrity checking."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from optbinning_spark.pipeline.bpe import bpe_token_ids_col
from optbinning_spark.sources.training_shards import (
    build_training_sequences,
    read_training_shards,
    validate_training_shards,
    write_training_shards,
)

SEQ = 16


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "a"),
        (1, "pack my box with five dozen liquor jugs", "a"),
        (2, "a b c d e f g h i j k l m n o p", "a"),
        (3, "sphinx of black quartz judge my vow", "b"),
        (4, "how vexingly quick daft zebras jump", "b"),
        (5, None, "b"),   # NULL text: no tokens, no slices
        (6, "", "b"),     # empty text: zero tokens, no slices
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def shards(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards"))
    manifest = write_training_shards(docs, out, SEQ, shard_col="lang")
    return out, manifest


def _doc_ids(docs):
    return {
        r["doc_id"]: (r["lang"], list(r["ids"]))
        for r in docs.select(
            "doc_id", "lang",
            F.coalesce(bpe_token_ids_col(F.col("text")),
                       F.array().cast("array<int>")).alias("ids"))
        .collect()}


def test_reconstructs_exact_token_stream(spark, docs, shards):
    out, _ = shards
    per_doc = _doc_ids(docs)
    seqs = sorted(
        ((r["shard"], r["seq_id"], list(r["input_ids"]))
         for r in read_training_shards(spark, out).collect()))
    for shard in ("a", "b"):
        want = []
        for d in sorted(k for k, v in per_doc.items() if v[0] == shard):
            want.extend(per_doc[d][1])
        got_chunks = [ids for s, _, ids in seqs if s == shard]
        # every sequence except the last is exactly full
        assert all(len(c) == SEQ for c in got_chunks[:-1])
        assert 0 < len(got_chunks[-1]) <= SEQ
        got = [t for c in got_chunks for t in c]
        assert got == want, shard


def test_provenance_spans_match_source_docs(spark, docs, shards):
    out, _ = shards
    per_doc = _doc_ids(docs)
    for r in read_training_shards(spark, out).collect():
        ids = list(r["input_ids"])
        assert len(ids) == r["n_tokens"]
        covered = 0
        for p in r["provenance"]:
            src = per_doc[p["doc_id"]][1]
            frag = ids[p["seq_offset"]:p["seq_offset"] + p["n_tokens"]]
            assert frag == src[p["doc_start"]:p["doc_start"] + p["n_tokens"]]
            covered += p["n_tokens"]
        assert covered == r["n_tokens"]  # spans tile the sequence


def test_manifest_matches_and_validates(spark, shards):
    out, manifest = shards
    assert set(manifest["shards"]) == {"a", "b"}
    assert manifest["totals"]["n_sequences"] == sum(
        s["n_sequences"] for s in manifest["shards"].values())
    report = validate_training_shards(spark, out)
    assert all(v["ok"] for v in report.values()), report


def test_validate_detects_corruption(spark, docs, tmp_path):
    out = str(tmp_path / "shards_corrupt")
    write_training_shards(docs, out, SEQ, shard_col="lang")
    # drop one sequence from shard a and rewrite its partition
    seqs = read_training_shards(spark, out).cache()
    keep = seqs.filter("shard = 'a'")
    victim = keep.agg(F.max("seq_id")).first()[0]
    truncated = keep.filter(F.col("seq_id") != victim).collect()
    part = glob.glob(os.path.join(out, "sequences", "shard=a"))[0]
    for f in glob.glob(os.path.join(part, "*.parquet")):
        os.remove(f)
    (spark.createDataFrame(truncated, keep.schema).drop("shard")
     .coalesce(1).write.mode("append").parquet(part))
    seqs.unpersist()
    report = validate_training_shards(spark, out)
    assert not report["a"]["ok"]
    assert report["b"]["ok"]


def test_no_shard_col_single_stream(spark, docs, tmp_path):
    out = str(tmp_path / "shards_single")
    manifest = write_training_shards(docs, out, SEQ)
    assert list(manifest["shards"]) == ["0"]
    per_doc = _doc_ids(docs)
    want = []
    for d in sorted(per_doc):
        want.extend(per_doc[d][1])
    got = [t for r in sorted(read_training_shards(spark, out).collect(),
                             key=lambda r: r["seq_id"])
           for t in r["input_ids"]]
    assert got == want


def test_build_sequences_is_bounded_rows(docs):
    seqs = build_training_sequences(docs, SEQ, shard_col="lang")
    for r in seqs.collect():
        assert len(r["input_ids"]) <= SEQ
        assert len(r["provenance"]) <= SEQ  # a span has >= 1 token


def test_arrow_tokenizer_equivalent(spark, docs):
    """tokenizer='arrow' (the production path for 32k+ merge
    vocabularies, where the expression cascade is not constructible)
    must produce byte-identical sequences to the expression path."""
    base = build_training_sequences(docs, SEQ, shard_col="lang")
    arrow = build_training_sequences(docs, SEQ, shard_col="lang",
                                     tokenizer="arrow")
    key = lambda r: (r["shard"], r["seq_id"])  # noqa: E731
    a = sorted(base.collect(), key=key)
    b = sorted(arrow.collect(), key=key)
    assert [(r["shard"], r["seq_id"], r["input_ids"], r["n_tokens"],
             [tuple(p) for p in r["provenance"]]) for r in a] == \
           [(r["shard"], r["seq_id"], r["input_ids"], r["n_tokens"],
             [tuple(p) for p in r["provenance"]]) for r in b]
    with pytest.raises(ValueError, match="tokenizer"):
        build_training_sequences(docs, SEQ, tokenizer="bogus")


def test_checkpoint_dir_restored_after_sink(spark, docs, tmp_path):
    """The sink's reliable checkpoint must not leak its directory into
    global SparkContext state: a prior setCheckpointDir survives."""
    sc = spark.sparkContext
    prior = str(tmp_path / "prior")
    sc.setCheckpointDir(prior)
    build_training_sequences(
        docs, SEQ, shard_col="lang",
        checkpoint_dir=str(tmp_path / "sink_ckpt")).collect()
    cur = sc._jsc.sc().getCheckpointDir()
    assert cur.isDefined() and prior in cur.get()


def test_checkpoint_dir_cleared_when_no_prior(spark, docs, tmp_path):
    """With no prior checkpoint dir, the sink must leave the context
    with NO dir set (not its own) so a later unrelated .checkpoint()
    fails loudly instead of silently inheriting the sink's directory."""
    sc = spark.sparkContext
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert not sc._jsc.sc().getCheckpointDir().isDefined()
    build_training_sequences(
        docs, SEQ, shard_col="lang",
        checkpoint_dir=str(tmp_path / "sink_ckpt2")).collect()
    assert not sc._jsc.sc().getCheckpointDir().isDefined()


def test_reliable_checkpoint_dir_equivalent(spark, docs, tmp_path):
    """checkpoint_dir (reliable checkpoint — the real-cluster
    resilience path for the sink's tokenized frame) must produce
    byte-identical sequences to the default localCheckpoint path."""
    base = build_training_sequences(docs, SEQ, shard_col="lang")
    ckpt = build_training_sequences(
        docs, SEQ, shard_col="lang",
        checkpoint_dir=str(tmp_path / "ckpt"))
    key = lambda r: (r["shard"], r["seq_id"])  # noqa: E731
    a = sorted(base.collect(), key=key)
    b = sorted(ckpt.collect(), key=key)
    assert [(r["shard"], r["seq_id"], r["input_ids"], r["n_tokens"],
             [tuple(p) for p in r["provenance"]]) for r in a] == \
           [(r["shard"], r["seq_id"], r["input_ids"], r["n_tokens"],
             [tuple(p) for p in r["provenance"]]) for r in b]
    # the reliable checkpoint actually landed on disk
    import os

    assert any(os.scandir(str(tmp_path / "ckpt")))
