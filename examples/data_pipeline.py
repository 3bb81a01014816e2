"""Training-data pipeline: PII -> paragraph dedup -> quality gates ->
NB quality model -> near-dup dedup -> DSIR select -> split -> chunk ->
pack -> training-shard sink (manifest-validated) -> ANN, with a
stage-by-stage row/token audit table.

The LLM-data operator family over the `documents` / `embeddings`
tables, wired the way a real curation run is: every stage that can
drop or rewrite content reports (docs, tokens, delta) so the cost of
each gate is visible — the number-one operational question of a
curation pipeline ("where did my corpus go?").

Run:  python examples/data_pipeline.py [sf_dir]   (default sf0.001)
CI:   tests/test_pipeline.py::test_data_pipeline_example_runs runs
      this at sf0.01 end-to-end and asserts the audit is printed and
      monotone where it must be.
"""

from __future__ import annotations

import os
import sys
import tempfile

# runnable from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from optbinning_spark import get_spark
from optbinning_spark.pipeline.bpe import bpe_token_count_col
from optbinning_spark.pipeline.classify import nb_filter, nb_train
from optbinning_spark.pipeline.dedup import (
    duplicate_clusters,
    paragraph_dedup,
)
from optbinning_spark.pipeline.sampling import (
    dsir_gumbel_sample,
    dsir_log_weights,
    hash_split,
)
from optbinning_spark.pipeline.similarity import brute_force_topk
from optbinning_spark.sources.training_shards import (
    validate_training_shards,
    write_training_shards,
)
from optbinning_spark.pipeline.text import (
    chunk_documents,
    gopher_quality_flags,
    pack_sequences,
    redact_pii,
    repetition_flags,
    token_count_expr,
)


def _audit_row(df, stage, note=""):
    """(stage, docs, ws_tokens) in ONE aggregation."""
    r = df.agg(
        F.count("*").alias("docs"),
        F.sum(token_count_expr(F.col("text"))).alias("tokens"),
    ).first()
    return {"stage": stage, "docs": int(r["docs"]),
            "tokens": int(r["tokens"] or 0), "note": note}


def print_audit(audit):
    prev = None
    print(f"\n{'stage':<22}{'docs':>8}{'tokens':>10}"
          f"{'d_docs':>8}{'d_tokens':>10}  note")
    for a in audit:
        dd = "" if prev is None else f"{a['docs'] - prev['docs']:+d}"
        dt = "" if prev is None else f"{a['tokens'] - prev['tokens']:+d}"
        print(f"{a['stage']:<22}{a['docs']:>8}{a['tokens']:>10}"
              f"{dd:>8}{dt:>10}  {a['note']}")
        prev = a
    print()


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("data_pipeline", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    audit = []

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    audit.append(_audit_row(docs, "raw"))

    # PII scrubbing first — nothing downstream sees raw identifiers
    meta = docs.drop("text")
    red = redact_pii(docs)
    n_red = red.agg(*[F.sum(c).alias(c) for c in
                      ("n_email", "n_ipv4", "n_phone")]).first()
    docs = red.select("doc_id", "text").join(meta, "doc_id")
    audit.append(_audit_row(
        docs, "pii_redacted",
        f"redactions: email={n_red['n_email']} ipv4={n_red['n_ipv4']} "
        f"phone={n_red['n_phone']}"))

    # paragraph-level exact dedup (Dolma step): a paragraph repeated
    # anywhere survives only at its first occurrence — removes
    # boilerplate blocks doc-level dedup can't touch
    pd_out = paragraph_dedup(docs).select(
        "doc_id", "text", "n_paragraphs", "n_kept")
    docs = pd_out.select("doc_id", "text").join(meta, "doc_id")
    audit.append(_audit_row(docs, "paragraph_dedup",
                            "first occurrence kept"))

    # Gopher quality + repetition gates (map-only booleans; the join
    # is doc_id-equi on the repetition aggregate)
    g = gopher_quality_flags(docs, min_words=5, min_stopword_hits=0)
    rep = repetition_flags(docs).select("doc_id",
                                        F.col("keep").alias("rep_keep"))
    gated = (g.join(rep, "doc_id")
             .filter(F.col("keep") & F.col("rep_keep"))
             .drop("keep", "rep_keep", *[c for c in g.columns
                                         if c.startswith("ok_")]))
    audit.append(_audit_row(gated, "quality_gates",
                            "gopher + repetition rules"))

    # model-based quality filter (the CCNet/LLaMA fastText step):
    # distill the heuristic gate decisions into an NB bag-of-n-gram
    # classifier, then keep only gated docs the model ALSO scores
    # gate-passing-like — the smooth ensemble of the sharp rules. At
    # 100 TB the trained model (one array literal) can gate the next
    # batch as a pure map, without re-running the gate aggregations.
    labeled = g.join(rep, "doc_id").withColumn(
        "y", (F.col("keep") & F.col("rep_keep")).cast("int"))
    try:
        model = nb_train(labeled, "y", n_buckets=2048)
        docs = nb_filter(gated, model, min_log_odds=0.0)
        audit.append(_audit_row(
            docs, "nb_quality_filter",
            f"NB LLR gate distilled from {labeled.count()} gate labels"))
    except ValueError:  # gates passed/failed everything: no classes
        docs = gated
        last = audit[-1]
        audit.append({"stage": "nb_quality_filter", "docs": last["docs"],
                      "tokens": last["tokens"],
                      "note": "skipped: gate labels single-class"})

    # near-duplicate clustering: MinHash -> LSH bands -> exact Jaccard
    # verify -> connected components; keep one doc per cluster
    clusters = duplicate_clusters(
        docs, n_hashes=8, band_size=2, jaccard_threshold=0.5)
    keep = clusters.filter("is_canonical").select("doc_id")
    docs = docs.join(keep, "doc_id")
    audit.append(_audit_row(docs, "near_dup_dedup",
                            "one canonical doc per cluster"))

    # DSIR data selection: weight docs toward a target distribution
    # (here: the Spanish slice), then Gumbel-top-k resample
    weights = dsir_log_weights(docs, docs.filter("lang = 'es'"),
                               n_buckets=2048)
    k = max(50, docs.count() // 3)
    selected = dsir_gumbel_sample(weights, k=k).join(docs, "doc_id")
    audit.append(_audit_row(selected, "dsir_selected",
                            f"gumbel top-{k} toward lang=es"))

    # deterministic split: same doc -> same split on ANY cluster/run
    split = hash_split(selected, "doc_id",
                       {"train": 0.9, "val": 0.05, "test": 0.05})
    mix = {r["split"]: r["count"] for r in
           split.groupBy("split").count().collect()}
    train = split.filter("split = 'train'").drop("split")
    audit.append(_audit_row(train, "train_split", f"split mix: {mix}"))

    # context-window chunking + per-shard sequence packing, measured
    # in REAL subword tokens (pinned mini BPE vocab)
    chunks = chunk_documents(train, chunk_tokens=64, overlap=8,
                             token_counter="bpe")
    packed = pack_sequences(train, seq_tokens=256, shard_col="lang",
                            token_counter="bpe")
    n_bpe = train.agg(F.sum(bpe_token_count_col(F.col("text")))).first()[0]
    print("chunks:", chunks.count(), "packed slices:", packed.count(),
          "sequences:",
          packed.select("shard", "seq_id").distinct().count(),
          "bpe tokens packed:", n_bpe)

    # the last mile: write the train split as shard-partitioned
    # token-id sequences with a provenance + content-hash manifest,
    # then verify the dataset on disk from the manifest alone
    out_dir = os.path.join(tempfile.gettempdir(), "pipeline_shards")
    manifest = write_training_shards(train, out_dir, seq_tokens=256,
                                     shard_col="lang")
    report = validate_training_shards(spark, out_dir)
    print("training shards:", out_dir,
          "| sequences:", manifest["totals"]["n_sequences"],
          "tokens:", manifest["totals"]["n_tokens"],
          "| manifest validated:",
          all(v["ok"] for v in report.values()))

    print_audit(audit)

    # embedding similarity: exact cosine top-k for a few query vectors,
    # then the memory-bound scale path — IVF-PQ ADC over trained
    # codebooks (the corpus scan reads m small ints per vector)
    from optbinning_spark.pipeline.similarity import (
        pq_topk, train_ivf_centroids, train_pq_codebooks)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter("vec_id % 101 = 0")
               .withColumnRenamed("vec_id", "query_id"))
    brute_force_topk(emb, queries, k=3).show(9)
    pq_topk(emb, queries, train_pq_codebooks(emb, m=16, k=16), k=3,
            centroids=train_ivf_centroids(emb, 8), n_probe=4).show(9)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
