"""Production-vocabulary BPE evidence run (round-11 ask).

Trains (or loads a cached) >=32k-merge BPE vocabulary from the ORGANIC
corpus, then exercises the production token-id path end-to-end at that
vocabulary size:

1. `bpe_token_ids_pandas_udf` over the full organic documents table —
   wall time + token throughput (the production path whose cost is
   vocab-size independent by construction; this run is the evidence).
2. Per-task memo statistics via a mapInPandas probe replicating the
   UDF's pre-tokenization: the iterator-form cache hit rate per
   worker task (1 - distinct_pretokens / total_pretokens).
3. Sample-equality assert: N hash-sampled docs' UDF ids must equal the
   driver-side reference `bpe_apply_python` ids under the same vocab.
4. The training-shard sink with ``tokenizer="arrow"`` at the same
   vocabulary — token-conservation check (sum of packed n_tokens ==
   sum of per-doc token counts).
5. A kernel profile by pre-token length bucket, to adjudicate the
   O(len^2) rescan question (VERDICT r10 "What's wrong" #3): the
   standard heap encoder is only worth building if long pre-tokens
   are measurably hot.

Prints one JSON summary line; the numbers land in SCALING.md's
production-vocab row.

Usage:
  python tools/run_production_bpe.py [--num-merges 32768]
      [--src /tmp/spark_graft_sf1_organic/documents.parquet]
      [--merges-cache /tmp/spark_graft_merges_{n}.txt] [--sample 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train_or_load(src: str, num_merges: int, cache_path: str):
    from optbinning_spark.pipeline.bpe import load_merges_txt

    if os.path.exists(cache_path):
        merges = load_merges_txt(cache_path)
        if len(merges) >= num_merges:
            return merges[:num_merges], 0.0
    import duckdb

    from tools.train_bpe_vocab import train_bpe_merges

    pat = f"{src}/*.parquet" if os.path.isdir(src) else src
    texts = [r[0] for r in duckdb.sql(
        f"select text from read_parquet('{pat}')").fetchall()]
    t0 = time.time()
    merges = train_bpe_merges(texts, num_merges)
    train_s = time.time() - t0
    # GPT-2 merges.txt format (leading space -> Ġ) so load_merges_txt
    # round-trips it
    with open(cache_path, "w", encoding="utf-8") as fh:
        fh.write("#version: spark-graft organic\n")
        for a, b in merges:
            fh.write(f"{a.replace(' ', chr(0x120))} "
                     f"{b.replace(' ', chr(0x120))}\n")
    return merges, train_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-merges", type=int, default=32768)
    ap.add_argument("--src",
                    default="/tmp/spark_graft_sf1_organic/documents.parquet")
    ap.add_argument("--merges-cache", default=None)
    ap.add_argument("--sample", type=int, default=200)
    ap.add_argument("--sink-docs", type=int, default=10_000)
    args = ap.parse_args()
    cache = args.merges_cache or f"/tmp/spark_graft_merges_{args.num_merges}.txt"

    out: dict = {"num_merges_requested": args.num_merges, "src": args.src}
    merges, train_s = _train_or_load(args.src, args.num_merges, cache)
    out["num_merges_trained"] = len(merges)
    out["train_sec"] = round(train_s, 1)
    if len(merges) < args.num_merges:
        print(f"WARNING: corpus exhausted at {len(merges)} merges "
              f"(< {args.num_merges})", file=sys.stderr)

    from pyspark.sql import functions as F

    from optbinning_spark import get_spark
    from optbinning_spark.pipeline.bpe import (
        ASCII_PRETOKEN_RE, bpe_apply_python, bpe_token_ids_pandas_udf,
        bpe_vocab)

    spark = get_spark("production_bpe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.src)
    n_docs, n_chars = docs.select(
        F.count("*"), F.sum(F.length("text"))).first()
    out["n_docs"] = n_docs
    out["n_chars"] = int(n_chars)

    udf = bpe_token_ids_pandas_udf(merges)
    # warm (JIT/Arrow init) on a small slice so the timed pass is
    # steady-state
    docs.limit(200).select(udf(F.col("text")).alias("ids")) \
        .write.format("noop").mode("overwrite").save()
    t0 = time.time()
    n_tokens, = docs.select(udf(F.col("text")).alias("ids")) \
        .select(F.sum(F.size("ids"))).first()
    encode_s = time.time() - t0
    out["n_tokens"] = int(n_tokens)
    out["encode_sec"] = round(encode_s, 2)
    out["tokens_per_sec"] = int(n_tokens / encode_s)
    out["mb_per_sec"] = round(n_chars / (1 << 20) / encode_s, 1)

    # memo-cache statistics per worker task (the iterator-form UDF
    # holds one cache per task): replicate the pre-tokenization and
    # count totals vs distincts per partition
    def _probe(batches):
        import pandas as pd
        total = 0
        seen = set()
        for pdf in batches:
            for t in pdf["text"]:
                if t is None:
                    continue
                toks = ASCII_PRETOKEN_RE.findall(t.replace("\x1e", ""))
                total += len(toks)
                seen.update(toks)
        yield pd.DataFrame({"total": [total], "distinct": [len(seen)]})

    parts = docs.select("text").mapInPandas(
        _probe, "total long, distinct long").collect()
    tot = sum(r["total"] for r in parts)
    dis = sum(r["distinct"] for r in parts)
    rates = [1 - r["distinct"] / r["total"] for r in parts if r["total"]]
    out["pretokens_total"] = tot
    out["memo_hit_rate_overall"] = round(1 - dis / tot, 4)
    out["memo_hit_rate_per_task_min"] = round(min(rates), 4)
    out["memo_hit_rate_per_task_max"] = round(max(rates), 4)
    out["n_tasks"] = len(parts)

    # sample equality vs the driver-side reference implementation
    vocab = bpe_vocab(merges)
    sample = docs.where(
        F.abs(F.hash("doc_id")) % 1000 < max(
            1, args.sample * 1000 // max(n_docs, 1))
    ).select("doc_id", "text", udf(F.col("text")).alias("ids")) \
        .limit(args.sample).collect()
    mismatches = 0
    for r in sample:
        ref = [vocab.get(s, 0) for s in bpe_apply_python(r["text"], merges)]
        if ref != list(r["ids"]):
            mismatches += 1
    out["sample_checked"] = len(sample)
    out["sample_mismatches"] = mismatches
    assert mismatches == 0, f"{mismatches}/{len(sample)} UDF/ref mismatches"

    # shard sink at production vocab: token conservation end-to-end
    from optbinning_spark.sources.training_shards import (
        build_training_sequences)

    sink_docs = docs.where(
        F.abs(F.hash("doc_id")) % max(n_docs // args.sink_docs, 1) == 0)
    n_sink = sink_docs.count()
    t0 = time.time()
    seqs = build_training_sequences(
        sink_docs, 512, merges=merges, tokenizer="arrow")
    packed_tokens, n_seqs = seqs.select(
        F.sum("n_tokens"), F.count("*")).first()
    sink_s = time.time() - t0
    doc_tokens, = sink_docs.select(
        udf(F.col("text")).alias("ids")).select(F.sum(F.size("ids"))).first()
    out["sink_docs"] = n_sink
    out["sink_sequences"] = int(n_seqs)
    out["sink_sec"] = round(sink_s, 2)
    out["sink_tokens_conserved"] = bool(int(packed_tokens) == int(doc_tokens))
    assert out["sink_tokens_conserved"], (packed_tokens, doc_tokens)

    # kernel profile by pre-token length (driver-side, pure Python):
    # is the O(len^2) pair rescan hot on the tail of long pre-tokens?
    from collections import Counter, defaultdict

    from optbinning_spark.pipeline.bpe import (_merge_pretoken_fast,
                                               _merge_ranks)

    ranks = _merge_ranks(merges)
    texts = [r["text"] for r in docs.select("text").limit(2000).collect()]
    freq: Counter = Counter()
    for t in texts:
        if t:
            freq.update(ASCII_PRETOKEN_RE.findall(t.replace("\x1e", "")))
    by_len: dict = defaultdict(lambda: [0, 0.0, 0])  # n, sec, weighted
    for tok, c in freq.items():
        t0 = time.perf_counter()
        _merge_pretoken_fast(tok, merges, ranks)
        dt = time.perf_counter() - t0
        b = min(len(tok) // 8, 4)  # buckets: 0-7, 8-15, ..., 32+
        by_len[b][0] += 1
        by_len[b][1] += dt
        by_len[b][2] += c
    prof = {}
    total_weighted = sum(v[1] / v[0] * v[2] for v in by_len.values() if v[0])
    for b in sorted(by_len):
        n, sec, w = by_len[b]
        us = sec / n * 1e6
        share = (sec / n * w) / total_weighted if total_weighted else 0
        lo, hi = b * 8, (b + 1) * 8 - 1
        label = f"{lo}-{hi}" if b < 4 else f"{lo}+"
        prof[label] = {"types": n, "encode_us_per_type": round(us, 1),
                       "corpus_time_share": round(share, 3)}
    out["kernel_profile_by_pretoken_len"] = prof

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
