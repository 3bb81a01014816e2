"""r17 optimization-round equivalence pins.

Two operators had their PHYSICAL form rewritten this round with a
claimed value-identical output; these tests pin the claim on
randomized synthetic corpora (beyond the fixed-fixture tests that
already cover them):

- ``incremental_lsh_dedup``: the bucket SELF-JOIN (min over qualifying
  collider rows) was replaced by a per-bucket (count, min-history-id,
  min-new-id) aggregation + equi-join. The reference formulation is
  re-implemented here directly from the banded index and compared row
  for row.
- ``paragraph_dedup``: the two per-doc aggregations (count branch +
  kept-reassembly branch, joined) were fused into ONE aggregation
  whose keeper filter folds into collect_list via NULL-skipping. The
  reference is a pure-Python replay of the keep-first /
  drop-everywhere semantics.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _random_corpus(rng, n_docs, vocab, dup_rate):
    rows = []
    texts = []
    for i in range(n_docs):
        if texts and rng.random() < dup_rate:
            t = rng.choice(texts)
            if rng.random() < 0.5:
                t = t + " " + rng.choice(vocab)
        else:
            t = " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(4, 12)))
        texts.append(t)
        rows.append((i, t))
    return rows


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_incremental_dedup_agg_form_equals_selfjoin(spark, seed):
    from optbinning_spark.pipeline.dedup import (
        incremental_lsh_dedup,
        lsh_bands,
        minhash_signatures,
    )

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(30)]
    rows = _random_corpus(rng, 40, vocab, dup_rate=0.45)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    idx = lsh_bands(
        minhash_signatures(hist, n_hashes=8), n_hashes=8, band_size=2)
    got = {r["id"]: (r["dup_of"], r["keep"]) for r in
           incremental_lsh_dedup(new, idx, n_hashes=8,
                                 band_size=2).collect()}

    # reference: the original self-join rule replayed in Python over
    # the SAME banded index (cap applied to combined bucket size)
    hist_bands = [(r["doc_id"], r["band"], r["band_key"])
                  for r in idx.collect()]
    new_bands = [(r["doc_id"], r["band"], r["band_key"]) for r in
                 lsh_bands(minhash_signatures(new, n_hashes=8),
                           n_hashes=8, band_size=2).collect()]
    buckets: dict = {}
    for d, b, k in hist_bands:
        buckets.setdefault((b, k), []).append((d, False))
    for d, b, k in new_bands:
        buckets.setdefault((b, k), []).append((d, True))
    expect: dict = {}
    for members in buckets.values():
        if len(members) > 1000:  # max_bucket_size default
            continue
        for d, is_new in members:
            if not is_new:
                continue
            colliders = [o for o, o_new in members
                         if (not o_new) or o < d]
            if colliders:
                expect[d] = min(
                    min(colliders), expect.get(d, min(colliders)))
    new_ids = {r[0] for r in rows if r[0] % 3 != 0}
    for nid in new_ids:
        want_dup = expect.get(nid)
        assert got[nid] == (want_dup, want_dup is None), (
            nid, got[nid], want_dup)


@pytest.mark.parametrize("seed,keep_first", [(3, True), (11, True),
                                             (5, False)])
def test_paragraph_dedup_fused_agg_equals_reference(spark, seed,
                                                    keep_first):
    from optbinning_spark.pipeline.dedup import paragraph_dedup

    rng = random.Random(seed)
    paras = [f"para {k} content" for k in range(12)]
    rows = []
    for i in range(25):
        n = rng.randint(1, 5)
        rows.append((i, "\n\n".join(rng.choice(paras)
                                    for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           paragraph_dedup(docs, keep_first=keep_first).collect()}

    # pure-Python reference of the documented semantics
    occ: dict = {}
    counts: dict = {}
    for i, text in rows:
        for pos, p in enumerate(text.split("\n\n")):
            occ.setdefault(p, (i, pos))
            occ[p] = min(occ[p], (i, pos))
            counts[p] = counts.get(p, 0) + 1
    for i, text in rows:
        ps = text.split("\n\n")
        if keep_first:
            kept = [p for pos, p in enumerate(ps)
                    if occ[p] == (i, pos)]
        else:
            kept = [p for p in ps if counts[p] == 1]
        r = got[i]
        assert r["n_paragraphs"] == len(ps)
        assert r["n_kept"] == len(kept)
        assert r["text"] == "\n\n".join(kept)
