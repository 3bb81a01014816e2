"""Organic sf1 dataset generator — fresh-seeded shards, NOT copies.

The round-5 sf1 ladder replicated sf0.1 ten times (offset keys,
per-copy token salt). That keeps dup structure and per-shard value
distributions structurally identical across shards: dedup sees the
same 8 intra-shard pairs ten times, shingle cardinality grows only by
the salt rewrite, and categorical cardinality stays frozen — so the
jaccard / spans / connected-components / salt-gate slopes it produced
were not trustworthy at 10x. This generator builds each shard from a
FRESH RNG seed with organic statistics:

- ``documents`` (5,000/shard): Zipf(1.2)-distributed tokens over a
  40,000-word vocabulary (observed vocab grows Heaps-style with
  corpus size — rare words only surface as shards accumulate),
  lognormal doc lengths (mean ~54 tokens, like the driver's sf0.1),
  a fixed boilerplate 10-gram prepended to ``bp_frac`` of docs (the
  license-header analog that makes one n-gram corpus-hot), ~0.3%
  exact duplicates + ~2% near-duplicates (90% token overlap) within
  each shard, and 20 global "viral" docs mutated into EVERY shard so
  duplicate clusters span shards. ``source`` is Zipf-skewed over a
  large id space (hot-key categorical).
- ``embeddings`` (2,000/shard): 64-dim points around 10 GLOBAL
  Gaussian centers (clusters span shards), ~1% near-dup vectors.
- ``orders`` (150,000/shard) / ``lineitem`` (600,000/shard): fresh
  draws matching the sf0.1 marginals (quantity U{1..50}, price
  U(900, 105000), discount/tax on the same grids, flat ~1/3 'R'
  target like the driver data), with key spaces that GROW with the
  shard count: l_partkey spans 20,000 x copies distinct values (the
  auto-salt gate's 65,536 threshold is crossed at 10 shards — the
  organic cardinality growth the self-similar ladder could not show)
  and l_suppkey 1,000 x copies.

Shards are generated independently (numpy per shard, bounded memory)
and written as one parquet file per shard with ~100k-row row groups,
so Spark scans split across both files and row groups.

Usage:
    python tools/gen_sf1_organic.py [--out DIR] [--copies 10]
                                    [--bp-frac 0.10] [--seed 42]

or from code: ``ensure_sf1_organic(out_dir, copies=10)`` builds only
if the _READY stamp is missing/stale and returns the dir.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STAMP_FMT = "organic-v1-copies={copies}-bp={bp_frac}-seed={seed}"

BOILERPLATE = ("licensed under the apache license version two point "
               "zero see notice file").split()
assert len(BOILERPLATE) >= 10  # spans at least one full 10-gram

_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def _zipf_p(v: int, s: float) -> np.ndarray:
    p = 1.0 / np.arange(1, v + 1) ** s
    return p / p.sum()


def _vocab(v: int) -> np.ndarray:
    # deterministic pseudo-words, 1-indexed rank order
    return np.array([f"w{j:05d}" for j in range(v)])


def _viral_docs(rng: np.random.RandomState, vocab, zp, n=20):
    docs = []
    for _ in range(n):
        ln = int(np.clip(rng.lognormal(np.log(45), 0.6), 8, 600))
        docs.append(rng.choice(vocab, size=ln, p=zp))
    return docs


def _documents_shard(shard, seed, copies, bp_frac, vocab, zp, viral,
                     n_docs=5000):
    rng = np.random.RandomState(seed * 1000 + shard + 101)
    lens = np.clip(rng.lognormal(np.log(45), 0.6, n_docs), 8, 600).astype(int)
    pool = rng.choice(len(vocab), size=int(lens.sum()), p=zp)
    offs = np.concatenate([[0], np.cumsum(lens)])
    toks = [list(vocab[pool[offs[i]:offs[i + 1]]]) for i in range(n_docs)]
    # viral docs (global content, per-shard 5% mutation) -> cross-shard
    # duplicate clusters; placed in the last len(viral) slots
    for k, vd in enumerate(viral):
        d = list(vd)
        for j in range(len(d)):
            if rng.rand() < 0.05:
                d[j] = vocab[rng.choice(len(vocab), p=zp)]
        toks[n_docs - len(viral) + k] = d
    # near-duplicates: ~2% of docs are 90%-overlap mutations of an
    # earlier doc in the shard
    n_near = int(0.02 * n_docs)
    for i in rng.choice(np.arange(1, n_docs - len(viral)), n_near,
                        replace=False):
        j = rng.randint(0, i)
        d = list(toks[j])
        for t in range(len(d)):
            if rng.rand() < 0.10:
                d[t] = vocab[rng.choice(len(vocab), p=zp)]
        toks[i] = d
    # exact duplicates: ~0.3%
    n_ex = max(1, int(0.003 * n_docs))
    for i in rng.choice(np.arange(1, n_docs - len(viral)), n_ex,
                        replace=False):
        toks[i] = list(toks[rng.randint(0, i)])
    # boilerplate 10-gram prepended to bp_frac of docs (corpus-hot key)
    bp_mask = rng.rand(n_docs) < bp_frac
    texts = [" ".join((BOILERPLATE + t) if bp_mask[i] else t)
             for i, t in enumerate(toks)]
    # Zipf-skewed high-cardinality source (hot head ~9%)
    src_p = _zipf_p(50_000, 1.05)
    src = rng.choice(50_000, size=n_docs, p=src_p)
    return pa.table({
        "doc_id": pa.array(shard * 100_000_000 + np.arange(n_docs),
                           pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(_LANGS, n_docs, p=_LANG_P), pa.string()),
        "source": pa.array([f"src{int(s)}" for s in src], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _embeddings_shard(shard, seed, centers, n=2000, dim=64):
    rng = np.random.RandomState(seed * 1000 + shard + 202)
    labels = rng.randint(0, len(centers), n)
    pts = centers[labels] + rng.normal(0, 1.0, (n, dim))
    # ~1% near-dup vectors of an earlier row
    for i in rng.choice(np.arange(1, n), max(1, n // 100), replace=False):
        j = rng.randint(0, i)
        pts[i] = pts[j] + rng.normal(0, 1e-3, dim)
        labels[i] = labels[j]
    emb = pa.array(pts.astype(np.float32).tolist(),
                   pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(shard * 100_000_000 + np.arange(n), pa.int64()),
        "embedding": emb,
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


_DAY = 86_400_000_000  # us


def _orders_shard(shard, seed, copies, n=150_000):
    rng = np.random.RandomState(seed * 1000 + shard + 303)
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_d = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                 / np.timedelta64(1, "D"))
    dates = base + rng.randint(0, span_d + 1, n).astype(np.int64) * _DAY
    return pa.table({
        "o_orderkey": pa.array(shard * 100_000_000 + np.arange(n), pa.int64()),
        "o_custkey": pa.array(
            rng.randint(0, 15_000 * copies, n).astype(np.int64), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n), pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500_000, n), 2), pa.float64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"], n), pa.string()),
    })


def _lineitem_shard(shard, seed, copies, n=600_000):
    rng = np.random.RandomState(seed * 1000 + shard + 404)
    base = np.datetime64("1995-01-02", "us").astype(np.int64)
    span_d = int((np.datetime64("2001-11-04") - np.datetime64("1995-01-02"))
                 / np.timedelta64(1, "D"))
    dates = base + rng.randint(0, span_d + 1, n).astype(np.int64) * _DAY
    return pa.table({
        "l_orderkey": pa.array(
            shard * 100_000_000
            + rng.randint(0, 150_000, n).astype(np.int64), pa.int64()),
        # organic key growth: partkey space = 20k x copies (crosses the
        # 65,536 auto-salt gate at 10 shards), suppkey = 1k x copies
        "l_partkey": pa.array(
            rng.randint(0, 20_000 * copies, n).astype(np.int64), pa.int64()),
        "l_suppkey": pa.array(
            rng.randint(0, 1_000 * copies, n).astype(np.int64), pa.int64()),
        "l_linenumber": pa.array(
            rng.randint(1, 8, n).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(
            rng.randint(1, 51, n).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105_000, n), 2), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.randint(0, 11, n) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(
            np.round(rng.randint(0, 9, n) / 100.0, 2), pa.float64()),
        # flat ~1/3 'R' rate, matching the driver data's noise target
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n), pa.string()),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n), pa.string()),
        "l_shipdate": pa.array(dates, pa.timestamp("us")),
    })


def ensure_sf1_organic(out_dir: str, copies: int = 10,
                       bp_frac: float = 0.10, seed: int = 42) -> str:
    """Build the organic sf1 dataset under ``out_dir`` unless a fresh
    _READY stamp says it already exists. Returns ``out_dir``."""
    stamp = STAMP_FMT.format(copies=copies, bp_frac=bp_frac, seed=seed)
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    gseed = np.random.RandomState(seed)
    vocab = _vocab(40_000)
    zp = _zipf_p(40_000, 1.2)
    viral = _viral_docs(gseed, vocab, zp)
    centers = np.random.RandomState(seed + 7).normal(0, 3.0, (10, 64))
    builders = {
        "documents": lambda s: _documents_shard(
            s, seed, copies, bp_frac, vocab, zp, viral),
        "embeddings": lambda s: _embeddings_shard(s, seed, centers),
        "orders": lambda s: _orders_shard(s, seed, copies),
        "lineitem": lambda s: _lineitem_shard(s, seed, copies),
    }
    for t, build in builders.items():
        tdir = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for s in range(copies):
            pq.write_table(build(s), os.path.join(tdir, f"shard{s:02d}.parquet"),
                           row_group_size=100_000)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_sf1_organic")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--bp-frac", type=float, default=0.10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out = ensure_sf1_organic(args.out, args.copies, args.bp_frac, args.seed)
    # document the corpus shape (rows + distinct shingles) so the
    # bench slopes are interpretable
    import duckdb

    con = duckdb.connect()
    stats = {
        "dir": out,
        "docs": con.sql(
            f"SELECT count(*) FROM '{out}/documents.parquet/*.parquet'"
        ).fetchone()[0],
        "lineitem": con.sql(
            f"SELECT count(*) FROM '{out}/lineitem.parquet/*.parquet'"
        ).fetchone()[0],
        "distinct_3gram_shingles": con.sql(f"""
            WITH w AS (SELECT string_split(text, ' ') AS ws
                       FROM '{out}/documents.parquet/*.parquet'),
            s AS (SELECT unnest(list_transform(
                      generate_series(1, len(ws) - 2),
                      i -> array_to_string(ws[i:i+2], ' '))) AS sh
                  FROM w)
            SELECT count(DISTINCT sh) FROM s""").fetchone()[0],
        "distinct_partkey": con.sql(
            f"SELECT count(DISTINCT l_partkey) FROM "
            f"'{out}/lineitem.parquet/*.parquet'").fetchone()[0],
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
