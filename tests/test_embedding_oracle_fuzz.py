"""Synthetic-corpus fuzz for the embeddings-table oracle families
(r16, extending the r15 scorecard/piecewise/docs layers — r15 verdict
ask #4's "keep extending it").

The real embeddings.parquet is well-behaved (unit-scale gaussian
mixture, no degenerate rows), so the similarity oracles could pass
vacuously on exactly the inputs that break cosine pipelines in
production: ZERO vectors (empty docs embedded as zeros -> norm 0 ->
divide-by-zero in cosine), exact duplicate vectors (argmax ties),
near-duplicates at float precision, and extreme magnitudes. Each
test feeds the SAME synthetic table to the engine query and to the
oracle SQL via a registered DuckDB parquet view and requires the
driver comparator's exact rounded equality.

NaN components are intentionally NOT fuzzed here: a NaN coordinate
poisons every dot product it touches and both engines then rank by
incomparable NaN keys — ordering becomes tie-break-undefined on both
sides without modeling either engine's NaN sort placement, which is
not a contract either side makes (the pipeline docs say to filter
non-finite embeddings upstream).
"""

from __future__ import annotations

import zlib

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

DIM = 64


def _emb_corpus(rng, n=300):
    base = rng.standard_normal((n, DIM)).astype(np.float32) * 0.3
    # exact duplicates: every 11th vector copies its predecessor
    for j in range(0, n - 1, 11):
        base[j + 1] = base[j]
    # near-duplicates at float32 resolution
    for j in range(0, n - 2, 23):
        base[j + 2] = base[j] + np.float32(1e-6)
    # zero vectors (norm 0 -> cosine division edge)
    for j in range(0, n, 29):
        base[j] = 0.0
    # extreme magnitudes (overflow/underflow in dot/norm products)
    for j in range(5, n, 37):
        base[j] *= np.float32(1e4)
    for j in range(7, n, 41):
        base[j] *= np.float32(1e-4)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [base[i] for i in range(n)],
        "label": rng.integers(0, 3, n).astype(np.int32),
    })


def _write_parquet(pdf, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array(pdf["vec_id"], pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in pdf["embedding"]],
                pa.list_(pa.float32())),
            "label": pa.array(pdf["label"], pa.int32()),
        }
    )
    pq.write_table(tbl, path)


# Families reading ONLY the embeddings table. semantic_dedup_arrow is
# the bit-parity twin of semantic_dedup and shares its oracle.
EMB_FAMILIES = [
    "embedding_topk",
    "ann_topk",
    "near_dup_cosine",
    "near_dup_cosine_bucketed",
    "ivf_topk",
    "ivf_topk_pinned",
    "ivf_topk_trained",
    "pq_topk_pinned",
    "kmeans_refined_centroids",
    "semantic_dedup",
    "semantic_dedup_arrow",
    "cluster_balanced_sample",
]


@pytest.mark.parametrize("n_datasets", [
    1, pytest.param(3, marks=pytest.mark.full)])
def test_embedding_oracles_match_on_degenerate_vectors(
        spark, tmp_path, n_datasets):
    oracles = E.oracle_sql()
    qs = E.queries()
    rng = np.random.default_rng(zlib.crc32(b"emb_family_fuzz"))
    for t in range(n_datasets):
        pdf = _emb_corpus(rng, int(rng.integers(250, 400)))
        sf = tmp_path / f"sf_e_{t}"
        sf.mkdir()
        _write_parquet(pdf, sf / "embeddings.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{sf / 'embeddings.parquet'}')")
        for name in EMB_FAMILIES:
            ora = con.execute(oracles[name]).fetchdf()
            eng = qs[name](spark, str(sf)).toPandas()
            cols = list(eng.columns)
            a = eng.sort_values(cols, na_position="first") \
                .reset_index(drop=True)
            b = ora[cols].sort_values(cols, na_position="first") \
                .reset_index(drop=True)
            assert len(a) == len(b), (t, name, len(a), len(b))
            for c in cols:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                try:
                    ok = np.array_equal(
                        np.asarray(av, dtype=float),
                        np.asarray(bv, dtype=float), equal_nan=True)
                except (ValueError, TypeError):
                    ok = (pd.isna(av) == pd.isna(bv)).all() and all(
                        (pd.isna(x) and pd.isna(yy)) or x == yy
                        for x, yy in zip(av, bv))
                assert ok, (t, name, c)
