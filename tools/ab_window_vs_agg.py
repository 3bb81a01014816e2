"""A/B: hot-key WINDOW count vs two-phase groupBy+join in the two
n-gram pipelines (ngram_jaccard_pairs / duplicate_ngram_spans).

The window shape is one scan but routes every row of a key through one
task (no map-side combine; AQE cannot split a window partition) — the
round-5 verdict's one weak-at-100x plan. The two-phase shape costs a
second evaluation of the explode subtree but absorbs hot keys in
map-side partials and joins back with an AQE-splittable equi-join.

Runs both modes on:
  1. the organic sf1 corpus (50k docs, Zipf vocab, 10% boilerplate)
  2. a boilerplate-heavy fixture (the SAME generator at bp_frac=0.30:
     one 10-gram in 30% of docs — the license-header scenario)
and first proves value-identical output of both modes at sf0.01.

RESULT (2026-08-14, local[32], min-of-3): the WINDOW wins ~2x in both
regimes — organic sf1: jaccard 3.58 vs 6.49, spans 1.93 vs 4.40;
bp30: jaccard 3.19 vs 7.08, spans 1.79 vs 4.17. A broadcast variant
of the two-phase (anti-join on the small hot-key set) landed between
(jaccard 4.19, spans 3.38). An additional adversarial probe (600k
docs, 30% sharing a periodic boilerplate block, ~1.6M rows on the
hottest n-gram key) still ran the window 2x faster (11.0 vs 23.3).
Interpretation: the two-phase's double subtree evaluation plus
full-volume join shuffle cost more than the window's single
shuffle+sort until ONE key reaches hundreds of millions of rows —
so use_window=True is the default and two-phase is the documented
escape hatch for that corpus.

Usage: python tools/ab_window_vs_agg.py [--reps 3]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_sf1_organic import ensure_sf1_organic  # noqa: E402

from optbinning_spark import get_spark  # noqa: E402


def _time(spark, build, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        gc.collect()
    spark._jvm.System.gc()
    return round(best, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    from pyspark.sql import functions as F  # noqa: F401

    from optbinning_spark.pipeline.dedup import (
        duplicate_ngram_spans,
        ngram_jaccard_pairs,
    )

    spark = get_spark("ab_window_vs_agg")
    spark.sparkContext.setLogLevel("ERROR")

    # -- value identity at sf0.01 (both pipelines, both modes) --------
    docs001 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for fn, kw in ((ngram_jaccard_pairs, {}),
                   (duplicate_ngram_spans, {"n": 5})):
        a = sorted(map(tuple, fn(docs001, use_window=True, **kw).collect()))
        b = sorted(map(tuple, fn(docs001, use_window=False, **kw).collect()))
        assert a == b, f"{fn.__name__}: modes disagree"
    print("value-identity: OK (both pipelines, sf0.01)", file=sys.stderr)

    out = {}
    fixtures = {
        "organic_sf1_bp10": ensure_sf1_organic(
            "/tmp/spark_graft_sf1_organic"),
        "organic_sf1_bp30": ensure_sf1_organic(
            "/tmp/spark_graft_sf1_bp30", bp_frac=0.30),
    }
    for label, d in fixtures.items():
        docs = spark.read.parquet(f"{d}/documents.parquet")
        sec = {}
        for mode in (True, False):
            tag = "window" if mode else "two_phase"
            sec[f"jaccard_{tag}"] = _time(
                spark, lambda m=mode: ngram_jaccard_pairs(
                    docs, use_window=m), args.reps)
            sec[f"spans_{tag}"] = _time(
                spark, lambda m=mode: duplicate_ngram_spans(
                    docs, n=10, use_window=m), args.reps)
        out[label] = sec
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
