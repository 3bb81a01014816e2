"""Same-host A/B timing probe for the cross-round movers watch.

Runs a list of registered queries from an ARBITRARY checkout of this
repo (a git worktree at a previous round's commit, or the live repo)
in a fresh process/JVM, with the exact bench.py headline protocol:
warm on sf0.001, then min-of-N reps of `query -> noop sink` with
catalog clear + gc between reps. Prints ONE line prefixed AB_RESULT
so the parent can parse it out of Spark's stdout noise.

Usage:
    python tools/ab_time_query.py CODE_DIR SF_DIR name1,name2 REPS

bench.py spawns this twice per adjudication — once pointed at the
previous round's code, once at HEAD — so a mover inversion is only
asserted when current code loses to previous code ON THE SAME HOST
(r14 verdict #1: raw cross-round wall-clock is dominated by host
drift the intra-run brackets cannot see).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def _matmul_ms():
    try:
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.standard_normal((768, 768))
        b = rng.standard_normal((768, 768))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            (a @ b).sum()
            best = min(best, time.perf_counter() - t0)
        return round(best * 1000, 2)
    except Exception:
        return None


def main():
    code_dir, sf_dir, names_csv, reps_s = sys.argv[1:5]
    names = [n for n in names_csv.split(",") if n]
    reps = int(reps_s)
    sys.path.insert(0, code_dir)
    import __spark_entry__ as entry_mod
    from optbinning_spark import get_spark

    out: dict = {"code_dir": code_dir, "cal_start_ms": _matmul_ms(),
                 "queries": {}}
    spark = get_spark("optbinning_spark_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entry_mod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    for name in names:
        # per-query guard: one failing query (a bug in the OLD
        # worktree code, or an env difference) must not kill the
        # whole side before AB_RESULT prints — the other co-grouped
        # movers' timings remain a valid adjudication
        try:
            samples = []
            for _ in range(reps):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
                del df
                gc.collect()
            spark._jvm.System.gc()
            out["queries"][name] = {"reps": samples, "min": min(samples)}
        except Exception as e:
            out["queries"][name] = {"error": str(e)[:300]}
    out["cal_end_ms"] = _matmul_ms()
    spark.stop()
    print("AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
