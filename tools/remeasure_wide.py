"""Fresh-session min-of-5 re-measurement of wide_process_fit in both
layouts (single-file stock sf0.1 and the 32-file multi-row-group
primary layout), following the same protocol used to clear the round-6
categorical_optimal_binning anomaly: fresh JVM, warmup rep at sf0.001,
5 timed reps with cache-clear + py4j-release + System.gc between reps.

Prints one JSON line: {"single_file": {...}, "multirowgroup": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from optbinning_spark import get_spark


def _reps(spark, qs, sf_dir, n=5):
    samples = []
    for _ in range(n):
        t0 = time.time()
        df = qs["wide_process_fit"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        del df
        gc.collect()
        spark._jvm.System.gc()
    return {"reps": samples, "min": min(samples)}


def main():
    spark = get_spark("remeasure_wide")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warmup (JIT / classloading) at tiny scale
    qs["wide_process_fit"](spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()

    out = {}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out["single_file"] = _reps(spark, qs, sf_dir)

    # multi-row-group layout (the declared-primary one); reuse the
    # bench-built copy if present, else build it the same way
    import bench

    mrg = os.path.join(
        "/tmp", f"spark_graft_mrg_{os.path.basename(sf_dir.rstrip('/'))}")
    if not os.path.exists(os.path.join(mrg, "_READY")):
        bench._scale_section(spark, sf_dir, qs)  # builds + times once
    out["multirowgroup"] = _reps(spark, qs, mrg)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
