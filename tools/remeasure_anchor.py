"""Fresh-session min-of-5 re-measurement of the scorecard_anchor
(continuous Huber scorecard fit, BASELINE.md's second anchor), with
host calibration bracketing — the same protocol that pinned the
round-7 wide_process_fit spread to an environment shift
(tools/remeasure_wide.py): fresh JVM, warmup rep at sf0.001, 5 timed
reps with cache-clear + py4j-release + System.gc between reps,
_host_calibration before and after so a contended host is visible in
the record itself.

Prints one JSON line:
  {"anchor": {"reps": [...], "min": ...}, "calibration":
   {"start": {...}, "end": {...}}, "rows": ..., "idle_hint": bool}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from optbinning_spark import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cal_start = bench._host_calibration(sf_dir)
    spark = get_spark("remeasure_anchor")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup at tiny scale (JIT / codegen / classloading)
    warm = bench._scorecard_anchor(spark, "/root/testdata/sf0.001", reps=1)
    gc.collect()
    spark._jvm.System.gc()

    samples = []
    for _ in range(5):
        t0 = time.time()
        r = bench._scorecard_anchor(spark, sf_dir, reps=1)
        samples.append(r["rep_samples"][0])
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.5)
    cal_end = bench._host_calibration(sf_dir)
    # idle hint: matmul <= 6 ms on both brackets was the round-8
    # criterion for "near-idle host" (SCALING.md host_calibration)
    idle = bool(
        (cal_start.get("matmul_768_ms") or 99) <= 6.0
        and (cal_end.get("matmul_768_ms") or 99) <= 6.0)
    print(json.dumps({
        "anchor": {"reps": samples, "min": min(samples)},
        "warmup_sf0001": warm["sec"],
        "rows": r["rows"],
        "calibration": {"start": cal_start, "end": cal_end},
        "idle_hint": idle,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
