"""Per-query profile of the headline bench: splits each query's wall
time into plan CONSTRUCTION (driver-side collects, probes,
localCheckpoints that run inside ``queries()[name](spark, sf_dir)``)
vs the noop-sink WRITE, and — with the UI enabled — attributes every
Spark job to its query via job descriptions and reports the job-level
breakdown. This is the "measure first" step of the optimization guide
(§1): it tells us whether a slow query is paying for scheduled jobs
(fixed overhead per action — fewer/fused actions is the lever) or for
one big stage (per-task work / shuffle volume is the lever).

Usage: SPARK_GRAFT_UI=1 python tools/profile_headline.py [query ...]
Defaults to the full headline list. Prints one JSON line per query and
a sorted summary.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from optbinning_spark import get_spark  # noqa: E402


def _jobs(app_id):
    url = f"http://localhost:4040/api/v1/applications/{app_id}/jobs"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main():
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    spark = get_spark("profile_headline")
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    qs = entry_mod.queries()
    # warmup (mirror bench.py)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in ("optimal_binning_table", "minhash_signatures",
                       "scorecard_scores_logistic", "jaccard_pairs",
                       "wide_process_fit", "ann_topk",
                       "near_dup_cosine_bucketed"):
            try:
                qs[warm_q](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    results = {}
    for name in names:
        fn = qs[name]
        best = None
        for rep in range(3):
            sc = spark.sparkContext
            sc.setJobDescription(f"{name}|construct|{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            sc.setJobDescription(f"{name}|noop|{rep}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobDescription(None)
            sample = {"construct": round(t1 - t0, 3),
                      "noop": round(t2 - t1, 3),
                      "total": round(t2 - t0, 3), "rep": rep}
            if best is None or sample["total"] < best["total"]:
                best = sample
            spark.catalog.clearCache()
            del df
            gc.collect()
        spark._jvm.System.gc()
        # job-level attribution for the best rep
        try:
            jobs = _jobs(app_id)
            mine = [j for j in jobs
                    if (j.get("description") or "").startswith(f"{name}|")
                    and (j.get("description") or "").endswith(
                        f"|{best['rep']}")]
            mine.sort(key=lambda j: j["jobId"])
            best["jobs"] = [
                {"id": j["jobId"],
                 "phase": j["description"].split("|")[1],
                 "stages": len(j.get("stageIds", [])),
                 "tasks": j.get("numTasks"),
                 "dur_ms": _dur(j)}
                for j in mine]
            best["n_jobs"] = len(mine)
        except Exception as e:
            best["jobs_err"] = str(e)[:120]
        results[name] = best
        print(json.dumps({name: best}), flush=True)
    print("\n=== summary (sorted by total) ===")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["total"]):
        print(f"{name:28s} total={r['total']:7.3f} "
              f"construct={r['construct']:7.3f} noop={r['noop']:7.3f} "
              f"jobs={r.get('n_jobs', '?')}")
    out = os.path.join(HERE, "plans", "r17", "profile_headline.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(results, open(out, "w"), indent=1)
    print(f"written {out}")
    spark.stop()


def _dur(j):
    from datetime import datetime
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%d-%m-%Y %H:%M:%S.%f"):
        try:
            t0 = datetime.strptime(
                j["submissionTime"].replace("GMT", ""), fmt)
            t1 = datetime.strptime(
                j["completionTime"].replace("GMT", ""), fmt)
            return round((t1 - t0).total_seconds() * 1000)
        except Exception:
            continue
    return None


if __name__ == "__main__":
    main()
