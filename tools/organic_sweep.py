"""Organic-data robustness sweep: run EVERY registered query against
the organic sf1 directory (Zipf text, 200k-cardinality keys, real dup
structure) and classify the outcome — ok / missing-table (the organic
generator only writes documents/embeddings/orders/lineitem) / failed.

No operator may depend on the driver fixtures' narrow cardinality or
token distribution; a `failed` here is a real robustness bug even
though the oracle gate stays green on the stock testdata.

Usage: python tools/organic_sweep.py [dir]   (default: organic sf1)
Prints one JSON line {"ok": N, "missing_table": N, "failed": N,
"failures": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_sf1_organic import ensure_sf1_organic  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from optbinning_spark import get_spark  # noqa: E402


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else ensure_sf1_organic(
        "/tmp/spark_graft_sf1_organic")
    spark = get_spark("organic_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    ok, missing, failures = [], [], {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, d).write.format("noop").mode("overwrite").save()
            ok.append(name)
        except Exception as e:
            msg = str(e)
            if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                    or "unable to open" in msg):
                missing.append(name)
            else:
                failures[name] = msg.splitlines()[0][:160]
        finally:
            spark.catalog.clearCache()
            gc.collect()
        if (time.time() - t0) > 60:
            print(f"# slow: {name} {time.time() - t0:.0f}s",
                  file=sys.stderr)
    print(json.dumps({
        "dir": d, "n_queries": len(qs), "ok": len(ok),
        "missing_table": len(missing), "failed": len(failures),
        "missing": missing, "failures": failures,
        "wall_sec": round(time.time() - t_all, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
