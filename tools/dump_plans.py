"""Dump .explain("formatted") for named queries to files.

Usage: python tools/dump_plans.py CODE_DIR OUT_DIR SUFFIX name1,name2,...

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query, using the
queries() registry of the __spark_entry__ in CODE_DIR. Run once
against a worktree of the previous round's commit (suffix "before")
and once against HEAD (suffix "after") to produce the plan-diff
evidence for the optimization round.
"""

from __future__ import annotations

import os
import sys


def main():
    code_dir, out_dir, suffix, names = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4].split(","))
    sys.path.insert(0, code_dir)
    import __spark_entry__ as entry_mod
    from optbinning_spark import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
