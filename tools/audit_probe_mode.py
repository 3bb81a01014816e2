"""Quantify the probe_mode="exact" audit gap (r13 verdict ask #6).

q_wide_fit_exact is the hash-checked audit twin of the production
q_wide_process_fit; the only delta is the probe: exact distinct
counts + exact percentile bucket edges vs HLL + GK approxQuantile.
The twin is a faithful witness for the production path only if the
two probes rarely produce different split proposals — and a
cardinality sitting on the HLL gate (per_var_cap * 1.1) could flip a
variable between the exact-distinct and bucketized paths, changing
splits silently.

This tool fits the SAME 16-variable BinningProcess twice per scale
(probe_mode="approx" then "exact") on the organic sf0.1 and sf1
tables and reports, per variable: identical splits (exact float
match), n_bins, and the IV delta. Results go into SCALING.md.

Usage: python tools/audit_probe_mode.py [--skip-sf1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as E
from optbinning_spark import BinningProcess, get_spark
from optbinning_spark.sources.tables import orders as _orders

VARS = E._WIDE_NUM_VARS + E._WIDE_CAT_VARS


def _wide_df(spark, sf_dir):
    li = E._lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir).drop("y")
    df = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)

    def to_days(c):
        if dict(df.dtypes)[c] == "bigint":
            return F.col(c) / F.lit(8.64e13)
        return F.datediff(
            F.to_date(F.col(c)), F.to_date(F.lit("1970-01-01"))
        ).cast("double")

    return (
        df.withColumn("l_shipdays", to_days("l_shipdate"))
        .withColumn("o_orderdays", to_days("o_orderdate"))
        .withColumn(
            "net_price",
            F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .withColumn("disc_tax", F.col("l_discount") + F.col("l_tax"))
    )


def _var_state(bp, summary_row, v):
    b = bp.get_binned_variable(v)
    if b._bin_categories is not None:
        key = repr([sorted(map(str, g)) for g in b._bin_categories])
    else:
        key = repr([float(s) for s in np.asarray(b.splits)])
    nb, iv = summary_row[v]
    return key, int(nb), float(iv)


def audit(spark, sf_dir, label):
    out = []
    fits = {}
    for mode in ("approx", "exact"):
        t0 = time.time()
        bp = BinningProcess(VARS, probe_mode=mode).fit(
            _wide_df(spark, sf_dir), "y")
        fits[mode] = (bp, time.time() - t0)
    bpa, ta = fits["approx"]
    bpe, te = fits["exact"]

    def _rows(bp):
        s = bp.summary()
        return {n: (nb, iv)
                for n, nb, iv in zip(s["name"], s["n_bins"], s["iv"])}

    rowsa, rowse = _rows(bpa), _rows(bpe)
    same = 0
    print(f"\n== {label} (approx fit {ta:.1f}s, exact fit {te:.1f}s)")
    for v in VARS:
        ka, nba, iva = _var_state(bpa, rowsa, v)
        ke, nbe, ive = _var_state(bpe, rowse, v)
        ident = ka == ke
        same += ident
        out.append((v, ident, nba, nbe, abs(iva - ive)))
        flag = "identical" if ident else "DIFFER"
        print(f"{v:18s} {flag:9s} n_bins {nba}/{nbe} "
              f"|dIV| {abs(iva - ive):.6g}")
    mx = max(r[4] for r in out)
    print(f"{label}: {same}/{len(VARS)} variables identical, "
          f"max |IV delta| {mx:.6g}")
    return out


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    audit(spark, "/root/testdata/sf0.1", "sf0.1")
    if "--skip-sf1" not in sys.argv:
        from gen_sf1_organic import ensure_sf1_organic
        sf1 = ensure_sf1_organic("/tmp/spark_graft_sf1_organic")
        audit(spark, sf1, "sf1_organic")


if __name__ == "__main__":
    main()
