"""Quickstart: optimal binning and a credit scorecard, Spark-first.

Mirrors the reference README's flow (fit -> binning table -> transform
-> scorecard -> score) over the repo's synthetic TPC-H-ish testdata.

Run:  python examples/quickstart.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from optbinning_spark import BinningProcess, OptimalBinning, get_spark
from optbinning_spark.scorecard import Scorecard


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("quickstart", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )

    # -- single-variable optimal binning (reference: OptimalBinning) --
    ob = OptimalBinning(monotonic_trend="auto")
    ob.fit(df, "l_quantity", "y")
    print("status:", ob.status)
    print(ob.binning_table.build())  # Bin / Count / WoE / IV table

    # map-only WoE transform — a pure column expression, no shuffle
    woe = ob.transform(df, "l_quantity", metric="woe")
    woe.select("l_quantity", "l_quantity_woe").show(5)

    # -- multi-variable process + scorecard (reference: Scorecard) --
    bp = BinningProcess(
        ["l_quantity", "l_extendedprice", "l_discount"],
        prebinning_method="quantile",
    )
    sc = Scorecard(
        bp,
        scaling_method="pdo_odds",
        scaling_method_params={"pdo": 20, "odds": 50,
                               "scorecard_points": 600},
    )
    sc.fit(df, "y")
    sc.information()
    print(sc.table().head(10))

    scored = sc.score(df)  # one CASE-expression column, map-only
    scored.select("l_orderkey", "score").show(5)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
