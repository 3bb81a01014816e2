"""Canonical readers for the TPC-H-ish synthetic test tables
(TESTDATA.md): parquet scans plus the small normalizations every
consumer needs (binary targets, nanosecond-timestamp repair, and the
single-row-group parallelism fix).

These mirror the reference's fit source conventions (S1/S2,
binning_process.py:65-72): column pruning is left to Catalyst — each
reader returns the full table and downstream ``select``s prune the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Parallelize CPU-heavy pipelines over single-row-group parquet:
    a one-row-group file scans as ONE task regardless of cores, so a
    narrow hashing/shingling pipeline would be single-threaded; a
    cheap round-robin repartition is a measured ~5x win there. Gated
    on the file count (metadata only — no job is triggered): on a
    real cluster the input has many splits and this is a no-op. Use
    for CPU-heavy text/binary pipelines only; for cheap numeric scans
    the shuffle costs more than it buys."""
    target = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) * 2 <= target:
        return df.repartition(target)
    return df


def lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem with the binary target y = (l_returnflag = 'R')."""
    return spark.read.parquet(table_path(sf_dir, "lineitem")).withColumn(
        "y", (F.col("l_returnflag") == "R").cast("int")
    )


def orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders with the binary target y = (o_orderstatus = 'F')."""
    return spark.read.parquet(table_path(sf_dir, "orders")).withColumn(
        "y", (F.col("o_orderstatus") == "F").cast("int")
    )


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores for the hashing pipelines."""
    return spread(spark, spark.read.parquet(table_path(sf_dir, "documents")))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark reads as
    long under ``spark.sql.legacy.parquet.nanosAsLong``; convert to a
    proper timestamp at microsecond precision."""
    ev = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif ts_type is not None and ts_type != "timestamp":
        # TIMESTAMP_NTZ (or similar) is not a valid event-time column
        # for watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); all
        # consumers expect plain TIMESTAMP.
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "embeddings"))
