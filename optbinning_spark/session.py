"""SparkSession factory tuned for this engine.

Local test posture: local[N] with shuffle partitions ~ cores. The same
settings (AQE on, Arrow on, UTC) are what we'd ship on a 1000-executor
cluster; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "optbinning_spark", cpus: int | None = None):
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long and convert at the query layer
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[N] runs all N task threads inside the driver JVM: at 32
        # threads an 8g heap GC-thrashes on aggregation-heavy fits
        # (measured: repeated 16-variable fits degraded 9s -> 40s from
        # GC pressure alone; a forced GC restored them). Size the heap
        # to the machine; on a real cluster executors get their own
        # memory and this knob is the driver only.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # the generated-class cache defaults to 100 entries; a session
        # running this engine's full query surface (fits, transforms,
        # dedup, ANN) churns through that and re-Janino-compiles the
        # big fit stages (measured: the 16-variable fit reads ~2s
        # slower after ~20 other queries ran). 1000 entries keeps every
        # stage of a long analytics session compiled once.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # UI off by default (bench hygiene: no listener/HTTP overhead);
        # measurement tools that read the REST metrics API
        # (tools/measure_cc_scale.py) export SPARK_GRAFT_UI=1
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") else "false")
        .getOrCreate()
    )
