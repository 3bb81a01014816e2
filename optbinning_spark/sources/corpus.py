"""Text-corpus sources/sinks beyond the parquet test tables.

Real training corpora arrive as JSONL (one document object per line —
the interchange format of every public text dataset) or as compressed
text shards. These readers wrap ``spark.read.json`` with the schema
ENFORCED up front instead of inferred:

- schema inference on JSON costs a full extra pass over the data — at
  100 TB that is a second scan before any work starts;
- a corrupt or schema-drifting shard should surface as a flagged row,
  not silently retype a column for the whole read.

Malformed lines land in ``_corrupt_record`` under PERMISSIVE mode
(default) so ingest can quarantine them; ``mode="FAILFAST"`` makes a
single bad line abort the read instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the minimal curation-pipeline document contract; extra JSON keys are
# simply not read (column pruning applies at the parser level)
DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
])


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read a JSONL document corpus with an enforced schema (no
    inference pass). Under PERMISSIVE mode the returned frame carries
    a ``_corrupt_record`` column holding the raw line for any row
    that failed to parse — filter it into a quarantine sink rather
    than dropping silently."""
    schema = schema or DOCUMENT_SCHEMA
    if mode == "PERMISSIVE" and "_corrupt_record" not in schema.names:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())])
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    partitions: int | None = None,
    compression: str = "gzip",
) -> None:
    """Write a document frame as compressed JSONL shards. One output
    file per partition — size shards with ``partitions`` (coalesce,
    no shuffle, when reducing; repartition when growing) so the shard
    count matches the downstream reader's parallelism."""
    out = df
    if partitions is not None:
        n = df.rdd.getNumPartitions()
        out = (df.coalesce(partitions) if partitions < n
               else df.repartition(partitions))
    out.write.mode("overwrite").option("compression", compression).json(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined): quarantined
    rows are those that failed to parse (non-null _corrupt_record) or
    lack the contract's required fields."""
    bad = F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull() \
        | F.col("text").isNull()
    clean = df.filter(~bad).drop("_corrupt_record")
    return clean, df.filter(bad)


def quarantine_metrics(df: DataFrame) -> DataFrame:
    """Per-input-file quarantine metrics for a PERMISSIVE JSONL read:
    one row per source file with total / parse-failed / missing-required
    -field / quarantined counts, so a bad upstream shard is identified
    by NAME instead of showing up only as a corpus-wide drop rate.

    One bounded aggregation (output cardinality = number of input
    files); ``input_file_name()`` is a task-local constant, so the
    grouping adds no extra scan. Call on the frame as returned by
    :func:`read_jsonl_corpus` (before joins, which lose file lineage).
    """
    bad_parse = F.col("_corrupt_record").isNotNull()
    # rows that parsed but violate the document contract
    missing_req = (~bad_parse) & (
        F.col("doc_id").isNull() | F.col("text").isNull())
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("rows"),
            F.sum(bad_parse.cast("long")).alias("corrupt_rows"),
            F.sum(missing_req.cast("long")).alias("missing_field_rows"),
        )
        .withColumn(
            "quarantined_rows",
            F.col("corrupt_rows") + F.col("missing_field_rows"))
        .orderBy("file")
    )
