"""Batch and streaming readers.

Reference analogs: ``sql/DataFrameReader.scala:27-55`` (readFromCsv,
readFromParquet, readFromScyllaDB) — re-expressed as thin wrappers over
``spark.read`` / ``spark.readStream`` so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, *paths: str, delimiter: str = ",",
             header: bool = True, schema: StructType | None = None) -> DataFrame:
    """CSV scan (reference: sql/DataFrameReader.scala:27-42)."""
    r = spark.read.option("header", str(header).lower()).option("delimiter", delimiter)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(list(paths))


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan, multi-path (reference: sql/DataFrameReader.scala:44-46)."""
    return spark.read.parquet(*paths)


def read_stream_parquet(spark: SparkSession, path: str, schema: StructType,
                        max_files_per_trigger: int = 1) -> DataFrame:
    """File-source change-feed tail (the binlog/WAL reader).

    A file source requires an explicit schema; maxFilesPerTrigger bounds
    micro-batch size (reference analog of the ScyllaDB incremental source,
    sql/DataFrameReader.scala:48-55, recast as a stream).
    """
    return read_stream(spark, path, schema, fmt="parquet",
                       max_files_per_trigger=max_files_per_trigger)


def read_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "parquet", max_files_per_trigger: int = 1) -> DataFrame:
    """WAL segment tail for any file format ∈ {parquet, orc, json, csv}.

    Debezium-style deployments often land change events as JSON lines;
    the schema projects each record the same way regardless of segment
    encoding, so the rest of the pipeline is format-agnostic.
    """
    r = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", str(max_files_per_trigger))
         .option("recursiveFileLookup", "true"))
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        return r.orc(path)
    if fmt == "json":
        return r.json(path)
    if fmt == "csv":
        return r.option("header", "true").csv(path)
    if fmt == "text":
        # raw line tail (one envelope string per row, column `value`) —
        # the input to sources/debezium.decode_debezium
        return r.text(path)
    raise ValueError(f"unsupported WAL segment format: {fmt!r}")
