"""File-based batch/stream sources — the tested transport in this repo.

The reference's app chain hands records between layers via Kafka topics; the
same macro-dataflow here is parquet directories per "topic": each pipeline
stage writes parquet, the next reads it (batch) or readStream's it
(micro-batch file source, which is also the scalable pattern for replayable
ingestion at 100 TB: immutable files + checkpointed offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def batch_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def stream_parquet(
    spark: SparkSession, path: str, schema: T.StructType, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming file source: replays a parquet directory as micro-batches —
    the deterministic stand-in for a Kafka topic in tests."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def stream_json_lines(
    spark: SparkSession, path: str, schema: T.StructType, files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .json(path)
    )


def stream_text(spark: SparkSession, path: str, files_per_trigger: int = 1) -> DataFrame:
    """Streaming text source: one ``value`` string column per line — the
    shape a Kafka value stream presents (S1's CAST(value AS STRING))."""
    return (
        spark.readStream.option("maxFilesPerTrigger", files_per_trigger)
        .text(path)
    )
