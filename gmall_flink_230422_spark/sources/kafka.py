"""Kafka source/sink factories (SURVEY §2.1 S1-S2, S6-S9).

Mirrors R/utils/MyKafkaUtil.java's factory role: one place that turns
(topic, group) into a stream of string records and back. No broker exists in
the test container, so these builders are exercised for plan construction
only; the file/memory sources in ``sources.files`` provide the tested
streaming path with identical downstream semantics.

Semantics mapping:
  - getKafkaConsumer (MyKafkaUtil.java:21-50, null-safe deserializer) →
    readStream.format("kafka") + CAST(value AS STRING); Kafka tombstones
    (null value) become null strings, filtered by the caller exactly where
    the reference's custom deserializer returned null.
  - getKafkaProducer at-least-once / EXACTLY_ONCE (:52-69) → writeStream
    with checkpointLocation; Spark's replay + idempotent-by-batch sink is
    the engine's exactly-once story.
  - upsert-kafka (:91-100) → sinks.upsert_latest semantics on read
    (changelog compaction = latest row per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_SERVER = "localhost:9092"  # reference: hadoop102:9092 (MyKafkaUtil.java:19)


def kafka_source(
    spark: SparkSession,
    topic: str,
    group_id: str,
    servers: str = KAFKA_SERVER,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: Kafka topic → streaming DataFrame of string values."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("kafka.group.id", group_id)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_sink(
    df: DataFrame,
    topic: str,
    checkpoint_dir: str,
    servers: str = KAFKA_SERVER,
    exactly_once: bool = True,
):
    """S6/S7: string-value DataFrame → Kafka topic — starts the query and
    returns the StreamingQuery (same contract as sinks.fan_out_sink).

    ``exactly_once`` maps to the reference's transactional producer
    (MyKafkaUtil.java:21-60): Spark's Kafka sink is at-least-once on replay,
    so we enable the idempotent producer (dedup within a producer session)
    and rely on checkpoint replay + downstream offset-dedup for the full EO
    contract — documented in SURVEY §2.1 S7. Untestable in this sandbox (no
    broker); plan construction + option wiring are what the unit tests cover
    via ``kafka_sink_writer``.
    """
    return kafka_sink_writer(df, topic, checkpoint_dir, servers, exactly_once).start()


def kafka_sink_writer(
    df: DataFrame,
    topic: str,
    checkpoint_dir: str,
    servers: str = KAFKA_SERVER,
    exactly_once: bool = True,
):
    """Unstarted writer builder behind :func:`kafka_sink` (testable without a
    broker: options/plan can be inspected before ``.start()``)."""
    value = df["value"] if "value" in df.columns else F.to_json(F.struct(*df.columns))
    writer = (
        df.select(value.cast("string").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    if exactly_once:
        writer = writer.option("kafka.enable.idempotence", "true")
    return writer
