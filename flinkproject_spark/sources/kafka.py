"""Kafka source/sink builders (B1, B2, B3).

Mirrors utils/MyKafkaUtil.java: consumer with topic + group id (:46-55),
producer with fixed topic (:25-27) or per-record dynamic topic from the
row's `sinkTable` field (:29-38), and the SQL-connector DDL variant
(:63-70) which in Spark is just readStream + from_json + a temp view.

This container ships neither the spark-sql-kafka connector jar nor a
broker, so these builders are *construction-only* here: they return the
configured reader/writer and a `load()/start()` is the caller's production
step. `kafka_available()` lets tests and plans degrade to the file/replay
stand-ins (flinkproject_spark.streaming.replay) without import-time
failures.

Delivery semantics: the reference's EXACTLY_ONCE transactional producer
(MyKafkaUtil.java:29-38) maps to checkpointed offsets + at-least-once
writes in Spark's Kafka sink; document-and-dedupe downstream is the Spark
idiom (SURVEY §4 exactly-once row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SERVERS = "localhost:9092"


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_reader_options(
    topic: str,
    servers: str = DEFAULT_SERVERS,
    group_id: str | None = None,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """B1 contract — the EXACT option surface of the reference consumer
    (MyKafkaUtil.java:46-55: bootstrap servers + topic + group id), as a
    pure dict so tests pin it against golden fixtures without a broker.

    Offset posture delta vs Flink: Spark tracks offsets in the query
    checkpoint, not the consumer group — `kafka.group.id` is still set for
    broker-side ACL/quota/monitoring parity, and `startingOffsets` only
    applies on first start (checkpoint wins thereafter).
    """
    opts = {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    return opts


def kafka_reader(
    spark: SparkSession,
    topic: str,
    servers: str = DEFAULT_SERVERS,
    group_id: str | None = None,
    starting_offsets: str = "latest",
):
    """B1 — the FlinkKafkaConsumer analog (MyKafkaUtil.java:46-55).

    Returns the configured DataStreamReader; `.load()` yields the standard
    (key, value, topic, partition, offset, timestamp) frame. All options
    come from :func:`kafka_reader_options` (the contract-tested surface).
    """
    r = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        topic, servers=servers, group_id=group_id, starting_offsets=starting_offsets
    ).items():
        r = r.option(k, v)
    return r


def json_value_parser(schema: T.StructType, view_name: str | None = None):
    """The (value, timestamp) -> typed-columns projection shared by every
    JSON-over-transport source: from_json on the value payload, flatten,
    keep the source timestamp, optionally register a temp view. One parse
    path for the Kafka topic reader AND the socket twin
    (sources.socket.socket_json_source), so the executable socket test
    exercises the exact code the broker path would run."""

    def parse(raw: DataFrame) -> DataFrame:
        df = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("v"), "timestamp"
        ).select("v.*", "timestamp")
        if view_name:
            df.createOrReplaceTempView(view_name)
        return df

    return parse


def json_topic(
    spark: SparkSession,
    topic: str,
    schema: T.StructType,
    servers: str = DEFAULT_SERVERS,
    view_name: str | None = None,
):
    """B3 — the Kafka SQL-connector DDL analog (MyKafkaUtil.java:63-70):
    reader + from_json projection, optionally registered as a temp view so
    `spark.sql` addresses it like Flink's `CREATE TABLE ... WITH (kafka)`.

    Returns a function of the loaded raw frame so construction stays
    broker-free: `parse(reader.load())`.
    """
    return kafka_reader(spark, topic, servers), json_value_parser(schema, view_name)


def kafka_writer_options(
    servers: str = DEFAULT_SERVERS, topic: str | None = None
) -> dict[str, str]:
    """B2 contract — the producer option surface (MyKafkaUtil.java:25-38).
    With `topic=None` the sink routes per-record from the frame's `topic`
    column (the dynamic `sinkTable` trick); a fixed topic pins it here.

    Delivery-semantics delta vs the reference's EXACTLY_ONCE transactional
    producer (MyKafkaUtil.java:29-38): Spark's Kafka sink is at-least-once
    on top of checkpointed offsets; exactly-once OUTPUT is recovered either
    downstream (consume with dedupe on a batch-deterministic key) or by the
    batchId-keyed idempotent file sink (streaming.sinks
    .idempotent_parquet_writer, replay-tested).
    """
    opts = {"kafka.bootstrap.servers": servers}
    if topic:
        opts["topic"] = topic
    return opts


def kafka_writer(df: DataFrame, servers: str = DEFAULT_SERVERS, topic: str | None = None):
    """B2 — producer sink builder. With `topic=None` the frame must carry a
    `topic` column (per-record dynamic routing, the `sinkTable` trick at
    MyKafkaUtil.java:29-38 / BaseDBApp.java:93-99); see
    streaming.sinks.kafka_value_frame for shaping rows into (topic, value).
    All options come from :func:`kafka_writer_options`.
    """
    w = df.writeStream.format("kafka")
    for k, v in kafka_writer_options(servers=servers, topic=topic).items():
        w = w.option(k, v)
    return w
