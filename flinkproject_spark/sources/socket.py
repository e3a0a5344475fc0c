"""TCP socket streaming source — the live-network streaming twin of the
Kafka path (B1/B3), executable in this sandbox.

The container ships neither the spark-sql-kafka connector jar nor a broker
(and has no network to fetch either), so `sources.kafka` stays
construction-only here. Spark's built-in `socket` source lives in core,
which makes it the one NON-FILE streaming source the engine can prove
end-to-end: readStream over a live TCP connection -> the SAME JSON value
parse the Kafka topic reader uses (`kafka.json_value_parser` — one code
path, so the socket test is evidence about the broker path's transform
chain, not a parallel implementation) -> any downstream operator/sink.

Reference parity: the reference's jobs consume JSON log/CDC records from
Kafka (utils/MyKafkaUtil.java:46-55, app/dwd/BaseLogApp.java:50); the
socket twin carries identical rows over TCP instead.

Production posture: the socket source is deliberately NOT a deployment
path — it keeps no offsets and cannot replay (Spark marks it
fault-intolerant), exactly the properties Kafka's offset log exists to
provide. It is the integration-test vehicle; swap `socket_json_source`
for `kafka.json_topic` + `.load()` when a broker exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from flinkproject_spark.sources.kafka import json_value_parser


def socket_reader(spark: SparkSession, host: str, port: int):
    """Configured reader for the built-in TCP source; `.load()` yields the
    (value string, timestamp) frame — the same shape the Kafka reader's
    value/timestamp projection feeds into the shared JSON parser."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .option("includeTimestamp", "true")
    )


def socket_json_source(
    spark: SparkSession,
    host: str,
    port: int,
    schema: T.StructType,
    view_name: str | None = None,
) -> DataFrame:
    """JSON-lines-over-TCP as a typed streaming DataFrame: socket reader +
    the Kafka path's `json_value_parser`. Returns the parsed stream
    (columns = schema fields + source `timestamp`)."""
    raw = socket_reader(spark, host, port).load()
    return json_value_parser(schema, view_name)(raw)
