"""CDC ingestion (B4) — Debezium-style envelope decoding + snapshot-then-stream.

The reference's FlinkCDC job (app/ods/FlinkCDC.java:33-43) tails a MySQL
binlog with `StartupOptions.initial()` — a full table snapshot first, then
incremental changes — and serializes every change as
`{database, tableName, before, after, type}` JSON
(app/function/CustomerDeserialization.java:23-85).

Spark has no binlog source; the engine consumes the *envelope*, which can
arrive from Kafka (sources.kafka), from files (this module's stand-in), or
from Delta Change Data Feed in a lakehouse deployment. The envelope decoder
itself lives in operators.routing (decode_cdc_envelope) so batch and
streaming share it.

`snapshot_then_stream` reproduces the `initial()` semantics: a batch
DataFrame of insert-typed envelopes for current state, unioned with the
live change stream — in Spark these stay two DataFrames consumed by the
same downstream code (a streaming union of a batch frame is not legal;
production runs the snapshot as batch backfill, then starts the stream
from the snapshot watermark, which is exactly what Flink CDC does
internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkproject_spark.operators.routing import CDC_ENVELOPE_SCHEMA, decode_cdc_envelope


def cdc_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Broker-less CDC stand-in: a directory of JSON-lines envelope files
    replayed as a stream, already decoded to typed columns."""
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return decode_cdc_envelope(raw)


def snapshot_envelope(table: DataFrame, database: str, table_name: str, pk_cols: list[str] | None = None) -> DataFrame:
    """Wrap a batch table's current rows as insert-typed envelopes — the
    snapshot half of `StartupOptions.initial()` (FlinkCDC.java:36).

    All values go through the string map exactly like the reference's
    all-varchar dim store (TableProcessFunction.java:76-80).
    """
    kv = []
    for c in table.columns:
        kv.extend([F.lit(c), F.col(c).cast("string")])
    return table.select(
        F.lit(database).alias("database"),
        F.lit(table_name).alias("tableName"),
        F.lit(None).cast(CDC_ENVELOPE_SCHEMA["before"].dataType).alias("before"),
        F.create_map(*kv).alias("after"),
        F.lit("insert").alias("type"),
    )


def snapshot_then_stream(
    snapshot: DataFrame, changes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """`initial()` assembly: returns (batch snapshot envelopes, change
    stream) for the caller to run as backfill + tail against the same
    downstream logic. Kept as a pair on purpose — see module docstring."""
    return snapshot, changes
