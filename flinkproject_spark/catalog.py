"""Table catalog over the driver-generated parquet testdata.

The reference consumes Kafka topics of JSON strings and external dim stores
(Phoenix/HBase fronted by Redis — reference: utils/DimUtil.java:13-45); this
engine's equivalent "storage layer" for batch parity testing is the parquet
star schema at /root/testdata/sf*/ (TESTDATA.md). Streaming variants replay
the same tables through Structured Streaming (flinkproject_spark.streaming).

Scale note: loading is a plain `spark.read.parquet` so Catalyst keeps
predicate pushdown / column pruning / partition pruning available — on a
real deployment these paths would be s3://.../table/ partitioned
directories and nothing here would change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    Timestamp physicals vary across driver testdata generations and both
    arrive here normalized to a session-tz (UTC) TIMESTAMP:

    - parquet TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong``
      the column arrives as a long of nanoseconds and is converted with
      integer division (``div`` — no double round-trip, which would lose
      precision above 2^53). DuckDB truncates ns->us the same way.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled``
      defaults true); cast to TIMESTAMP under the pinned UTC session zone —
      a pure type-tag change, zero arithmetic — so every downstream
      epoch-based kernel (unix_millis, window(), watermarks) keeps working.
      DuckDB reads the same bytes as naive timestamps, so both engines see
      identical wall-clock values.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so `spark.sql` queries (the A20
    'SQL over streams' surface, reference: app/dws/ProvinceStatsSqlApp.java:35-68)
    can address them by name."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
