"""Config-driven dynamic routing + CDC envelope handling (A15, A16, B4, B6).

The reference's BaseDBApp consumes a MySQL-CDC stream of row changes wrapped
in a Debezium-style envelope `{database, tableName, before, after, type}`
(produced by app/function/CustomerDeserialization.java:23-85), drops
deletes, and routes each row by a *broadcast config table* (`table_process`:
sourceTable, operateType, sinkType, sinkTable, sinkColumns, sinkPk —
bean/TableProcess.java:11-30) to either a per-table Kafka topic or a
Phoenix dim table, pruning columns per config
(app/dwd/BaseDBApp.java:33-104, app/function/TableProcessFunction.java:44-175).

Spark design (SURVEY §4 custom-work item 3): the config is a small
DataFrame/dict re-resolved per micro-batch; routing = join-with-config (or
per-route filtered writes inside foreachBatch); column pruning = a plain
`select`, which Catalyst then pushes all the way into the scan. Unknown
(table, type) combos are dropped, matching TableProcessFunction.java:146-152.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class RouteRule:
    """One `table_process` row (bean/TableProcess.java:11-30)."""

    source_table: str
    operate_type: str  # insert | update | delete
    sink_type: str  # "kafka" (fact) | "hbase" (dim)
    sink_table: str
    sink_columns: tuple[str, ...]  # the sinkColumns CSV, parsed
    sink_pk: str = "id"


# The in-repo stand-in for the MySQL table_process config (FIXTURES.md §2.2).
DEFAULT_RULES: tuple[RouteRule, ...] = (
    RouteRule("orders", "insert", "kafka", "dwd_order_info",
              ("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"), "o_orderkey"),
    RouteRule("orders", "update", "kafka", "dwd_order_update",
              ("o_orderkey", "o_orderstatus", "o_totalprice"), "o_orderkey"),
    RouteRule("customer", "insert", "hbase", "dim_user_info",
              ("c_custkey", "c_name", "c_mktsegment"), "c_custkey"),
)


CDC_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("type", T.StringType()),
    ]
)


def decode_cdc_envelope(raw_json: DataFrame, value_col: str = "value") -> DataFrame:
    """B4 — parse the Debezium-style envelope JSON into typed columns.

    Matches the shape CustomerDeserialization.java:23-85 emits. `before` and
    `after` stay as string->string maps (the reference's dim store is
    all-varchar — TableProcessFunction.java:76-80).
    """
    return raw_json.select(
        F.from_json(F.col(value_col), CDC_ENVELOPE_SCHEMA).alias("e")
    ).select("e.database", "e.tableName", "e.before", "e.after", "e.type")


def filter_deletes(cdc: DataFrame) -> DataFrame:
    """A2 — BaseDBApp.java:56-62: keep rows whose after-image is non-empty
    and whose type is not delete."""
    return cdc.filter((F.col("type") != "delete") & F.col("after").isNotNull())


def route(df: DataFrame, table: str, op: str, rules: tuple[RouteRule, ...] = DEFAULT_RULES) -> DataFrame | None:
    """A15+A16 — look up the (sourceTable, operateType) rule and apply its
    column pruning; None when no rule matches (row dropped + logged in the
    reference — TableProcessFunction.java:146-152)."""
    for r in rules:
        if r.source_table == table and r.operate_type == op:
            return df.select(*r.sink_columns)
    return None


def route_cdc_batch(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    ops: dict[str, str] | None = None,
    rules: tuple[RouteRule, ...] = DEFAULT_RULES,
) -> dict[str, DataFrame]:
    """Fan a batch of per-table changes out to their configured sinks.

    Returns {sink_table: pruned DataFrame}. In streaming this body runs
    inside foreachBatch: config re-read per micro-batch, writes fanned out
    by sinkTable value (SURVEY §7 delta #6 — Spark cannot add sinks to a
    running query, so routing happens inside the batch function).
    """
    ops = ops or {}
    out: dict[str, DataFrame] = {}
    for r in rules:
        if r.source_table not in tables:
            continue
        if ops.get(r.source_table, "insert") != r.operate_type:
            continue
        out[r.sink_table] = tables[r.source_table].select(*r.sink_columns)
    return out


def routed_counts(tables: dict[str, DataFrame], rules: tuple[RouteRule, ...] = DEFAULT_RULES) -> DataFrame:
    """Auditable summary of the routing config applied to a batch: per sink,
    the row count and the pruned column list (for oracle comparison)."""
    spark = next(iter(tables.values())).sparkSession
    parts = []
    for r in rules:
        if r.source_table not in tables:
            continue
        pruned = tables[r.source_table].select(*r.sink_columns)
        parts.append(
            pruned.agg(F.count("*").alias("ct")).select(
                F.lit(r.sink_table).alias("sink_table"),
                F.lit(r.sink_type).alias("sink_type"),
                F.lit(",".join(r.sink_columns)).alias("sink_columns"),
                "ct",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def upsert_parquet(df: DataFrame, path: str, pk: str) -> None:
    """B6 — dim upsert sink (Phoenix `upsert into` at DimSinkFunction.java:68-77).

    Parquet has no MERGE; last-writer-wins per pk via read-union-dedup and
    partition overwrite. On Delta this is a one-line MERGE INTO; the engine
    keeps the same call signature.
    """
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path)
        merged = df.unionByName(existing, allowMissingColumns=True).dropDuplicates([pk])
    except Exception:
        merged = df
    merged.write.mode("overwrite").parquet(path + "_new")
    # atomic-ish swap left to the caller/filesystem in tests; real deployments use Delta


# ---------------------------------------------------------------------------
# SCD2 dimension versioning (beyond the reference's SCD1 upsert)
# ---------------------------------------------------------------------------
def scd2_history(
    updates: DataFrame, key: str, ts: str, attrs: list[str]
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    stream: one row per version with [valid_from, valid_to) bounds and a
    dense version number; the current version has valid_to = NULL.

    The reference's dim sink overwrites in place (SCD1 upsert —
    DimSinkFunction.java:21-77), losing history; SCD2 is what makes the
    as-of join (joins.asof_join) able to reconstruct any past state.
    One window over (key ORDER BY ts): valid_to = lead(valid_from) —
    a single shuffle, no self-join. Input must be unique per (key, ts);
    pre-aggregate (e.g. last change per day) to guarantee it.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts)
    return updates.select(
        F.col(key),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        *attrs,
    )
