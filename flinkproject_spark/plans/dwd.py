"""DWD-layer assemblies: BaseLogApp and BaseDBApp.

BaseLogApp (app/dwd/BaseLogApp.java:31-143): parse raw log JSON with a
dirty side channel, correct the new-visitor flag against keyed state, then
split one stream three ways (page / start / display) — displays fan out one
row per array element with the page_id injected.

BaseDBApp (app/dwd/BaseDBApp.java:33-104): decode the CDC envelope, drop
deletes, then route every row by the broadcast config table to per-table
fact topics or dim tables with column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flinkproject_spark.operators.routing import DEFAULT_RULES, RouteRule, decode_cdc_envelope, filter_deletes
from flinkproject_spark.sources.logs import parse_logs


def base_log_app(raw_logs: DataFrame) -> dict[str, DataFrame]:
    """Raw log JSON -> {page, start, display, dirty} streams.

    The is_new correction (BaseLogApp.java:73-96) is applied by the A11
    operator downstream of the split in this engine (operators.state /
    streaming.stateful) — it needs the event-keyed shape, not the raw JSON.

    Split semantics (BaseLogApp.java:100-130): a row with a `start` payload
    is a launch event; everything else is a page event; display rows are
    exploded from `displays` with the parent page_id injected (A3).
    """
    clean, dirty = parse_logs(raw_logs)
    is_start = F.col("start").isNotNull() & (F.size(F.map_keys("start")) > 0)
    start = clean.filter(is_start)
    page = clean.filter(~is_start)
    display = (
        page.filter(F.col("displays").isNotNull() & (F.size("displays") > 0))
        .select(
            "common",
            "ts",
            F.col("page")["page_id"].alias("page_id"),
            F.explode("displays").alias("display"),
        )
    )
    return {"page": page, "start": start, "display": display, "dirty": dirty}


def base_db_app(
    raw_cdc: DataFrame, rules: tuple[RouteRule, ...] = DEFAULT_RULES
) -> dict[str, DataFrame]:
    """Raw CDC envelope JSON -> {sink_table: pruned frame} routing plan.

    Returns the per-sink DataFrames; streaming callers hand the decoded
    stream to streaming.sinks.start_routed_cdc_sink instead (same rules,
    same pruning, executed inside foreachBatch).
    """
    decoded = filter_deletes(decode_cdc_envelope(raw_cdc))
    out: dict[str, DataFrame] = {}
    for r in rules:
        out[r.sink_table] = decoded.filter(
            (F.col("tableName") == r.source_table) & (F.col("type") == r.operate_type)
        ).select(*[F.col("after")[c].alias(c) for c in r.sink_columns])
    return out
