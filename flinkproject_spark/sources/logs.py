"""Behavior-log ingestion (B9 payload; BaseLogApp's input surface).

The log event is the implicit JSON shape reconstructed in FIXTURES.md §2.1
(field reads at app/dwd/BaseLogApp.java:71,84,108-121):

    {"common": {"mid", "vc", "ch", "ar", "is_new", ...},
     "page":   {"page_id", "last_page_id", "item", "during_time", ...},
     "displays": [{"item", "item_type", ...}, ...],
     "start":  {...},
     "ts": epoch-millis}

Parsing strategy (A4 dirty channel): `from_json` in PERMISSIVE mode yields
NULL for malformed rows — the clean/dirty split is two filters over one
parse, the Spark analog of BaseLogApp's try/catch side output
(BaseLogApp.java:53-68). String->string maps keep the schema dynamic like
the reference's JSONObject access; typed projections happen per consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAP = T.MapType(T.StringType(), T.StringType())

LOG_SCHEMA = T.StructType(
    [
        T.StructField("common", _MAP),
        T.StructField("page", _MAP),
        T.StructField("displays", T.ArrayType(_MAP)),
        T.StructField("start", _MAP),
        T.StructField("ts", T.LongType()),
    ]
)


def parse_logs(raw: DataFrame, value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """(clean, dirty) from a frame of raw JSON strings.

    A row is dirty when it fails JSON parsing outright or carries no ts —
    the reference treats unparseable strings as dirty (BaseLogApp.java:62-66).
    """
    parsed = raw.withColumn("e", F.from_json(F.col(value_col), LOG_SCHEMA))
    is_dirty = F.col("e").isNull() | F.col("e.ts").isNull()
    clean = parsed.filter(~is_dirty).select("e.*")
    dirty = parsed.filter(is_dirty).select(F.col(value_col).alias("raw"))
    return clean, dirty


def events_to_log_json(events: DataFrame, corrupt_every: int | None = None) -> DataFrame:
    """Test bridge: wrap the driver `events` table into log-event JSON
    (FIXTURES.md §2.1 stand-in mapping: user_id->mid, event_type->page_id,
    value->during_time, props->page.item payload).

    `corrupt_every=k` truncates every k-th row's JSON to exercise the dirty
    channel deterministically.
    """
    j = F.to_json(
        F.struct(
            F.create_map(
                F.lit("mid"), F.col("user_id").cast("string"),
                F.lit("is_new"), F.lit("1"),
                F.lit("ch"), F.col("event_type"),
            ).alias("common"),
            F.create_map(
                F.lit("page_id"), F.col("event_type"),
                F.lit("during_time"), F.col("value").cast("string"),
                F.lit("item"), F.get_json_object("props", "$.k"),
            ).alias("page"),
            F.unix_millis(F.col("ts")).alias("ts"),
        )
    )
    out = events.select("event_id", j.alias("value"))
    if corrupt_every:
        out = out.withColumn(
            "value",
            F.when(
                F.col("event_id") % corrupt_every == 0, F.substring("value", 1, 10)
            ).otherwise(F.col("value")),
        )
    return out
