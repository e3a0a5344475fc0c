"""Watermarked streaming forms of the DWS/DWM computations.

Each function takes a *streaming* DataFrame (from the replay harness or a
Kafka source) and applies the SAME DataFrame-building code as the batch
operators — `withWatermark` + heartbeat filtering is the only streaming
delta. That sharing is the test strategy (SURVEY §5): the batch bodies are
oracle-checked against DuckDB, and replay tests check streaming == batch.

Heartbeat handling: sentinel rows are NOT filtered before the watermark —
Catalyst pushes a deterministic `user_id != -1` straight through the
EventTimeWatermark node into the parquet scan, the row group gets skipped
(min=max=-1 statistics), and the watermark never advances. Instead the
sentinel is *intrinsically harmless*: its far-future timestamp puts it in a
tumbling window whose end is always beyond the final watermark
(end > hb_ts >= hb_ts - delay), so append mode never emits it; the stateful
operators skip the sentinel key inside the state function; pass-through
operators filter it AFTER the stateful/dedup node (`drop_heartbeats`).

A7/A6 distinct counts: Structured Streaming forbids `countDistinct` in a
streaming aggregation, so the streaming twins use
`size(collect_set(...))` — exact, same value, watermark-bounded state.
(`approx_count_distinct` stays the documented 100 TB valve; at that scale
the collect_set per (window,key) cell is the memory hazard.)

Watermark delays mirror the reference's bounded-disorder choices
(UserJumpDetailApp.java:57-65: 1 s; VisitorStatsApp.java:117-124: 11 s) but
scaled to the testdata's minute-granular event spacing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flinkproject_spark import functions as K
from flinkproject_spark.operators import joins, windows
from flinkproject_spark.streaming.replay import drop_heartbeats

DEFAULT_DELAY = "10 minutes"


def watermarked_events(events: DataFrame, delay: str = DEFAULT_DELAY) -> DataFrame:
    """Standard prologue for every events-driven streaming job (A13).

    No heartbeat filter here — see the module docstring: the sentinel must
    reach the EventTimeWatermark node, and it cannot leak into any
    append-mode window output anyway.
    """
    return events.withWatermark("ts", delay)


def with_input_metrics(events: DataFrame, name: str = "input_metrics") -> DataFrame:
    """Attach per-micro-batch observability (`df.observe`): input row
    count, sentinel count, and max event time — surfaced in every
    StreamingQueryProgress under observedMetrics[name] with zero extra
    passes (the metrics ride the existing scan). The production analog of
    the reference's console-print debugging (BaseLogApp.java:132-134),
    machine-readable."""
    return events.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("user_id") == -1, 1)).alias("n_heartbeats"),
        F.max("ts").alias("max_event_time"),
    )


# ---------------------------------------------------------------------------
# A6 — VisitorStats as a streaming query (VisitorStatsApp.java:127-168)
# ---------------------------------------------------------------------------
def visitor_stats_stream(events: DataFrame, delay: str = DEFAULT_DELAY) -> DataFrame:
    return windows.visitor_stats(watermarked_events(events, delay))


def visitor_stats_4d_stream(events: DataFrame, delay: str = DEFAULT_DELAY) -> DataFrame:
    """The reference's FULL 4-dim VisitorStats as a streaming pipeline
    (VisitorStatsApp.java:127-168): stateful is_new enrichment
    (keyed first-day state, the BaseLogApp correction) CHAINED into the
    (window x ar x ch x vc x is_new) aggregate — two stateful operators in
    one query, which Spark supports in append mode with the watermark
    re-declared on the enriched output's event-time column.

    The heartbeat advances the global watermark at the source node even
    though the state fn drops the sentinel row, so every real window closes
    during replay.
    """
    from flinkproject_spark.streaming import stateful

    wm = watermarked_events(events, delay)
    enriched = stateful.enrich_is_new_stream(wm).withWatermark("ts", delay)
    return windows.visitor_4d_agg(windows.with_visitor_dims(enriched))


def retention_cohorts_stream(events: DataFrame, delay: str = DEFAULT_DELAY) -> DataFrame:
    """Retention cohorts as a COMPLETE-output-mode streaming aggregate —
    the serving-table shape where every trigger republishes the whole
    (small) result: stateful first-day enrichment chains into an
    unwindowed (cohort, offset) aggregate with the streaming-legal exact
    distinct (size(collect_set)). Cohort state is bounded by (days x
    offsets), not by users — the per-user state lives in the enrichment
    operator. Run the sink with outputMode='complete'."""
    from flinkproject_spark.streaming import stateful
    from flinkproject_spark.streaming.replay import HEARTBEAT_ID

    wm = watermarked_events(events, delay)
    enriched = stateful.enrich_is_new_stream(wm).filter(
        F.col("user_id") != HEARTBEAT_ID  # post-stateful filter: does not push
    )
    agg = (
        enriched.select(
            "user_id",
            F.col("first_dt").alias("cohort_dt"),
            F.datediff(F.to_date("ts"), F.to_date("first_dt")).alias("day_offset"),
        )
        .groupBy("cohort_dt", "day_offset")
        .agg(F.size(F.collect_set("user_id")).cast("bigint").alias("active_users"))
    )
    return agg.select(
        "cohort_dt", F.col("day_offset").cast("bigint").alias("day_offset"), "active_users"
    )


# ---------------------------------------------------------------------------
# A7 — windowed exact distinct users, streaming-legal form
# ---------------------------------------------------------------------------
def window_distinct_users_stream(
    events: DataFrame, duration: str = "1 hour", delay: str = DEFAULT_DELAY
) -> DataFrame:
    ev = watermarked_events(events, delay)
    agg = ev.groupBy(F.window("ts", duration)).agg(
        F.size(F.collect_set("user_id")).cast("bigint").alias("uv_ct"),
        F.count("*").alias("pv_ct"),
    )
    return agg.select(
        K.ts_to_str(F.col("window.start")).alias("stt"),
        K.ts_to_str(F.col("window.end")).alias("edt"),
        "uv_ct",
        "pv_ct",
    )


# ---------------------------------------------------------------------------
# A8 — PaymentWide stream-stream interval self-join (PaymentWideApp.java:77-85)
# ---------------------------------------------------------------------------
def payment_wide_stream(
    events: DataFrame, hours_before: int = 24, delay: str = DEFAULT_DELAY
) -> DataFrame:
    """Both join inputs derive from one watermarked source; the equi-key
    (user) + time-range predicate lets Spark bound each side's join state to
    the interval width plus the watermark delay — the exact analog of
    Flink's interval-join state machine (SURVEY §4 join-strategy row)."""
    return joins.payment_wide(watermarked_events(events, delay), hours_before)


# ---------------------------------------------------------------------------
# A9 — stream-static broadcast enrichment + windowed agg (ProvinceStats live)
# ---------------------------------------------------------------------------
def province_stats_stream(
    orders_stream: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    duration_days: int = 365,
    delay: str = "1 day",
) -> DataFrame:
    """The reference's core enrichment pattern live: a streaming fact joined
    to *static* dim snapshots via broadcast (the whole DimAsyncFunction +
    Redis apparatus — OrderWideApp.java:126-231 — reduced to a hash probe),
    then the windowed province aggregate.

    Dim-freshness contract (measured, r10): the static DataFrames passed
    here are snapshots AS OF STREAM CONSTRUCTION — a stream-static join
    pins the dim's parquet file listing in the plan, so an overwrite
    mid-query serves stale rows and then fails with FileNotFoundException
    once the old part files vanish. The reference instead invalidates its
    Redis cache on dim update (DimSinkFunction.java:49-51); the Spark twin
    of that freshness guarantee is sinks.dim_enriching_writer, which
    re-reads + re-broadcasts the dim INSIDE foreachBatch (update between
    micro-batches visible in the very next batch — replay-tested in
    test_dim_update_mid_replay_visible_next_batch). Use THIS job when dims
    are release-pinned; use the writer when dims churn under the stream.

    Streaming-legal distinct: `size(collect_set(...))` replaces the batch
    twin's countDistinct (same exact value). Column-compatible with
    operators.windows.province_stats for replay parity tests.
    """
    # watermark columns must be TIMESTAMP (not NTZ); session tz is pinned
    # UTC so the cast is wall-clock preserving
    orders_stream = orders_stream.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    wm = orders_stream.withWatermark("o_orderdate", delay)
    enriched = wm.join(
        F.broadcast(customer), wm.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    agg = (
        enriched.groupBy(
            F.window("o_orderdate", f"{duration_days} days"),
            F.col("n_nationkey").alias("province_id"),
            F.col("n_name").alias("province_name"),
        )
        .agg(
            K.money_sum("o_totalprice").alias("order_amount"),
            F.size(F.collect_set("o_orderkey")).cast("bigint").alias("order_count"),
        )
    )
    return agg.select(
        K.ts_to_str(F.col("window.start")).alias("stt"),
        K.ts_to_str(F.col("window.end")).alias("edt"),
        "province_id",
        "province_name",
        "order_amount",
        "order_count",
    )


# ---------------------------------------------------------------------------
# A8 — stream-stream interval join on two independent streams (OrderWide)
# ---------------------------------------------------------------------------
def interval_join_stream(
    orders_stream: DataFrame,
    lineitem_stream: DataFrame,
    days_after: int = 30,
    delay: str = "1 day",
) -> DataFrame:
    """orders ⋈ lineitem as two watermarked streams — the true streaming
    form of OrderWideApp's interval join (OrderWideApp.java:99-107): the
    equi-key plus the time-range predicate let Spark bound both sides'
    join state to interval width + watermark delay. Inner-join matches emit
    eagerly (no watermark wait), so replay output equals the batch join.

    Replay note: heartbeat sentinels (key -1) must be dropped from the
    BATCH output, never in the streaming plan — a deterministic filter on
    the join key pushes through the join and the EventTimeWatermark into
    the scan (the sharp edge documented at module level), silently removing
    the heartbeat before it can advance the watermark. The inner join then
    still matches (eager emission) but state stops evicting; the outer
    variant loses its null emissions entirely.
    """
    o = orders_stream.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    ).withWatermark("o_orderdate", delay)
    l = lineitem_stream.withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp")
    ).withWatermark("l_shipdate", delay)
    from flinkproject_spark.operators.joins import interval_join_orders_lineitem

    return interval_join_orders_lineitem(o, l, days_after=days_after)


# ---------------------------------------------------------------------------
# A6+A7 — ProductStats as a streaming query (ProductStatsApp.java:215-261)
# ---------------------------------------------------------------------------
def product_stats_stream(
    lineitem_stream: DataFrame, duration_days: int = 30, delay: str = "1 day"
) -> DataFrame:
    """Per-sku windowed measures with streaming-legal exact distinct-order
    counts; column-compatible with operators.windows.product_stats."""
    li = lineitem_stream.withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp")
    ).withWatermark("l_shipdate", delay)
    agg = (
        li.groupBy(
            F.window("l_shipdate", f"{duration_days} days"),
            F.col("l_partkey").alias("sku_id"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sku_num"),
            F.sum(K.revenue("l_extendedprice", "l_discount")).cast("double").alias("order_amount"),
            F.size(F.collect_set("l_orderkey")).cast("bigint").alias("order_ct"),
            F.count("*").alias("line_ct"),
        )
    )
    return agg.select(
        K.ts_to_str(F.col("window.start")).alias("stt"),
        K.ts_to_str(F.col("window.end")).alias("edt"),
        "sku_id", "sku_num", "order_amount", "order_ct", "line_ct",
    )


# ---------------------------------------------------------------------------
# Session windows as a streaming query (engine addition; watermark evicts
# closed-session state, heartbeat sessions never close -> never emit)
# ---------------------------------------------------------------------------
def session_stats_stream(
    events: DataFrame, gap_min: int = 30, delay: str = DEFAULT_DELAY
) -> DataFrame:
    return windows.session_stats(watermarked_events(events, delay), gap_min)


# ---------------------------------------------------------------------------
# A20 — SQL over a streaming dynamic table (ProvinceStatsSqlApp.java:35-68)
# ---------------------------------------------------------------------------
def sql_visitor_stats_stream(
    events_stream: DataFrame,
    duration: str = "10 minutes",
    delay: str = DEFAULT_DELAY,
    view: str = "events_dyn",
) -> DataFrame:
    """Flink's `CREATE TABLE ... WITH (kafka)` + `TUMBLE` SQL surface: the
    watermarked stream registers as a temp view and plain `spark.sql` with
    `window()` grouping runs against it — the result is itself a streaming
    DataFrame (dynamic-table semantics, SURVEY §1.1-2).

    `size(collect_set())` is the streaming-legal exact distinct (the SQL
    `count(distinct)` at ProvinceStatsSqlApp.java:57)."""
    spark = events_stream.sparkSession
    watermarked_events(events_stream, delay).createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
               date_format(window.end,   'yyyy-MM-dd HH:mm:ss') AS edt,
               event_type,
               CAST(size(collect_set(user_id)) AS BIGINT) AS uv_ct,
               COUNT(*) AS pv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        FROM {view}
        GROUP BY window(ts, '{duration}'), event_type
    """)


# ---------------------------------------------------------------------------
# A10 built-in approximation — dropDuplicates dedup (vs stateful exact twin)
# ---------------------------------------------------------------------------
def unique_visits_dropdup_stream(events: DataFrame, delay: str = DEFAULT_DELAY) -> DataFrame:
    """The one-line engine form of UV dedup: watermark + dropDuplicates on
    (user, day). Emits ONE arbitrary row per key-day (not necessarily the
    first — that precision needs stateful.unique_visits_stream); state is
    dropped once the watermark passes the day, the built-in analog of the
    reference's 24 h TTL (UniqueVisitApp.java:62-66)."""
    ev = watermarked_events(events, delay).withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    deduped = ev.dropDuplicates(["user_id", "dt"])
    return drop_heartbeats(deduped).select(
        "event_id", K.ts_to_str("ts").alias("ts"), "user_id", "dt", "event_type"
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) windows, streaming form — windows.sliding_visitor_stats
# with the streaming-legal exact distinct (size(collect_set), per A7)
# ---------------------------------------------------------------------------
def sliding_visitor_stats_stream(
    events: DataFrame,
    length: str = "2 hours",
    slide: str = "1 hour",
    delay: str = DEFAULT_DELAY,
) -> DataFrame:
    ev = watermarked_events(events, delay)
    agg = ev.groupBy(F.window("ts", length, slide), "event_type").agg(
        F.count("*").alias("pv_ct"),
        F.size(F.collect_set("user_id")).cast("bigint").alias("uv_ct"),
        K.money_sum("value").alias("val_sum"),
    )
    return windows._window_bounds(agg)


def interval_join_outer_stream(
    orders_stream: DataFrame,
    lineitem_stream: DataFrame,
    days_after: int = 7,
    delay: str = "1 day",
) -> DataFrame:
    """Left-outer interval join as two watermarked streams: matches emit
    eagerly; unmatched orders emit with nulls once the watermark passes the
    interval end (the global watermark is the min across inputs, so both
    replay heartbeats must land). Column-compatible with
    operators.joins.interval_join_outer.

    Sentinel rows are NOT filtered here — see interval_join_stream's replay
    note: an in-plan key filter would push into the scan and suppress the
    heartbeat, and outer-join null emissions depend on the final watermark.
    Callers drop key -1 rows from the batch output."""
    o = orders_stream.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    ).withWatermark("o_orderdate", delay)
    l = lineitem_stream.withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp")
    ).withWatermark("l_shipdate", delay)
    from flinkproject_spark.operators.joins import interval_join_outer

    return interval_join_outer(o, l, days_after=days_after)
