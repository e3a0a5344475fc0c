"""DWM-layer assemblies: UV dedup, bounce CEP, OrderWide, PaymentWide.

Thin compositions of the oracle-checked operator bodies; streaming callers
use the streaming.stateful twins for the two keyed-state jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flinkproject_spark.operators import joins, state


def unique_visit_app(page_events: DataFrame) -> DataFrame:
    """UniqueVisitApp (app/dwm/UniqueVisitApp.java:27-96): first event per
    device per event-time day."""
    return state.unique_visits(page_events)


def user_jump_app(page_events: DataFrame) -> DataFrame:
    """UserJumpDetailApp (app/dwm/UserJumpDetailApp.java:34-127): bounce =
    session entry with no timely follow-up (match + timeout branches)."""
    return state.detect_bounces(page_events)


def order_wide_app(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """OrderWideApp (app/dwm/OrderWideApp.java:30-243): order ⋈ detail
    interval join, then the chained broadcast dim enrichment — the fact
    rows keep their join-derived detail columns and gain the dim columns,
    mirroring bean/OrderWide.java's merge of both sides."""
    fact = joins.interval_join_orders_lineitem(orders, lineitem)
    dims = joins.order_wide(orders, customer, nation, region)
    # fact carries per-line detail; dims carry per-order enrichment.
    return fact.join(
        dims.withColumnRenamed("order_id", "o_orderkey").select(
            "o_orderkey", "user_name", "user_segment", "province_id",
            "province_name", "region_name",
        ),
        "o_orderkey",
        "left",
    )


def payment_wide_app(events: DataFrame) -> DataFrame:
    """PaymentWideApp (app/dwm/PaymentWideApp.java:22-98): payment ⋈ its
    triggering order within an asymmetric lookback interval."""
    return joins.payment_wide(events)
