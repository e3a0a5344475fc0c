"""DWS-layer assemblies: the four serving-table builders.

Each mirrors one reference DWS job end-to-end (union/enrich -> windowed
aggregate); the SQL-surface variant of ProvinceStats lives in
__spark_entry__.q_a20_sql_province_stats (A20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flinkproject_spark.operators import joins, windows


def visitor_stats_app(events: DataFrame) -> DataFrame:
    """VisitorStatsApp (app/dws/VisitorStatsApp.java:30-177): union the
    measure streams, then the keyed tumbling-window sum-reduce. The union
    half is relational.union_measure_streams (A5); visitor_stats windows
    the same measures directly from the typed event stream (A6)."""
    return windows.visitor_stats(events)


def product_stats_app(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """ProductStatsApp (app/dws/ProductStatsApp.java:39-339): windowed
    per-sku measures with exact distinct-order counts, then the broadcast
    dim enrichment (sku -> part, supplier -> nation)."""
    stats = windows.product_stats(lineitem)
    dims = (
        joins.product_wide(lineitem, part, supplier, nation)
        .select("sku_id", "sku_name", "tm_name", "category3_name")
        .dropDuplicates(["sku_id"])
    )
    return stats.join(dims, "sku_id", "left")


def province_stats_app(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """ProvinceStatsSqlApp (app/dws/ProvinceStatsSqlApp.java:13-82)."""
    return windows.province_stats(orders, customer, nation)


def keyword_stats_app(documents: DataFrame) -> DataFrame:
    """KeywordStatsApp (app/dws/KeywordStatsApp.java:14-88): tokenize (the
    UDTF surface, A19) -> word counts -> top-N."""
    return windows.keyword_stats(documents)


def gmv_serving(product_stats: DataFrame, top: int = 10) -> DataFrame:
    """The publisher REST query shape (A17 —
    publisher/.../ProductStatsMapper.java:26) over the DWS output: GMV per
    brand, descending, top N."""
    from pyspark.sql import functions as F

    return (
        product_stats.groupBy("tm_name")
        .agg(F.sum("order_amount").alias("order_amount"))
        .orderBy(F.desc("order_amount"), F.asc("tm_name"))
        .limit(top)
    )
