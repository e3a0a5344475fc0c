"""Join operators (SURVEY.md §2 A8, A9) — the DWM layer.

Two join families in the reference:

1. **Interval joins** — event-time range equi-joins with inclusive bounds
   (order_info ⋈ order_detail within ±5 s, payment ⋈ order_wide within
   [-15 min, +5 s] — reference: app/dwm/OrderWideApp.java:99-107,
   app/dwm/PaymentWideApp.java:77-85). Spark: equi-join + BETWEEN range
   predicate; in streaming the same expression with watermarks bounds state.

2. **Dimension enrichment** — per-key async lookups against Phoenix/HBase
   with a Redis cache and a 60 s timeout (reference:
   app/function/DimAsyncFunction.java:16-69, utils/DimUtil.java:13-45,
   utils/ThreadPoolUtil.java:14-38 — ~300 LoC of machinery). Spark replaces
   the whole apparatus with **broadcast hash joins**: the dim snapshot ships
   to every executor once per plan, lookups become in-memory hash probes,
   and null-on-miss left-join semantics match DimAsyncFunction.java:49-51.

Scale notes: the fact-side join key (order id) is near-uniform, so the
shuffle for any non-broadcast join is skew-safe; AQE skew-join splitting is
enabled in the session for the residual cases. Dim tables at 100 TB scale
stay broadcastable (dims are MBs, facts are TBs) — exactly why the
reference needed a cache and Spark doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flinkproject_spark import functions as K


# ---------------------------------------------------------------------------
# A8 — interval join (inclusive bounds, per SURVEY §7 delta #2)
# ---------------------------------------------------------------------------
def interval_join_orders_lineitem(
    orders: DataFrame, lineitem: DataFrame, days_before: int = 0, days_after: int = 30
) -> DataFrame:
    """order ⋈ line-detail on key + event-time interval.

    Mirrors OrderWideApp's `keyBy(id) intervalJoin keyBy(order_id)
    .between(-5s, +5s)` (app/dwm/OrderWideApp.java:99-107) with inclusive
    bounds: l_shipdate ∈ [o_orderdate - days_before, o_orderdate + days_after],
    both ends inclusive (Flink `between` is inclusive — SURVEY §7 delta #2).

    The equi-key (l_orderkey = o_orderkey) drives the shuffle; the range
    predicate is evaluated post-probe, so this is a plain shuffled hash/merge
    join, NOT a cartesian range join.

    The bounds use timestamp INTERVAL arithmetic, not date_add: date_add
    truncates to DATE, which both shifts semantics for intra-day timestamps
    and defeats StreamingJoinHelper's state-watermark extraction — with
    intervals the streaming form of this join evicts state as the watermark
    advances instead of buffering forever.
    """
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate >= orders.o_orderdate - F.expr(f"INTERVAL {days_before} DAYS"))
            & (lineitem.l_shipdate <= orders.o_orderdate + F.expr(f"INTERVAL {days_after} DAYS")),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "l_linenumber",
            "l_partkey",
            K.money("l_extendedprice").cast("double").alias("order_price"),
            F.col("l_quantity").alias("sku_num"),
            "l_shipdate",
        )
    )


# ---------------------------------------------------------------------------
# A9 — chained broadcast dimension enrichment (OrderWide shape)
# ---------------------------------------------------------------------------
def order_wide(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    broadcast_growing_dims: bool = True,
) -> DataFrame:
    """OrderWide assembly: fact ⋈ user dim ⋈ province dim chain.

    The reference chains 5 async dim lookups (user, province, sku, spu,
    trademark — app/dwm/OrderWideApp.java:126-231); here the same chain is
    broadcast left joins with null-on-miss (DimAsyncFunction.java:49-51 only
    merges when dimInfo != null — i.e. left-outer semantics).
    customer=DIM_USER_INFO, nation+region=DIM_BASE_PROVINCE two-level
    hierarchy (FIXTURES.md §2.4).

    Scale note: nation/region are BOUNDED dims (25/5 rows at any scale) —
    always hinted. customer GROWS with the dataset; the hint is correct up
    to executor-memory-sized dims (every test SF, and any real deployment
    where the user dim fits in a few GB). Past that, pass
    ``broadcast_growing_dims=False``: the un-hinted join lets AQE pick
    broadcast when the runtime size allows and fall back to a shuffled hash
    join (or the bucketed layout in operators/scale.py) when it doesn't.
    """
    cust = F.broadcast(customer) if broadcast_growing_dims else customer
    return (
        orders.join(cust, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderstatus").alias("order_status"),
            K.money("o_totalprice").cast("double").alias("total_amount"),
            K.ts_to_str("o_orderdate").alias("create_time"),
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("user_segment"),
            F.col("c_acctbal").alias("user_acctbal"),
            F.col("n_nationkey").alias("province_id"),
            F.col("n_name").alias("province_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def product_wide(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    broadcast_growing_dims: bool = True,
) -> DataFrame:
    """ProductStats-side dim chain: sku -> part dim, supplier -> nation dim
    (reference: app/dws/ProductStatsApp.java:266-328 — 4 chained async dim
    joins become broadcast left joins).

    part/supplier grow with the dataset — same hint policy as
    :func:`order_wide` (see its scale note); nation is bounded, always
    hinted."""
    p = F.broadcast(part) if broadcast_growing_dims else part
    s = F.broadcast(supplier) if broadcast_growing_dims else supplier
    return (
        lineitem.join(p, lineitem.l_partkey == part.p_partkey, "left")
        .join(s, lineitem.l_suppkey == supplier.s_suppkey, "left")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_partkey").alias("sku_id"),
            F.col("p_name").alias("sku_name"),
            F.col("p_brand").alias("tm_name"),
            F.col("p_type").alias("category3_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("supplier_nation"),
            K.revenue("l_extendedprice", "l_discount").cast("double").alias("order_amount"),
        )
    )


# ---------------------------------------------------------------------------
# A8 variant — PaymentWide (asymmetric interval: -15 min / +5 s analog)
# ---------------------------------------------------------------------------
def payment_wide(events: DataFrame, hours_before: int = 24) -> DataFrame:
    """payment ⋈ triggering-event interval join with *asymmetric* bounds.

    PaymentWideApp joins payment_info to order_wide where the order was
    created within the 15 minutes *before* the payment — bounds
    [-15 min, +5 s] (app/dwm/PaymentWideApp.java:77-85). Stand-in
    (FIXTURES.md §2.3): `purchase` events are payments; a `click` event by
    the same user within `hours_before` hours *before* the purchase is its
    triggering order. Both timestamps survive, renamed exactly like
    bean/PaymentWide.java:14-87 (payment_create_time / order_create_time).

    The user_id equi-key drives the shuffle; in streaming form the same
    predicate + watermarks on both sides bounds the join state to the
    interval width.
    """
    payments = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("payment_id"),
        F.col("user_id").alias("pay_user"),
        F.col("ts").alias("payment_ts"),
        F.col("value").alias("payment_amount"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("order_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("order_ts"),
        F.col("value").alias("order_amount"),
    )
    return (
        payments.join(
            clicks,
            (payments.pay_user == clicks.click_user)
            & (clicks.order_ts <= payments.payment_ts)
            & (clicks.order_ts >= F.col("payment_ts") - F.expr(f"INTERVAL {hours_before} HOURS")),
        )
        .select(
            "payment_id",
            F.col("pay_user").alias("user_id"),
            K.ts_to_str("payment_ts").alias("payment_create_time"),
            K.money("payment_amount").cast("double").alias("payment_amount"),
            "order_id",
            K.ts_to_str("order_ts").alias("order_create_time"),
            K.money("order_amount").cast("double").alias("order_amount"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (beyond the reference — standard warehouse/feature-store op)
# ---------------------------------------------------------------------------
def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join: enrich each left row with the value columns of
    the most recent right row for the same key at-or-before the left
    timestamp (inclusive, matching DuckDB/kdb ASOF semantics); left rows
    with no prior right row keep nulls.

    Not in the reference's surface (its closest shape is the bounded
    interval join, app/dwm/OrderWideApp.java:99-107); added because
    point-in-time dimension lookup is the canonical feature-store /
    training-data primitive.

    Execution is the union+running-window form, NOT a per-key pandas
    merge_asof and NOT a range self-join: tag both inputs, union them,
    and carry the right values forward with `last(_v, ignorenulls) OVER
    (PARTITION BY key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)`, then
    keep only left rows. One shuffle + one sort on the join key — the
    same cost as a single sort-merge join — with no candidate-pair blowup,
    so it scales to fact-sized inputs on both sides. Right rows sort
    before left rows on timestamp ties (tag 0 < 1) which is what makes
    the bound inclusive. Value columns travel in ONE struct so a null
    value INSIDE a right row is preserved rather than filled from an
    older row. Right side must be unique per (key, ts) — pre-aggregate
    (e.g. last order per day) to make results deterministic.
    """
    from pyspark.sql import Window

    v_struct = F.struct(*[F.col(c) for c in value_cols]).alias("_v")
    null_struct = F.lit(None).cast(
        right.select(v_struct).schema["_v"].dataType
    ).alias("_v")
    l_tag = left.select(
        *left.columns,
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        null_struct,
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        v_struct,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).withColumn(
        "_vf", F.last("_v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_tag") == 1).select(
        *left.columns, *[F.col(f"_vf.{c}").alias(c) for c in value_cols]
    )


def last_order_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Point-in-time enrichment: each behavior event joined to the user's
    most recent order state as of the event timestamp (the per-day last
    order, keyed by highest order id). Nulls (no prior order) surface as
    -1 sentinels so results hash identically across engines."""
    day_orders = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("last_order_key"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
    )
    enriched = asof_join(
        events.select("event_id", "user_id", "ts"),
        day_orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["last_order_key", "last_order_price"],
    )
    return enriched.select(
        "event_id",
        "user_id",
        K.ts_to_str("ts").alias("ts"),
        F.coalesce("last_order_key", F.lit(-1)).alias("last_order_key"),
        F.coalesce("last_order_price", F.lit(-1.0)).alias("last_order_price"),
    )


def interval_join_outer(
    orders: DataFrame, lineitem: DataFrame, days_before: int = 0, days_after: int = 7
) -> DataFrame:
    """Left-outer interval join: every order, with its line details when
    they ship inside [o_orderdate - days_before, o_orderdate + days_after]
    (inclusive), else nulls.

    The reference's interval joins are inner-only (Flink intervalJoin —
    app/dwm/OrderWideApp.java:99-107 — drops unmatched keys silently);
    the outer form is what "orders with no shipment in the window" late-
    fact analysis needs, and in Structured Streaming the same expression
    runs as a watermarked stream-stream left-outer join (nulls emitted
    once the watermark closes the interval). Same plan as the inner form:
    the equi-key drives one shuffle, the range predicate filters
    post-probe."""
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate >= orders.o_orderdate - F.expr(f"INTERVAL {days_before} DAYS"))
            & (lineitem.l_shipdate <= orders.o_orderdate + F.expr(f"INTERVAL {days_after} DAYS")),
            "left",
        )
        .select(
            "o_orderkey",
            K.ts_to_str("o_orderdate").alias("o_orderdate"),
            F.coalesce(F.col("l_linenumber").cast("bigint"), F.lit(-1)).alias("line_no"),
            F.coalesce(K.money("l_extendedprice").cast("double"), F.lit(-1.0)).alias("order_price"),
        )
    )


# ---------------------------------------------------------------------------
# selective fact join — runtime bloom-filter scan pruning
# ---------------------------------------------------------------------------
def urgent_revenue_by_day(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Revenue of line items belonging to URGENT orders, by order day —
    the selective-dimension -> huge-fact join shape where Spark's RUNTIME
    bloom filter is the scale win: Catalyst (when
    spark.sql.optimizer.runtime.bloomFilter.enabled, on by default)
    rewrites the fact side to
    `might_contain(bloom_agg(xxhash64(o_orderkey)), xxhash64(l_orderkey))`,
    so ~4/5 of the 100 TB fact scan is discarded AT THE SCAN — before the
    shuffle that would otherwise move it. The filter is built from the
    already-filtered dim side (one extra tiny aggregation) and pushed
    into the fact scan as an ordinary predicate.

    Declared as a plain filter-join-agg: NO hand-built semi-join — the
    injection is the optimizer's decision, gated on the size thresholds
    (creation side small enough to build a useful filter, application
    side large enough to pay for it: ~10 MB / 10 GB defaults — local test
    data sits below them, so tests pin the rewrite on a session with
    lowered thresholds while THIS plan stays the declarative form that
    scales). Exactly-equal results either way: the bloom filter only
    discards rows the join would drop (false positives just ride to the
    join and die there).

    Reference parity: the reference's order-wide enrichment
    (app/dwm/OrderWideApp.java) streams the whole fact; a selective
    batch analog without runtime filtering re-reads everything too.
    """
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", K.ts_to_str("o_orderdate").alias("order_day")
    )
    return (
        lineitem.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("order_day")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(K.revenue("l_extendedprice", "l_discount")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
