"""User-behavior analytics operators over the events stream (engine
additions in the reference's own domain — its DWS layer serves visitor and
product stats; funnels and retention cohorts are the two serving tables
every such warehouse grows next).

Both are single-shuffle-per-stage window/aggregate compositions, fully
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkproject_spark import functions as K

NEVER = "never"


def funnel(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered-step conversion funnel per user: the first `steps[0]` event,
    the first `steps[1]` strictly after it, the first `steps[2]` after
    that, ... `funnel_stage` = number of steps reached.

    Plan: one shuffle on user_id, then a chain of window-min passes over
    the SAME partitioning (no further exchanges — each min conditions on
    the previous stage's timestamp column), then the per-user aggregate
    rides the same partitioning. Null stage timestamps surface as the
    'never' sentinel for hash-stable cross-engine output.
    """
    w = Window.partitionBy("user_id")
    df = events
    stage_cols = []
    prev = None
    for i, s in enumerate(steps):
        col = f"s{i}_ts"
        cond = F.col("event_type") == s
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        df = df.withColumn(col, F.min(F.when(cond, F.col("ts"))).over(w))
        stage_cols.append(col)
        prev = col
    agg = df.groupBy("user_id").agg(
        *[F.min(c).alias(c) for c in stage_cols],
    )
    stage = None
    for i, col in enumerate(reversed(stage_cols)):
        n = len(stage_cols) - i
        cond = F.col(col).isNotNull()
        stage = F.when(cond, n) if stage is None else stage.when(cond, n)
    stage = stage.otherwise(0)
    return agg.select(
        "user_id",
        *[
            F.coalesce(K.ts_to_str(c), F.lit(NEVER)).alias(c)
            for c in stage_cols
        ],
        stage.cast("bigint").alias("funnel_stage"),
    )


def funnel_windowed(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    step_window_s: int = 3600,
) -> DataFrame:
    """Time-constrained funnel: each step must land within `step_window_s`
    of the PREVIOUS step's timestamp (the 'converted within an hour'
    serving query; the unconstrained :func:`funnel` is the limit case).
    Identical plan shape — the deadline folds into each window-min's
    condition, so the time-constrained form costs exactly what the
    unconstrained one does: one user_id shuffle, chained window-mins.

    Semantics note (the greedy-vs-optimal delta, documented not hidden):
    like `funnel`, each stage anchors on the EARLIEST qualifying event;
    a user who converts only via a later s0 anchor is not credited —
    first-touch attribution, the standard serving convention.
    """
    w = Window.partitionBy("user_id")
    df = events
    stage_cols = []
    prev = None
    for i, s in enumerate(steps):
        col = f"s{i}_ts"
        cond = F.col("event_type") == s
        if prev is not None:
            cond = (
                cond
                & (F.col("ts") > F.col(prev))
                & (F.col("ts") <= F.col(prev) + F.expr(f"INTERVAL {step_window_s} SECONDS"))
            )
        df = df.withColumn(col, F.min(F.when(cond, F.col("ts"))).over(w))
        stage_cols.append(col)
        prev = col
    agg = df.groupBy("user_id").agg(
        *[F.min(c).alias(c) for c in stage_cols],
    )
    stage = None
    for i, col in enumerate(reversed(stage_cols)):
        n = len(stage_cols) - i
        cond = F.col(col).isNotNull()
        stage = F.when(cond, n) if stage is None else stage.when(cond, n)
    stage = stage.otherwise(0)
    return agg.select(
        "user_id",
        *[
            F.coalesce(K.ts_to_str(c), F.lit(NEVER)).alias(c)
            for c in stage_cols
        ],
        stage.cast("bigint").alias("funnel_stage"),
    )


def daily_anomalies(
    events: DataFrame, trailing_days: int = 7, sigma: float = 3.0
) -> DataFrame:
    """Volume-anomaly flags per (event_type, day): a day is anomalous when
    its event count exceeds mean + sigma * stddev of the TRAILING
    `trailing_days` OBSERVED days (a ROWS frame over the per-day series;
    current day excluded — the baseline must not contain the
    observation). The ops-dashboard query every event
    warehouse serves next to its stats tables.

    Plan: one partial-aggregating shuffle to (event_type, day) counts —
    day-grain metadata from there on — then trailing mean/stddev as frame
    windows per event_type (tiny partitions: one row per day). Both
    moments round to 6 dp and the flag compares the ROUNDED values, so
    the verdict is identical cross-engine even where summation order
    differs in the last ulps. Days with fewer than 2 trailing samples
    have no stddev and are never flagged (null-safe false).
    """
    daily = (
        events.select(F.col("event_type"), F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    mu = F.round(F.avg("n").over(w), 6)
    sd = F.round(F.stddev_samp("n").over(w), 6)
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        mu.alias("trailing_mean"),
        sd.alias("trailing_std"),
        F.coalesce(
            F.col("n") > (mu + F.lit(sigma) * sd), F.lit(False)
        ).alias("is_anomaly"),
    )


def daily_anomalies_dense(
    events: DataFrame, trailing_days: int = 7, sigma: float = 3.0
) -> DataFrame:
    """`daily_anomalies` over the DENSIFIED calendar (ADVICE r04 #2): each
    event_type's day axis is filled from its first to its last observed
    day, with n=0 for silent days — so the trailing frame always covers
    the real last `trailing_days` CALENDAR days, zero-volume days can
    pull the baseline down, and a dead-then-spiking type is judged
    against its true recent history instead of arbitrarily old rows.

    Plan: the same single partial-aggregating shuffle to (event_type,
    day) counts; the calendar spine is `sequence(min_day, max_day)`
    exploded from the per-type bounds (one tiny agg on the day-grain
    metadata, broadcast back), then a left join at day grain and the
    same ROWS frame — which over a dense axis IS the calendar frame.
    Day-grain rows are O(types x days): metadata-sized at any corpus
    scale.
    """
    daily = (
        events.select(F.col("event_type"), F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    dense = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    mu = F.round(F.avg("n").over(w), 6)
    sd = F.round(F.stddev_samp("n").over(w), 6)
    return dense.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        mu.alias("trailing_mean"),
        sd.alias("trailing_std"),
        F.coalesce(
            F.col("n") > (mu + F.lit(sigma) * sd), F.lit(False)
        ).alias("is_anomaly"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, counted
    distinctly per day-offset of later activity — the (cohort, offset) ->
    active_users matrix behind every retention curve.

    Plan: per-user first-day via a window over user_id (one shuffle), then
    one partial-aggregating shuffle on (cohort, offset) with an exact
    distinct (swap approx_count_distinct at the 100 TB tier).
    """
    w = Window.partitionBy("user_id")
    first_day = F.min(F.to_date("ts")).over(w)
    enriched = events.select(
        "user_id",
        first_day.alias("cohort_day"),
        F.datediff(F.to_date("ts"), first_day).alias("day_offset"),
    )
    return (
        enriched.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_dt"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "active_users",
        )
    )


def _gated_items(lineitem: DataFrame, max_basket: int) -> DataFrame:
    """Distinct (order, part) items with pathological baskets dropped
    OUTRIGHT — the shared first stage of every market-basket consumer
    (copurchase_pairs' lift table, pagerank's edge build): capping
    baskets bounds downstream pair volume at O(rows * max_basket).

    The result is materialized lazily: its consumers read it up to FIVE
    times in one query (both self-join sides, the part-count table, the
    order count), and each read otherwise re-runs the distinct + basket
    window over the full fact table (r11 optimization; the gated item
    set is the distinct (order, part) table — already far smaller than
    the line items it summarizes)."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn(
            "basket", F.count("*").over(Window.partitionBy("l_orderkey"))
        )
        .filter(F.col("basket") <= max_basket)
        .drop("basket")
        .localCheckpoint(eager=False)
    )


def _supported_pairs(items: DataFrame, min_support: int) -> DataFrame:
    """Support-gated co-purchase pairs (part_a < part_b, counted over the
    gated item set) — shared by copurchase_pairs and pagerank so the two
    operators mine the SAME graph by construction."""
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )


def copurchase_pairs(
    lineitem: DataFrame, min_support: int = 2, max_basket: int = 64
) -> DataFrame:
    """Frequent co-purchased part pairs with lift — the market-basket
    surface an e-commerce analytics engine serves next to GMV rollups
    (the reference's serving tier exposes only per-brand sums;
    association mining is the natural extension of the same fact table).

    Shape: distinct (order, part) items -> per-order self-join with
    part_a < part_b -> pair counts -> support gate -> lift against the
    independent-purchase baseline, lift = n_pair * n_orders / (n_a*n_b).

    Scale posture: the self-join is keyed on l_orderkey, so pair volume
    is sum(basket^2) — bounded by the `max_basket` gate (baskets above it
    are dropped OUTRIGHT, the standard mining practice: a 10^4-item
    pathological basket would contribute 10^8 pairs and no signal). With
    baskets capped, pairs are O(rows * max_basket): linear, one shuffle
    each for items/pairs/counts. The support gate cuts the long tail
    before the count joins; part counts are computed on the SAME gated
    item set so support and lift are mutually consistent. Ties and
    floats: counts are exact ints, lift rounds to 6 per module contract.
    """
    items = _gated_items(lineitem, max_basket)
    part_ct = items.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    pairs = _supported_pairs(items, min_support)
    return (
        pairs.join(
            F.broadcast(part_ct.select(F.col("l_partkey").alias("part_a"),
                                       F.col("n_part").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_ct.select(F.col("l_partkey").alias("part_b"),
                                       F.col("n_part").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.col("n_pair").cast("double") * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the co-purchase graph (iterative link analysis)
# ---------------------------------------------------------------------------
PR_SCALE = 1_000_000  # rank mass per node, int64 fixed-point
PR_DAMPING_PCT = 85  # d = 0.85 as an integer percentage


def pagerank(
    lineitem: DataFrame,
    n_iter: int = 5,
    min_support: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """PageRank over the co-purchase part graph — the iterative
    link-analysis member of the analytics family (CC closure finds
    components; PageRank ranks WITHIN them), and the classic quality
    prior a web-scale training corpus weights documents by (Page et al.
    1999; Common Crawl ranks hosts the same way). Here the graph is the
    one this engine already mines: parts are nodes, co-purchased pairs
    (support-gated, basket-capped like copurchase_pairs) are undirected
    edges, so every node has degree >= 1 and there is no dangling mass.

    Arithmetic contract: ranks are int64 fixed-point (PR_SCALE mass per
    node), each Jacobi step is

        rank'(v) = floor(15 * SCALE / 100)
                   + (85 * sum over in-edges of (rank(u) div deg(u))) div 100

    with `div` EXACT integer division in both engines (Spark `div`,
    DuckDB `//`) — no float enters the loop, so the fixed-point is
    bit-reproducible by the oracle's unrolled CTEs at any partitioning.
    Overflow valve: inbound sums are bounded by total mass ~ n * SCALE,
    so bigint holds to ~9e12 graph nodes (document-scale corpora need
    SCALE dropped to 10^3, same discipline as embedding_gram's valve).

    Scale posture: Pregel's canonical shape — per iteration ONE shuffle
    join of the rank table against edges co-partitioned on src and ONE
    (dst)-keyed aggregate with map-side partial sums; edges and degrees
    are built once and reused. n_iter is fixed (5), so the plan is a
    bounded chain; per-iteration localCheckpoint cuts the lineage
    cascade exactly as kmeans_fit's does (without it, iteration i
    re-runs the i-1 joins at every reference — job count quadratic in
    n_iter). Returns (part_id, degree, pr_rank) — all exact integers.

    Reference parity: the reference has no graph tier (its closest
    surface is the per-key serving aggregates); this is north-star
    extension surface. Public formulation per Page/Brin/Motwani/Winograd
    1999; the iterative shape is Pregel's (Malewicz et al. 2010).
    """
    pairs = _supported_pairs(_gated_items(lineitem, max_basket), min_support)
    edges = pairs.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    # the items self-join lineage behind `edges` feeds THREE consumers
    # (deg, esrc, and through them every iteration); materialize the edge
    # list ONCE — the r10 form checkpointed deg and esrc separately and
    # each of those two eager jobs re-ran the whole pair-mining subplan
    # (r11 optimization: one pairs execution instead of two). Lazy since
    # r12: the first iteration's job materializes the esrc -> deg ->
    # edges checkpoint chain (each RDD computed once, cache-locked), so
    # the construction-time driver sync the eager form paid is gone.
    edges = edges.localCheckpoint(eager=False)
    # deg is node-sized and referenced every iteration AND in the final
    # join — checkpoint it (lazily: its one shuffle over the cached edge
    # list folds into the first job that reads it)
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=False)
    )
    # edges carry their source degree so the loop joins ONCE per step
    esrc = edges.join(deg, "src").localCheckpoint(eager=False)
    # Join strategy, MEASURED: broadcasting the node-sized rank table
    # into each step was tried (kills the edge-side shuffle) and LOST —
    # 58 s vs 47 s at sf1 and an executor OOM in a shared session: each
    # iteration pays a driver collect + broadcast-relation build, and in
    # local mode (as on any co-located cluster) the rank shuffle it
    # replaces is the CHEAPER move. Shuffle join also holds unchanged at
    # web-graph node counts where a broadcast could not fit at all.
    base = (15 * PR_SCALE) // 100
    rank = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            esrc.join(rank, F.col("src") == F.col("node"))
            .select(
                F.col("dst"),
                F.expr("rank div degree").cast("bigint").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            deg.select(F.col("src").alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"(coalesce(s, CAST(0 AS BIGINT)) * {PR_DAMPING_PCT})"
                        " div 100"
                    ).cast("bigint")
                ).alias("rank"),
            )
            # lazy: the plan is truncated immediately (constant-size per
            # iteration) while materialization folds into the next
            # iteration's job instead of a per-iteration driver sync
            # barrier — 5 fewer job launches per query (r11 optimization)
            .localCheckpoint(eager=False)
        )
    return (
        deg.select(F.col("src").alias("part_id"), "degree")
        .join(rank, F.col("part_id") == F.col("node"))
        .select("part_id", "degree", F.col("rank").alias("pr_rank"))
    )


# ---------------------------------------------------------------------------
# event-flow transition matrix (path analysis)
# ---------------------------------------------------------------------------
def event_transitions(events: DataFrame, session_gap_min: int = 30) -> DataFrame:
    """Next-event transition matrix — the path-analysis serving table every
    behavior warehouse grows beside funnels: sessionize each user's events
    by inactivity gap, then count the (from_type -> to_type) transitions
    between CONSECUTIVE events within a session, with the per-from-state
    transition share as exact integer parts-per-million.

    Reference parity: the reference's log layer tracks page flow through
    `page.last_page_id` — session entry is `last_page_id == null`
    (app/dwm/UniqueVisitApp.java:64-66, UserJumpDetailApp.java:72-80) and
    the jump job inspects exactly this previous->current page relation;
    this operator is that relation materialized as the aggregate
    transition table instead of consumed event-by-event.

    Arithmetic contract: the share is (n * 1_000_000) div total_from —
    pure int64, bit-identical in Spark (`div`) and DuckDB (`//`) — never
    a rounded double division, whose half-up/half-even tie handling
    differs across engines.

    Sessionization is state.sessionize itself — ONE session-boundary rule
    in the codebase (unix_timestamp whole-second gap > gap_s, the same
    convention every bounce/UV operator in state.py uses), not a private
    re-derivation that could disagree with the other serving tables about
    where a user's session ends (r10 review).

    Plan: one user_id-partitioned window pass (sessionize's lag + running
    counter plus this operator's lag: THREE window functions over ONE
    shuffle on user_id — (user_id, session_seq) clustering is satisfied
    by the user_id hash partitioning), then one (from, to) groupBy with
    map-side partials. Scale: the user_id shuffle is the cost at 100 TB,
    paid once; the transition matrix itself is |event_type|^2 rows,
    metadata-sized."""
    from flinkproject_spark.operators.state import sessionize

    sess = sessionize(events, gap_min=session_gap_min)
    w_s = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    pairs = (
        sess.withColumn("from_type", F.lag("event_type").over(w_s))
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    # per-from total as a WINDOW over the metadata-sized counts table —
    # a groupBy+join here re-executes the whole window pipeline for the
    # totals side (measured in the plan: duplicated exchange chain),
    # while the window adds one exchange over |types|^2 rows
    total_from = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") * F.lit(1_000_000)).cast("bigint").alias("__num"),
        total_from.alias("__tot"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("__num div __tot").alias("share_ppm"),
    )


def event_next_topk(
    events: DataFrame, k: int = 3, session_gap_min: int = 30
) -> DataFrame:
    """Markov next-event recommendation — the serving CONSUMER of the
    transition matrix (VERDICT r10 task 8): per from-state the top-k
    next events by transition share (ppm-exact from event_transitions;
    ties broken by to_type), ranked — the 'users who did X next did Y'
    table a product surface reads directly, and the row shape an
    anomaly monitor compares live paths against (a path outside its
    from-state's top-k is the reference's jump-detail candidate,
    UserJumpDetailApp.java:72-80, viewed from the aggregate side).

    Plan: everything downstream of the matrix is a window over the
    |event_type|^2-row aggregate — metadata-sized at any corpus scale;
    the one data-scale shuffle is event_transitions' user_id pass."""
    t = event_transitions(events, session_gap_min=session_gap_min)
    w = Window.partitionBy("from_type").orderBy(
        F.desc("share_ppm"), F.asc("to_type")
    )
    return (
        t.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("from_type", "rk", "to_type", "n", "share_ppm")
    )
