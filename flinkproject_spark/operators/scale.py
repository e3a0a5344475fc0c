"""Scale primitives: salted aggregation/joins (skew) and bucketed
co-located joins (shuffle elimination).

The reference never confronts skew (parallelism 1 everywhere — SURVEY §6);
at 100 TB it is the first thing that breaks a shuffle: one hot key (a viral
sku, a bot device id) lands an entire reduce partition on one executor.
AQE's skew-join splitting (enabled in session.py) handles the join case at
runtime; these operators are the *explicit* valves for the two cases AQE
does not cover — aggregation skew, and joins where the planner must be
forced to pre-spread a hot key.

- `salted_agg`: two-phase aggregation. Phase 1 groups by (keys, salt) so a
  hot key's rows spread over `buckets` partitions; phase 2 merges the
  partials by the true keys. Only works for decomposable aggregates
  (sum/count/min/max — the re-aggregation is given per measure).
- `salted_join`: fact rows get a deterministic salt in [0, buckets); the
  (small-ish) right side is replicated `buckets` times via explode, so the
  shuffle key (key, salt) spreads a hot fact key over `buckets` reducers.
  Use when the right side is too big to broadcast but small enough to
  replicate; broadcast remains the first choice for true dims.

Both are semantics-preserving (tests assert equality with the unsalted
plans) and deterministic: the salt is a hash of the whole fact row's
distinguishing column, not rand(), so retries/speculative tasks agree.

- `write_bucketed` / `bucketed_join`: pre-shuffle-by-contract. Two tables
  bucketed on the same key with the same bucket count join with ZERO
  exchanges — each task zips bucket i with bucket i. At 100 TB this is the
  difference between re-shuffling the fact table on every query and paying
  the shuffle once at ingest: the standing layout for fact⋈fact joins
  (order_info ⋈ order_detail — the reference's OrderWideApp interval join
  pair, app/dwm/OrderWideApp.java:99-107) where neither side broadcasts.
  tests/test_operators.py asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _salt_col(distinct_col: str | Column, buckets: int) -> Column:
    c = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    measures: {out_name: (input_col, fn)} with fn in {"sum", "count",
    "min", "max"} — the decomposable set (phase-2 re-agg: count -> sum).
    `salt_from` is any column whose values spread a hot key's rows (a row
    id, an event id); hashing it gives a uniform deterministic salt.
    """
    refn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    phase1 = df.withColumn(SALT, _salt_col(salt_from, buckets)).groupBy(
        *keys, SALT
    ).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in measures.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, refn[fn])(out).alias(out)
            for out, (_, fn) in measures.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    right: DataFrame,
    fact_key: str,
    right_key: str,
    salt_from: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: fact gets salt = hash(salt_from) % buckets,
    right side is replicated once per salt value, join key becomes
    (key, salt). Output columns = fact ⊕ right minus the helper columns.
    """
    f = fact.withColumn(SALT, _salt_col(salt_from, buckets))
    r = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = f.join(r, (f[fact_key] == r[right_key]) & (f[SALT] == r[SALT]), how)
    return out.drop(f[SALT]).drop(r[SALT])


def hot_customer_revenue(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Deliberately SKEWED-key join — the driver-surface proof of the
    engine's hot-key posture (the #1 scale-killer class; VERDICT r09 #3).

    The fact side remaps ~90% of orders onto ONE hot customer
    (o_custkey % 10 != 0 -> custkey 1 — deterministic, so the oracle
    replays the skew exactly); the join to `customer` is merge-HINTED,
    never broadcast, modeling the 100 TB plan where the customer table
    scales with the fact side and cannot ship to executors. That leaves a
    sort-merge join whose hot partition holds ~90% of the fact — exactly
    the shape AQE's skew-join splitting (on in session.py:
    spark.sql.adaptive.skewJoin.enabled) splits into threshold-sized
    sub-partitions at runtime, each joined against a replicated copy of
    the matching right rows. tests/test_explain.py pins the split
    actually firing (skew=true in the executed SMJ) under forced
    thresholds; at test SFs the default 256 MB threshold never binds and
    the plan is an ordinary SMJ.

    The aggregation after the join deliberately groups by keys UNRELATED
    to the join key (c_mktsegment, c_nationkey): grouping by the join key
    would let the HashAggregate reuse the join's output partitioning, and
    OptimizeSkewedJoin then (correctly) declines to split — splitting
    would cost an extra exchange (measured: with groupBy(c_custkey) the
    executed plan stays skew=false under forced thresholds). With
    independent grouping keys the aggregate exchanges regardless, the
    split is free, and partial aggregation collapses each split's rows
    before that exchange. The explicit valves for shapes that MUST keep
    the join key downstream are forceOptimizeSkewedJoin (pay a tiny
    partial-agg reshuffle) or salted_join/salted_agg above.

    Output: (c_mktsegment, c_nationkey, n_orders, total_spend) — the hot
    key's ~90% order volume flows through whichever segment customer 1
    belongs to, so the skew survives into the values being verified.
    Reference parity: no skew handling exists in the reference
    (parallelism 1 — SURVEY §6); this is engine-native scale surface.
    """
    hot = orders.withColumn(
        "cust_hot",
        F.when(F.col("o_custkey") % 10 != 0, F.lit(1).cast("bigint")).otherwise(
            F.col("o_custkey").cast("bigint")
        ),
    )
    from flinkproject_spark import functions as K

    j = hot.hint("merge").join(
        customer, hot["cust_hot"] == customer["c_custkey"], "inner"
    )
    return j.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n_orders"),
        K.money_sum("o_totalprice").alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# bucketed co-located joins
# ---------------------------------------------------------------------------
def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) external table.

    Bucketing hash-partitions rows into `buckets` files per write-task by
    `keys`, and records the layout in the catalog; `sort=True` additionally
    sorts within each bucket so downstream sort-merge joins skip their sort.
    This is the pay-the-shuffle-once ingest layout for standing fact tables.
    """
    w = df.repartition(buckets, *keys).write.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket keys.

    With matching bucket specs Spark plans a sort-merge join with NO
    Exchange on either side (and no per-query Sort when bucket-sorted):
    bucket i of the left zips with bucket i of the right. The join itself
    is ordinary `join` — this helper exists to name the contract and keep
    the table-vs-path distinction (bucketing metadata lives in the catalog,
    so reads must go through `spark.table`, not `spark.read.parquet`).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
