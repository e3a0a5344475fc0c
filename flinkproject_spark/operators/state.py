"""Batch forms of the reference's keyed-state operators (A10, A11, A12).

Each of these is a per-key *ordered* computation the reference implements
with Flink keyed state or CEP. In batch they are window functions over
`partitionBy(key).orderBy(ts)` — SQL-expressible, so DuckDB can oracle them
exactly. The true streaming forms (incremental state, event-time timers)
live in `flinkproject_spark.streaming.stateful` and are verified against
these batch semantics on replay (SURVEY.md §5 strategy).

Ordering determinism: every window orders by (ts, event_id) — timestamps
alone can collide, and a nondeterministic tie would flip first-per-key
results between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkproject_spark import functions as K


# ---------------------------------------------------------------------------
# A10 — stateful dedup: first event per key per day (UV)
# ---------------------------------------------------------------------------
def unique_visits(events: DataFrame) -> DataFrame:
    """Keep only each user's first event per calendar day.

    UniqueVisitApp keeps a page-view iff the device's stored visit-date
    differs from today, with 24 h state TTL (app/dwm/UniqueVisitApp.java:54-87).
    Event-time-day semantics are the spec (SURVEY §7 delta #5): state TTL in
    the reference is a memory bound, not the business rule.
    """
    day = F.date_format("ts", "yyyy-MM-dd").alias("dt")
    w = Window.partitionBy("user_id", "dt").orderBy("ts", "event_id")
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value", day)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", K.ts_to_str("ts").alias("ts"), "user_id", "dt", "event_type")
    )


# ---------------------------------------------------------------------------
# A11 — new/returning-visitor flag correction (first-seen per key, ever)
# ---------------------------------------------------------------------------
def fix_is_new_flag(events: DataFrame) -> DataFrame:
    """Tag each event is_new=1 iff it is the user's first event ever.

    BaseLogApp rewrites a claimed is_new=1 to 0 when the device already
    exists in keyed state (app/dwd/BaseLogApp.java:73-96). Batch analog:
    the first (ts, event_id)-ordered event per user keeps the flag.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        K.ts_to_str("ts").alias("ts"),
        "user_id",
        "event_type",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("is_new"),
    )


# ---------------------------------------------------------------------------
# A12 — CEP bounce detection (batch lag/lead form)
# ---------------------------------------------------------------------------
def detect_bounces(events: DataFrame, session_gap_min: int = 30, bounce_gap_min: int = 10) -> DataFrame:
    """Bounce = a session-entry event NOT followed by activity soon enough.

    UserJumpDetailApp's CEP pattern (app/dwm/UserJumpDetailApp.java:68-117):
    per device, a session-entry event followed by another entry within 10 s
    — or by nothing (timeout) — is a bounce; both the matched and timed-out
    branches emit the *first* event, then the two streams union.

    Batch equivalent per user ordered by (ts, event_id):
      entry  := previous event absent or > session_gap_min older;
      bounce := entry whose next event is absent or > bounce_gap_min later.
    Both CEP branches (strict-contiguity match and timer timeout) collapse
    into the one `next-too-late-or-missing` predicate.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = session_gap_min * 60
    bounce_s = bounce_gap_min * 60
    flagged = events.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
    ).withColumn(
        "is_entry",
        F.col("prev_ts").isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap_s),
    )
    return (
        flagged.filter("is_entry")
        .withColumn(
            "is_bounce",
            F.col("next_ts").isNull()
            | (F.unix_timestamp("next_ts") - F.unix_timestamp("ts") > bounce_s),
        )
        .filter("is_bounce")
        .select("event_id", K.ts_to_str("ts").alias("ts"), "user_id", "event_type")
    )


def detect_bounces_strict(
    events: DataFrame, session_gap_min: int = 30, bounce_gap_min: int = 10
) -> DataFrame:
    """A12 with the reference's CEP branches kept SEPARATE — the literal
    strict-contiguity pattern (app/dwm/UserJumpDetailApp.java:68-92):

      begin(entry).next(entry).within(bounce_gap)   [.next() = strict]

    - match branch: an entry whose immediately-next event is ANOTHER entry
      inside the bounce window -> emit the first (the CEP select);
    - timeout branch: an entry with NO next event inside the bounce window
      -> emit it (the timeout side-output);
    - abort: a non-entry next event inside the window kills the match
      attempt (strict contiguity) -> NOT a bounce.

    With gap-derived entries and session_gap >= bounce_gap the match branch
    is provably empty (an entry's gap exceeds the session gap, hence the
    bounce window), so this collapses to `detect_bounces`'s single
    next-too-late-or-missing predicate — the equivalence is pinned by a
    property test over generated sessions (tests/test_properties.py) and a
    whole-table equality test; with bounce_gap > session_gap the two
    genuinely diverge (also pinned).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = session_gap_min * 60
    bounce_s = bounce_gap_min * 60
    flagged = (
        events.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.lag("ts").over(w).alias("prev_ts"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .withColumn(
            "is_entry",
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap_s),
        )
        .withColumn("next_is_entry", F.lead("is_entry").over(w))
    )
    next_diff = F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    matched = F.col("next_is_entry") & (next_diff <= bounce_s)
    timed_out = F.col("next_ts").isNull() | (next_diff > bounce_s)
    return (
        flagged.filter("is_entry")
        .filter(matched | timed_out)
        .select("event_id", K.ts_to_str("ts").alias("ts"), "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Sessionization (generalization of A12's session-entry notion)
# ---------------------------------------------------------------------------
def sessionize(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Assign session ids: cumulative count of session-entry flags per user.

    Not in the reference surface but the natural engine primitive underlying
    UV/bounce logic; one shuffle on user_id, then pure window math.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    entry = (
        F.lag("ts").over(w).isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_min * 60)
    ).cast("int")
    wsess = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).withColumn("session_seq", F.sum(entry).over(wsess))
