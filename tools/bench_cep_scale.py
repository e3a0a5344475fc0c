"""CEP scale-curve evidence (VERDICT r04 #7).

Two claims, measured:

1. **Wall time is near-linear in rows, under key skew.** Deterministic
   synthetic event streams (no RNG: xxhash64-derived) at growing sizes,
   with a HOT KEY holding ~25% of all events and the rest spread over
   n/50 keys — the adversarial shape for a keyed, order-sensitive
   operator. The batch `cep_pattern` (view -> click within 5 min) is
   timed per size; rows/s should hold roughly flat. An unskewed control
   at the largest size prices the skew penalty itself. (A hot key is
   processed sequentially by construction — order-sensitive NFA semantics
   admit no intra-key parallelism, on Flink's keyed operators exactly as
   here — so the skew penalty's ceiling is hot-key rows / single-core
   machine rate, and the curve shows the machine rate.)

2. **Per-key state is O(pattern), independent of stream length.** A
   single-key stream of 200k events is pushed through the shared NFA core
   (`run_machine`) in chunks — exactly how the streaming operator carries
   state across micro-batches — recording the partial-match buffer length
   after every chunk, for patterns of length 2/3/5 and both contiguity
   modes. The max observed buffer is asserted < pattern length (a full
   match emits and resets), i.e. state never grows with history.

Usage: python tools/bench_cep_scale.py [--full]   (writes BENCH_CEP_SCALE.md)
`--full` adds a 3.2M-row point.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flinkproject_spark.operators import cep  # noqa: E402
from flinkproject_spark.session import get_spark  # noqa: E402

HOT_SHARE_MOD = 4  # ~25% of events on the hot key
STEPS = ["event_type = 'view'", "event_type = 'click'"]
WITHIN_S = 300


def synth_events(spark, n_rows: int, skewed: bool = True) -> DataFrame:
    """Deterministic keyed event stream: id-ordered seconds, event types
    cycling view/click/scroll, keys hash-spread over n/50 — with every
    4th row rerouted to hot key 0 when `skewed`."""
    n_keys = max(2, n_rows // 50)
    base = spark.range(n_rows)
    spread_key = F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_keys)) + 1
    key = (
        F.when(F.pmod(F.xxhash64(F.col("id")), F.lit(HOT_SHARE_MOD)) == 0, F.lit(0))
        .otherwise(spread_key)
        if skewed
        else spread_key
    )
    return base.select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        key.alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("scroll")),
            (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
    )


def run_wall_curve(spark, sizes: list[int]) -> list[dict]:
    # warm: JIT + Arrow path spin-up, so the smallest point measures the
    # machine rate rather than first-touch costs
    warm = synth_events(spark, 50_000).localCheckpoint(eager=True)
    cep.cep_pattern(warm, STEPS, within_s=WITHIN_S).count()
    rows = []
    for n in sizes:
        for label, skewed in (("skewed", True), ("uniform", False)):
            if not skewed and n != sizes[-1]:
                continue  # the control only needs the largest point
            ev = synth_events(spark, n, skewed=skewed).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            out_n = cep.cep_pattern(ev, STEPS, within_s=WITHIN_S).count()
            wall = round(time.perf_counter() - t0, 2)
            rows.append(
                dict(rows=n, dist=label, wall_s=wall,
                     krows_per_s=round(n / wall / 1000, 1), emissions=out_n)
            )
            print(f"  rows={n} {label}: {wall}s "
                  f"({rows[-1]['krows_per_s']}k rows/s, {out_n} emissions)", flush=True)
    return rows


def run_state_bound(n_events: int = 200_000, chunk: int = 1_000) -> list[dict]:
    """Push one key's long stream through the NFA core chunkwise (the
    streaming operator's exact state carry) and record the partial-buffer
    high-water mark per pattern."""
    out = []
    etypes_cycle = np.array(["view", "click", "scroll"])
    etypes = etypes_cycle[
        (np.arange(n_events) * 2654435761 % 97) % 3  # deterministic mix
    ]
    ts = np.arange(n_events, dtype=np.int64)
    keys = np.zeros(n_events, dtype=np.int64)
    eids = np.arange(n_events, dtype=np.int64)
    for n_steps, contig in ((2, "next"), (3, "followedBy"), (5, "followedBy")):
        want = ["view", "click", "scroll", "view", "click"][:n_steps]
        strict = cep.strict_array(n_steps, [contig] * (n_steps - 1))
        partial: list = []
        cur_key = None
        max_partial = 0
        emissions_total = 0
        for lo in range(0, n_events, chunk):
            hi = min(lo + chunk, n_events)
            P = np.stack(
                [etypes[lo:hi] == w for w in want], axis=1
            )
            ems, partial, cur_key = cep.run_machine(
                keys[lo:hi], eids[lo:hi], ts[lo:hi], etypes[lo:hi], P,
                WITHIN_S, cur_key, partial, strict,
            )
            emissions_total += len(ems)
            max_partial = max(max_partial, len(partial))
        assert max_partial < n_steps, (
            f"state grew past the pattern: {max_partial} >= {n_steps}"
        )
        out.append(dict(pattern_len=n_steps, contiguity=contig,
                        chunks=n_events // chunk, max_partial=max_partial,
                        emissions=emissions_total))
        print(f"  pattern={n_steps} ({contig}): max in-flight state "
              f"{max_partial} slots over {n_events} events", flush=True)
    return out


def main() -> None:
    full = "--full" in sys.argv
    spark = get_spark("cep-scale")
    sizes = [100_000, 400_000, 1_600_000] + ([3_200_000] if full else [])
    print("CEP wall-time curve (skewed keys):", flush=True)
    wall_rows = run_wall_curve(spark, sizes)
    print("CEP per-key state bound:", flush=True)
    state_rows = run_state_bound()

    lines = [
        "# CEP scale curves",
        "",
        f"Generated by `python tools/bench_cep_scale.py{' --full' if full else ''}`"
        " (local[32]); deterministic xxhash64-derived streams, hot key"
        " holding ~25% of all events, remainder over n/50 keys.",
        "",
        "## Wall time vs rows (view -> click within 5 min)",
        "",
        "| rows | distribution | wall s | k rows/s | emissions |",
        "|---|---|---|---|---|",
    ]
    for r in wall_rows:
        lines.append(
            f"| {r['rows']} | {r['dist']} | {r['wall_s']} "
            f"| {r['krows_per_s']} | {r['emissions']} |"
        )
    lines += [
        "",
        "Near-flat rows/s across a 16x size range = near-linear wall time."
        " The uniform control at the top size prices the skew penalty: the"
        " hot key's 25% share is processed sequentially (order-sensitive"
        " NFA semantics admit no intra-key parallelism — true of Flink's"
        " keyed CEP operator identically), so the skew ceiling is hot-key"
        " rows divided by the single-core machine rate shown here.",
        "",
        "## Per-key state vs stream length (the O(pattern) claim)",
        "",
        "| pattern len | contiguity | events pushed | chunks | max in-flight slots |",
        "|---|---|---|---|---|",
    ]
    for r in state_rows:
        lines.append(
            f"| {r['pattern_len']} | {r['contiguity']} | 200000 "
            f"| {r['chunks']} | {r['max_partial']} |"
        )
    lines += [
        "",
        "State carried across chunks (== micro-batches in the streaming"
        " operator) never exceeds pattern_len - 1 slots: a completed match"
        " emits and resets, an aborted/timed-out partial clears. Per-key"
        " state is O(pattern length), independent of stream length — at"
        " 10^9 keys that is a few tuples per key in the state store, the"
        " same bound Flink's sharedBuffer keeps for this single-run"
        " pattern class.",
        "",
    ]
    with open("/root/repo/BENCH_CEP_SCALE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote /root/repo/BENCH_CEP_SCALE.md", flush=True)


if __name__ == "__main__":
    main()
