"""Streaming state-size audit (VERDICT r10 task 6).

Replays sf1 events through the stateful streaming jobs under BOTH state
store providers (HDFS-backed and RocksDB), recording per-trigger state
rows / bytes / watermark from StreamingQueryProgress.stateOperators —
the measured evidence that every stateful operator keeps WATERMARK-
BOUNDED state rather than accumulating the stream:

- interval join (payment_wide_stream, A8): state on both sides is
  bounded by interval width (24 h) + watermark delay (jobs.DEFAULT_DELAY
  = 10 minutes) behind the max event time — the Flink interval-join
  state machine's horizon (OrderWideApp.java:99-107).
- CEP bounce (detect_bounces_stream, A12): <= 1 pending entry + last
  event time per user; timers evict on watermark.
- unique visits + TTL (unique_visits_stream, A10+A14): one last_dt slot
  per user with a 24 h timeout.

The staged replay ends with a heartbeat file that advances the
watermark ~1 year, so the final no-data batches must DRAIN the bounded
state — the curve's tail is the eviction proof, not just its plateau.

Usage:  python tools/bench_state.py [sf_dir] [chunks]
Writes BENCH_STATE.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkproject_spark.catalog import load_table  # noqa: E402
from flinkproject_spark.session import get_spark  # noqa: E402
from flinkproject_spark.streaming import jobs, replay, stateful  # noqa: E402

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}

JOBS = {
    "interval_join": lambda s: jobs.payment_wide_stream(s),
    "cep_bounce": lambda s: stateful.detect_bounces_stream(
        jobs.watermarked_events(s, delay="1 minute")
    ),
    "unique_visits_ttl": lambda s: stateful.unique_visits_stream(
        jobs.watermarked_events(s, delay="1 minute")
    ),
}


def run_one(spark, maker, staged: str, provider_class: str) -> dict:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", provider_class
    )
    df = maker(replay.read_replay(spark, staged))
    ckpt = tempfile.mkdtemp(prefix="ckpt_stateaudit_")
    t0 = time.time()
    q = (
        df.writeStream.format("noop")
        .queryName(f"state_audit_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(1800), "state audit replay timed out"
    finally:
        if q.isActive:
            q.stop()
    wall = time.time() - t0
    curve = []
    for raw in q.recentProgress:
        p = json.loads(raw.json) if not isinstance(raw, dict) else raw
        ops = p.get("stateOperators") or []
        rows = sum(int(o.get("numRowsTotal") or 0) for o in ops)
        mem = sum(int(o.get("memoryUsedBytes") or 0) for o in ops)
        # Spark 4.x names the RocksDB size metric rocksdbSstFileSize;
        # keep the pre-4 name as a fallback (the r11 review caught the
        # old-name-only read silently summing 0 on 4.1.2)
        sst = sum(
            int(
                (o.get("customMetrics") or {}).get("rocksdbSstFileSize")
                or (o.get("customMetrics") or {}).get(
                    "rocksdbTotalSSTFilesBytes"
                )
                or 0
            )
            for o in ops
        )
        curve.append(
            {
                "batch": p.get("batchId"),
                "input_rows": int(p.get("numInputRows") or 0),
                "state_rows": rows,
                "mem_bytes": mem,
                "sst_bytes": sst,
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
    curve.sort(key=lambda c: c["batch"])
    return {"wall_s": round(wall, 1), "curve": curve}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    events = load_table(spark, sf_dir, "events")
    n_input = events.count()
    n_users = events.select("user_id").distinct().count()
    staged = os.path.join(
        tempfile.mkdtemp(prefix="state_replay_"), "events"
    )
    replay.stage_replay(events, staged, chunks=chunks)

    results: dict[str, dict] = {}
    for jname, maker in JOBS.items():
        for pname, pclass in PROVIDERS.items():
            key = f"{jname}/{pname}"
            print(f"-- {key}", file=sys.stderr)
            results[key] = run_one(spark, maker, staged, pclass)

    md = [
        "# BENCH_STATE — streaming state-size audit (r11)",
        "",
        f"Corpus: `{sf_dir}` events = {n_input:,} rows over ~30 days, "
        f"{n_users:,} distinct users; replayed as {chunks} event-time-"
        "ordered chunks + 1 heartbeat file (watermark advanced ~1 year "
        "at the end, so the tail batches must DRAIN state — eviction is "
        "measured, not assumed). Metrics from "
        "`StreamingQueryProgress.stateOperators` per trigger.",
        "",
        "| job | provider | wall s | peak state rows | peak mem MB | "
        "peak sst MB | final state rows | peak rows / input |",
        "|---|---|---|---|---|---|---|---|",
    ]
    summary = {}
    for key, r in results.items():
        c = r["curve"]
        peak = max((x["state_rows"] for x in c), default=0)
        final = c[-1]["state_rows"] if c else 0
        pmem = max((x["mem_bytes"] for x in c), default=0) / 1e6
        psst = max((x["sst_bytes"] for x in c), default=0) / 1e6
        md.append(
            f"| {key.split('/')[0]} | {key.split('/')[1]} | {r['wall_s']} "
            f"| {peak:,} | {pmem:.1f} | {psst:.1f} | {final:,} "
            f"| {peak / max(n_input, 1):.3f} |"
        )
        summary[key] = {
            "wall_s": r["wall_s"],
            "peak_state_rows": peak,
            "final_state_rows": final,
        }
    md += [
        "",
        "## Reading the table",
        "",
        "- **interval join**: peak state is the watermark horizon's rows "
        "(interval width 24 h + the job's 10-minute watermark delay "
        "behind max event time), a "
        "small fraction of the 30-day input — the bounded-state contract "
        "of the A8 docstring (`OrderWideApp.java:99-107` parity). The "
        "final rows are what the horizon still covers when input ends "
        "(the heartbeat drains the rest of the buffer as late rows "
        "become evictable).",
        "- **cep_bounce / unique_visits_ttl**: state is O(users), never "
        "O(events) — one pending-entry/last-dt slot per key; the "
        "heartbeat fires every pending timer, so the final count drops "
        "to (at most) the key count with cleared slots.",
        "- RocksDB reports sst bytes (disk-backed store) where the HDFS "
        "provider reports heap bytes; rows match across providers — the "
        "provider is an executor-memory knob, not a semantics change.",
        "",
        "## Per-trigger curve — interval_join / hdfs",
        "",
        "| batch | input rows | state rows | mem MB | watermark |",
        "|---|---|---|---|---|",
    ]
    for x in results["interval_join/hdfs"]["curve"]:
        md.append(
            f"| {x['batch']} | {x['input_rows']:,} | {x['state_rows']:,} "
            f"| {x['mem_bytes'] / 1e6:.1f} | {x['watermark'] or ''} |"
        )
    md += [
        "",
        "## Per-trigger curve — unique_visits_ttl / rocksdb",
        "",
        "| batch | input rows | state rows | sst MB | watermark |",
        "|---|---|---|---|---|",
    ]
    for x in results["unique_visits_ttl/rocksdb"]["curve"]:
        md.append(
            f"| {x['batch']} | {x['input_rows']:,} | {x['state_rows']:,} "
            f"| {x['sst_bytes'] / 1e6:.1f} | {x['watermark'] or ''} |"
        )
    md.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STATE.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(json.dumps({"metric": "state_audit", "summary": summary}))


if __name__ == "__main__":
    main()
