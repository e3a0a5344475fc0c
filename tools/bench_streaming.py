"""Streaming throughput benchmark — end-to-end rows/sec for the Structured
Streaming surface (the reference is a stream processor; its jobs publish no
numbers and run at parallelism 1 — BaseLogApp.java:35 et al.).

Replays the sf events table through the file-stream harness (the Kafka
stand-in; see streaming/replay.py) and times each streaming job from
query start to completion (Trigger.AvailableNow, memory sink), reporting
input rows / wall seconds. Prints ONE JSON line.

Usage: python tools/bench_streaming.py [sf_dir] [chunks] [files_per_trigger]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkproject_spark import catalog  # noqa: E402
from flinkproject_spark.session import get_spark  # noqa: E402
from flinkproject_spark.streaming import jobs, replay, stateful  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FILES_PER_TRIGGER = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main() -> None:
    spark = get_spark("bench-streaming")
    events = catalog.load_table(spark, SF_DIR, "events")
    n_rows = events.count()

    stage_dir = tempfile.mkdtemp(prefix="replay_bench_")
    et_stage = tempfile.mkdtemp(prefix="replay_bench_et_")
    doc_stage = tempfile.mkdtemp(prefix="replay_bench_docs_")
    ev_stage = tempfile.mkdtemp(prefix="replay_bench_ev_")
    try:
        replay.stage_replay(events, stage_dir, chunks=CHUNKS)
        # separate staging for event_type-keyed jobs: the heartbeat must
        # blank that key too or the sentinel pollutes a real group. The
        # chunk files are byte-identical, so hardlink them and rewrite
        # ONLY the one-row heartbeat — not a second full sort+write.
        from pyspark.sql import functions as F

        for f in sorted(os.listdir(stage_dir)):
            src, dst = f"{stage_dir}/{f}", f"{et_stage}/{f}"
            if f.endswith("-heartbeat.parquet"):
                hb_dir = f"{et_stage}/_hb_tmp"
                (
                    spark.read.parquet(src)
                    .withColumn("event_type", F.lit(str(replay.HEARTBEAT_ID)))
                    .coalesce(1).write.mode("overwrite").parquet(hb_dir)
                )
                part = [p for p in os.listdir(hb_dir) if p.endswith(".parquet")][0]
                os.rename(f"{hb_dir}/{part}", dst)
                shutil.rmtree(hb_dir, ignore_errors=True)
                t = os.path.getmtime(src)
                os.utime(dst, (t, t))
            else:
                os.link(src, dst)

        def stream():
            return replay.read_replay(spark, stage_dir, files_per_trigger=FILES_PER_TRIGGER)

        def et_stream():
            return replay.read_replay(spark, et_stage, files_per_trigger=FILES_PER_TRIGGER)

        cases = {
            # windowed multi-measure aggregate (VisitorStatsApp shape, A6)
            "visitor_stats": lambda: jobs.visitor_stats_stream(stream()),
            # built-in dedup (UniqueVisitApp shape, A10 dropDuplicates form)
            "unique_visits_dropdup": lambda: jobs.unique_visits_dropdup_stream(stream()),
            # native session windows
            "session_stats": lambda: jobs.session_stats_stream(stream()),
            # custom stateful operator (applyInPandasWithState, exact A10+TTL)
            "unique_visits_stateful": lambda: stateful.unique_visits_stream(
                jobs.watermarked_events(stream())
            ),
            # stream-stream interval self-join (PaymentWide shape, A8)
            "payment_wide_join": lambda: jobs.payment_wide_stream(stream()),
            # chained stateful operators: is_new enrichment -> 4-dim window
            "visitor_stats_4d": lambda: jobs.visitor_stats_4d_stream(stream()),
            # update-mode keyed state machine (funnel serving table)
            "funnel_update": (
                lambda: stateful.funnel_stream(stream()),
                "update",
            ),
            # trailing-deque anomaly flags per event_type (r05): watermark-
            # driven day closing, few keys -> per-key throughput ceiling
            "daily_anomalies_trailing": lambda: stateful.daily_anomalies_stream(
                jobs.watermarked_events(et_stream())
            ),
        }

        results: dict[str, dict[str, float]] = {}
        for name, build in cases.items():
            build, mode = build if isinstance(build, tuple) else (build, "append")
            # fresh session per job: accumulated memory-sink tables and
            # state-store providers from earlier jobs otherwise degrade
            # later ones badly (measured 17 s solo -> 186 s as job #5 in a
            # shared session); session startup stays outside the timer
            spark.stop()
            spark = get_spark("bench-streaming")
            t0 = time.perf_counter()
            out = replay.run_to_table(build(), output_mode=mode)
            out.count()
            wall = time.perf_counter() - t0
            results[name] = {
                "sec": round(wall, 3),
                "rows_per_sec": round(n_rows / wall),
            }
        # foreachBatch ingest sinks (round 7) — parquet-state writers, so
        # they get their own staging (order-insensitive: no event-time
        # re-sort needed) and are timed start->awaitTermination. Input is
        # the table each sink actually ingests: documents for the span
        # index, events for the CMS counter deltas.
        from flinkproject_spark.streaming import sinks as sk

        # the cases loop recycled the session; reload inputs on the live one
        docs = catalog.load_table(spark, SF_DIR, "documents")
        ev2 = catalog.load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id"
        )
        n_docs = docs.count()
        docs.repartition(CHUNKS).write.mode("overwrite").parquet(doc_stage)
        ev2.repartition(CHUNKS).write.mode("overwrite").parquet(ev_stage)
        doc_schema = docs.schema
        ev_schema = ev2.schema
        fb_cases = {
            "span_incremental_index": (
                doc_stage, doc_schema, n_docs,
                lambda out: sk.span_incremental_writer(
                    f"{out}/gramidx", f"{out}/spans"
                ),
            ),
            "cms_incremental_counters": (
                ev_stage, ev_schema, n_rows,
                lambda out: sk.cms_incremental_writer(f"{out}/cms"),
            ),
        }
        for name, (src, schema, n_in, mk) in fb_cases.items():
            spark.stop()
            spark = get_spark("bench-streaming")
            out_dir = tempfile.mkdtemp(prefix=f"replay_bench_{name}_")
            try:
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
                    .parquet(src)
                )
                t0 = time.perf_counter()
                q = (
                    stream.writeStream.foreachBatch(mk(out_dir))
                    .option("checkpointLocation", f"{out_dir}/ckpt")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                wall = time.perf_counter() - t0
                results[name] = {
                    "sec": round(wall, 3),
                    "rows_per_sec": round(n_in / wall),
                }
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(et_stage, ignore_errors=True)
        shutil.rmtree(doc_stage, ignore_errors=True)
        shutil.rmtree(ev_stage, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "streaming_replay_throughput",
        "unit": "rows/sec",
        "input_rows": n_rows,
        "chunks": CHUNKS,
        "files_per_trigger": FILES_PER_TRIGGER,
        "jobs": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
