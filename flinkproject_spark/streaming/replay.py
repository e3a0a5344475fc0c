"""Deterministic replay harness: batch table -> time-ordered file stream.

The reference's inputs are Kafka topics (utils/MyKafkaUtil.java:46-55); this
environment has no broker, so streaming operators are exercised by replaying
a batch table through Spark's *file* streaming source in event-time order:

1. :func:`stage_replay` sorts the table by (ts, tiebreak), slices it into N
   chunks, and writes each chunk as one parquet file with strictly
   increasing modification times — so `maxFilesPerTrigger=1` yields
   micro-batches that arrive in event-time order, like a well-behaved topic.
2. An optional trailing **heartbeat** file carries a single far-future row
   (sentinel key) whose only job is to push the watermark past every real
   window/timer at end-of-replay, so append-mode windows close and
   event-time timeouts fire. Operators filter the sentinel out.
3. :func:`read_replay` opens the staged directory as `readStream`;
   :func:`run_to_table` executes any streaming DataFrame with
   `Trigger.AvailableNow` into a memory sink and returns the batch result.

Swapping `read_replay` for `spark.readStream.format("kafka")` is the ONLY
change needed for production — every downstream operator is source-agnostic.

Scale posture: the harness itself is test-only; the operators it drives run
unchanged against real sources, where state sharding, watermark-bounded
buffers, and AQE-sized shuffles do the 100 TB heavy lifting.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Sentinel key value for heartbeat rows (user_id is BIGINT in testdata).
HEARTBEAT_ID = -1


def stage_replay(
    df: DataFrame,
    path: str,
    order_col: str = "ts",
    tiebreak: str = "event_id",
    chunks: int = 8,
    heartbeat_keys: tuple[str, ...] = ("user_id",),
    heartbeat_advance: str = "365 days",
) -> str:
    """Write `df` as a chunked, event-time-ordered parquet stream at `path`.

    Chunk i holds the i-th slice of the (order_col, tiebreak)-sorted table;
    files are written sequentially (increasing mtime) and named in order, so
    the file streaming source replays them as ordered micro-batches.

    The final heartbeat file (one row, `order_col` pushed `heartbeat_advance`
    past the max, key columns set to :data:`HEARTBEAT_ID`) advances the
    watermark so that every real window closes and every pending event-time
    timer fires during the replay itself (no-data micro-batches then flush
    the emissions). Pass ``heartbeat_keys=()`` to disable.
    """
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)

    n = df.count()
    chunks = max(1, min(chunks, n))
    rows_per = -(-n // chunks)  # ceil
    ordered = df.orderBy(order_col, tiebreak).coalesce(1)

    with tempfile.TemporaryDirectory() as tmp:
        ordered.write.mode("overwrite").parquet(f"{tmp}/all")
        spark = df.sparkSession
        whole = spark.read.parquet(f"{tmp}/all")
        # slice by row position within the single sorted file
        sliced = whole.withColumn(
            "__rn", F.monotonically_increasing_id()
        ).withColumn("__chunk", (F.col("__rn") / rows_per).cast("int")).drop("__rn")
        for i in range(chunks):
            part_dir = f"{tmp}/c{i}"
            sliced.filter(F.col("__chunk") == i).drop("__chunk").coalesce(1).write.mode(
                "overwrite"
            ).parquet(part_dir)
            _move_single_part(part_dir, f"{path}/{i:05d}.parquet")

        if heartbeat_keys:
            hb = whole.orderBy(F.desc(order_col)).limit(1)
            hb = hb.withColumn(order_col, F.col(order_col) + F.expr(f"INTERVAL {heartbeat_advance}"))
            for k in heartbeat_keys:
                hb = hb.withColumn(k, F.lit(HEARTBEAT_ID).cast(dict(df.dtypes)[k]))
            hb_dir = f"{tmp}/hb"
            hb.coalesce(1).write.mode("overwrite").parquet(hb_dir)
            _move_single_part(hb_dir, f"{path}/{chunks:05d}-heartbeat.parquet")

    # The file streaming source orders files by modification time; pin
    # strictly increasing, well-spaced mtimes so replay order can never
    # collide (a reordered heartbeat would — correctly — late-drop the
    # chunks it jumped ahead of).
    base_t = os.path.getmtime(f"{path}/00000.parquet")
    for i, f in enumerate(sorted(os.listdir(path))):
        os.utime(f"{path}/{f}", (base_t + i * 10, base_t + i * 10))
    return path


def _move_single_part(spark_out_dir: str, dest: str) -> None:
    parts = [f for f in os.listdir(spark_out_dir) if f.endswith(".parquet")]
    assert len(parts) == 1, f"expected one part file, got {parts}"
    shutil.move(os.path.join(spark_out_dir, parts[0]), dest)


def drop_heartbeats(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Remove sentinel rows a heartbeat file injected (for operators that
    pass event rows through rather than aggregate them)."""
    return df.filter(F.col(key_col) != HEARTBEAT_ID)


def read_replay(spark: SparkSession, path: str, files_per_trigger: int = 1) -> DataFrame:
    """Open a staged replay directory as a streaming DataFrame.

    Schema is taken from the staged files themselves (file streams require
    an explicit schema). `maxFilesPerTrigger` keeps one chunk per
    micro-batch so watermarks advance between batches exactly as staged.
    """
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def run_to_table(
    stream_df: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (Trigger.AvailableNow)
    into a memory sink; return the accumulated result as a batch DataFrame.

    `spark.sql.streaming.noDataMicroBatches.enabled` (default true) gives the
    trailing zero-data batches that flush watermark-driven emissions after
    the heartbeat file lands.
    """
    name = f"replay_{uuid.uuid4().hex[:10]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(timeout_s), f"replay query timed out after {timeout_s}s"
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)
