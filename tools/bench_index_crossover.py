"""Bucketed-index crossover measurement at its claimed regime (VERDICT
r08 task 5) — writes BENCH_INDEX_CROSSOVER.md.

BENCH_SINKS_SCALE.md measures the SRP sink's flat-vs-bucketed layouts at
10^5-10^6 index rows, where the flat whole-index re-scan is ~free and
the bucketed layout's constants lose; the at-scale claim ("the pruned
read wins at 10^8+ rows") was extrapolated. This tool grows the SRP
signature index to >= 10^7 rows (batched sf10-scale ingest: N bulk
batches of the 200k-vector sf10 embeddings table, sign-mask
orthogonalized and id-offset per batch), then measures the
SERVING-INGEST regime the claim concerns: single-vector trickle
triggers, where batch keys << n_buckets and the bucketed read prunes to
a handful of pb= directories while the flat read re-scans everything.

Compaction is disabled for the bucketed run (compact_every=None): the
hand-rolled maybe_compact is an O(store) rewrite, which at 10^7 rows
would dominate and measure the WRONG thing — a production deployment
gets the same layout with atomic background compaction from a
transactional table format. File-count growth without compaction is
bounded here by n_batches appends per bucket.

Usage: python tools/bench_index_crossover.py [n_bulk_batches] [n_trickle]
Env: SPARK_GRAFT_SF10_DIR (default /tmp/spark_graft_sf10; falls back to
/root/testdata/sf0.1 embeddings replicated if the derived dir is absent).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flinkproject_spark import catalog  # noqa: E402
from flinkproject_spark.operators.dedup import srp_recommended_banding  # noqa: E402
from flinkproject_spark.session import get_spark  # noqa: E402
from flinkproject_spark.streaming import sinks  # noqa: E402

N_BULK = int(sys.argv[1]) if len(sys.argv) > 1 else 12
N_TRICKLE = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N_BUCKETS = 256


def bulk_batch(emb, b):
    """Sign-mask orthogonalized, id-offset copy of the base table: batches
    are mutually near-orthogonal so ~everything is admitted and the index
    GROWS (the same construction as bench_sinks_scale.srp_batches)."""
    return emb.select(
        (F.col("vec_id") + F.lit(b * 10_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.lit(b), i), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)


def main() -> None:
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
    src_dir = sf10 if os.path.isdir(sf10) else "/root/testdata/sf0.1"
    spark = get_spark("index-crossover", cpus=16, shuffle_partitions=32)
    emb = catalog.load_table(spark, src_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_base = emb.count()
    expected = n_base * N_BULK
    bits, bands = srp_recommended_banding(expected, bands=8)
    tmp = tempfile.mkdtemp(prefix="index_xover_")
    results: dict[str, dict] = {}
    try:
        for lay, buckets in (("flat", None), ("bucketed", N_BUCKETS)):
            # fresh session per layout: accumulated broadcast/state debris
            # from the first run otherwise taxes the second; inputs must
            # be reloaded on the LIVE session
            spark.stop()
            spark = get_spark(
                "index-crossover", cpus=16, shuffle_partitions=32
            )
            emb = catalog.load_table(spark, src_dir, "embeddings").select(
                "vec_id", "embedding"
            )
            writer = sinks.srp_incremental_writer(
                f"{tmp}/{lay}_corpus",
                f"{tmp}/{lay}_sigs",
                bits=bits,
                bands=bands,
                index_buckets=buckets,
                compact_every=None,
            )
            build = []
            print(f"{lay}: building index ({N_BULK} x {n_base:,} vectors, "
                  f"banding {bits}/{bands})", flush=True)
            for b in range(N_BULK):
                batch = bulk_batch(emb, b)
                t0 = time.perf_counter()
                writer(batch, b)
                wall = round(time.perf_counter() - t0, 2)
                build.append(wall)
                print(f"  {lay} bulk {b}: {wall}s", flush=True)
            idx_rows = spark.read.parquet(f"{tmp}/{lay}_sigs").count()
            trickle = []
            for i in range(N_TRICKLE):
                one = emb.filter(F.col("vec_id") == i).select(
                    (F.col("vec_id") + F.lit(777_000_000 + i)).alias("vec_id"),
                    F.col("embedding").cast("array<double>").alias("embedding"),
                ).localCheckpoint(eager=True)
                t0 = time.perf_counter()
                writer(one, N_BULK + i)
                trickle.append(round(time.perf_counter() - t0, 2))
                print(f"  {lay} trickle {i}: {trickle[-1]}s", flush=True)
            results[lay] = dict(build=build, trickle=trickle, idx_rows=idx_rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    fl, bu = results["flat"], results["bucketed"]
    mean = lambda xs: round(sum(xs) / len(xs), 2)  # noqa: E731
    lines = [
        "# BENCH_INDEX_CROSSOVER — bucketed layout at its claimed regime",
        "",
        f"Generated by `python tools/bench_index_crossover.py {N_BULK} "
        f"{N_TRICKLE}` (local[32], shuffle=32). SRP sink, banding "
        f"{bits}/{bands} (srp_recommended_banding for the "
        f"{expected:,}-vector corpus this run builds), bucketed layout "
        f"{N_BUCKETS} buckets, compaction OFF for both layouts (the "
        "hand-rolled compaction is an O(store) rewrite; a transactional "
        "format does it atomically in the background — this measures the "
        "READ-pruning claim, not compaction strategy).",
        "",
        f"Index grown to **{fl['idx_rows']:,} signature rows** "
        f"({n_base:,} vectors x {N_BULK} batches x {bands} bands; corpus "
        f"{expected:,} stored vectors).",
        "",
        "## Bulk-ingest build (per-trigger wall, s)",
        "",
        "| batch | flat | bucketed |",
        "|---|---|---|",
    ]
    for b in range(N_BULK):
        lines.append(f"| {b} | {fl['build'][b]} | {bu['build'][b]} |")
    half = N_BULK // 2
    lines += [
        "",
        f"Half-over-half build ratio: flat "
        f"**{round(mean(fl['build'][half:]) / mean(fl['build'][:half]), 2)}**, "
        f"bucketed "
        f"**{round(mean(bu['build'][half:]) / mean(bu['build'][:half]), 2)}**. "
        "Bulk batches touch every bucket (200k keys >> 256 buckets), so "
        "pruning cannot help the build; both layouts' growth here is the "
        "whole-index re-scan.",
        "",
        "## Trickle serving-ingest against the built index (wall, s)",
        "",
        "| trigger | flat | bucketed |",
        "|---|---|---|",
    ]
    for i in range(N_TRICKLE):
        lines.append(f"| {i} | {fl['trickle'][i]} | {bu['trickle'][i]} |")
    ratio = round(mean(fl["trickle"]) / mean(bu["trickle"]), 2)
    lines += [
        "",
        f"Trickle means: flat **{mean(fl['trickle'])}s**, bucketed "
        f"**{mean(bu['trickle'])}s** — flat/bucketed = **{ratio}x** at "
        f"{fl['idx_rows']:,} index rows.",
        "",
    ]
    if ratio > 1.2:
        lines.append(
            "**Crossover observed**: at this index size the bucketed "
            "pruned read beats the flat whole-index re-scan for "
            "single-item triggers — the regime the BENCH_SINKS_SCALE "
            "claim concerned. Below ~10^6 rows (that file's tables) the "
            "flat scan is cheaper than the layout's constants; the "
            "crossover sits between."
        )
    else:
        lines.append(
            "**No crossover at this size**: the flat whole-index re-scan "
            "still amortizes better than the bucketed layout's "
            "per-trigger constants (touched-set collect, partitioned "
            "listing). The BENCH_SINKS_SCALE claim should be read as "
            "UNPROVEN at this scale; revise upward or drop it."
        )
    with open("/root/repo/BENCH_INDEX_CROSSOVER.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote /root/repo/BENCH_INDEX_CROSSOVER.md", flush=True)


if __name__ == "__main__":
    main()
