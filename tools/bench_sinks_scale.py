"""Incremental-sink scale curves: per-batch wall time as persisted state
grows, for the three stateful ingest sinks (VERDICT r07 tasks 4 & 7).

1. SRP near-dup gate (`srp_incremental_writer`) — FLAT parquet layout vs
   the BucketedParquetIndex layout (index_buckets, periodic compaction):
   the flat curve grows linearly with the index re-scan; the bucketed
   curve must stay flat (±noise) with IDENTICAL admitted output
   (parity pinned by tests/test_streaming.py).
2. Repeated-span detector (`span_incremental_writer`) — same comparison
   over batch-salted document batches (every gram batch-unique, so the
   curve isolates index read/write cost from match work).
3. Count-Min sink (`cms_incremental_writer`) — write wall per batch plus
   the `read_cms_counters` serving-read wall as the delta log grows.

Writes BENCH_SINKS_SCALE.md. Usage: python tools/bench_sinks_scale.py
[n_batches] (default 10).
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
from flinkproject_spark.session import get_spark  # noqa: E402
from flinkproject_spark.streaming import sinks  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def srp_batches(spark, n_batches):
    emb = catalog.load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    for b in range(n_batches):
        # deterministic per-batch sign mask (same construction as
        # bench_cc_scale): batches are mutually ~orthogonal, so the curve
        # measures trigger overhead vs index size, not match volume
        yield emb.select(
            (F.col("vec_id") + F.lit(b * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(b), i), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ).alias("embedding"),
        ).localCheckpoint(eager=True)


def span_batches(spark, n_batches):
    docs = catalog.load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    for b in range(n_batches):
        # batch-salted tokens: every gram is batch-unique, so cross-batch
        # match work is ~zero and the curve isolates index scan/write cost
        yield docs.select(
            (F.col("doc_id") + F.lit(b * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit(f"_{b}")),
                ),
                " ",
            ).alias("text"),
            "lang",
        ).localCheckpoint(eager=True)


def run_curve(name, writer, batches, index_path, spark, extra=None):
    rows = []
    for b, batch in enumerate(batches):
        t0 = time.perf_counter()
        writer(batch, b)
        wall = round(time.perf_counter() - t0, 2)
        row = dict(batch=b, wall_s=wall)
        try:
            row["index_rows"] = spark.read.parquet(index_path).count()
        except Exception:
            row["index_rows"] = 0
        if extra:
            row.update(extra(b))
        rows.append(row)
        print(f"  {name} batch {b}: {wall}s index={row['index_rows']}", flush=True)
    return rows


def trickle_curve(name, writer, batches, spark):
    rows = []
    for b, batch in batches:
        t0 = time.perf_counter()
        writer(batch, b)
        wall = round(time.perf_counter() - t0, 2)
        rows.append(dict(batch=b, wall_s=wall))
        print(f"  {name} trickle {b}: {wall}s", flush=True)
    return rows


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("sinks-scale", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="sinks_scale_")
    curves = {}
    # banding sized for the corpus the run builds (srp_recommended_banding
    # for ~20k vectors: 15-bit bands) — an undersized banding makes
    # candidate VERIFICATION the growing cost and drowns the layout signal
    from flinkproject_spark.operators.dedup import srp_recommended_banding

    SRP_BITS, SRP_BANDS = srp_recommended_banding(20_000, bands=8)
    try:
        writers = {}
        print(f"SRP sink ({SRP_BITS}/{SRP_BANDS} banding), flat layout:",
              flush=True)
        writers["srp_flat"] = sinks.srp_incremental_writer(
            f"{tmp}/sf_corpus", f"{tmp}/sf_sigs",
            bits=SRP_BITS, bands=SRP_BANDS,
        )
        curves["srp_flat"] = run_curve(
            "srp_flat", writers["srp_flat"],
            srp_batches(spark, n_batches), f"{tmp}/sf_sigs", spark,
        )
        print("SRP sink, bucketed layout (64 buckets, compact every 4):",
              flush=True)
        writers["srp_bucketed"] = sinks.srp_incremental_writer(
            f"{tmp}/sb_corpus", f"{tmp}/sb_sigs",
            index_buckets=64, compact_every=4,
            bits=SRP_BITS, bands=SRP_BANDS,
        )
        curves["srp_bucketed"] = run_curve(
            "srp_bucketed", writers["srp_bucketed"],
            srp_batches(spark, n_batches), f"{tmp}/sb_sigs", spark,
        )
        print("span sink, flat layout:", flush=True)
        writers["span_flat"] = sinks.span_incremental_writer(
            f"{tmp}/pf_idx", f"{tmp}/pf_spans"
        )
        curves["span_flat"] = run_curve(
            "span_flat", writers["span_flat"],
            span_batches(spark, n_batches), f"{tmp}/pf_idx", spark,
        )
        print("span sink, bucketed layout (256 buckets, compact every 4):",
              flush=True)
        writers["span_bucketed"] = sinks.span_incremental_writer(
            f"{tmp}/pb_idx", f"{tmp}/pb_spans",
            index_buckets=256, compact_every=4,
        )
        curves["span_bucketed"] = run_curve(
            "span_bucketed", writers["span_bucketed"],
            span_batches(spark, n_batches), f"{tmp}/pb_idx", spark,
        )

        # trickle phase: single-item triggers against the built-up state —
        # the serving-ingest regime where batch keys << n_buckets and the
        # pruned read touches a FRACTION of the index directories
        emb1 = catalog.load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding"
        )
        docs1 = catalog.load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "lang"
        )
        for lay in ("flat", "bucketed"):
            sb = [
                (
                    n_batches + i,
                    emb1.filter(F.col("vec_id") == i).select(
                        (F.col("vec_id") + 777_000_000 + i).alias("vec_id"),
                        # bulk batches wrote array<double> (the sign-mask
                        # product); keep the corpus schema consistent
                        F.col("embedding").cast("array<double>").alias("embedding"),
                    ).localCheckpoint(eager=True),
                )
                for i in range(5)
            ]
            curves[f"srp_trickle_{lay}"] = trickle_curve(
                f"srp_{lay}", writers[f"srp_{lay}"], sb, spark
            )
            db = [
                (
                    n_batches + i,
                    docs1.filter(F.col("doc_id") == i).select(
                        (F.col("doc_id") + 777_000_000 + i).alias("doc_id"),
                        "text", "lang",
                    ).localCheckpoint(eager=True),
                )
                for i in range(5)
            ]
            curves[f"span_trickle_{lay}"] = trickle_curve(
                f"span_{lay}", writers[f"span_{lay}"], db, spark
            )

        print("CMS sink (write + serving read):", flush=True)
        events = catalog.load_table(spark, SF_DIR, "events").select("user_id")
        cms_writer = sinks.cms_incremental_writer(f"{tmp}/cms")
        cms_rows = []
        for b in range(n_batches):
            batch = events.select(
                (F.col("user_id").cast("bigint") + F.lit(b * 10_000_000))
                .cast("string").alias("user_id")
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            cms_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_ctr = sinks.read_cms_counters(spark, f"{tmp}/cms").count()
            r_wall = round(time.perf_counter() - t0, 2)
            cms_rows.append(
                dict(batch=b, write_s=w_wall, read_s=r_wall, counters=n_ctr)
            )
            print(f"  cms batch {b}: write {w_wall}s read {r_wall}s "
                  f"counters={n_ctr}", flush=True)
        curves["cms"] = cms_rows

        print("HLL sink (write + serving read):", flush=True)
        events_full = catalog.load_table(spark, SF_DIR, "events").select(
            "ts", "user_id"
        )
        hll_writer = sinks.hll_incremental_writer(f"{tmp}/hll")
        hll_rows = []
        for b in range(n_batches):
            # per-batch disjoint user ids: the sketch keeps absorbing NEW
            # distincts, so register churn (not just reads) is exercised
            batch = events_full.select(
                "ts",
                (F.col("user_id") + F.lit(b * 10_000_000)).alias("user_id"),
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            hll_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_reg = sinks.read_hll_registers(spark, f"{tmp}/hll").count()
            r_wall = round(time.perf_counter() - t0, 2)
            hll_rows.append(
                dict(batch=b, write_s=w_wall, read_s=r_wall, registers=n_reg)
            )
            print(f"  hll batch {b}: write {w_wall}s read {r_wall}s "
                  f"registers={n_reg}", flush=True)
        curves["hll"] = hll_rows

        print("histogram-quantile sink (write + serving read):", flush=True)
        ev_val = catalog.load_table(spark, SF_DIR, "events").select(
            "event_id", "event_type", "value"
        )
        qexp = F.round(F.col("value").cast("double") * F.lit(1000.0), 0).cast(
            "bigint"
        )
        hq_lo, hq_hi = ev_val.select(F.min(qexp), F.max(qexp)).first()
        hq_writer = sinks.histq_incremental_writer(f"{tmp}/histq", hq_lo, hq_hi)
        hq_rows = []
        for b in range(n_batches):
            batch = ev_val.select(
                (F.col("event_id") + F.lit(b * 10_000_000)).alias("event_id"),
                "event_type", "value",
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            hq_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_ctr = sinks.read_histq_counters(spark, f"{tmp}/histq").count()
            r_wall = round(time.perf_counter() - t0, 2)
            hq_rows.append(
                dict(batch=b, write_s=w_wall, read_s=r_wall, counters=n_ctr)
            )
            print(f"  histq batch {b}: write {w_wall}s read {r_wall}s "
                  f"counters={n_ctr}", flush=True)
        curves["histq"] = hq_rows

        print("Gram sink (write + serving read):", flush=True)
        emb_full = catalog.load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding"
        )
        gram_writer = sinks.gram_incremental_writer(f"{tmp}/gram")
        gram_rows = []
        for b in range(n_batches):
            batch = emb_full.select(
                (F.col("vec_id") + F.lit(b * 10_000_000)).alias("vec_id"),
                "embedding",
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            gram_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_cells = sinks.read_gram(spark, f"{tmp}/gram").count()
            r_wall = round(time.perf_counter() - t0, 2)
            gram_rows.append(
                dict(batch=b, write_s=w_wall, read_s=r_wall, cells=n_cells)
            )
            print(f"  gram batch {b}: write {w_wall}s read {r_wall}s "
                  f"cells={n_cells}", flush=True)
        curves["gram"] = gram_rows

        print("k-means assigning sink (stateless serving writes):", flush=True)
        from flinkproject_spark.operators.similarity import kmeans_fit

        kmeans_fit(emb_full).write.mode("overwrite").parquet(f"{tmp}/centroids")
        km_writer = sinks.kmeans_assigning_writer(
            f"{tmp}/centroids", f"{tmp}/assignments"
        )
        km_rows = []
        for b in range(n_batches):
            batch = emb_full.select(
                (F.col("vec_id") + F.lit(b * 10_000_000)).alias("vec_id"),
                "embedding",
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            km_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_asg = sinks.read_assignments(spark, f"{tmp}/assignments").count()
            r_wall = round(time.perf_counter() - t0, 2)
            km_rows.append(
                dict(batch=b, write_s=w_wall, read_s=r_wall, assignments=n_asg)
            )
            print(f"  kmeans batch {b}: write {w_wall}s read {r_wall}s "
                  f"assignments={n_asg}", flush=True)
        curves["kmeans"] = km_rows

        print("Z-order compacting sink (append + window rewrite):", flush=True)
        ev_xy = catalog.load_table(spark, SF_DIR, "events").select(
            F.col("user_id").alias("x"),
            F.dayofyear(F.to_date("ts")).alias("y"),
            "value",
        )
        z_writer = sinks.zorder_compacting_writer(
            f"{tmp}/zsink", ["x", "y"], bits=8, window_batches=4
        )
        z_rows = []
        store = 0
        for b in range(n_batches):
            batch = ev_xy.select(
                (F.col("x") + F.lit(b * 10_000_000)).alias("x"), "y", "value"
            ).localCheckpoint(eager=True)
            n_in = batch.count()
            t0 = time.perf_counter()
            z_writer(batch, b)
            w_wall = round(time.perf_counter() - t0, 2)
            store += n_in
            compacted = (b + 1) % 4 == 0
            z_rows.append(
                dict(batch=b, write_s=w_wall, store_rows=store,
                     compacted="yes" if compacted else "")
            )
            print(f"  zorder batch {b}: write {w_wall}s store={store} "
                  f"{'(window rewrite)' if compacted else ''}", flush=True)
        curves["zorder"] = z_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def slope(rows, key="wall_s"):
        half = len(rows) // 2
        a = sum(r[key] for r in rows[:half]) / half
        b = sum(r[key] for r in rows[half:]) / (len(rows) - half)
        return round(b / a, 2) if a else float("nan")

    lines = [
        "# Incremental-sink scale curves",
        "",
        f"Generated by `python tools/bench_sinks_scale.py {n_batches}`"
        f" over {SF_DIR} batches (local[32], shuffle=8). second-half /"
        " first-half mean wall ratio ~1.0 = flat trigger cost."
        f" SRP banding {SRP_BITS}/{SRP_BANDS}"
        " (srp_recommended_banding for the 20k-vector corpus this run"
        " builds — the r07 curve's 16/4 banding made candidate"
        " verification the growing cost and drowned the layout signal).",
        "",
        "## SRP near-dup gate: flat vs bucketed index layout",
        "",
        "| batch | flat wall s | flat index rows | bucketed wall s |"
        " bucketed index rows |",
        "|---|---|---|---|---|",
    ]
    for rf, rb in zip(curves["srp_flat"], curves["srp_bucketed"]):
        lines.append(
            f"| {rf['batch']} | {rf['wall_s']} | {rf['index_rows']} "
            f"| {rb['wall_s']} | {rb['index_rows']} |"
        )
    lines += [
        "",
        f"Half-over-half wall ratio: flat **{slope(curves['srp_flat'])}**,"
        f" bucketed **{slope(curves['srp_bucketed'])}** (1.0 = flat)."
        " ROOT CAUSE REVISION of the r07 finding: the 6->14 s growth in"
        " BENCH_CC_SCALE.md's SRP table was the UNDERSIZED 16/4 banding"
        " driving candidate-verification volume up with the index — at"
        " corpus-appropriate banding the flat layout's trigger cost is"
        " already flat in this measured range (the whole-index re-scan"
        " is sequential columnar read, ~free at 10^5 rows). The bucketed"
        " layout (BucketedParquetIndex) pays a constant per-trigger"
        " overhead here (touched-set collect, partitioned listing, the"
        " repartition before partitionBy) that a 10^5-row index cannot"
        " amortize. CLAIM REVISED (r09): BENCH_INDEX_CROSSOVER.md grew"
        " the index to 1.8e7 rows and the crossover still did NOT appear"
        " (trickle flat 4.1 s vs bucketed 5.0 s) — on a single box with"
        " local disk the flat columnar re-scan stays competitive through"
        " at least ~2e7 rows. The bucketed layout's honest value is"
        " bounded worst-case read VOLUME per trigger (O(touched buckets"
        " / n_buckets) of the store), which matters in the remote-"
        " object-store regime where bytes moved — not local scan wall —"
        " is the cost; it is NOT a measured local-wall win at any size"
        " this sandbox can reach. Outputs are identical across layouts"
        " (parity tests), so the layout is a pure storage decision.",
        "",
        "## Repeated-span detector: flat vs bucketed gram index",
        "",
        "| batch | flat wall s | flat index rows | bucketed wall s |"
        " bucketed index rows |",
        "|---|---|---|---|---|",
    ]
    for rf, rb in zip(curves["span_flat"], curves["span_bucketed"]):
        lines.append(
            f"| {rf['batch']} | {rf['wall_s']} | {rf['index_rows']} "
            f"| {rb['wall_s']} | {rb['index_rows']} |"
        )
    lines += [
        "",
        f"Half-over-half wall ratio: flat **{slope(curves['span_flat'])}**,"
        f" bucketed **{slope(curves['span_bucketed'])}**. Batch-salted"
        " tokens keep cross-batch matches ~zero, so the curves isolate"
        " index scan/write cost from genuine span-match work. Same"
        " reading as the SRP table: both layouts flat; the bucketed"
        " form's higher constant is the 256-directory layout tax at a"
        " 2.4M-row index — it buys read pruning that only a much larger"
        " index cashes in.",
        "",
        "## Count-Min sink: write + serving read vs delta-log growth",
        "",
        "| batch | write wall s | serving read wall s | merged counters |",
        "|---|---|---|---|",
    ]
    for r in curves["cms"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['read_s']} | {r['counters']} |"
        )
    lines += [
        "",
        "## HLL sink: write + serving read vs register-log growth",
        "",
        "| batch | write wall s | serving read wall s | merged registers |",
        "|---|---|---|---|",
    ]
    for r in curves["hll"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['read_s']} | {r['registers']} |"
        )
    lines += [
        "",
        "## Trickle ingest: single-item triggers against the built index",
        "",
        "| trigger | srp flat s | srp bucketed s | span flat s |"
        " span bucketed s |",
        "|---|---|---|---|---|",
    ]
    for i in range(len(curves["srp_trickle_flat"])):
        lines.append(
            f"| {i} | {curves['srp_trickle_flat'][i]['wall_s']} "
            f"| {curves['srp_trickle_bucketed'][i]['wall_s']} "
            f"| {curves['span_trickle_flat'][i]['wall_s']} "
            f"| {curves['span_trickle_bucketed'][i]['wall_s']} |"
        )
    lines += [
        "",
        "The serving-ingest regime: one vector / one document per"
        " trigger, batch keys << n_buckets, so the bucketed read prunes"
        " to the handful of pb= directories the item's keys hash to."
        " At THIS index size the pruning saves less than the layout's"
        " fixed costs (partition listing + the pb computation + the"
        " partitionBy write), so flat wins the toy benchmark — honest"
        " constants, stated. The pruned read's byte volume is"
        " O(batch keys / n_buckets * index), vs O(index) flat: the"
        " bucketed form's advantage is asymptotic in index size, and a"
        " production deployment gets the same layout with atomic"
        " compaction from a transactional table format.",
        "",
        f"Half-over-half ratios: write **{slope(curves['cms'], 'write_s')}**,"
        f" read **{slope(curves['cms'], 'read_s')}**. Writes are O(batch)"
        " by construction (per-batch deltas); the serving read merges the"
        " whole delta log (d x w counters per batch — bounded rows, the"
        " sketch's point), so its growth is bounded by batch count, not"
        " stream volume. A serving deployment snapshots the merged"
        " counters periodically (same compaction discipline as the"
        " bucketed indexes).",
        "",
        f"HLL half-over-half ratios: write"
        f" **{slope(curves['hll'], 'write_s')}**, read"
        f" **{slope(curves['hll'], 'read_s')}**. Same bounded-state story"
        " with a stronger merge: registers fold by MAX (idempotent), so"
        " replay needs no batch-id machinery at all, and the serving read"
        " merges at most batches x days x 64 rows whatever the stream"
        " volume.",
        "",
        "## Histogram-quantile sink: counter deltas vs delta-log growth",
        "",
        "| batch | write wall s | serving read wall s | merged counters |",
        "|---|---|---|---|",
    ]
    for r in curves["histq"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['read_s']} | {r['counters']} |"
        )
    lines += [
        "",
        f"Histogram half-over-half ratios: write"
        f" **{slope(curves['histq'], 'write_s')}**, read"
        f" **{slope(curves['histq'], 'read_s')}**. Pinned-edge binning"
        " caps deltas at scopes x 256 counter rows per trigger whatever"
        " the batch size; counters merge by addition with batch-id dedup"
        " (the CMS discipline), and `compact_delta_log` folds the log to"
        " one snapshot batch when reads should stop paying the"
        " per-batch merge (compaction invisibility pinned by test).",
        "",
        "## Gram sink: exact-covariance deltas vs delta-log growth",
        "",
        "| batch | write wall s | serving read wall s | merged cells |",
        "|---|---|---|---|",
    ]
    for r in curves["gram"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['read_s']} | {r['cells']} |"
        )
    lines += [
        "",
        f"Gram half-over-half ratios: write"
        f" **{slope(curves['gram'], 'write_s')}**, read"
        f" **{slope(curves['gram'], 'read_s')}**. Each trigger appends"
        " exactly d(d+1)/2 = 2080 exact-integer partial rows independent"
        " of batch size; partials merge by ADDITION with batch-id dedup"
        " (the CMS discipline), so the serving read folds batches x 2080"
        " rows — bounded by trigger count, never stream volume — and the"
        " merged table feeds whitening_transform at O(d^2) per refresh.",
        "",
        "## k-means assigning sink: stateless serving writes vs log growth",
        "",
        "| batch | write wall s | serving read wall s | assignments |",
        "|---|---|---|---|",
    ]
    for r in curves["kmeans"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['read_s']} "
            f"| {r['assignments']} |"
        )
    lines += [
        "",
        f"k-means half-over-half ratios: write"
        f" **{slope(curves['kmeans'], 'write_s')}**, read"
        f" **{slope(curves['kmeans'], 'read_s')}**. The write side is"
        " STATELESS per trigger (persisted centroids broadcast, exact"
        " argmin, append) — flat by construction; the serving read's"
        " full-row distinct grows with the log and is the one consumers"
        " snapshot/compact in production (same discipline as the span"
        " log).",
        "",
        "## Z-order compacting sink: fast appends + every-4 window rewrite",
        "",
        "| batch | write wall s | store rows | window rewrite |",
        "|---|---|---|---|",
    ]
    for r in curves["zorder"]:
        lines.append(
            f"| {r['batch']} | {r['write_s']} | {r['store_rows']} "
            f"| {r['compacted']} |"
        )
    comp = [r["write_s"] for r in curves["zorder"] if r["compacted"]]
    plain = [r["write_s"] for r in curves["zorder"] if not r["compacted"]]
    lines += [
        "",
        f"Append triggers mean **{round(sum(plain)/len(plain), 2)}s**;"
        f" window-rewrite triggers mean **{round(sum(comp)/len(comp), 2)}s**"
        " and do NOT grow with store size (each rewrite clusters its own"
        " 4-batch window once and never touches it again — compaction is"
        " O(window), not O(store), so the sawtooth's peaks stay level as"
        " the store grows: the lakehouse OPTIMIZE-ZORDER discipline).",
        "",
    ]
    with open("/root/repo/BENCH_SINKS_SCALE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote /root/repo/BENCH_SINKS_SCALE.md", flush=True)


if __name__ == "__main__":
    main()
