"""Z-order pruning payoff meter — writes BENCH_ZORDER.md.

The layout tier's claim (operators/layout.py) is test-proven on an ideal
64x64 grid; this tool MEASURES it on the real events table at sf1/sf10:
write the same rows under three layouts — day-sorted (the conventional
time-partitioned layout), user-sorted, and Z-ordered on (user_id, day) —
then count, from parquet FOOTER STATS ALONE (layout.file_ranges, the
exact metadata a scan planner prunes with), how many files each layout
forces a query to read for:

  - conjunctive point (user_id = U AND day = D)
  - user-only point   (user_id = U)
  - day-only point    (day = D)
  - 7-day range       (day BETWEEN D AND D+6)

Probes are deterministic percentile points (10 per metric, p5..p95 of
each column's actual domain), averaged. zorder_layout min-max scales
each column to the shared 8-bit width before interleaving, so the raw
user_id domain and the ~9-bit day domain cluster at comparable
significance — footer min/max on the real predicate columns, no folded
stand-ins. (The unscaled first cut left day pruning at a full 64/64
scan: the wide column owned every significant key bit.)

Usage: python tools/bench_zorder.py            (sf1; --sf10 adds sf10)
Env: SPARK_GRAFT_SF1_DIR / SPARK_GRAFT_SF10_DIR (defaults /tmp/spark_graft_*).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flinkproject_spark.catalog import load_table  # noqa: E402
from flinkproject_spark.operators import layout  # noqa: E402
from flinkproject_spark.session import get_spark  # noqa: E402

N_FILES = 64


def files_touched_range(ranges: list[dict], col: str, lo, hi) -> int:
    """Range analog of layout.files_touched: a file survives pruning iff
    its [min, max] intersects [lo, hi]."""
    return sum(
        1
        for r in ranges
        if r[f"min_{col}"] is not None
        and not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
    )


def pct_points(spark, df, col: str, n: int = 10) -> list[int]:
    qs = [0.05 + 0.9 * i / (n - 1) for i in range(n)]
    row = df.select(
        F.percentile_approx(col, F.array(*[F.lit(q) for q in qs]), F.lit(10000))
    ).first()[0]
    return [int(v) for v in row]


def bench_sf(spark, sf_dir: str, label: str, out: list[str]) -> None:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.dayofyear(F.to_date("ts")).alias("day"), "value"
    )
    n = ev.count()
    bits = 8  # zorder_layout min-max scales each column to this width
    base = f"/tmp/spark_graft_zorder_{label}"
    t0 = time.time()
    (
        ev.repartitionByRange(N_FILES, "day")
        .sortWithinPartitions("day")
        .write.mode("overwrite")
        .parquet(f"{base}/day_sorted")
    )
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(f"{base}/user_sorted")
    )
    layout.zorder_layout(ev, ["user_id", "day"], f"{base}/zordered", N_FILES, bits)
    t_write = time.time() - t0

    cols = ["user_id", "day"]
    rng = {
        name: layout.file_ranges(f"{base}/{name}", cols)
        for name in ("day_sorted", "user_sorted", "zordered")
    }
    uids = pct_points(spark, ev, "user_id")
    days = pct_points(spark, ev, "day")

    def avg(fn) -> dict[str, float]:
        return {
            name: sum(fn(rng[name], u, d) for u, d in zip(uids, days))
            / len(uids)
            for name in rng
        }

    metrics = {
        "point (user AND day)": avg(
            lambda r, u, d: layout.files_touched(r, {"user_id": u, "day": d})
        ),
        "user-only point": avg(
            lambda r, u, d: layout.files_touched(r, {"user_id": u})
        ),
        "day-only point": avg(lambda r, u, d: layout.files_touched(r, {"day": d})),
        "7-day range": avg(
            lambda r, u, d: files_touched_range(r, "day", d, d + 6)
        ),
    }
    out.append(
        f"\n## {label} — {n:,} rows, {N_FILES} files per layout, "
        f"zkey bits={bits}, write pass {t_write:.1f}s\n"
    )
    out.append(
        "| predicate | day-sorted | user-sorted | z-ordered | z vs best-single |"
    )
    out.append("|---|---|---|---|---|")
    for m, v in metrics.items():
        best = min(v["day_sorted"], v["user_sorted"])
        ratio = v["zordered"] / best if best else float("nan")
        out.append(
            f"| {m} | {v['day_sorted']:.1f} | {v['user_sorted']:.1f} | "
            f"{v['zordered']:.1f} | {ratio:.2f}x |"
        )


def main() -> None:
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
    spark = get_spark("bench-zorder", cpus=16, shuffle_partitions=32)
    out = [
        "# BENCH_ZORDER — footer-stat pruning, measured on real events",
        "",
        "Files a scan must read (average over 10 deterministic percentile",
        "probes), counted from parquet footer min/max alone — the exact",
        "pruning a planner applies. `z vs best-single` compares Z against",
        "whichever single-column sort is better FOR THAT predicate; the",
        "point of Z is the row-wise max: no predicate direction collapses",
        "to a full scan. Generated by `python tools/bench_zorder.py`.",
    ]
    bench_sf(spark, sf1, "sf1", out)
    if "--sf10" in sys.argv and os.path.isdir(sf10):
        bench_sf(spark, sf10, "sf10", out)
    text = "\n".join(out) + "\n"
    with open("/root/repo/BENCH_ZORDER.md", "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
