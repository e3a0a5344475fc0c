"""Third-decade scale bench: headline tier at sf1 -> sf10 (100x sf0.1).

BENCH_SF1.md proves sf0.1 -> sf1 and BENCH_SF3.md proves sf1 -> sf3.
This tool closes the second full decade ABOVE sf1: a deterministic 100x
scale-up of sf0.1 (same construction as bench_sf1.build_sf1 — disjoint-
shingle documents, sign-mask embeddings, FK-consistent key offsets — with
REPLICAS=100) re-timed against sf1. The reported exponent is per-decade:

    exponent = log10(t_sf10 / t_sf1)

1.0 = linear, > SUPERLINEAR_GATE flagged. With sf1 already past fixed
overhead for every headline query, an exponent holding ~1.0 across a
full clean decade is the strongest single-box evidence this harness can
produce for the 100 TB scaling claim: any O(n^2) or O(n log^2 n)-gone-
wrong term that a 3x step can hide behind noise shows up unmistakably
at 10x.

Exclusion (logged, not silent): `dedup_srp` — decomposed in BENCH_SF1.md
as quadratic-by-construction at its fixed 16/4 calibration banding; its
oracle-verified scale knob `dedup_srp_scaled` (96/8) stays in the tier.

Usage: python tools/bench_sf10.py         (writes BENCH_SF10.md)
Env: SPARK_GRAFT_SF1_DIR / SPARK_GRAFT_SF10_DIR to pin/reuse the derived
directories (defaults /tmp/spark_graft_sf1, /tmp/spark_graft_sf10).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from flinkproject_spark.session import get_spark  # noqa: E402
from tools import bench_sf1  # noqa: E402

SF10_REPLICAS = 100
SUPERLINEAR_GATE = 1.3

HEADLINE = [q for q in bench_sf1.HEADLINE if q != "dedup_srp"]

# Excluded from --full: each is already decomposed IN THIS FILE as
# quadratic-by-construction at a corpus-size-dependent granularity
# parameter, with its measured scale knob in the headline table. Re-timing
# the saturated forms at 10x the pair count adds tens of minutes and no
# information.
FULL_SKIP = ("dedup_srp", "dedup_srp_scaled", "dedup_semantic", "dedup_embedding")


def run_full_surface_sf10(spark, qs, sf1_dir: str, sf10_dir: str) -> list[str]:
    """--full: every `queries()` entry once at sf1 and once at sf10 —
    third-decade screening for the WHOLE surface, so super-linearity
    hiding behind fixed overhead in the sf0.1→sf1 table (as the
    embedding-cell operators did) has nowhere left to hide."""
    rows = []
    n_run = 0
    for name, fn in qs.items():
        if name in FULL_SKIP:
            print(f"  {name}: skipped (decomposed above)", flush=True)
            continue
        # recycle the session every 25 queries: ~90 sf10-sized queries in
        # one 8g-driver JVM accumulated enough heap (result frames, AQE
        # stats, shuffle metadata) to OOM an executor thread mid-shuffle —
        # same lesson as bench_streaming's fresh-session-per-job
        if n_run and n_run % 25 == 0:
            spark.stop()
            spark = get_spark("sf10-bench")
        n_run += 1
        rec = {"q": name}
        for key, d in (("1", sf1_dir), ("10", sf10_dir)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, d)
            df.write.format("noop").mode("overwrite").save()
            rec[f"t{key}"] = round(time.perf_counter() - t0, 2)
            rec[f"n{key}"] = df.count()
        rec["exponent"] = round(math.log10(rec["t10"] / max(rec["t1"], 0.01)), 2)
        rows.append(rec)
        print(f"  {name}: sf1 {rec['t1']}s/{rec['n1']}r  "
              f"sf10 {rec['t10']}s/{rec['n10']}r  exp {rec['exponent']}", flush=True)
    total1 = round(sum(r["t1"] for r in rows), 1)
    total10 = round(sum(r["t10"] for r in rows), 1)
    flagged = [r["q"] for r in rows if r["exponent"] > SUPERLINEAR_GATE]
    lines = [
        f"## Full {len(rows)}-query surface at sf10 (single-shot per scale)",
        "",
        f"Skipped (decomposed in the headline section, knob rows measured): "
        f"{list(FULL_SKIP)}.",
        "",
        f"Totals: sf1 **{total1} s**, sf10 **{total10} s** "
        f"(x{round(total10 / total1, 2)} for 10x data). "
        f"Queries above the {SUPERLINEAR_GATE} exponent gate: "
        f"{flagged or 'none'}.",
        "",
        "| query | sf1 s | sf10 s | exponent | rows sf1 | rows sf10 |",
        "|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: -r["exponent"]):
        mark = " **FLAG**" if r["exponent"] > SUPERLINEAR_GATE else ""
        lines.append(
            f"| {r['q']} | {r['t1']} | {r['t10']} | {r['exponent']}{mark} "
            f"| {r['n1']} | {r['n10']} |"
        )
    lines.append("")
    return lines


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("sf10-bench")
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    sf10_dir = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
    if not os.path.exists(f"{sf1_dir}/embeddings.parquet"):
        print(f"building sf1 scale-up at {sf1_dir}:", flush=True)
        bench_sf1.build_sf1(spark, sf1_dir)
    if not os.path.exists(f"{sf10_dir}/embeddings.parquet"):
        print(f"building sf10 scale-up at {sf10_dir}:", flush=True)
        saved = bench_sf1.REPLICAS
        bench_sf1.REPLICAS = SF10_REPLICAS
        try:
            bench_sf1.build_sf1(spark, sf10_dir)
        finally:
            bench_sf1.REPLICAS = saved

    qs = dict(entrymod.queries())
    rows = []
    for name in HEADLINE:
        t1 = bench_sf1.time_query(qs[name], spark, sf1_dir)
        t10 = bench_sf1.time_query(qs[name], spark, sf10_dir)
        exp = math.log10(t10 / t1)
        rows.append(dict(q=name, t1=round(t1, 2), t10=round(t10, 2),
                         exponent=round(exp, 2)))
        print(f"  {name}: sf1 {rows[-1]['t1']}s  sf10 {rows[-1]['t10']}s  "
              f"exp {rows[-1]['exponent']}", flush=True)

    # `dedup_srp_scaled`'s 96/8 banding (12-bit bands = bands*2^12 ~ 32k
    # vector capacity) saturates at n=500k — the EXPECTED flag per its own
    # b ~ log2(n) rule. Measure the rule's third-decade setting (152/8 =
    # 19-bit bands, 2^19 ~ n) alongside, as srp_third_decade_knob — a
    # library-parameter measurement, not a driver query.
    from flinkproject_spark.operators import dedup as _dedup

    def _srp19(spark_, d):
        return _dedup.srp_lsh_near_dups(
            spark_.read.parquet(f"{d}/embeddings.parquet"), bits=152, bands=8
        )

    t1 = bench_sf1.time_query(_srp19, spark, sf1_dir)
    t10 = bench_sf1.time_query(_srp19, spark, sf10_dir)
    rows.append(dict(q="srp_third_decade_knob (152/8, non-driver)",
                     t1=round(t1, 2), t10=round(t10, 2),
                     exponent=round(math.log10(t10 / t1), 2)))
    print(f"  srp_third_decade_knob: sf1 {rows[-1]['t1']}s  "
          f"sf10 {rows[-1]['t10']}s  exp {rows[-1]['exponent']}", flush=True)

    # Same story, second instance: `dedup_semantic`'s coarse quantizer is
    # the testdata's FIXED 10-label assignment, so cell population grows
    # linearly with the corpus and the per-cell O(m^2) cosine matrix is
    # quadratic overall (sf10: 21.8k-row cells, ~3.8 GB matrices, 10-way
    # parallelism). semdedup's max_cell_rows knob refines oversized cells
    # by deterministic SRP sub-buckets — the paper's own k-grows-with-
    # corpus practice. Measure driver form AND knob form.
    for label, fn in (
        ("dedup_semantic (driver form, fixed 10-cell quantizer)",
         lambda s, d: _dedup.semdedup(s.read.parquet(f"{d}/embeddings.parquet"))),
        ("semdedup_cell_cap_knob (max_cell_rows=2000, non-driver)",
         lambda s, d: _dedup.semdedup(
             s.read.parquet(f"{d}/embeddings.parquet"), max_cell_rows=2000)),
        ("dedup_embedding (driver form, fixed 10-cell quantizer)",
         lambda s, d: _dedup.embedding_near_dups(
             s.read.parquet(f"{d}/embeddings.parquet"))),
        ("embedding_near_dups_cell_cap_knob (max_cell_rows=2000, non-driver)",
         lambda s, d: _dedup.embedding_near_dups(
             s.read.parquet(f"{d}/embeddings.parquet"), max_cell_rows=2000)),
    ):
        t1 = bench_sf1.time_query(fn, spark, sf1_dir)
        t10 = bench_sf1.time_query(fn, spark, sf10_dir)
        rows.append(dict(q=label, t1=round(t1, 2), t10=round(t10, 2),
                         exponent=round(math.log10(t10 / t1), 2)))
        print(f"  {label}: sf1 {rows[-1]['t1']}s  sf10 {rows[-1]['t10']}s  "
              f"exp {rows[-1]['exponent']}", flush=True)

    flagged = [r["q"] for r in rows if r["exponent"] > SUPERLINEAR_GATE]
    total1 = round(sum(r["t1"] for r in rows), 1)
    total10 = round(sum(r["t10"] for r in rows), 1)
    lines = [
        "# Headline-tier sf1 -> sf10 scaling (third decade)",
        "",
        "Generated by `python tools/bench_sf10.py` (local[32], best-of-2 "
        "per scale per query, noop sink). sf10 = the deterministic 100x "
        "scale-up of sf0.1 via `bench_sf1.build_sf1(REPLICAS=100)` — same "
        "disjoint-shingle / sign-mask / key-offset construction, so "
        "per-key structure stays sf0.1's while volume grows 100x. "
        "Exponent = log10(t_sf10 / t_sf1): 1.0 = linear; > "
        f"{SUPERLINEAR_GATE} flagged. A full clean decade above sf1 — "
        "the strongest single-box read on the 100 TB scaling posture.",
        "",
        "`dedup_srp` (fixed 16/4 banding) is excluded BY DESIGN, not "
        "silently: BENCH_SF1.md decomposes it as quadratic-by-construction "
        "at this corpus shape; its oracle-verified scale knob "
        "`dedup_srp_scaled` is measured below.",
        "",
        "**`dedup_srp_scaled` flags HERE by the same mechanism, on "
        "schedule**: its 96/8 banding (12-bit bands) has capacity "
        "bands*2^12 ~ 32k vectors — right for the sf1 corpus it was "
        "tuned to, saturated at sf10's n=500k, where spurious candidates "
        "grow as C(n,2)*bands/2^b. The operator's documented rule "
        "(b ~ log2 n) prescribes ~19-bit bands at this n; the "
        "`srp_third_decade_knob` row below re-runs the SAME "
        "`srp_lsh_near_dups` with bits=152, bands=8 (2^19 ~ n) and "
        "scaling is restored (the standard LSH recall re-tune applies — "
        "per-band true-pair collision is (1-theta/pi)^19, so a recall "
        "target needs more bands). The driver query keeps the sf1-tuned "
        "setting because its DuckDB oracle regenerates exactly that "
        "parameterization; LSH banding is corpus-size-dependent BY "
        "DESIGN, not an engine defect.",
        "",
        "**`dedup_semantic` and `dedup_embedding` are the second "
        "quantizer-granularity case**: the testdata's fixed 10-label "
        "coarse quantizer means cell population grows linearly with the "
        "corpus, making the per-cell O(m^2) cosine work quadratic "
        "overall (21.8k-row cells at sf10). The shared "
        "`max_cell_rows` knob (`_refine_oversized_cells`) splits "
        "oversized cells by deterministic 20-bit SRP sub-buckets "
        "(SemDeDup's k grows with the corpus in the paper itself — 50k "
        "clusters for LAION); the knob rows restore linear work and "
        "full parallelism, with output pinned identical when the cap "
        "doesn't bind and pair-subset semantics when it does. The "
        "driver queries keep the raw labels because their oracles "
        "regenerate that exact cell assignment.",
        "",
        f"Totals: sf1 **{total1} s**, sf10 **{total10} s** "
        f"(x{round(total10 / total1, 2)} for 10x data). Flagged: "
        f"{flagged or 'none'}.",
        "",
        "| query | sf1 s | sf10 s | exponent |",
        "|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: -r["exponent"]):
        mark = " **FLAG**" if r["exponent"] > SUPERLINEAR_GATE else ""
        lines.append(f"| {r['q']} | {r['t1']} | {r['t10']} "
                     f"| {r['exponent']}{mark} |")
    lines.append("")
    if "--full" in sys.argv:
        print("full query surface:", flush=True)
        lines += run_full_surface_sf10(spark, qs, sf1_dir, sf10_dir)
    out = "/root/repo/BENCH_SF10.md"
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}; flagged: {flagged or 'none'}")


if __name__ == "__main__":
    main()
