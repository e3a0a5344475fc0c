"""Property-based tests (hypothesis) for the cross-engine kernel contracts —
the invariants every oracle comparison silently depends on."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from flinkproject_spark import functions as K

SETTINGS = dict(max_examples=20, deadline=None)


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=40), min_size=1, max_size=20))
def test_hash64_nonnegative_and_stable(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], ["s"])
    got = [r.h for r in df.select(K.hash64("s").alias("h")).collect()]
    assert all(0 <= h < 2**60 for h in got)
    again = [r.h for r in df.select(K.hash64("s").alias("h")).collect()]
    assert got == again


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=K.MINHASH_P - 1), min_size=1, max_size=20),
       st.integers(min_value=0, max_value=15))
def test_minhash_member_stays_in_field(spark, hs, i):
    df = spark.createDataFrame([(h,) for h in hs], ["h"])
    got = [r.m for r in df.select(K.minhash_member(F.col("h"), i).alias("m")).collect()]
    assert all(0 <= m < K.MINHASH_P for m in got)
    # the affine map with a != 0 is a bijection mod P: distinct in -> distinct out
    assert len(set(got)) == len(set(hs))


@settings(**SETTINGS)
@given(st.lists(st.decimals(min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"),
                            places=2, allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30))
def test_money_sum_is_exact_decimal_sum(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    (got,) = df.select(K.money_sum("v").alias("s")).first()
    # exact decimal accumulation of the 2-dp-quantized doubles
    want = float(sum(Decimal(str(float(v))).quantize(Decimal("0.01")) for v in vals))
    assert got == want


# ---------------------------------------------------------------------------
# A12 bounce semantics: the single next-too-late-or-missing predicate is
# equivalent to the reference's strict-contiguity CEP (match branch + timeout
# branch, UserJumpDetailApp.java:68-92) whenever session_gap >= bounce_gap.
# Pure-Python models mirror the two operators' window expressions exactly;
# tests/test_operators.py bridges the models to the Spark operators on real
# data.
# ---------------------------------------------------------------------------

def _entries(ts: list[int], gap_s: int) -> list[bool]:
    return [i == 0 or ts[i] - ts[i - 1] > gap_s for i in range(len(ts))]


def bounce_simple_model(ts: list[int], gap_s: int, bounce_s: int) -> set[int]:
    e = _entries(ts, gap_s)
    return {
        i for i in range(len(ts))
        if e[i] and (i == len(ts) - 1 or ts[i + 1] - ts[i] > bounce_s)
    }


def bounce_strict_model(ts: list[int], gap_s: int, bounce_s: int) -> set[int]:
    e = _entries(ts, gap_s)
    out = set()
    for i in range(len(ts)):
        if not e[i]:
            continue
        last = i == len(ts) - 1
        timed_out = last or ts[i + 1] - ts[i] > bounce_s
        matched = not last and e[i + 1] and ts[i + 1] - ts[i] <= bounce_s
        if timed_out or matched:
            out.add(i)
    return out


@st.composite
def _session_case(draw):
    gap_s = draw(st.integers(min_value=10, max_value=3600))
    bounce_s = draw(st.integers(min_value=1, max_value=gap_s))  # valid regime
    gaps = draw(st.lists(st.integers(min_value=1, max_value=2 * gap_s), max_size=30))
    ts, t = [0], 0
    for g in gaps:
        t += g
        ts.append(t)
    return ts, gap_s, bounce_s


@settings(max_examples=300, deadline=None)
@given(_session_case())
def test_bounce_strict_equivalent_when_session_gap_dominates(case):
    ts, gap_s, bounce_s = case
    assert bounce_simple_model(ts, gap_s, bounce_s) == bounce_strict_model(ts, gap_s, bounce_s)


def test_bounce_models_diverge_when_bounce_gap_exceeds_session_gap():
    # entry at t=0; next event 700 s later is ITSELF an entry (gap > 600)
    # and inside the 1200 s bounce window: the CEP match branch fires
    # (strict => bounce) while the simple predicate sees a next event in
    # time (=> no bounce). The equivalence precondition is necessary.
    ts, gap_s, bounce_s = [0, 700], 600, 1200
    assert bounce_strict_model(ts, gap_s, bounce_s) == {0, 1}
    assert bounce_simple_model(ts, gap_s, bounce_s) == {1}


# ---------------------------------------------------------------------------
# Chunking coverage model: n_chunks = max(1, ceil((n-overlap)/stride)) must
# cover every token, overlap consecutive chunks by exactly `overlap`, and
# never emit an empty or out-of-range chunk.
# ---------------------------------------------------------------------------

def chunk_starts_model(n: int, chunk: int, overlap: int) -> list[int]:
    stride = chunk - overlap
    n_chunks = max((max(n - overlap, 1) + stride - 1) // stride, 1)
    return [i * stride for i in range(n_chunks)]


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    chunk=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunk_model_covers_all_tokens(n, chunk, data):
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    starts = chunk_starts_model(n, chunk, overlap)
    # every chunk starts in range and is non-empty
    assert all(0 <= s < max(n, 1) for s in starts)
    # full coverage: last chunk reaches the end
    assert min(starts[-1] + chunk, n) == n or starts[-1] + chunk >= n
    # no gaps: consecutive chunks overlap by exactly `overlap` (or more at
    # the tail when the final chunk is short)
    stride = chunk - overlap
    assert all(b - a == stride for a, b in zip(starts, starts[1:]))
    # minimality: dropping the last chunk would leave tokens uncovered
    # (except the degenerate single-chunk case)
    if len(starts) > 1:
        assert starts[-2] + chunk < n


@settings(**SETTINGS)
@given(st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=2, max_size=16))
def test_cosine_kernel_self_similarity(spark, vec):
    from flinkproject_spark.operators.similarity import with_norm, cosine_expr

    if sum(v * v for v in vec) == 0:
        return
    df = spark.createDataFrame([(1, [float(v) for v in vec])], ["vec_id", "embedding"])
    e = with_norm(df)
    pair = e.select(
        F.col("emb").alias("emb_a"), F.col("emb").alias("emb_b"),
        F.col("norm").alias("norm_a"), F.col("norm").alias("norm_b"),
    )
    (cos,) = pair.select(F.round(cosine_expr("emb_a", "emb_b", "norm_a", "norm_b"), 6).alias("c")).first()
    assert abs(cos - 1.0) < 1e-5


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=4),
    st.lists(st.tuples(st.integers(0, 999), st.integers(0, 999), st.integers(0, 9999)),
             min_size=0, max_size=4),
    st.lists(st.tuples(st.integers(0, 999), st.integers(0, 99), st.integers(0, 9999)),
             min_size=0, max_size=3),
    st.lists(st.tuples(*[st.integers(0, 255)] * 4), min_size=0, max_size=3),
    st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=1, max_size=10),
)
def test_redact_pii_counts_exact_and_scrub_complete(spark, em, ph, ssn, ip, words):
    """Property: with space-separated tokens, per-class counts equal the
    number of injected instances, and NO pattern matches survive in the
    redacted text (the placeholder tokens cannot re-trigger any pattern)."""
    from flinkproject_spark.operators import text as T

    pii = (
        [f"u{n}@example.com" for n in em]
        + [f"{a:03d}-{b:03d}-{c:04d}" for a, b, c in ph]
        + [f"{a:03d}-{b:02d}-{c:04d}" for a, b, c in ssn]
        + [".".join(str(o) for o in q) for q in ip]
    )
    # deterministic interleave of filler and PII tokens
    toks = []
    for i in range(max(len(pii), len(words))):
        if i < len(words):
            toks.append(words[i])
        if i < len(pii):
            toks.append(pii[i])
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id bigint, text string")
    r = T.redact_pii(df).first()
    assert r.n_email == len(em)
    assert r.n_phone == len(ph)
    assert r.n_ssn == len(ssn)
    assert r.n_ipv4 == len(ip)
    assert r.n_pii == len(pii)
    residual = spark.createDataFrame([(1, r.redacted)], "doc_id bigint, text string")
    r2 = T.redact_pii(residual).first()
    assert r2.n_pii == 0 and r2.redacted == r.redacted  # idempotent on scrubbed text


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1, max_size=60,
    )
)
def test_connected_components_star_equals_propagation_random_graphs(spark, edges):
    """Property: on arbitrary random graphs (self-loops, duplicates,
    reversed edges, multi-component), the alternating-star form and the
    pointer-jumping propagation form produce identical labelings."""
    from flinkproject_spark.operators import dedup

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    g = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    a = {r.id: r.cluster_id for r in dedup.connected_components(g).collect()}
    b = {r.id: r.cluster_id for r in dedup.connected_components_star(g).collect()}
    assert a == b


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12),
        min_size=5, max_size=40,
    ),
)
def test_curriculum_is_phase_contiguous_bijection_on_random_corpora(spark, word_lists):
    """Property: on arbitrary corpora (ties, duplicate texts, skewed
    lengths), curriculum_order emits a bijection onto 1..N whose phases
    occupy contiguous position ranges in phase order."""
    from flinkproject_spark.operators import sampling

    rows = [
        (i, " ".join(ws), "en", "s", len(" ".join(ws)))
        for i, ws in enumerate(word_lists)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = sampling.curriculum_order(df, bands=3, shards=4).collect()
    n = len(rows)
    assert sorted(r.global_pos for r in out) == list(range(1, n + 1))
    by_phase: dict[int, list[int]] = {}
    for r in out:
        by_phase.setdefault(r.phase, []).append(r.global_pos)
    hi = 0
    for ph in sorted(by_phase):
        ps = sorted(by_phase[ph])
        assert ps[0] == hi + 1 and ps[-1] == hi + len(ps)
        hi = ps[-1]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=10),
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=3, max_size=30,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_weighted_sample_winners_stable_under_loser_removal(spark, docs, k):
    """The A-ES subset property: priorities are per-doc deterministic, so
    deleting NON-winners can never change the winner set — the invariant
    that makes the draw reproducible under corpus shrinkage/filtering."""
    from flinkproject_spark.operators import sampling

    rows = [
        (i, " ".join(ws), "en", src, len(" ".join(ws)))
        for i, (ws, src) in enumerate(docs)
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)
    win = {r.doc_id for r in sampling.weighted_sample(df, k=k).collect()}
    # drop every other loser
    losers = sorted(set(r[0] for r in rows) - win)
    keep_ids = win | set(losers[::2])
    sub = df.filter(F.col("doc_id").isin([int(i) for i in keep_ids]))
    win2 = {r.doc_id for r in sampling.weighted_sample(sub, k=k).collect()}
    assert win2 == win


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=100,
    )
)
def test_streaming_round_half_up6_matches_spark_round(spark, xs):
    """The streaming twins' Python rounding (Decimal over the shortest
    round-trip repr, HALF_UP) must equal Spark's round(x, 6) BIT-EXACTLY —
    the contract daily_anomalies_stream's replay parity rests on."""
    from flinkproject_spark.streaming.stateful import _round_half_up6

    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    want = [_round_half_up6(x) for x in xs]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefghij"), min_size=3, max_size=12),
        min_size=3, max_size=8,
    ),
    st.data(),
)
def test_minhash_xx_certificate_invariants_hold_on_random_corpora(spark, base_docs, data):
    """The certificate's three invariants are THEOREMS, not observations:
    on any corpus (here: random small-vocab docs plus 0-2 planted verbatim
    clones) `sound` and `exact_dup_recall_ok` must be true and `n_true`
    must count at least the planted clone pairs."""
    from flinkproject_spark.operators import dedup

    texts = [" ".join(ws) for ws in base_docs]
    n_clones = data.draw(st.integers(min_value=0, max_value=min(2, len(texts))))
    clone_rows = [texts[i] for i in range(n_clones)]
    rows = [
        (i, t, "en", "src", len(t))
        for i, t in enumerate(texts + clone_rows)
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)
    cert = dedup.minhash_xx_certificate(df).first()
    assert cert["sound"] is True
    assert cert["exact_dup_recall_ok"] is True
    assert cert["n_true"] >= n_clones  # each clone pairs with its original


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(max_size=60),  # arbitrary garbage incl. unicode/control
            st.text(alphabet='{}[]",:abtrue01\\', max_size=40),  # JSON-ish shrapnel
            st.builds(
                lambda db, tbl, ty: f'{{"database":"{db}","tableName":"{tbl}","before":null,"after":{{"id":"1"}},"type":"{ty}"}}',
                st.sampled_from(["gmall", "x"]),
                st.sampled_from(["order_info", "t"]),
                st.sampled_from(["insert", "update", "delete"]),
            ),
        ),
        min_size=1, max_size=25,
    )
)
def test_parsers_never_crash_and_partition_exactly(spark, raws):
    """Malformed input is a DATA condition, not an exception: the CDC
    envelope decoder and the log parser must consume ANY string — garbage,
    JSON shrapnel, valid envelopes — without raising, preserve row counts,
    and (for logs) split into an exact clean/dirty partition, mirroring
    the reference's dirty side-output (BaseLogApp.java:62-66)."""
    from flinkproject_spark.operators import routing
    from flinkproject_spark.sources import logs

    df = spark.createDataFrame([(r,) for r in raws], ["value"])
    decoded = routing.decode_cdc_envelope(df)
    assert decoded.count() == len(raws)  # no row lost, no exception
    valid = decoded.filter(F.col("type").isNotNull()).count()
    assert valid == sum('"type":' in r for r in raws)

    clean, dirty = logs.parse_logs(df)
    assert clean.count() + dirty.count() == len(raws)  # exact partition


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-20_000_000, max_value=20_000_000),  # micro-units
        min_size=1, max_size=40,
    )
)
def test_mean6_is_cross_engine_exact_including_half_boundaries(spark, micros):
    """The K.mean6 kernel must produce BIT-IDENTICAL values in Spark and
    DuckDB for any DECIMAL(18,6) sum / count — including the exact-half
    quotients where round(double, 6) split the engines (the r05 sf0.1
    find). Integer micro-unit inputs hit half boundaries constantly
    (e.g. sum=3, n=2), so this strategy is adversarial by construction."""
    import duckdb

    from flinkproject_spark import functions as K

    n = len(micros)
    s_micro = sum(micros)
    df = spark.createDataFrame(
        [(m,) for m in micros], "m bigint"
    ).select((F.col("m") / F.lit(1_000_000)).cast("decimal(18,6)").alias("v"))
    got = df.agg(
        K.mean6(F.sum("v"), F.lit(n).cast("bigint")).alias("mean")
    ).first()["mean"]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {K.duck_mean6(f'CAST({s_micro} AS DECIMAL(18,6)) / 1000000', str(n))}"
    ).fetchone()[0]
    assert got == want
    # and it equals the exact rational rounded half-up (toward +inf)
    import math
    assert got == math.floor((2 * s_micro + n) / (2 * n)) / 1_000_000
