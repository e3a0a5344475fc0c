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


def test_mean6_documented_sum_bound_is_exact_at_the_frontier(spark):
    """Lock the |2*S_micro + n| <= 2^53 domain the mean6 docstring claims
    (ADVICE r06): (a) the kernel is still bit-exact vs pure-integer math
    at a sum chosen to land the numerator AT the frontier; (b) the bound
    is real — the first integers past 2^53 no longer round-trip through
    double, which is exactly the failure mode the docstring warns new
    call sites about."""
    import math

    from flinkproject_spark import functions as K

    LIM = 1 << 53
    # (b) the premise: round-trip exactness ends exactly at 2^53
    assert all(float(v) == v for v in range(LIM - 8, LIM + 1))
    assert any(float(v) != v for v in range(LIM + 1, LIM + 9))

    # (a) numerator 2*S+n == 2^53 - 1 (odd -> a half case, the hard kind);
    # the decimal comes from a STRING — a double division here would
    # itself lose micro-units at this magnitude, which is the point
    for n in (1, 3, 7):
        s_micro = (LIM - 1 - n) // 2
        txt = f"{s_micro // 1_000_000}.{s_micro % 1_000_000:06d}"
        df = spark.createDataFrame([(txt,)], "t string").select(
            F.col("t").cast("decimal(18,6)").alias("v")
        )
        got = df.agg(
            K.mean6(F.sum("v"), F.lit(n).cast("bigint")).alias("mean")
        ).first()["mean"]
        assert got == math.floor((2 * s_micro + n) / (2 * n)) / 1_000_000


# ---------------------------------------------------------------------------
# CEP NFA equivalence (VERDICT r05 #8): the generalized machine
# (operators/cep.py run_machine) vs an independently-written brute-force
# matcher of the DOCUMENTED semantics — single greedy run per key, per-
# transition next/followedBy contiguity (times(k) spelled as repeated
# steps), within-budget timeouts (event-time proof + end-of-key flush),
# after-match reseed by the completing event. The property also pins
# Arrow-batch-boundary invariance: run_machine fed arbitrary chunkings
# with (cur_key, partial) state carry must emit exactly the one-shot
# sequence. Pure numpy/python — no Spark session, so 300+ cases are cheap.
# ---------------------------------------------------------------------------

def _brute_force_cep(streams, preds, strict, within_s):
    """Reference matcher: per key, a plain event loop over (eid, ts, ety)
    tuples with predicate sets checked by membership — no matrices, no
    state carry, no batching. Deliberately re-derived from the docstring
    semantics, not from run_machine's code."""
    n = len(preds)
    out = []
    for key in sorted(streams):
        partial = []
        for eid, t, ety in streams[key]:
            if partial and t > partial[0][1] + within_s:
                out.append((key, "timeout", tuple(partial)))
                partial = []
            consumed = False
            if partial:
                j = len(partial)
                if ety in preds[j]:
                    partial = partial + [(eid, t, ety)]
                    consumed = True
                    if len(partial) == n:
                        out.append((key, "match", tuple(partial)))
                        partial = [(eid, t, ety)] if ety in preds[0] else []
                elif strict[j]:
                    partial = []
            if not partial and not consumed and ety in preds[0]:
                partial = [(eid, t, ety)]
                if n == 1:
                    out.append((key, "match", tuple(partial)))
                    partial = []
        if partial:
            out.append((key, "timeout", tuple(partial)))
    return out


def _normalize_emissions(emissions):
    return [
        (int(k), kind, tuple((int(e), int(t), str(y)) for e, t, y in steps))
        for k, kind, steps in emissions
    ]


@st.composite
def _cep_case(draw):
    import numpy as np

    alphabet = "abc"
    n = draw(st.integers(min_value=1, max_value=4))
    preds = [
        frozenset(draw(st.sets(st.sampled_from(alphabet), min_size=1, max_size=3)))
        for _ in range(n)
    ]
    contiguity = (
        draw(
            st.one_of(
                st.none(),
                st.lists(
                    st.sampled_from(["next", "followedBy"]),
                    min_size=n - 1,
                    max_size=n - 1,
                ),
            )
        )
        if n > 1
        else None
    )
    within_s = draw(st.integers(min_value=1, max_value=12))
    n_keys = draw(st.integers(min_value=1, max_value=3))
    streams, rows, eid = {}, [], 0
    for key in range(n_keys):
        gaps_types = draw(
            st.lists(
                st.tuples(st.integers(0, 8), st.sampled_from(alphabet)),
                max_size=25,
            )
        )
        t, evs = 0, []
        for gap, ety in gaps_types:
            t += gap
            evs.append((eid, t, ety))
            eid += 1
        streams[key] = evs
        rows += [(key, e, ts, y) for e, ts, y in evs]
    # arbitrary consecutive chunking of the (key, ts, eid)-ordered rows
    cuts = sorted(
        draw(st.sets(st.integers(1, max(1, len(rows) - 1)), max_size=6))
    ) if len(rows) > 1 else []
    return preds, contiguity, within_s, streams, rows, cuts


@settings(max_examples=300, deadline=None)
@given(_cep_case())
def test_cep_machine_equals_brute_force_and_is_batch_invariant(case):
    import numpy as np

    from flinkproject_spark.operators import cep

    preds, contiguity, within_s, streams, rows, cuts = case
    n = len(preds)
    strict = cep.strict_array(n, contiguity)
    want = _brute_force_cep(streams, preds, strict, within_s)

    def arrays(chunk):
        keys = np.array([r[0] for r in chunk], dtype=np.int64)
        eids = np.array([r[1] for r in chunk], dtype=np.int64)
        ts = np.array([r[2] for r in chunk], dtype=np.int64)
        etypes = np.array([r[3] for r in chunk], dtype=object)
        P = np.array(
            [[r[3] in p for p in preds] for r in chunk], dtype=bool
        ).reshape(len(chunk), n)
        return keys, eids, ts, etypes, P

    # one-shot
    keys, eids, ts, etypes, P = arrays(rows)
    got, partial, cur_key = cep.run_machine(
        keys, eids, ts, etypes, P, within_s, None, [], strict
    )
    if partial:
        got = got + [(cur_key, "timeout", partial)]
    assert _normalize_emissions(got) == want

    # chunked with state carry (Arrow-batch boundary invariance)
    got2, partial, cur_key = [], [], None
    for lo, hi in zip([0] + cuts, cuts + [len(rows)]):
        chunk = rows[lo:hi]
        if not chunk:
            continue
        keys, eids, ts, etypes, P = arrays(chunk)
        ems, partial, cur_key = cep.run_machine(
            keys, eids, ts, etypes, P, within_s, cur_key, partial, strict
        )
        got2 += ems
    if partial:
        got2 = got2 + [(cur_key, "timeout", partial)]
    assert _normalize_emissions(got2) == want


def test_cep_pattern_end_to_end_matches_brute_force(spark):
    """Wiring twin of the machine property: the full cep_pattern operator
    (SQL-predicate compilation, narrow projection, one-shuffle
    mapInPandas, emissions_frame) on a seeded random corpus must emit
    exactly the brute-force matcher's (key, kind, step event_ids)
    multiset. Mixed contiguity + a times(2) spelled as repeated steps."""
    import numpy as np

    from flinkproject_spark.operators import cep

    rng = np.random.RandomState(7)
    rows, eid = [], 0
    for key in range(5):
        t = 0
        for _ in range(40):
            t += int(rng.randint(0, 7))
            rows.append((key, eid, t, "abc"[rng.randint(3)]))
            eid += 1
    df = spark.createDataFrame(
        [
            (k, e, f"2021-01-01 00:{t // 60:02d}:{t % 60:02d}", y)
            for k, e, t, y in rows
        ],
        "user_id bigint, event_id bigint, ts string, event_type string",
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"), "event_type")

    preds = [frozenset("ab"), frozenset("a"), frozenset("a"), frozenset("abc")]
    sql_steps = [
        "event_type IN ('a','b')",
        "event_type = 'a'",
        "event_type = 'a'",  # times(2) on 'a' via repetition
        "event_type IN ('a','b','c')",
    ]
    contiguity = ["followedBy", "next", "followedBy"]
    within_s = 15
    strict = cep.strict_array(4, contiguity)
    streams = {}
    for k, e, t, y in rows:
        streams.setdefault(k, []).append((e, t, y))
    want = sorted(
        (k, kind, tuple(e for e, _, _ in steps))
        for k, kind, steps in _brute_force_cep(streams, preds, strict, within_s)
    )
    got = sorted(
        (
            r.user_id,
            r.match_kind,
            tuple(
                int(r[f"s{i}_event_id"])
                for i in range(4)
                if r[f"s{i}_event_id"] is not None
            ),
        )
        for r in cep.cep_pattern(
            df, sql_steps, within_s, contiguity=contiguity
        ).collect()
    )
    assert got == want and any(kind == "match" for _, kind, _ in want)


# ---------------------------------------------------------------------------
# A8 interval join vs brute force: inclusive bounds at exact edges, inner
# and left-outer forms, on random (key, hour-offset) event layouts. The
# fixed-data tests pin the boundary rows; this pins the SEMANTICS over
# arbitrary layouts (including exact-boundary hits, multi-match fan-out,
# and orders with no lines at all).
# ---------------------------------------------------------------------------

@st.composite
def _interval_case(draw):
    n_orders = draw(st.integers(min_value=1, max_value=6))
    orders = []
    for i in range(n_orders):
        key = draw(st.integers(min_value=0, max_value=3))
        hour = draw(st.integers(min_value=0, max_value=400))
        orders.append((i, key, hour))
    lines = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),    # join key
                st.integers(min_value=0, max_value=400),  # shipdate hour
            ),
            max_size=12,
        )
    )
    before = draw(st.integers(min_value=0, max_value=3))
    after = draw(st.integers(min_value=0, max_value=10))
    return orders, lines, before, after


@settings(max_examples=12, deadline=None)
@given(_interval_case())
def test_interval_join_matches_brute_force(spark, case):
    from datetime import datetime, timedelta

    from flinkproject_spark.operators import joins

    orders, lines, before, after = case
    base = datetime(2024, 1, 1)

    # join key IS o_orderkey in the operator (several orders may share
    # it — real fan-out); order identity carried in o_custkey
    odf = spark.createDataFrame(
        [(key, 100 + i, base + timedelta(hours=h)) for i, key, h in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp",
    )
    ldf = spark.createDataFrame(
        [
            (key, j, 1, 10.0, 1.0, base + timedelta(hours=h))
            for j, (key, h) in enumerate(lines)
        ],
        "l_orderkey bigint, l_linenumber int, l_partkey bigint, "
        "l_extendedprice double, l_quantity double, l_shipdate timestamp",
    )

    lo, hi = timedelta(days=before), timedelta(days=after)
    want_inner = sorted(
        (key, 100 + i, j)
        for i, key, oh in orders
        for j, (lkey, lh) in enumerate(lines)
        if lkey == key
        and base + timedelta(hours=oh) - lo
        <= base + timedelta(hours=lh)
        <= base + timedelta(hours=oh) + hi
    )
    got_inner = sorted(
        (r.o_orderkey, r.o_custkey, r.l_linenumber)
        for r in joins.interval_join_orders_lineitem(
            odf, ldf, days_before=before, days_after=after
        ).collect()
    )
    assert got_inner == want_inner

    matched_orders = {(k, c) for k, c, _ in want_inner}
    want_outer = sorted(
        [(key, j) for key, _, j in want_inner]
        + [
            (key, -1)
            for i, key, _ in orders
            if (key, 100 + i) not in matched_orders
        ]
    )
    got_outer = sorted(
        (r.o_orderkey, r.line_no)
        for r in joins.interval_join_outer(
            odf, ldf, days_before=before, days_after=after
        ).collect()
    )
    assert got_outer == want_outer


# ---------------------------------------------------------------------------
# B6 upsert_parquet vs a dict model: arbitrary batch sequences must leave
# the bucketed-parquet dim equal to "last writer per pk" (batches have
# unique pks — the operator's documented determinism domain), across
# bucket boundaries and first-write table creation.
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.integers(min_value=0, max_value=15),          # pk
            st.text(alphabet="abcxyz", min_size=1, max_size=6),  # value
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_upsert_parquet_equals_last_writer_model(spark, tmp_path_factory, batches):
    from flinkproject_spark.operators import routing

    path = str(tmp_path_factory.mktemp("upsert_prop") / "dim")
    model: dict[int, str] = {}
    for batch in batches:
        df = spark.createDataFrame(
            list(batch.items()), "pk bigint, val string"
        )
        routing.upsert_parquet(df, path, "pk", n_buckets=4)
        model.update(batch)
    got = {
        r.pk: r.val for r in spark.read.parquet(path).select("pk", "val").collect()
    }
    assert got == model


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=14),
        min_size=2, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_duplicated_spans_equals_bruteforce_on_random_corpora(spark, word_lists, w):
    """Property: on arbitrary tiny-vocabulary corpora (dense gram
    collisions, duplicate docs, within-doc repetition, docs shorter than
    the window), duplicated_spans matches an independent brute-force
    matcher exactly — spans, gram counts, and multiplicity. Within-doc
    repetition alone must NOT mark (min_docs counts DISTINCT documents)."""
    from flinkproject_spark.operators import dedup

    rows = [(i, " ".join(ws), "en") for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {tuple(r) for r in dedup.duplicated_spans(df, w=w).collect()}

    toks = {i: (ws if ws else [""]) for i, ws in enumerate(word_lists)}
    owners: dict[tuple, set] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - w + 1):
            owners.setdefault(tuple(ts[p : p + w]), set()).add(i)
    expect = set()
    for i, ts in toks.items():
        marked = [
            (p, len(owners[tuple(ts[p : p + w])]))
            for p in range(len(ts) - w + 1)
            if len(owners[tuple(ts[p : p + w])]) >= 2
        ]
        spans: list[list[int]] = []  # [start, end_excl, n_grams, nd_max]
        for p, nd in marked:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = p + w
                spans[-1][2] += 1
                spans[-1][3] = max(spans[-1][3], nd)
            else:
                spans.append([p, p + w, 1, nd])
        for s, e, n, nd in spans:
            expect.add((i, s, e - s, n, nd))
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    users=st.lists(st.integers(0, 500), min_size=1, max_size=120),
    split=st.integers(2, 4),
)
def test_hll_merge_equals_direct_on_random_splits(spark, users, split):
    """The merge property the streaming sink rests on: registers built
    from ANY partition of the input and folded with MAX must equal the
    registers of the whole — for arbitrary multisets and split counts."""
    from flinkproject_spark.operators import relational

    rows = [(i, "2024-01-0%d" % ((i % split) + 1), u) for i, u in enumerate(users)]
    df = spark.createDataFrame(rows, ["event_id", "d", "user_id"]).select(
        "event_id", F.to_timestamp("d").alias("ts"), "user_id"
    )
    whole = {
        (r.scope, r.reg): r.rho for r in relational.hll_registers(df).collect()
    }
    merged: dict = {}
    for s in range(split):
        part = relational.hll_registers(
            df.filter(F.pmod("event_id", F.lit(split)) == s)
        ).collect()
        for r in part:
            k = (r.scope, r.reg)
            merged[k] = max(merged.get(k, 0), r.rho)
    assert merged == whole


def test_kmeans_assignment_is_argmin_with_cid_tiebreak(spark, sf_dir):
    """Every assigned (cid, d2) must be the true integer-L2 argmin over
    the trained centroid table, ties resolved to the smallest cid —
    recomputed independently in numpy from the collected centroids."""
    import numpy as np

    from flinkproject_spark import catalog
    from flinkproject_spark.operators import similarity

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    fit = similarity.kmeans_fit(emb).collect()
    cids = np.array([r.cid for r in fit])
    C = np.array([r.cent for r in fit], dtype=np.int64)
    order = np.argsort(cids)
    cids, C = cids[order], C[order]
    got = similarity.kmeans_assign(emb).collect()
    X = {
        r.vec_id: np.array(r.qv, dtype=np.int64)
        for r in emb.select(
            "vec_id", similarity._km_quantize().alias("qv")
        ).collect()
    }
    for r in got:
        d = ((C - X[r.vec_id]) ** 2).sum(axis=1)
        best = int(d.min())
        assert r.d2 == best
        assert r.cid == int(cids[d == best].min())  # smallest-cid tie-break


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=-1000, max_value=1000,
                      allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_histogram_quantile_edges_bound_true_quantiles(spark, rows):
    """The histogram sketch's defining guarantee on RANDOM inputs: for
    every scope and percentile p, the reported edge is the lower edge of
    the bin holding the true rank-ceil(p*n/100) element — so the true
    quantile q_true satisfies edge <= q_true < edge + bin_width (in
    quantized units). Checks the guarantee for the merged '__all__' row
    too (the sum-merge path)."""
    import math

    from flinkproject_spark.operators import relational

    df = spark.createDataFrame(
        [(i, t, float(v)) for i, (t, v) in enumerate(rows)],
        ["event_id", "event_type", "value"],
    )
    out = relational.histogram_quantile_report(df).collect()
    from decimal import Decimal, ROUND_HALF_UP

    qv = [
        (t, int(Decimal(repr(float(v) * 1000)).quantize(0, ROUND_HALF_UP)))
        for t, v in rows
    ]
    lo = min(q for _, q in qv)
    hi = max(q for _, q in qv)
    width = (hi - lo) // relational.HISTQ_BINS + 1  # the operator's divide-first width
    for r in out:
        sub = sorted(q for t, q in qv if r.scope == "__all__" or t == r.scope)
        assert r.n == len(sub)
        for p in relational.HISTQ_PCTS:
            true_q = sub[math.ceil(p * len(sub) / 100) - 1]
            edge = getattr(r, f"q{p}_edge")
            assert edge <= true_q, (r.scope, p, edge, true_q)
            assert true_q < edge + width + 1, (r.scope, p, edge, true_q, width)


@settings(**SETTINGS)
@given(
    st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),
            st.sampled_from(list("小米手机性价比研究生命科学 ,.，。!abc123")),
        ),
        max_size=60,
    )
)
def test_cjk_segmentation_lossless_on_word_chars(s):
    """The segmenter's conservation law on RANDOM mixed text: every CJK
    character and every \\w word character of the input appears in the
    token stream exactly as many times as it occurs (dictionary matching
    reorders NOTHING and drops ONLY delimiters), tokens are non-empty,
    and CJK tokens never exceed the longest lexicon word."""
    import re
    from collections import Counter

    from flinkproject_spark.operators import cjk

    toks = cjk.segment(s)
    assert all(toks), "empty token emitted"
    kept = Counter(c for c in s if cjk.is_cjk(c) or re.match(r"\w", c))
    got = Counter("".join(toks))
    assert got == kept
    for t in toks:
        if any(cjk.is_cjk(c) for c in t):
            assert len(t) <= cjk.MAX_WORD_LEN
