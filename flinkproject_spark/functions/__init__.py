"""Scalar-function kernel set (SURVEY.md §2C) + cross-engine helpers.

Every scalar computation the reference performs (datetime parse/format,
string split, conditional flags, age derivation, JSON field access —
reference: utils/DateTimeUtil.java:11-21, app/dwm/OrderWideApp.java:77-146,
app/dws/VisitorStatsApp.java:94-100) exists here as a composable Column
function built from `pyspark.sql.functions` — JVM-side, codegen-friendly,
no Python UDFs in the hot path.

The hash helpers are *cross-engine deterministic*: built from md5 so the
DuckDB oracle can compute bit-identical values (`('0x'||substr(md5(x),1,N))
::BIGINT` on the DuckDB side). Spark's native `xxhash64` would be faster but
is not reproducible outside Spark; for the correctness tier we pay the md5
cost, and the dedup operators take the hash function as a parameter so the
scale tier can swap in `F.xxhash64`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# datetime kernels (reference: utils/DateTimeUtil.java:11-21)
# ---------------------------------------------------------------------------

DT_FMT = "yyyy-MM-dd HH:mm:ss"


def ts_to_str(col: Column | str) -> Column:
    """epoch-ms/timestamp -> 'yyyy-MM-dd HH:mm:ss' (DateTimeUtil.java:13-16)."""
    return F.date_format(col, DT_FMT)


def str_to_ts(col: Column | str) -> Column:
    """'yyyy-MM-dd HH:mm:ss' -> timestamp (DateTimeUtil.java:18-21)."""
    return F.to_timestamp(col, DT_FMT)


def yyyymmdd(col: Column | str) -> Column:
    """ClickHouse ``toYYYYMMDD`` analog (publisher ProductStatsMapper.java:12,26)."""
    return F.date_format(col, "yyyyMMdd")


def create_date(col: Column | str) -> Column:
    """create_time.split(" ")[0] (OrderWideApp.java:77-80)."""
    return F.date_format(col, "yyyy-MM-dd")


def create_hour(col: Column | str) -> Column:
    """create_time.split(" ")[1].split(":")[0] (OrderWideApp.java:77-80)."""
    return F.date_format(col, "HH")


def age_years(birthday: Column | str, on: Column | None = None) -> Column:
    """(now - birthday)/365 days, floor — reproduces the reference's 365-day
    convention, NOT months_between (OrderWideApp.java:138-146)."""
    ref = on if on is not None else F.current_date()
    return F.floor(F.datediff(ref, F.col(birthday) if isinstance(birthday, str) else birthday) / 365)


# ---------------------------------------------------------------------------
# money kernels — exact decimal arithmetic
# ---------------------------------------------------------------------------
# The reference accumulates money in BigDecimal (ProductStatsApp.java:224-232).
# Engine convention: cast doubles to DECIMAL(18,2) *before* aggregating so the
# sum is exact and independent of partition/accumulation order (bit-identical
# between Spark and the DuckDB oracle), then surface as double.


def money(col: Column | str) -> Column:
    return (F.col(col) if isinstance(col, str) else col).cast("decimal(18,2)")


def money_sum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a money column, surfaced as double."""
    return F.sum(money(col)).cast("double")


def revenue(price: Column | str, discount: Column | str) -> Column:
    """l_extendedprice * (1 - l_discount) as exact decimal product."""
    p = money(price)
    d = (F.lit(1.0) - (F.col(discount) if isinstance(discount, str) else discount)).cast(
        "decimal(18,2)"
    )
    return p * d


# ---------------------------------------------------------------------------
# flags / conditionals (VisitorStatsApp.java:94-100, UniqueVisitApp.java:74-76)
# ---------------------------------------------------------------------------


def is_session_entry(last_page_id: Column | str) -> Column:
    """sv flag: 1 when last_page_id is null/empty else 0."""
    c = F.col(last_page_id) if isinstance(last_page_id, str) else last_page_id
    return F.when(F.coalesce(c, F.lit("")) == "", F.lit(1)).otherwise(F.lit(0))


# ---------------------------------------------------------------------------
# cross-engine deterministic hashing
# ---------------------------------------------------------------------------


def hash64(col: Column | str, nhex: int = 15) -> Column:
    """Deterministic non-negative int64 from md5's first `nhex` hex chars.

    15 hex chars = 60 bits, always positive in a signed 64-bit integer.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, nhex), 16, 10).cast("bigint")


def hash32(col: Column | str) -> Column:
    """32-bit variant (8 hex chars) for SimHash bit budgets."""
    return hash64(col, nhex=8)


def duck_hash64(expr: str, nhex: int = 15) -> str:
    """The DuckDB SQL text computing the same value as :func:`hash64`."""
    return f"(('0x' || substr(md5({expr}), 1, {nhex}))::BIGINT)"


# Bloom-filter probe positions via Kirsch-Mitzenmacher double hashing:
# pos_i = (h1 + i*h2) mod m from ONE 60-bit hash64 per element — h1 draws
# the low bits (shid mod m), h2 the high bits (shid >> 30), so k probe
# positions cost one md5, not k. Pure integer math both engines reproduce
# bit-identically (the same discipline as the MinHash affine family).
BLOOM_M_DEFAULT = 1 << 20
BLOOM_K_DEFAULT = 3
# auto-sizing: m = max(default, 13n) at k=3 gives kn/m <= 3/13, FP rate
# (1-e^{-3/13})^3 ~ 0.9% — INTEGER-ONLY math so the oracle reproduces the
# size exactly (GREATEST(1048576, 13 * COUNT(*)) in SQL); no power-of-two
# rounding needed (60-bit hash mod m bias is ~m/2^60)
BLOOM_AUTO_FACTOR = 13


def bloom_auto_m(n_items: int) -> int:
    """Filter size for ~<=1% false positives at k=3: max(default, 13n)."""
    return max(BLOOM_M_DEFAULT, BLOOM_AUTO_FACTOR * n_items)


def bloom_pos(shid: Column, i: int, m_bits: int = BLOOM_M_DEFAULT) -> Column:
    """i-th bloom probe position for a non-negative 60-bit element hash."""
    h1 = shid % m_bits
    h2 = F.lit(1) + (F.shiftright(shid, 30) % (m_bits - 1))
    return (h1 + F.lit(i) * h2) % m_bits


def duck_bloom_pos(expr: str, i: int, m_bits: int = BLOOM_M_DEFAULT) -> str:
    """DuckDB SQL text computing the same value as :func:`bloom_pos`.

    `expr` must be the non-negative BIGINT element hash (duck_hash64 text).
    """
    return (
        f"((({expr}) % {m_bits}) + {i} * "
        f"(1 + ((({expr}) >> 30) % {m_bits - 1}))) % {m_bits}"
    )


# MinHash universal-hash family: ONE md5 per input, then cheap affine
# transforms h_i = (a_i * (h mod P) + b_i) mod P. P = 2^31 - 1 keeps
# a_i * h below 2^62 (no signed-64 overflow) in both engines.
MINHASH_P = 2_147_483_647


def minhash_coeffs(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for hash-family member i; a_i != 0."""
    a = (1103515245 * (i + 1) + 12345) % MINHASH_P
    b = (2654435761 * (i + 1)) % MINHASH_P
    return (a or 1, b)


def minhash_member(h_mod: Column, i: int) -> Column:
    """Affine family member over an already-reduced base hash (h mod P)."""
    a, b = minhash_coeffs(i)
    return (F.lit(a) * h_mod + F.lit(b)) % F.lit(MINHASH_P)


def mean6(sum_dec: Column, n: Column | str) -> Column:
    """Exact 6-dp mean of a DECIMAL(18,6) sum over a positive integer
    count — deterministic across engines at EVERY input. Works in integer
    micro-units and rounds the exact rational half-UP (toward +inf) via
    floor((2*S + n) / (2*n)) / 1e6. The double division is exact for this
    purpose: the only ulp-sensitive points are integer quotients, and
    those divide exactly — PROVIDED |2*S_micro + n| <= 2^53, i.e.
    |sum| <~ 4.5e9 in original units. DECIMAL(18,6) admits sums up to
    ~1e12, so do NOT reuse this kernel for money-scale totals: beyond the
    bound the bigint numerator no longer round-trips through double and
    the 6th decimal can silently drift. Every current call site (logprob
    means, per-group quality scores) is orders of magnitude inside it;
    new call sites must check their sum domain first.

    round(double_quotient, 6) is NOT cross-engine stable: Spark rounds
    the SHORTEST DECIMAL REPR of the double (BigDecimal.valueOf) while
    DuckDB rounds the binary value, so an exact-half quotient like
    0.0019785 splits between engines (measured: 2/5000 docs at sf0.1).
    DuckDB twin: :func:`duck_mean6`.
    """
    n = F.col(n) if isinstance(n, str) else n
    s_micro = (sum_dec * 1_000_000).cast("bigint")
    return F.floor(
        (2 * s_micro + n).cast("double") / (2 * n).cast("double")
    ) / F.lit(1_000_000.0)


def duck_mean6(sum_expr: str, n_expr: str) -> str:
    """The DuckDB SQL text computing the same value as :func:`mean6`."""
    return (
        f"(floor((2 * CAST(({sum_expr}) * 1000000 AS BIGINT) + ({n_expr}))::DOUBLE"
        f" / (2 * ({n_expr}))::DOUBLE) / 1000000.0)"
    )


def minhash_member_sql(h_mod_expr: str, i: int) -> str:
    """SQL-text twin of :func:`minhash_member` — valid in BOTH Spark SQL
    and DuckDB (integer `%` on positive operands). Call sites that build
    wide signatures (128 hashes) use ONE `F.expr` per aggregate instead
    of ~8 py4j Column constructions each: the Column form measured 2.2 s
    of pure driver plan-BUILD time per 128-hash query."""
    a, b = minhash_coeffs(i)
    return f"(({a} * {h_mod_expr} + {b}) % {MINHASH_P})"


# ---------------------------------------------------------------------------
# JSON access (fastjson getString/getJSONObject — BaseLogApp.java:71,108,115)
# ---------------------------------------------------------------------------


def json_str(col: Column | str, path: str) -> Column:
    """get_json_object shorthand; DuckDB twin: json_extract_string(col,'$.path')."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, f"$.{path}")
