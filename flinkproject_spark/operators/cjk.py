"""CJK segmentation — dictionary maximum-matching, dependency-free.

The reference tokenizes search keywords with the IK analyzer
unconditionally (utils/KeywordUtil.java:13-35: `IKSegmenter(reader,
useSmart=true)` looping the Lexeme iterator), so a Chinese-log user gets
dictionary segmentation out of the box. This sandbox cannot ship jieba
(pure-Python but undownloadable: no network, not preinstalled), so the
DEFAULT CJK tier is implemented here from first principles: bidirectional
maximum matching (BMM) over a word dictionary — the textbook public
algorithm family IK itself belongs to (dictionary max-match + ambiguity
resolution; cf. Wong & Chan 1996, "Chinese word segmentation based on
maximum matching and word binding force"). jieba remains an optional
better-dictionary tier behind the same `register_split_words` surface.

Algorithm: forward maximum matching (FMM) greedily takes the LONGEST
dictionary word starting at each position; backward MM (BMM proper) does
the same right-to-left. The two disagree exactly on ambiguous overlaps
(研究生命科学 -> FMM 研究生|命|科学 vs backward 研究|生命|科学); the
classical resolution picks the candidate with fewer tokens, then fewer
unmatched singletons — backward wins ties, matching the empirical finding
that backward MM errs less on Chinese.

Non-CJK runs (ASCII words, digits, mixed SKU codes) pass through as
whitespace/punctuation-delimited tokens, so mixed-script e-commerce text
segments sensibly without a second code path.

The built-in lexicon is a deliberately small common-vocabulary seed (the
e-commerce/analytics domain of the reference's logs); production loads a
real dictionary via the `lexicon=` parameter — the same extension-dict
mechanism IK's `IKAnalyzer.cfg.xml` provides. Segmentation cost is
O(len(text) * max_word_len) per document with an O(1) dict probe per
candidate — embarrassingly parallel per row, no state, no shuffle.
"""

from __future__ import annotations

import re

# Common-vocabulary seed lexicon (word -> present). Small on purpose: the
# point is correct ALGORITHM + extension surface, not dictionary coverage.
DEFAULT_LEXICON: frozenset[str] = frozenset({
    # e-commerce domain (the reference's keyword/log vocabulary)
    "小米", "手机", "小米手机", "苹果", "苹果手机", "华为", "荣耀",
    "电视", "冰箱", "洗衣机", "电脑", "笔记本", "平板", "耳机", "充电器",
    "商品", "订单", "支付", "下单", "购物", "购物车", "优惠", "优惠券",
    "价格", "性价比", "品牌", "旗舰", "旗舰店", "正品", "包邮", "秒杀",
    "用户", "会员", "评价", "好评", "差评", "退货", "退款", "客服",
    # analytics / platform vocabulary
    "数据", "大数据", "实时", "计算", "平台", "分析", "搜索", "关键词",
    "排行", "排行榜", "榜单", "日志", "报表", "指标", "流量", "转化",
    "访问", "点击", "曝光", "统计", "明细", "汇总",
    # general glue words
    "今天", "明天", "可以", "没有", "我们", "他们", "什么", "怎么",
    "非常", "推荐", "喜欢", "研究", "研究生", "生命", "科学", "中国",
    "北京", "上海", "广州", "深圳", "广大",
})

# Pinned ambiguity probes for the driver-surface CJK query: each string
# exercises a DIFFERENT branch of the bidirectional-MM disambiguation
# against DEFAULT_LEXICON — backward wins (研究生|命 vs 研究|生命;
# 排行榜|单 vs 排行|榜单), FORWARD wins (广大|数据 vs 广|大数据: fewer
# singletons forward), junction merge into one longer word (小米手机),
# agreement on multiword parses, and the empty probe (plain
# concatenation). Kept here so the Spark query and the DuckDB oracle
# derive their literals from the ONE constant.
AMBIGUITY_PROBES: tuple[str, ...] = (
    "", "研究生命科学", "小米手机", "排行榜单", "广大数据", "优惠券商品",
)

MAX_WORD_LEN = max(len(w) for w in DEFAULT_LEXICON)

_WORD = re.compile(r"\w+")  # non-CJK token class: punctuation is a delimiter


def is_cjk(ch: str) -> bool:
    """CJK Unified Ideographs (BMP core + Extension A) — the script the
    dictionary pass owns; everything else takes the whitespace path."""
    return "一" <= ch <= "鿿" or "㐀" <= ch <= "䶿"


def _fmm(run: str, lexicon: frozenset[str], max_len: int) -> list[str]:
    """Forward maximum matching: longest dictionary word at each position,
    unmatched characters emitted as singletons."""
    out, i, n = [], 0, len(run)
    while i < n:
        for w in range(min(max_len, n - i), 1, -1):
            if run[i : i + w] in lexicon:
                out.append(run[i : i + w])
                i += w
                break
        else:
            out.append(run[i])
            i += 1
    return out


def _bmm_backward(run: str, lexicon: frozenset[str], max_len: int) -> list[str]:
    """Backward maximum matching: longest dictionary word ENDING at each
    position, scanning right-to-left."""
    out, j = [], len(run)
    while j > 0:
        for w in range(min(max_len, j), 1, -1):
            if run[j - w : j] in lexicon:
                out.append(run[j - w : j])
                j -= w
                break
        else:
            out.append(run[j - 1])
            j -= 1
    out.reverse()
    return out


def segment_run(run: str, lexicon: frozenset[str], max_len: int) -> list[str]:
    """Bidirectional MM over one pure-CJK run: segment forward AND
    backward, keep the candidate with (fewer tokens, fewer unmatched
    singletons), backward winning ties — the classical disambiguation
    rule."""
    fwd = _fmm(run, lexicon, max_len)
    bwd = _bmm_backward(run, lexicon, max_len)
    if fwd == bwd:
        return fwd

    def key(toks: list[str]) -> tuple[int, int]:
        return (len(toks), sum(1 for t in toks if len(t) == 1))

    return bwd if key(bwd) <= key(fwd) else fwd


def segment(
    text: str,
    lexicon: frozenset[str] | None = None,
    max_len: int | None = None,
) -> list[str]:
    """Tokenize mixed-script text: CJK runs through bidirectional
    max-matching against `lexicon`, non-CJK runs reduced to their \\w+
    word tokens (whitespace AND punctuation — ASCII or fullwidth — are
    delimiters, never tokens; a run is flushed whenever the script class
    flips). Returns the token list in reading order; empty/None input
    yields []."""
    if not text:
        return []
    lex = lexicon if lexicon is not None else DEFAULT_LEXICON
    if max_len is not None:
        ml = max_len
    elif lex is DEFAULT_LEXICON:
        ml = MAX_WORD_LEN  # precomputed: segment() runs once per row on
        # the UDTF hot path, so don't re-scan the lexicon per call
    else:
        ml = max(len(w) for w in lex) if lex else 1
    tokens: list[str] = []
    buf: list[str] = []
    buf_cjk = False

    def flush() -> None:
        if not buf:
            return
        run = "".join(buf)
        if buf_cjk:
            tokens.extend(segment_run(run, lex, ml))
        else:
            # word characters only: punctuation — including fullwidth CJK
            # punctuation like ，。which is_cjk classes as non-CJK — is a
            # delimiter, never a token (IK drops it too; emitting it would
            # put phantom keywords in the A19 aggregates)
            tokens.extend(_WORD.findall(run))
        buf.clear()

    for ch in text:
        cjk = is_cjk(ch)
        if buf and cjk != buf_cjk:
            flush()
        buf_cjk = cjk
        buf.append(ch)
    flush()
    return tokens
