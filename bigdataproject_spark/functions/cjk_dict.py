"""Dictionary-based CJK word segmentation — forward maximum matching.

The reference tokenizes danmaku with jieba
(``/root/reference/hot/preprocess_high_energy.py:40-58``); jieba is not
installed in this container, so exact dictionary parity is
environment-blocked (SURVEY §7.4.1). This module is the in-container
stand-in for jieba's DICTIONARY phase: forward maximum matching (FMM) —
the classic greedy longest-match scan every dictionary segmenter
(including jieba's DAG construction) builds on — over a small vendored
word list, as a pure deterministic function. Unlike the bigram fallback
(functions/tokenize.py cjk_bigram_tokens) it produces real WORDS when
the dictionary knows them, so the golden word-count tests can exercise
dictionary-mode segmentation end-to-end; unlike jieba it has no HMM
OOV model — out-of-vocabulary Han characters come back as single
characters, which the shared min_len>=2 post-filter then drops exactly
as the reference's ``len<=1`` rule does.

Execution shape: an Arrow-batched pandas_udf (never row-at-a-time).
The word set rides the UDF closure — right for the few-hundred-word
vendored list and for alias dictionaries (data_dicts.py); for a
100k-word production dictionary, pass a broadcast's ``.value`` inside
your own wrapper so executors deserialize it once per process, not
once per task closure.

``DEFAULT_CJK_WORDS`` is a small list of common-usage Mandarin words
(basic vocabulary + a few danmaku-culture interjections) — all public,
general-dictionary vocabulary, vendored as data so the backend works
out of the box. It is deliberately tiny: real deployments pass their
own list (e.g. the union with a domain alias table's keys).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import pandas as pd  # module-level: pandas_udf resolves hints here

# Common-usage Mandarin vocabulary (public general-dictionary words):
# pronouns/function words, high-frequency verbs/nouns/adverbs, and a few
# danmaku-culture interjections. Vendored as DATA, like the stopword
# list in functions/tokenize.py.
DEFAULT_CJK_WORDS: tuple[str, ...] = (
    # pronouns / demonstratives / question words
    "我们", "你们", "他们", "她们", "它们", "咱们", "大家", "自己",
    "这个", "那个", "这些", "那些", "这样", "那样", "这里", "那里",
    "什么", "怎么", "怎样", "为什么", "多少", "哪里", "哪个", "谁的",
    # function words / conjunctions / adverbs
    "不是", "没有", "可以", "不能", "不会", "应该", "必须", "需要",
    "因为", "所以", "但是", "可是", "如果", "虽然", "然后", "而且",
    "还是", "就是", "只是", "已经", "正在", "马上", "立刻", "终于",
    "当然", "果然", "突然", "忽然", "其实", "真的", "非常", "特别",
    "一起", "一样", "一直", "一定", "有点", "比较", "最后", "第一",
    # high-frequency verbs / verb phrases
    "知道", "觉得", "感觉", "喜欢", "希望", "认为", "发现", "出现",
    "开始", "结束", "进行", "成为", "变成", "起来", "出来", "回来",
    "下来", "过来", "出去", "回去", "上去", "下去", "看到", "听到",
    "学习", "工作", "生活", "休息", "帮助", "谢谢", "再见", "加油",
    # high-frequency nouns
    "时候", "时间", "今天", "明天", "昨天", "每天", "现在", "以后",
    "以前", "东西", "地方", "问题", "世界", "朋友", "老师", "学生",
    "孩子", "名字", "故事", "电影", "音乐", "动画", "漫画", "小说",
    # adjectives
    "漂亮", "可爱", "好看", "厉害", "开心", "高兴", "难过", "有趣",
    # danmaku-culture interjections (public bullet-comment usage)
    "哈哈", "哈哈哈", "弹幕", "高能", "前方高能", "名场面", "泪目",
    "上岸", "经典", "封神",
)

# CJK Unified Ideographs + Extension A — the same Han range the
# bigram backend's \p{IsHan} matches in practice for BMP text.
_HAN_RUN = re.compile(r"[一-鿿㐀-䶿]+")
_NON_HAN_WORD = re.compile(r"[^\W_]+", re.UNICODE)


def fmm_segment(
    run: str, words: frozenset[str], max_word_len: int
) -> list[str]:
    """Forward maximum matching over ONE Han run: at each position take
    the longest dictionary word starting there (length max_word_len
    down to 2), else emit the single character and advance. Greedy,
    deterministic, O(len·max_word_len)."""
    i, n, out = 0, len(run), []
    while i < n:
        hi = min(max_word_len, n - i)
        for ln in range(hi, 1, -1):
            w = run[i : i + ln]
            if w in words:
                out.append(w)
                i += ln
                break
        else:
            out.append(run[i])
            i += 1
    return out


def segment_text(
    text: str | None,
    words: frozenset[str],
    max_word_len: int,
    *,
    lowercase: bool = True,
) -> list[str]:
    """Segment mixed text in original order: Han runs via
    :func:`fmm_segment`, everything between them split into
    letter/digit words (lowercased per the flag — Han is caseless)."""
    if not text:
        return []
    out: list[str] = []
    pos = 0

    def _non_han(seg: str) -> None:
        if seg:
            if lowercase:
                seg = seg.lower()
            out.extend(_NON_HAN_WORD.findall(seg))

    for m in _HAN_RUN.finditer(text):
        _non_han(text[pos : m.start()])
        out.extend(fmm_segment(m.group(), words, max_word_len))
        pos = m.end()
    _non_han(text[pos:])
    return out


def cjk_dict_tokenize_udf(
    words: Sequence[str] | None = None,
    *,
    lowercase: bool = True,
):
    """Arrow-batched pandas_udf: ``string -> array<string>`` raw
    dictionary segmentation (no filtering — the seam applies the shared
    native post-filter policy on the returned array, exactly as for the
    other backends). ``words`` defaults to :data:`DEFAULT_CJK_WORDS`;
    single-character entries are ignored (every character is already a
    fallback token) and the FMM window is sized to the longest word."""
    from pyspark.sql.pandas.functions import pandas_udf

    wset = frozenset(
        w for w in (words if words is not None else DEFAULT_CJK_WORDS)
        if len(w) >= 2
    )
    max_len = max((len(w) for w in wset), default=2)

    @pandas_udf("array<string>")
    def _seg(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: segment_text(t, wset, max_len, lowercase=lowercase)
        )

    return _seg
