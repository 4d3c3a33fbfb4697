"""Semantic dictionaries the reference hardcodes inside UDFs, injected as
data (SURVEY §2.10 rebuild strategy): alias→canonical entity tables for
the two series the relation-graph job supports.

Contents transcribed from relation_graph/danmaku_analysis_cluster.py
(凡人修仙传 active at :40-100, SPY×FAMILY commented out at :30-38) — these
are configuration data (character alias lists), not code.
"""

from __future__ import annotations

# 凡人修仙传: 36 alias entries → 17 canonical characters
# (danmaku_analysis_cluster.py:40-100).
FANREN_ALIASES: dict[str, str] = {
    "韩立": "韩立",
    "二愣子": "韩立",
    "韩跑跑": "韩立",
    "跑跑": "韩立",
    "韩老魔": "韩立",
    "韩天尊": "韩立",
    "韩师弟": "韩立",
    "小韩": "韩立",
    "厉飞雨": "厉飞雨",
    "厉师兄": "厉飞雨",
    "南宫婉": "南宫婉",
    "婉儿": "南宫婉",
    "南宫": "南宫婉",
    "师娘": "南宫婉",
    "陈巧倩": "陈巧倩",
    "陈师姐": "陈巧倩",
    "巧倩": "陈巧倩",
    "董萱儿": "董萱儿",
    "红拂弟子": "董萱儿",
    "墨彩环": "墨彩环",
    "彩环": "墨彩环",
    "紫灵": "紫灵仙子",
    "紫灵仙子": "紫灵仙子",
    "汪凝": "紫灵仙子",
    "元瑶": "元瑶",
    "银月": "银月",
    "墨居仁": "墨大夫",
    "墨大夫": "墨大夫",
    "墨老": "墨大夫",
    "王蝉": "王蝉",
    "少门主": "王蝉",
    "大衍神君": "大衍神君",
    "大衍": "大衍神君",
    "老鬼": "大衍神君",
    "曲魂": "曲魂",
    "张铁": "曲魂",
    "雷万鹤": "雷万鹤",
    "雷师伯": "雷万鹤",
    "令狐老祖": "令狐老祖",
    "文思月": "文思月",
    "掌天瓶": "小绿瓶",
    "小绿瓶": "小绿瓶",
    "瓶子": "小绿瓶",
}

# SPY×FAMILY: commented-out mapping (danmaku_analysis_cluster.py:30-38),
# kept for the spy_family golden outputs.
SPY_FAMILY_ALIASES: dict[str, str] = {
    "瓜神": "阿尼亚",
    "阿尼亚": "阿尼亚",
    "安妮亚": "阿尼亚",
    "花生": "阿尼亚",
    "黄昏": "黄昏",
    "劳埃德": "黄昏",
    "父亲": "黄昏",
    "罗伊德": "黄昏",
    "约尔": "约尔",
    "荆棘公主": "约尔",
    "约儿": "约尔",
    "太太": "约尔",
    "睡美人": "约尔",
    "妈妈": "约尔",
    "次子": "次子",
    "达米安": "次子",
    "尤里": "尤里",
    "弟弟": "尤里",
    "邦德": "邦德",
    "狗": "邦德",
    "狗狗": "邦德",
    "贝威": "贝威",
    "蓬蓬头": "贝威",
}


# SPY×FAMILY high-energy sentiment tiers (hot/spark_energy.py:39-46):
# first tier containing any substring of the lowercased text wins.
SPY_ENERGY_TIERS: list[tuple[list[str], float]] = [
    (
        ["优雅", "elegance", "哇库", "哇酷", "waku", "瓜神", "世界名画", "名场面"],
        5.0,
    ),
    (
        [
            "次子", "昏爹", "父亲", "约尔", "太太", "荆棘公主", "邦德", "上岸",
            "读心", "花生", "吃花生", "手雷", "母亲", "妈妈", "阿尼亚",
        ],
        3.0,
    ),
    (
        [
            "高能", "泪目", "起立", "卧槽", "牛逼", "awsl", "封神", "致敬",
            "完结", "撒花", "好帅", "可爱",
        ],
        2.0,
    ),
    (["哈哈", "hhh", "www", "233", "打卡", "第一", "热乎"], 0.5),
]
