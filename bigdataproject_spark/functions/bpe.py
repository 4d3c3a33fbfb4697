"""Deterministic pure-Python byte-pair encoding (BPE) tokenizer — the
third ``get_tokenizer`` backend (functions/tokenize.py).

Why it exists: chunk/pack budgets measured in regex tokens misstate
real context-window fill — a training pipeline packs sequences in
MODEL tokens, and subword vocabularies split rare words into several
pieces where the regex backend counts one. The algorithm is the public
word-level BPE of Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016): learn by
iteratively merging the most frequent adjacent symbol pair; encode by
replaying the learned merges in rank order. Everything here is
deterministic — ties in the learner break to the lexicographically
smallest pair, the default merge table is learned from a fixed vendored
sample — so golden tests and cross-run pack layouts are stable.

Scale shape: learning is a DRIVER-side operation over a small sample
(a merge table is a few hundred pairs — fitting it on 100 TB would be
pointless as well as slow); encoding runs as an Arrow-batched
pandas_udf with a per-executor word→pieces cache, the same seam
contract as the jieba backend (never a row-at-a-time UDF). The merge
table travels to executors by closure capture (kilobytes).

The reference has no subword tokenizer (its seg_text is jieba word
segmentation, hot/preprocess_high_energy.py:40-58); this backend is
part of the LLM-training-pipeline surface, not reference parity.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import lru_cache

# End-of-word marker, FUSED onto the word's final character at init
# (the Sennrich word-final-symbol variant: "low" → l, o, w</w>) so
# suffix merges stay distinct from word-internal ones and no standalone
# marker piece can ever exist (a bare "</w>" token would be invisible
# to length/stopword policy and would inflate subword counts). Encoded
# pieces keep the marker — "".join(pieces) round-trips to word + EOW,
# which tests pin.
EOW = "</w>"


def learn_bpe(
    texts: Iterable[str], n_merges: int, *, lowercase: bool = True
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from an iterable of texts.

    Classic Sennrich training loop over word frequencies (not the
    corpus stream — identical words collapse to one weighted entry), so
    cost is O(n_merges × |vocab words|). Deterministic: the most
    frequent pair wins, ties break to the lexicographically smallest
    pair. Stops early when no pair occurs twice — merging singletons
    would just memorize the sample."""
    import re
    from collections import Counter

    word_freq: Counter = Counter()
    for t in texts:
        if not t:
            continue
        if lowercase:
            t = t.lower()
        for w in re.findall(r"[^\W_]+", t, flags=re.UNICODE):
            word_freq[w] += 1

    # each vocab word as a tuple of symbols
    vocab: dict[tuple[str, ...], int] = {
        tuple(w[:-1]) + (w[-1] + EOW,): c for w, c in word_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best, best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


class SimpleBPE:
    """Encoder over a learned merge list: replay merges in rank order
    (lowest-ranked available pair merges first, all occurrences at
    once). Per-instance word cache — natural-language word frequency is
    Zipfian, so an Arrow batch re-encodes mostly cached words."""

    def __init__(self, merges: Sequence[tuple[str, str]]):
        self._by_rank = [tuple(p) for p in merges]
        self.ranks = {p: i for i, p in enumerate(self._by_rank)}
        self._cache: dict[str, tuple[str, ...]] = {}

    def encode_word(self, word: str) -> tuple[str, ...]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        sym = list(word[:-1]) + [word[-1] + EOW]
        while len(sym) > 1:
            ranked = [
                (self.ranks.get((sym[i], sym[i + 1])), i)
                for i in range(len(sym) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            rank, _ = min(ranked)
            a, b = self._by_rank[rank]
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        enc = tuple(sym)
        self._cache[word] = enc
        return enc

    def encode(self, text: str, *, lowercase: bool = True) -> list[str]:
        """Subword pieces of ``text``: regex word split (same
        letters+digits runs as the regex backend), then per-word BPE."""
        import re

        if not text:
            return []
        if lowercase:
            text = text.lower()
        out: list[str] = []
        for w in re.findall(r"[^\W_]+", text, flags=re.UNICODE):
            out.extend(self.encode_word(w))
        return out


# Fixed vendored training sample for the default merge table: generic
# English prose written for this repo (no external corpus), long enough
# that common suffixes/digraphs ("th", "ing", "er", "tion") earn
# merges. DO NOT EDIT casually — the default merges, and every golden
# test over backend="bpe", derive from it deterministically.
_DEFAULT_SAMPLE = """
the engine reads records from storage and turns them into batches of
tokens for training runs that continue for days without interruption
every document passes through cleaning stages that remove duplicated
passages score the remaining text for quality and measure the number
of tokens before packing sequences into fixed windows the packing
stage orders chunks within shards and fills each window close to the
target length so that training steps waste little padding the
distributed planner pushes filters down to the scan prunes unused
columns and broadcasts small tables to avoid shuffling large ones
partitions stay balanced because keys are salted when their counts
grow beyond the expected range and the monitoring system records the
bytes read written and shuffled during every stage of the computation
national international operation information generation preparation
working reading writing processing streaming counting sorting joining
"""

_DEFAULT_N_MERGES = 200


@lru_cache(maxsize=1)
def default_merges() -> tuple[tuple[str, str], ...]:
    """The vendored default merge table, learned lazily (once per
    process) from the fixed sample above — deterministic by
    construction of :func:`learn_bpe`."""
    return tuple(learn_bpe([_DEFAULT_SAMPLE], _DEFAULT_N_MERGES))


def bpe_tokenize_udf(
    merges: Sequence[tuple[str, str]] | None = None,
    *,
    stopwords: Sequence[str] = (),
    min_len: int = 1,
    drop_numeric: bool = False,
    lowercase: bool = True,
):
    """Arrow-batched pandas_udf BPE tokenizer (``array<string>`` of
    subword pieces, EOW markers kept). ``merges=None`` uses the
    vendored :func:`default_merges`. The post-filter policy
    (stopwords / min_len / drop_numeric) applies to the SUBWORD pieces,
    inside the udf — mirroring the jieba backend's loop — with EOW
    stripped before the length/stopword/numeric checks so policy sees
    the linguistic piece, not the marker."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    table = tuple(merges) if merges is not None else default_merges()
    sw = set(stopwords)

    # explicit SCALAR eval type: `from __future__ import annotations`
    # stringifies local type hints, which pyspark cannot resolve here
    @pandas_udf("array<string>", PandasUDFType.SCALAR)
    def _enc(s):
        enc = SimpleBPE(table)

        def one(t):
            if not t:
                return []
            out = []
            for tok in enc.encode(t, lowercase=lowercase):
                bare = tok[: -len(EOW)] if tok.endswith(EOW) else tok
                if len(bare) < min_len or bare in sw:
                    continue
                if drop_numeric and bare.isdigit():
                    continue
                out.append(tok)
            return out

        return s.map(one)

    return _enc
