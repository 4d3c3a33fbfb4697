"""Entity extraction — native rebuild of reference UDF U3.

Reference semantics (relation_graph/danmaku_analysis_cluster.py:25-105,
``extract_entities_safe``): an alias→canonical dictionary (33 aliases → 17
canonical names); for each alias appearing as a SUBSTRING of the text, emit
the canonical name; de-duplicate per row (set semantics); null → [].

Rebuild: build an array of ``when(contains(alias), canon)`` cells, then
``array_distinct(filter(..., not null))`` — all higher-order Catalyst
expressions, no Python. The alias table is injected as data.

Order note: the reference iterates a dict (python insertion order) and then
set()s the result, so per-row order is unspecified; we emit canonical names
in first-alias-declaration order deterministically, and consumers that need
set semantics compare sorted.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_entities_expr(
    text: Column | str,
    alias_to_canonical: Mapping[str, str],
    *,
    case_insensitive: bool = False,
) -> Column:
    """array<string> of distinct canonical entities whose alias occurs in text.

    Equivalent oracle SQL shape (per alias)::

        SELECT DISTINCT id, canon
        FROM t JOIN (VALUES (alias, canon), ...) d(a, c) ON contains(t.text, d.a)
    """
    col = F.col(text) if isinstance(text, str) else text
    if case_insensitive:
        col = F.lower(col)
    cells = []
    seen_canon: list[str] = []
    for alias, canon in alias_to_canonical.items():
        a = alias.lower() if case_insensitive else alias
        cells.append(F.when(col.contains(F.lit(a)), F.lit(canon)))
        if canon not in seen_canon:
            seen_canon.append(canon)
    hits = F.array_distinct(
        F.filter(F.array(*cells), lambda x: x.isNotNull())
    )
    # null text → every contains() is null → all cells filtered → [] (matches
    # the UDF's `if text is None: return []`, danmaku_analysis_cluster.py:104).
    return F.coalesce(hits, F.array())


def canonical_names(alias_to_canonical: Mapping[str, str]) -> list[str]:
    """The distinct canonical names in LEXICOGRAPHIC order — the code
    table for :func:`extract_entity_codes_expr`. Sorted order is the
    load-bearing invariant: code ``i`` maps to the i-th smallest name,
    so integer comparisons (array_sort, Target > Source) agree exactly
    with the string comparisons they replace."""
    return sorted(set(alias_to_canonical.values()))


def extract_entity_codes_expr(
    text: Column | str,
    alias_to_canonical: Mapping[str, str],
    *,
    case_insensitive: bool = False,
) -> Column:
    """:func:`extract_entities_expr` with INT CODES instead of name
    strings: array<int> of distinct codes (positions in
    :func:`canonical_names`) whose alias occurs in text.

    Why (r13 optimization round, guide §2.3 narrower types): the graph
    family's hot aggregate hashes every exploded pair — two short
    strings per row through the hash tables where two ints do (CPU
    receipt at sf10: 13.9–14.9 → 10.1–11.5 CPU-s for graph_edges
    end-to-end, output bit-equal). Because codes are assigned in
    lexicographic name order, array_distinct/array_sort and the
    ``Target > Source`` canonical-pair filter commute with the mapping;
    consumers map back with ``element_at(array(<names>), code + 1)``
    on the tiny aggregated output (|entities|² rows at most), never
    per input row."""
    col = F.col(text) if isinstance(text, str) else text
    if case_insensitive:
        col = F.lower(col)
    code = {c: i for i, c in enumerate(canonical_names(alias_to_canonical))}
    cells = []
    for alias, canon in alias_to_canonical.items():
        a = alias.lower() if case_insensitive else alias
        cells.append(F.when(col.contains(F.lit(a)), F.lit(code[canon])))
    hits = F.array_distinct(
        F.filter(F.array(*cells), lambda x: x.isNotNull())
    )
    return F.coalesce(hits, F.array().cast("array<int>"))


def pair_combinations_expr(entities: Column | str) -> Column:
    """All C(n,2) sorted pairs of a (distinct) entity array, shuffle-free.

    This is the DataFrame-native replacement for the reference's RDD
    ``flatMap(itertools.combinations(sorted(roles), 2))``
    (danmaku_analysis_cluster.py:141-147): a cross of the sorted array with
    itself, keeping i<j. Emitting pairs via higher-order functions keeps pair
    generation inside the scan stage — the only shuffle left in the
    co-occurrence pipeline is the final groupBy(pair).count(), which is
    unavoidable and map-side-combined. At 100TB this beats the explode +
    self-join formulation (J1) by avoiding a join shuffle of the exploded
    table against itself.

    Returns array<struct<src:string, dst:string>> with src < dst.
    """
    col = F.col(entities) if isinstance(entities, str) else entities
    sorted_arr = F.array_sort(col)
    return F.flatten(
        F.transform(
            sorted_arr,
            lambda x, i: F.filter(
                F.transform(
                    sorted_arr,
                    lambda y, j: F.when(j > i, F.struct(x.alias("src"), y.alias("dst"))),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
