"""The sweep harness's sf100-class auto-sizing (tools/sweeplib.py):
big input dirs default the session-sizing env knobs so a large-scale
sweep can't silently run at the 8g/32-partition defaults that lose
whole chunks to local-JVM OOM (SCALING.md r9 sizing lesson); explicit
env always wins; small dirs are untouched."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from sweeplib import apply_scale_env  # noqa: E402


def _mkfile(p, n):
    with open(p, "wb") as f:
        f.write(b"\0" * n)


def test_small_dir_is_untouched(tmp_path, monkeypatch):
    _mkfile(tmp_path / "t.parquet", 1024)
    env: dict = {}
    apply_scale_env(str(tmp_path), env)
    assert env == {}


def test_big_dir_defaults_both_knobs(tmp_path, monkeypatch):
    import sweeplib

    monkeypatch.setattr(sweeplib, "_BIG_INPUT_BYTES", 1024)
    _mkfile(tmp_path / "t.parquet", 4096)
    env: dict = {}
    apply_scale_env(str(tmp_path), env)
    assert env["SPARK_GRAFT_SHUFFLE"] == "256"
    assert env["SPARK_GRAFT_DRIVER_MEM"] == "32g"


def test_explicit_env_wins(tmp_path, monkeypatch):
    import sweeplib

    monkeypatch.setattr(sweeplib, "_BIG_INPUT_BYTES", 1024)
    _mkfile(tmp_path / "t.parquet", 4096)
    env = {"SPARK_GRAFT_SHUFFLE": "64", "SPARK_GRAFT_DRIVER_MEM": "12g"}
    apply_scale_env(str(tmp_path), env)
    assert env["SPARK_GRAFT_SHUFFLE"] == "64"
    assert env["SPARK_GRAFT_DRIVER_MEM"] == "12g"


def test_missing_dir_is_noop():
    env: dict = {}
    apply_scale_env("/nonexistent/path/xyz", env)
    assert env == {}


def test_env_applied_after_import_reaches_session_conf(monkeypatch):
    """r9 review finding: session.py used to read the sizing env at
    IMPORT time, so apply_scale_env (which every in-process sweep
    harness calls AFTER importing the engine) was a silent no-op and
    sf100 sweeps ran at 8g/32 while printing the sized banner. Pin the
    fix: the env must be resolved when get_spark builds its conf."""
    import bigdataproject_spark.session as session_mod

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "256")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "32g")
    # the import-time snapshot must not pin these keys
    assert "spark.sql.shuffle.partitions" not in session_mod._DEFAULTS
    assert "spark.driver.memory" not in session_mod._DEFAULTS
    # and get_spark's own conf resolution must see the post-import env
    conf = session_mod._resolve_conf()
    assert conf["spark.sql.shuffle.partitions"] == "256"
    assert conf["spark.driver.memory"] == "32g"
    # caller overrides still win over the env
    conf = session_mod._resolve_conf({"spark.sql.shuffle.partitions": "8"})
    assert conf["spark.sql.shuffle.partitions"] == "8"
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE")
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM")
    assert session_mod._resolve_conf()["spark.sql.shuffle.partitions"] == "32"


def test_chunk_deal_pinned_for_carried_queries():
    """r12 (the r11 verdict's item 5): the sf100 sweep's name-hash
    chunk deal — md5("v3:" + name) % 10 — is PROTOCOL from r11 on, so
    per-query sf100 walls are comparable round-over-round. This pins
    the salt, the modulus, and the exact chunk of every query carried
    from the r11 registry (snapshot below): if anyone changes the
    deal, every heavy query's JVM co-residents move and the wall-time
    series breaks — fail here first. Queries added/removed since r11
    affect only their own chunk's co-residency (documented in
    SCALING.md), never a carried query's assignment."""
    import hashlib

    from bigdataproject_spark.queries import registry

    # chunk assignments of the r11 registry, as swept in
    # SWEEP_sf100_r11.json (the baseline envelope round)
    r11_deal = {
        "ann_brute_topk": 7, "ann_indexed_topk": 3,
        "approx_distinct_users": 3, "asof_purchase_attribution": 9,
        "assoc_rules": 2, "bm25_rrf_hybrid": 5,
        "chunk_pack_sequences": 0, "conditional_buckets": 5,
        "contamination_check": 0, "date_monthly_orders": 3,
        "dedup_exact": 0, "dedup_lines_boilerplate": 0,
        "dedup_minhash_lsh": 6, "dedup_ngram_jaccard": 1,
        "dedup_simhash_neardup": 3, "deterministic_sample": 6,
        "doc_fingerprint": 3, "embedding_neardup": 7,
        "energy_approx_flag": 7, "energy_timeline": 6,
        "energy_timeline_nested": 8, "freq_itemsets": 4,
        "graph_communities": 2, "graph_edges": 6,
        "graph_nodes": 8, "graph_pagerank": 3,
        "grouping_sets_orders": 5, "json_props_stats": 2,
        "multimodal_meta": 3, "outer_join_user_activity": 8,
        "pii_redact": 4, "pivot_event_counts": 4,
        "q1_pricing_summary": 7, "q3_top_revenue": 2,
        "q5_region_revenue": 8, "quantiles_by_type": 7,
        "range_join_recent_views": 3, "rollup_lineitem": 7,
        "semi_anti_join_customers": 8, "sessionize_events": 2,
        "set_ops_customers": 9, "span_dedup_report": 9,
        "sql_density_per_minute": 1, "stats_agg": 2,
        "tag_etl_transactions": 8, "text_quality_langid": 2,
        "tiered_score": 8, "topk_per_customer": 2,
        "window_lag_lead": 3, "word_count_seams": 1,
    }

    def chunk_of(name: str) -> int:
        return int(hashlib.md5(f"v3:{name}".encode()).hexdigest(), 16) % 10

    # the snapshot itself must reproduce under the protocol deal
    for name, want in r11_deal.items():
        assert chunk_of(name) == want, (name, chunk_of(name), want)
    # every carried query (r11 ∩ current registry) keeps its chunk
    carried = set(r11_deal) & set(registry())
    assert len(carried) >= 45  # the r12 surgery touched only 3 slots
    for name in carried:
        assert chunk_of(name) == r11_deal[name], name
