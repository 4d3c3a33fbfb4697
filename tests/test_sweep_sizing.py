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
