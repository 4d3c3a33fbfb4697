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
