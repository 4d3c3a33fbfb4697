"""The r10 paired-generation pointer (operators/versioned.py:
pair_versions / publish_pair): a rebuild of the two-table minhash index
publishes bands+shingles with ONE atomic flip, so no crash point leaves
a reader observing one table's new generation next to the other's old
one — the torn window r9 documented as crash-safe-by-re-run is now
unobservable by construction.

Epoch marker: each rebuild epoch uses a disjoint doc-id range, so a
"reader" (table_read_dir + parquet scan) can classify which epoch each
table serves and the torn state (bands epoch != shingles epoch) is a
direct assertion.
"""

from __future__ import annotations

import pytest

from bigdataproject_spark.operators import versioned
from bigdataproject_spark.operators.dedup_index import (
    compact_index,
    write_minhash_index,
)
from bigdataproject_spark.operators.versioned import (
    pair_versions,
    pointer_version,
    table_read_dir,
)

EPOCHS = {
    0: [(1, [11, 12, 13, 14]), (2, [21, 22, 23, 24])],
    1: [(101, [31, 32, 33, 34]), (102, [41, 42, 43, 44])],
    2: [(201, [51, 52, 53, 54]), (202, [61, 62, 63, 64])],
}


def _docs(spark, epoch: int):
    return spark.createDataFrame(
        EPOCHS[epoch], "doc_id long, shingles array<bigint>"
    )


def _epoch_of(ids: set[int]) -> int:
    for e, rows in EPOCHS.items():
        if ids and ids <= {i for i, _ in rows}:
            return e
    raise AssertionError(f"ids {ids} match no single epoch — torn index")


def _observe(spark, idx: str) -> tuple[int, int]:
    """(bands_epoch, shingles_epoch) as an external reader resolves
    them — the pair is consistent iff they are equal."""
    b = {
        r.id
        for r in spark.read.parquet(table_read_dir(spark, idx, "bands"))
        .select("id").distinct().collect()
    }
    s = {
        r.id
        for r in spark.read.parquet(table_read_dir(spark, idx, "shingles"))
        .select("id").distinct().collect()
    }
    return _epoch_of(b), _epoch_of(s)


def _versioned_index(spark, tmp_path) -> str:
    """Epoch-0 index in the VERSIONED layout (legacy build, then one
    compaction — rebuild atomicity only applies to versioned indexes;
    the legacy flat overwrite stays documented reader-unsafe)."""
    idx = str(tmp_path / "idx")
    write_minhash_index(
        _docs(spark, 0), idx, id_col="doc_id", shingles_col="shingles"
    )
    compact_index(spark, idx)
    assert _observe(spark, idx) == (0, 0)
    return idx


def test_rebuild_publishes_pair_and_flips_once(spark, tmp_path):
    idx = _versioned_index(spark, tmp_path)
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )
    assert _observe(spark, idx) == (1, 1)
    pv = pair_versions(spark, idx)
    assert pv is not None and set(pv) == {"bands", "shingles"}
    # per-table pointers caught up in the same publish
    assert pointer_version(spark, idx, "bands") == pv["bands"]
    assert pointer_version(spark, idx, "shingles") == pv["shingles"]


def test_crash_between_table_writes_is_unobservable(spark, tmp_path, monkeypatch):
    """Crash after the bands generation is fully written but before the
    shingles write: NOTHING is published — readers stay on the old
    consistent epoch, and the re-run completes the rebuild."""
    idx = _versioned_index(spark, tmp_path)
    real = versioned.table_overwrite_target

    def crash_on_shingles(spark_, path_, table_, **kw):
        if table_ == "shingles":
            raise RuntimeError("injected crash before the shingles write")
        return real(spark_, path_, table_, **kw)

    monkeypatch.setattr(versioned, "table_overwrite_target", crash_on_shingles)
    with pytest.raises(RuntimeError, match="injected crash"):
        write_minhash_index(
            _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
        )
    monkeypatch.undo()
    assert _observe(spark, idx) == (0, 0)  # old epoch, both tables
    assert pair_versions(spark, idx) is None  # nothing announced
    # the prescribed recovery: re-run to completion
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )
    assert _observe(spark, idx) == (1, 1)


def test_crash_before_pair_flip_is_unobservable(spark, tmp_path, monkeypatch):
    """Both generations fully written, crash inside the pair flip
    itself: still nothing published (the two complete orphans get the
    standard one-cycle grace), and the re-run publishes cleanly."""
    idx = _versioned_index(spark, tmp_path)

    def crash_write_pair(spark_, path_, versions_):
        raise RuntimeError("injected crash before the pair flip")

    monkeypatch.setattr(versioned, "_write_pair", crash_write_pair)
    with pytest.raises(RuntimeError, match="injected crash"):
        write_minhash_index(
            _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
        )
    monkeypatch.undo()
    assert _observe(spark, idx) == (0, 0)
    assert pair_versions(spark, idx) is None
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )
    assert _observe(spark, idx) == (1, 1)


def test_crash_after_pair_flip_before_pointer_flips(spark, tmp_path, monkeypatch):
    """The pair file IS the publish: a crash after it flips but before
    any per-table pointer moves leaves readers on the NEW epoch for
    both tables (never mixed); the lagging pointers are cosmetic and
    the next maintenance publish heals them."""
    idx = _versioned_index(spark, tmp_path)
    old_ptr = {
        t: pointer_version(spark, idx, t) for t in ("bands", "shingles")
    }

    def crash_publish_version(spark_, path_, table_, version_, prev_):
        raise RuntimeError("injected crash before the pointer flips")

    monkeypatch.setattr(versioned, "publish_version", crash_publish_version)
    with pytest.raises(RuntimeError, match="injected crash"):
        write_minhash_index(
            _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
        )
    monkeypatch.undo()
    # readers already consistent on the new epoch via the pair...
    assert _observe(spark, idx) == (1, 1)
    pv = pair_versions(spark, idx)
    assert pv is not None
    # ...while the per-table pointers lag (cosmetic)
    for t in ("bands", "shingles"):
        assert pointer_version(spark, idx, t) == old_ptr[t] < pv[t]
    # the next maintenance publish (a compaction) heals the pointers
    compact_index(spark, idx)
    assert _observe(spark, idx) == (1, 1)
    pv2 = pair_versions(spark, idx)
    for t in ("bands", "shingles"):
        assert pointer_version(spark, idx, t) == pv2[t] > pv[t]


def test_every_crash_point_yields_consistent_pair(spark, tmp_path, monkeypatch):
    """Sweep: a reader hooked into EVERY publish step of a second
    rebuild (pair write, each pointer flip) always observes equal
    epochs across the two tables."""
    idx = _versioned_index(spark, tmp_path)
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )

    observed: list[tuple[int, int]] = []

    def check():
        be, se = _observe(spark, idx)
        assert be == se, f"torn: bands epoch {be}, shingles epoch {se}"
        observed.append((be, se))

    real_wp, real_pub = versioned._write_pair, versioned.publish_version

    def hooked_wp(spark_, path_, versions_):
        check()
        real_wp(spark_, path_, versions_)
        check()

    def hooked_pub(spark_, path_, table_, version_, prev_):
        check()
        real_pub(spark_, path_, table_, version_, prev_)
        check()

    monkeypatch.setattr(versioned, "_write_pair", hooked_wp)
    monkeypatch.setattr(versioned, "publish_version", hooked_pub)
    write_minhash_index(
        _docs(spark, 2), idx, id_col="doc_id", shingles_col="shingles"
    )
    monkeypatch.undo()
    # the flip happened mid-sequence: both epochs observed, never mixed
    assert (1, 1) in observed and (2, 2) in observed
    assert _observe(spark, idx) == (2, 2)


def test_pair_file_torn_content_degrades_to_pointers(spark, tmp_path):
    """A torn/garbled pair file must degrade resolution to the
    per-table pointers (hint, not dependency — same philosophy as
    pointer_version), not crash or misroute."""
    idx = _versioned_index(spark, tmp_path)
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )
    with open(f"{idx}/pair.version", "w") as fh:
        fh.write("bands=")  # torn mid-write on a non-atomic FS
    assert pair_versions(spark, idx) is None
    # pointers were flipped by the same publish, so resolution holds
    assert _observe(spark, idx) == (1, 1)


def test_publish_pair_carries_foreign_entries_forward(spark, tmp_path):
    """publish_pair must not drop pair entries for tables outside this
    publish (a three-table index publishing two must keep the third's
    announcement intact)."""
    root = str(tmp_path / "root")
    spark.range(1).write.parquet(f"{root}/a-v1")
    spark.range(1).write.parquet(f"{root}/b-v1")
    versioned.publish_pair(spark, root, {"a": (1, None), "b": (1, None)})
    assert pair_versions(spark, root) == {"a": 1, "b": 1}
    spark.range(2).write.parquet(f"{root}/a-v2")
    versioned.publish_pair(spark, root, {"a": (2, f"{root}/a-v1")})
    assert pair_versions(spark, root) == {"a": 2, "b": 1}


def test_index_health_reports_pair(spark, tmp_path):
    """index_health must surface the pair pointer readers resolve: a
    crashed paired publish leaves per-table cadence generations LAGGING
    the pair, and the report is where a monitor sees that debt."""
    from bigdataproject_spark.operators.dedup_index import index_health

    idx = _versioned_index(spark, tmp_path)
    assert index_health(spark, idx)["pair"] is None  # never rebuilt
    write_minhash_index(
        _docs(spark, 1), idx, id_col="doc_id", shingles_col="shingles"
    )
    health = index_health(spark, idx)
    pv = pair_versions(spark, idx)
    assert health["pair"] == pv and set(pv) == {"bands", "shingles"}
    for t in ("bands", "shingles"):
        assert health[t]["generation"] == pv[t]  # clean publish: no lag
