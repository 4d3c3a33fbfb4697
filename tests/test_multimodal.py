"""Multimodal plumbing: asset wrapping metadata, stubbed decode via
mapInPandas (real schema/batching, fake deterministic features), and the
NotImplementedError gate for the real codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdataproject_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    to_media_assets,
)


@pytest.fixture()
def assets(spark):
    df = spark.createDataFrame(
        [Row(id=1, payload=b"abc"), Row(id=2, payload=b""), Row(id=3, payload=b"\x00\x01\x02\x03")]
    )
    return to_media_assets(df, id_col="id", payload_col="payload", media_type="image")


def test_asset_metadata(assets):
    rows = {r.asset_id: r for r in assets.collect()}
    assert rows[1].n_bytes == 3
    assert rows[2].n_bytes == 0
    assert rows[1].sha256 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    assert all(r.media_type == "image" for r in rows.values())


def test_fake_decode_features(assets):
    feats = extract_features(assets, fake=True, dim=4)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows[1].feature) == 4
    # histogram sums to 1 for non-empty payloads
    assert abs(sum(rows[1].feature) - 1.0) < 1e-6
    assert sum(rows[2].feature) == 0.0  # empty payload → zero vector


def test_real_decode_is_gated(assets):
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(assets, fake=False).collect()
