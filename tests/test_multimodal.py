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


def test_resize_images_plumbing(spark, sf_dir):
    """Resize stage: 1:1 cardinality, bounded payloads, deterministic."""
    import pytest
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.multimodal import resize_images, to_media_assets
    from bigdataproject_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50).withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    assets = to_media_assets(docs, id_col="doc_id", payload_col="payload", media_type="image")
    out = resize_images(assets, width=8, height=4, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.payload) <= 32 for r in rows)
    again = {r.asset_id: bytes(r.payload) for r in resize_images(assets, width=8, height=4, fake=True).collect()}
    assert {r.asset_id: bytes(r.payload) for r in rows} == again  # deterministic
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(assets, width=8, height=4).collect()


def test_sample_frames_explodes(spark, sf_dir):
    """Frame sampling: 1:N cardinality with ordered synthetic timestamps."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.multimodal import sample_frames, to_media_assets
    from bigdataproject_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10).withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    assets = to_media_assets(docs, id_col="doc_id", payload_col="payload", media_type="video")
    out = sample_frames(assets, n_frames=4, frame_interval_ms=250, fake=True)
    rows = out.collect()
    assert len(rows) == 40
    per = {}
    for r in rows:
        per.setdefault(r.asset_id, []).append((r.frame_idx, r.ts_ms))
    for frames in per.values():
        assert sorted(frames) == [(0, 0), (1, 250), (2, 500), (3, 750)]


def test_bmp_roundtrip_pure_python():
    """The vendored real decoder (r8 VERDICT item 6): encode → decode is
    the identity for uncompressed 24-bpp, including non-multiple-of-4
    widths (row padding) and the top-down (negative height) variant."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (5, 4), (8, 3)]:  # 3,5 exercise padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ww, hh, out = decode_bmp(encode_bmp(img))
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, img)

    # top-down variant: flip the height sign in the info header
    import struct

    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    buf = bytearray(encode_bmp(img[::-1]))  # body stored top-first now
    struct.pack_into("<i", buf, 22, -2)
    ww, hh, out = decode_bmp(bytes(buf))
    assert (ww, hh) == (3, 2)
    assert np.array_equal(out, img)


def test_bmp_decoder_rejects_garbage():
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_bmp, encode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all, far too short")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_bmp(img)
    with _pytest.raises(ValueError):  # truncated pixel array
        decode_bmp(good[:-3])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))


def test_real_bmp_decode_through_seam(spark):
    """The non-fake mapInPandas path decodes REAL bytes in-container:
    solid-color BMP fixtures of known size go through
    extract_features(codec='bmp') and come back as exact pixel
    statistics — a wrong decode (row order, padding, channel order)
    would change the numbers."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import encode_bmp

    fixtures = []
    for aid, (w, h, bgr) in enumerate(
        [(5, 3, (10, 20, 30)), (4, 4, (0, 0, 255)), (7, 2, (200, 100, 50))]
    ):
        img = np.tile(np.array(bgr, dtype=np.uint8), (h, w, 1))
        fixtures.append(Row(id=aid, payload=encode_bmp(img), w=w, h=h, bgr=bgr))

    df = spark.createDataFrame([Row(id=f.id, payload=f.payload) for f in fixtures])
    assets = to_media_assets(df, id_col="id", payload_col="payload", media_type="image")
    feats = extract_features(assets, codec="bmp", dim=5)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 3
    for f in fixtures:
        got = rows[f.id].feature
        want = [float(f.w), float(f.h)] + [float(c) for c in f.bgr]
        assert got == pytest.approx(want), (f.w, f.h, f.bgr)

    # a non-BMP payload on the real path fails LOUDLY, not silently
    junk = to_media_assets(
        spark.createDataFrame([Row(id=9, payload=b"\x89PNG not a bmp......")]),
        id_col="id", payload_col="payload", media_type="image",
    )
    with pytest.raises(Exception):
        extract_features(junk, codec="bmp").collect()


def test_wav_roundtrip_and_seam(spark):
    """Second real in-container codec (audio): stdlib-wave PCM decode
    through the same mapInPandas seam — sample_rate / channels /
    n_samples / rms / peak come back exact for a generated sine
    fixture; non-WAV payloads fail loudly."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(800)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    rate, ch, back = decode_wav(encode_wav(sine, sample_rate=8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(back, sine)

    square = np.where(np.arange(400) % 2 == 0, 3000, -3000).astype(np.int16)
    df = spark.createDataFrame(
        [
            Row(id=0, payload=encode_wav(sine, sample_rate=8000)),
            Row(id=1, payload=encode_wav(square, sample_rate=16000)),
        ]
    )
    assets = to_media_assets(df, id_col="id", payload_col="payload", media_type="audio")
    rows = {
        r.asset_id: r.feature
        for r in extract_features(assets, codec="wav", dim=5).collect()
    }
    want_sine_rms = float(np.sqrt((sine.astype(np.float64) ** 2).mean()))
    assert rows[0][:3] == [8000.0, 1.0, 800.0]
    assert rows[0][3] == pytest.approx(want_sine_rms, rel=1e-6)
    assert rows[1] == pytest.approx([16000.0, 1.0, 400.0, 3000.0, 3000.0])

    junk = to_media_assets(
        spark.createDataFrame([Row(id=9, payload=b"RIFFgarbage")]),
        id_col="id", payload_col="payload", media_type="audio",
    )
    with pytest.raises(Exception):
        extract_features(junk, codec="wav").collect()
