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


def test_png_roundtrip_all_filters():
    """The PNG decoder (third real codec, first COMPRESSED one):
    encode → decode is the identity for every scanline filter type
    (None/Sub/Up/Average/Paeth) and every supported channel count
    (gray, gray+alpha, RGB, RGBA) — each filter exercises a distinct
    reconstruction branch, so a wrong Paeth predictor or a dropped
    left-pixel carry fails loudly here."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for channels in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(5, 7, channels), dtype=np.uint8)
        for ftype in range(5):
            w, h, out = decode_png(encode_png(img, filter_type=ftype))
            assert (w, h) == (7, 5)
            assert out.shape == (5, 7, channels)
            assert np.array_equal(out, img), (channels, ftype)
    # 2-D grayscale input encodes as color type 0 and round-trips
    gray = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    w, h, out = decode_png(encode_png(gray, filter_type=4))
    assert out.shape == (3, 4, 1)
    assert np.array_equal(out[:, :, 0], gray)


def test_png_decoder_rejects_garbage():
    """Reject-don't-guess: non-PNG bytes, truncated chunks, corrupted
    CRCs, unsupported depth, and torn zlib streams all raise ValueError
    instead of producing pixels."""
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError):
        decode_png(b"GIF89a definitely not a png")
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with _pytest.raises(ValueError):  # truncated mid-chunk
        decode_png(good[:-6])
    flipped = bytearray(good)
    flipped[-5] ^= 0xFF  # corrupt the IEND CRC
    with _pytest.raises(ValueError):
        decode_png(bytes(flipped))
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit depth byte
    struct.pack_into(  # re-seal the CRC so the depth check is what fires
        ">I",
        bad_depth,
        29,
        __import__("zlib").crc32(bytes(bad_depth[12:29])) & 0xFFFFFFFF,
    )
    with _pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad_depth))


def test_real_png_decode_through_seam(spark):
    """extract_features(codec='png') decodes real deflate-compressed
    bytes on executors: solid-color RGBA/RGB fixtures come back as
    exact (width, height, channels, per-channel means)."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import encode_png

    fixtures = [
        (0, np.tile(np.array([10, 20, 30], dtype=np.uint8), (3, 5, 1))),
        (1, np.tile(np.array([200, 100, 50, 255], dtype=np.uint8), (4, 2, 1))),
    ]
    df = spark.createDataFrame(
        [Row(id=i, payload=encode_png(img, filter_type=4)) for i, img in fixtures]
    )
    assets = to_media_assets(df, id_col="id", payload_col="payload", media_type="image")
    rows = {
        r.asset_id: r.feature
        for r in extract_features(assets, codec="png", dim=7).collect()
    }
    assert rows[0] == pytest.approx([5.0, 3.0, 3.0, 10.0, 20.0, 30.0, 0.0])
    assert rows[1] == pytest.approx([2.0, 4.0, 4.0, 200.0, 100.0, 50.0, 255.0])

    junk = to_media_assets(
        spark.createDataFrame([Row(id=9, payload=b"BM not a png")]),
        id_col="id", payload_col="payload", media_type="image",
    )
    with pytest.raises(Exception):
        extract_features(junk, codec="png").collect()


def test_real_resize_through_codecs(spark):
    """resize_images(codec=...) is a REAL transform: decode →
    nearest-neighbor → re-encode, verified pixel-exact against the
    numpy index-resample of the source array, for both image codecs —
    and the outputs are themselves decodable media."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
        resize_images,
    )

    rng = np.random.default_rng(23)
    src = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    tw, th = 4, 3
    ys = np.minimum(((np.arange(th) + 0.5) * 6 / th).astype(int), 5)
    xs = np.minimum(((np.arange(tw) + 0.5) * 9 / tw).astype(int), 8)
    want = src[ys][:, xs]

    for codec, enc, dec in (("bmp", encode_bmp, decode_bmp), ("png", encode_png, decode_png)):
        df = spark.createDataFrame([Row(id=1, payload=enc(src))])
        assets = to_media_assets(
            df, id_col="id", payload_col="payload", media_type="image"
        )
        out = resize_images(assets, width=tw, height=th, codec=codec).collect()
        assert len(out) == 1 and (out[0].width, out[0].height) == (tw, th)
        w, h, img = dec(bytes(out[0].payload))
        assert (w, h) == (tw, th)
        assert np.array_equal(img, want), codec

    # upscale path: every target pixel maps inside the source
    up = resize_images(
        to_media_assets(
            spark.createDataFrame([Row(id=2, payload=encode_png(src))]),
            id_col="id", payload_col="payload", media_type="image",
        ),
        width=18, height=12, codec="png",
    ).collect()
    w, h, img = decode_png(bytes(up[0].payload))
    assert (w, h, img.shape[2]) == (18, 12, 3)
    # 2x nearest-neighbor upscale is an exact pixel repeat
    assert np.array_equal(img, np.repeat(np.repeat(src, 2, axis=0), 2, axis=1))


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


def test_resize_rejects_codec_with_fake(spark):
    """codec= and fake=True are mutually exclusive — silently preferring
    the codec would hand real re-encoded media to a caller who believes
    they requested the deterministic stub."""
    from bigdataproject_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, b"x")], "asset_id long, payload binary")
    for codec in ("bmp", "png"):
        with pytest.raises(ValueError, match="fake=True contradicts codec"):
            resize_images(df, width=2, height=2, codec=codec, fake=True)


def test_avi_roundtrip():
    """encode_avi → decode_avi is exact: dimensions, frame timing from
    the container's own avih, and every frame byte-identical."""
    import numpy as np

    from bigdataproject_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(4)]
    payload = encode_avi(frames, fps=10)
    w, h, usec, got = decode_avi(payload)
    assert (w, h) == (5, 6)
    assert usec == 100_000  # 10 fps
    assert len(got) == 4
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_avi_decoder_rejects_garbage():
    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_avi, encode_avi

    with _pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFX" + b"\x00" * 64)
    good = encode_avi([np.zeros((2, 2, 3), dtype=np.uint8)])
    with _pytest.raises(ValueError, match="truncated"):
        decode_avi(good[:-6])


def test_avi_decoder_single_stream_contract():
    """r11 (advisor): a second video stream must REJECT, and frame
    chunks from a non-00 stream must never interleave into the output
    — the reject-don't-guess contract extended to multi-stream AVIs."""
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_avi, encode_avi

    f0 = np.full((2, 2, 3), 7, dtype=np.uint8)
    f1 = np.full((2, 2, 3), 200, dtype=np.uint8)
    good = encode_avi([f0, f1], fps=10)

    # a second 'vids' strh anywhere in the container → loud rejection
    # (the walker scans the whole RIFF, so a top-level append suffices)
    two_streams = good + b"strh" + struct.pack("<I", 4) + b"vids"
    with _pytest.raises(ValueError, match="2 video streams"):
        decode_avi(two_streams)

    # a foreign-stream frame chunk (01db) inside movi is IGNORED, not
    # interleaved: relabel the second frame's fourcc and expect exactly
    # the first frame back
    i = good.rindex(b"00db")
    foreign = good[:i] + b"01db" + good[i + 4 :]
    w, h, _, frames = decode_avi(foreign)
    assert (w, h) == (2, 2) and len(frames) == 1
    # frame content equals the encoded first frame exactly
    _, _, _, ref = decode_avi(encode_avi([f0], fps=10))
    assert (frames[0] == ref[0]).all()


def test_real_avi_frame_sampling_through_seam(spark):
    """The r10 real video path: a generated 10-frame AVI (frame f is a
    constant-color image of value f) goes through sample_frames'
    mapInPandas seam with codec='avi'; the sampled payloads are
    standalone BMPs that decode back to the EXPECTED source frames at
    the container's own timestamps."""
    import numpy as np
    from pyspark.sql import Row

    from bigdataproject_spark.operators.multimodal import (
        decode_bmp,
        encode_avi,
        sample_frames,
    )

    frames = [
        np.full((4, 6, 3), f, dtype=np.uint8) for f in range(10)
    ]  # 10 frames @ 25 fps = 40 ms apart, 360 ms long
    df = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(encode_avi(frames, fps=25)))]
    )
    out = sample_frames(
        df, n_frames=3, frame_interval_ms=100, codec="avi"
    ).collect()
    assert len(out) == 3
    by_idx = {r.frame_idx: r for r in out}
    # targets 0/100/200 ms → source frames 0 (0 ms), round(100/40)=2
    # (80 ms wait: round(2.5)=2 → 80 ms), round(200/40)=5 (200 ms)
    for f, (src, ts) in {0: (0, 0), 1: (2, 80), 2: (5, 200)}.items():
        r = by_idx[f]
        assert r.ts_ms == ts, (f, r.ts_ms)
        w, h, img = decode_bmp(bytes(r.payload))
        assert (w, h) == (6, 4)
        assert int(img[0, 0, 0]) == src, (f, int(img[0, 0, 0]))


def test_sample_frames_rejects_codec_with_fake(spark):
    from bigdataproject_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"x")], "asset_id long, payload binary")
    with pytest.raises(ValueError, match="fake=True contradicts codec"):
        sample_frames(df, n_frames=2, codec="avi", fake=True)


def test_avi_decoder_accepts_nonzero_video_stream():
    """r12 (advisor): a valid single-video AVI whose audio strl
    precedes the video strl (video = stream 01) must DECODE — r11
    pinned frame chunks to stream 00 and such a file died with a
    misleading 'no video frames'. The demuxer now tracks the vids
    strh ordinal and accepts that stream's dd-chunks; chunks of the
    audio stream (00wb) and of any other ordinal are still ignored."""
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_avi, encode_avi

    f0 = np.full((2, 2, 3), 7, dtype=np.uint8)
    f1 = np.full((2, 2, 3), 200, dtype=np.uint8)
    base = encode_avi([f0, f1], fps=10)

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    # rebuild the container with an audio strl FIRST: rip avih, the
    # video strh/strf and the frame DIBs out of the encoder's output
    def find(fourcc, frm=0):
        i = base.index(fourcc, frm)
        (size,) = struct.unpack_from("<I", base, i + 4)
        return base[i + 8 : i + 8 + size], i + 8 + size

    avih, _ = find(b"avih")
    strh_v, _ = find(b"strh")
    strf_v, _ = find(b"strf")
    dib0, nxt = find(b"00db")
    dib1, _ = find(b"00db", nxt)

    strh_a = struct.pack(
        "<4s4sIHH8I4h", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1,
        8000, 0, 16000, 1, 0, 0, 0, 0, 0, 0,
    )
    strf_a = b"\x01\x00\x01\x00" + struct.pack("<IIHH", 8000, 8000, 1, 8)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v)),
    )
    movi = lst(
        b"movi",
        chunk(b"00wb", b"\x80" * 20)  # audio data: ignored
        + chunk(b"01db", dib0)
        + chunk(b"01db", dib1),
    )
    payload = chunk(b"RIFF", b"AVI " + hdrl + movi)

    w, h, usec, frames = decode_avi(payload)
    assert (w, h, usec, len(frames)) == (2, 2, 100_000, 2)
    _, _, _, ref = decode_avi(base)
    assert (frames[0] == ref[0]).all() and (frames[1] == ref[1]).all()

    # no vids stream at all → loud, specific error
    hdrl_a = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)),
    )
    with _pytest.raises(ValueError, match="no video .vids. stream"):
        decode_avi(chunk(b"RIFF", b"AVI " + hdrl_a + movi))


def test_avi_decoder_ignores_large_audio_strf():
    """r12 review follow-up: the strf handler must be associated with
    its stream via the preceding strh, not gated on size — an audio
    WAVEFORMATEXTENSIBLE strf is exactly 40 bytes and was being parsed
    as BITMAPINFOHEADER, rejecting the very audio-first files the
    ordinal fix accepts (bpp field lands on nChannels/wBitsPerSample
    garbage)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdataproject_spark.operators.multimodal import decode_avi, encode_avi

    f0 = np.full((2, 2, 3), 9, dtype=np.uint8)
    base = encode_avi([f0], fps=10)

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    def find(fourcc, frm=0):
        i = base.index(fourcc, frm)
        (size,) = struct.unpack_from("<I", base, i + 4)
        return base[i + 8 : i + 8 + size], i + 8 + size

    avih, _ = find(b"avih")
    strh_v, _ = find(b"strh")
    strf_v, _ = find(b"strf")
    dib0, _ = find(b"00db")

    strh_a = struct.pack(
        "<4s4sIHH8I4h", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1,
        8000, 0, 16000, 1, 0, 0, 0, 0, 0, 0,
    )
    # WAVEFORMATEXTENSIBLE: 18-byte WAVEFORMATEX (cbSize=22) + 22-byte
    # extension = 40 bytes — wFormatTag=0xFFFE, 2ch, 16-bit, the
    # standard PCM-extensible shape
    strf_a = struct.pack(
        "<HHIIHHH", 0xFFFE, 2, 48000, 192000, 4, 16, 22
    ) + struct.pack("<HI16s", 16, 3, b"\x01\x00\x00\x00\x00\x00\x10\x00" b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
    assert len(strf_a) == 40
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v)),
    )
    movi = lst(b"movi", chunk(b"00wb", b"\x80" * 8) + chunk(b"01db", dib0))
    payload = chunk(b"RIFF", b"AVI " + hdrl + movi)

    w, h, usec, frames = decode_avi(payload)
    assert (w, h, len(frames)) == (2, 2, 1)
    _, _, _, ref = decode_avi(base)
    assert (frames[0] == ref[0]).all()

    # and a truncated VIDS strf now fails loudly instead of falling
    # through to the generic missing-headers error
    hdrl_bad = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v[:20])),
    )
    with _pytest.raises(ValueError, match="truncated vids strf"):
        decode_avi(chunk(b"RIFF", b"AVI " + hdrl_bad + movi))
