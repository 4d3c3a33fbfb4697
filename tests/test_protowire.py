"""Protobuf wire-format danmaku ingestion (S10) — hand-rolled parser
parity, edge cases, and the Spark mapInPandas/binaryFile plumbing.

The encoder here is the test double: round-trip encode→parse pins the
wire format without needing google.protobuf in the container; the
import-gated cross-check at the bottom lights up as a real
generated-runtime comparison in any protobuf-bearing environment (the
jieba-seam pattern, tests/test_tokenizer_seam.py)."""

from __future__ import annotations

import os

import pytest

from bigdataproject_spark.sources.protowire import (
    danmaku_table,
    decode_danmaku_segments,
    encode_danmaku_elem,
    encode_dm_seg,
    parse_danmaku_elem,
    parse_dm_seg,
    read_danmaku_bin_dir,
    read_varint,
    skip_field,
    write_varint,
)

ELEM_A = {
    "dmid": 123456789012345,
    "progress_ms": 61234,
    "mode": 1,
    "fontsize": 25,
    "color": 16777215,
    "uid": "a1b2c3d4",
    "text": "前方高能！",
    "ctime": 1700000000,
    "weight": 10,
    "pool": 0,
}
ELEM_B = {
    "dmid": 7,
    "progress_ms": 0,
    "mode": 4,
    "fontsize": 18,
    "color": 0,
    "uid": "ffee",
    "text": "emoji 🎉 + ascii",
    "ctime": 1700000300,
    "weight": 0,
    "pool": 1,
}


# --- varint primitives --------------------------------------------------------


def test_varint_roundtrip_boundaries():
    for v in [0, 1, 127, 128, 300, 2**21 - 1, 2**32, 2**63 - 1, 2**64 - 1]:
        raw = write_varint(v)
        got, pos = read_varint(raw, 0)
        assert got == v and pos == len(raw)


def test_varint_truncated_and_overlong_raise():
    with pytest.raises(ValueError, match="truncated"):
        read_varint(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="longer than 10"):
        read_varint(b"\x80" * 11, 0)


def test_skip_field_rejects_groups_and_truncation():
    with pytest.raises(ValueError, match="wire type 3"):
        skip_field(b"", 0, 3)
    with pytest.raises(ValueError, match="truncated fixed64"):
        skip_field(b"\x01\x02", 0, 1)
    with pytest.raises(ValueError, match="overruns"):
        skip_field(write_varint(99) + b"xy", 0, 2)


# --- elem / segment round-trip ------------------------------------------------


def test_elem_roundtrip_exact():
    for elem in (ELEM_A, ELEM_B):
        assert parse_danmaku_elem(encode_danmaku_elem(elem)) == elem


def test_empty_elem_is_all_defaults():
    parsed = parse_danmaku_elem(b"")
    assert parsed["dmid"] == 0 and parsed["text"] == "" and parsed["uid"] == ""


def test_negative_int32_ten_byte_varint():
    # proto3 int32 negatives sign-extend to 64 bits on the wire
    elem = dict(ELEM_A, progress_ms=-1500)
    raw = encode_danmaku_elem(elem)
    assert b"\xff" in raw  # the 10-byte sign-extended varint is present
    assert parse_danmaku_elem(raw)["progress_ms"] == -1500


def test_unknown_fields_skipped_every_wire_type():
    # splice unknown fields (numbers the elem never uses) between real
    # ones: varint(14), fixed64(15), LEN(16), fixed32(17)
    raw = bytearray(encode_danmaku_elem(ELEM_A))
    raw += write_varint(14 << 3 | 0) + write_varint(991)
    raw += write_varint(15 << 3 | 1) + b"\x01\x02\x03\x04\x05\x06\x07\x08"
    raw += write_varint(16 << 3 | 2) + write_varint(3) + b"abc"
    raw += write_varint(17 << 3 | 5) + b"\xaa\xbb\xcc\xdd"
    assert parse_danmaku_elem(bytes(raw)) == ELEM_A


def test_repeated_scalar_last_wins():
    raw = encode_danmaku_elem(ELEM_A) + encode_danmaku_elem(
        {"text": "overwritten"}
    )
    assert parse_danmaku_elem(raw)["text"] == "overwritten"


def test_seg_roundtrip_and_state_skipped():
    data = encode_dm_seg([ELEM_A, ELEM_B], state=1)
    assert parse_dm_seg(data) == [ELEM_A, ELEM_B]
    assert parse_dm_seg(encode_dm_seg([])) == []


def test_corrupt_overrun_raises():
    data = bytearray(encode_dm_seg([ELEM_A]))
    # inflate the elem's declared length past the buffer end
    tag, pos = read_varint(bytes(data), 0)
    data[pos] = 0x7F  # single-byte length 127 >> actual remaining bytes
    with pytest.raises(ValueError, match="overruns"):
        parse_dm_seg(bytes(data))


# --- Spark plumbing -----------------------------------------------------------


@pytest.fixture(scope="module")
def seg_df(spark):
    rows = [
        ("seg-1", encode_dm_seg([ELEM_A, ELEM_B], state=1)),
        ("seg-2", encode_dm_seg([dict(ELEM_A, ctime=1700009999)])),  # dup dmid
        ("seg-3", encode_dm_seg([])),
        ("seg-4", None),  # the reference's parse-failure/retry path
    ]
    return spark.createDataFrame(rows, "seg_key string, payload binary")


def test_decode_segments_explodes_per_elem(seg_df):
    out = decode_danmaku_segments(
        seg_df, key_col="seg_key", payload_col="payload"
    )
    rows = {(r.seg_key, r.dmid): r.asDict() for r in out.collect()}
    assert len(rows) == 3  # 2 + 1 + 0 + 0
    got = rows[("seg-1", ELEM_A["dmid"])]
    assert got["text"] == ELEM_A["text"]
    assert got["progress_ms"] == ELEM_A["progress_ms"]
    assert got["color"] == ELEM_A["color"]
    assert rows[("seg-1", 7)]["pool"] == 1


def test_danmaku_table_matches_reference_mapping(seg_df):
    elems = decode_danmaku_segments(
        seg_df, key_col="seg_key", payload_col="payload"
    )
    table = danmaku_table(elems)
    rows = {r.dmid: r.asDict() for r in table.collect()}
    # dedup by dmid: ELEM_A appears in seg-1 and seg-2; min ctime wins
    assert len(rows) == 2
    a = rows[str(ELEM_A["dmid"])]
    assert a["video_time"] == pytest.approx(61.234, abs=0)
    assert a["send_date"].startswith("2023-11-1")  # epoch 1700000000
    assert a["uid"] == ELEM_A["uid"] and a["source"] == "api"
    assert set(rows[str(ELEM_A["dmid"])]) == {
        "dmid", "video_time", "text", "send_date", "uid", "source",
    }


def test_binaryfile_ingestion_roundtrip(spark, tmp_path):
    bin_dir = tmp_path / "bins"
    os.makedirs(bin_dir)
    (bin_dir / "av1.bin").write_bytes(encode_dm_seg([ELEM_A], state=1))
    (bin_dir / "av2.bin").write_bytes(encode_dm_seg([ELEM_B]))
    segs = read_danmaku_bin_dir(spark, str(bin_dir))
    out = decode_danmaku_segments(
        segs, key_col="seg_key", payload_col="payload"
    ).collect()
    by_file = {r.seg_key.rsplit("/", 1)[-1]: r for r in out}
    assert by_file["av1.bin"].dmid == ELEM_A["dmid"]
    assert by_file["av2.bin"].text == ELEM_B["text"]


# --- generated-runtime cross-check (lights up when protobuf exists) -----------


def test_generated_runtime_parity_when_available():
    """In a protobuf-bearing container, build the same DanmakuElem via
    the official runtime's wire encoder and require bit-level parse
    parity (and reverse: our encoder's bytes parse identically there).
    Skips cleanly here — the standing-signal pattern of the jieba seam."""
    pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2  # noqa: F401 - presence probe

    # No generated dm_pb2 is shipped (and the reference's copy must not
    # be imported); construct the message dynamically from a minimal
    # FileDescriptorProto mirroring the public field numbers.
    from google.protobuf import descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "dm_min.proto"
    fdp.syntax = "proto3"
    msg = fdp.message_type.add()
    msg.name = "DanmakuElem"
    scalars = [
        ("id", 1, "TYPE_INT64"),
        ("progress", 2, "TYPE_INT32"),
        ("mode", 3, "TYPE_INT32"),
        ("fontsize", 4, "TYPE_INT32"),
        ("color", 5, "TYPE_UINT32"),
        ("midHash", 6, "TYPE_STRING"),
        ("content", 7, "TYPE_STRING"),
        ("ctime", 8, "TYPE_INT64"),
        ("weight", 9, "TYPE_INT32"),
        ("pool", 11, "TYPE_INT32"),
    ]
    for name, num, typ in scalars:
        f = msg.field.add()
        f.name, f.number = name, num
        f.type = getattr(descriptor_pb2.FieldDescriptorProto, typ)
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    cls = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("DanmakuElem")
    )
    m = cls(
        id=ELEM_A["dmid"],
        progress=ELEM_A["progress_ms"],
        mode=ELEM_A["mode"],
        fontsize=ELEM_A["fontsize"],
        color=ELEM_A["color"],
        midHash=ELEM_A["uid"],
        content=ELEM_A["text"],
        ctime=ELEM_A["ctime"],
        weight=ELEM_A["weight"],
    )
    official = m.SerializeToString()
    assert parse_danmaku_elem(official) == ELEM_A
    theirs = cls()
    theirs.ParseFromString(encode_danmaku_elem(ELEM_A))
    assert theirs == m


# --- property-based invariants (hypothesis) -----------------------------------


def test_property_roundtrip_and_junk_safety():
    """Two wire-format invariants over generated inputs (SURVEY §5
    item 4 style): (a) encode→parse is the identity for any canonical
    elem dict; (b) the parser TERMINATES on arbitrary junk bytes with
    either a parsed result or ValueError — never a hang, never another
    exception type (the fail-loud contract's full envelope)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    text_s = st.text(max_size=40)  # includes CJK, emoji, controls
    elem_s = st.fixed_dictionaries(
        {
            "dmid": st.integers(-(2**63), 2**63 - 1),
            "progress_ms": st.integers(-(2**31), 2**31 - 1),
            "mode": st.integers(-(2**31), 2**31 - 1),
            "fontsize": st.integers(-(2**31), 2**31 - 1),
            "color": st.integers(0, 2**32 - 1),
            "uid": text_s,
            "text": text_s,
            "ctime": st.integers(-(2**63), 2**63 - 1),
            "weight": st.integers(-(2**31), 2**31 - 1),
            "pool": st.integers(-(2**31), 2**31 - 1),
        }
    )

    @settings(max_examples=200, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(elem_s, max_size=5))
    def roundtrip(elems):
        assert parse_dm_seg(encode_dm_seg(elems, state=1)) == elems

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def junk(data):
        try:
            out = parse_dm_seg(data)
        except ValueError:
            return
        assert isinstance(out, list)

    roundtrip()
    junk()
