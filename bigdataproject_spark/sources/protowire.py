"""Dependency-free protobuf wire-format ingestion for the danmaku
segment binaries the reference crawls (SURVEY §2.1 S10).

Reference: ``crawler/spider_worker.py:29-46`` decodes a
``DmSegMobileReply`` protobuf (``crawler/dm_pb2.py``, package
``bilibili.community.service.dm.v1``) and keeps five ``DanmakuElem``
fields — ``id``→dmid, ``progress`` (ms), ``content``→text,
``ctime``→send epoch, ``midHash``→uid — writing one CSV row per elem
(deduplicated by dmid via a ``seen_ids`` set); parse failures fall back
to saving the raw ``.bin`` (``spider_worker.py:80-86``), which is the
on-disk form this module ingests at scale.

The reference needs the ``google.protobuf`` runtime; this container
doesn't have it, and a row-at-a-time generated class would be the slow
path on Spark anyway. The protobuf WIRE FORMAT itself is public and
tiny (Protocol Buffers encoding spec, protobuf.dev/programming-guides/
encoding): a message is a flat sequence of ``(tag, payload)`` records
where ``tag = field_number << 3 | wire_type``, varints are 7-bit
little-endian groups with a continuation bit, and strings/submessages
are length-delimited. Everything the danmaku reply uses is covered by
wire types 0 (varint), 1 (fixed64), 2 (LEN) and 5 (fixed32), so a
~60-line pure-Python parser decodes it exactly — including skipping
unknown/unused fields by wire type, so real replies carrying
``ai_flag``/``colorfulSrc``/new fields decode fine (forward
compatibility is a wire-format property, not a library feature).

Spark side: payloads ride as opaque ``binary`` columns (parquet rows or
the ``binaryFile`` source over the crawler's ``.bin`` fallback dir);
decoding is an Arrow-batched ``mapInPandas`` flat map — zero shuffle,
output cardinality decided per batch, one task never holds more than a
batch of blobs (the multimodal codec-seam shape). A matching encoder
lives here too: it is the test double (round-trip parity without the
protobuf runtime) and the fixture generator, exactly like
``multimodal.encode_png``/``encode_avi``. When a container DOES have
``google.protobuf`` + the generated class, the import-gated cross-check
(tests/test_protowire.py) lights up as a real generated-runtime-vs-
hand-parser comparison — the jieba-seam pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- wire-format primitives ---------------------------------------------------

_MAX_VARINT_BYTES = 10  # 64 bits / 7 bits per byte, rounded up


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode one base-128 varint at ``pos`` → (unsigned value, next pos).

    Raises ``ValueError`` on truncation or an over-long (>10 byte)
    encoding — corrupt input must fail loudly, not decode garbage."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(data):
            raise ValueError(f"truncated varint at byte {start}")
        if pos - start >= _MAX_VARINT_BYTES:
            raise ValueError(f"varint longer than 10 bytes at byte {start}")
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return result, pos
        shift += 7


def _to_int64(u: int) -> int:
    """Unsigned varint value → proto3 int64 (two's complement low 64)."""
    u &= (1 << 64) - 1
    return u - (1 << 64) if u >= (1 << 63) else u


def _to_int32(u: int) -> int:
    """Unsigned varint value → proto3 int32 (two's complement low 32).

    Negative int32s are encoded as 10-byte (sign-extended 64-bit)
    varints — the low 32 bits carry the value."""
    u &= (1 << 32) - 1
    return u - (1 << 32) if u >= (1 << 31) else u


def skip_field(data: bytes, pos: int, wire_type: int) -> int:
    """Advance past one field payload of the given wire type.

    Groups (wire types 3/4) are rejected: proto3 never emits them, so
    their presence means the buffer is not a proto3 danmaku reply."""
    if wire_type == 0:  # varint
        _, pos = read_varint(data, pos)
        return pos
    if wire_type == 1:  # fixed64
        if pos + 8 > len(data):
            raise ValueError(f"truncated fixed64 at byte {pos}")
        return pos + 8
    if wire_type == 2:  # length-delimited
        n, pos = read_varint(data, pos)
        if pos + n > len(data):
            raise ValueError(f"LEN field overruns buffer at byte {pos}")
        return pos + n
    if wire_type == 5:  # fixed32
        if pos + 4 > len(data):
            raise ValueError(f"truncated fixed32 at byte {pos}")
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type} at byte {pos}")


# --- DanmakuElem / DmSegMobileReply -------------------------------------------

# DanmakuElem field numbers (crawler/dm_pb2.py DESCRIPTOR, readable in
# the serialized FileDescriptorProto: id=1 progress=2 mode=3 fontsize=4
# color=5 midHash=6 content=7 ctime=8 weight=9 action=10 pool=11
# idStr=12 attr=13). The varint fields decode as int64/int32/uint32 per
# the .proto; LEN fields as UTF-8.
_ELEM_DEFAULTS = {
    "dmid": 0,
    "progress_ms": 0,
    "mode": 0,
    "fontsize": 0,
    "color": 0,
    "uid": "",
    "text": "",
    "ctime": 0,
    "weight": 0,
    "pool": 0,
}

_ELEM_VARINT = {
    1: ("dmid", _to_int64),
    2: ("progress_ms", _to_int32),
    3: ("mode", _to_int32),
    4: ("fontsize", _to_int32),
    5: ("color", lambda u: u & ((1 << 32) - 1)),  # uint32
    8: ("ctime", _to_int64),
    9: ("weight", _to_int32),
    11: ("pool", _to_int32),
}

_ELEM_LEN = {6: "uid", 7: "text"}  # midHash, content — UTF-8 strings


def parse_danmaku_elem(data: bytes) -> dict:
    """One ``DanmakuElem`` submessage → plain dict.

    proto3 semantics: absent scalar = default (0 / ''); a repeated
    occurrence of a scalar field = last one wins; unknown fields are
    skipped by wire type."""
    elem = dict(_ELEM_DEFAULTS)
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0 and field in _ELEM_VARINT:
            name, conv = _ELEM_VARINT[field]
            u, pos = read_varint(data, pos)
            elem[name] = conv(u)
        elif wt == 2 and field in _ELEM_LEN:
            n, pos = read_varint(data, pos)
            if pos + n > len(data):
                raise ValueError(f"string field {field} overruns buffer")
            elem[_ELEM_LEN[field]] = data[pos : pos + n].decode("utf-8")
            pos += n
        else:
            pos = skip_field(data, pos, wt)
    return elem


def parse_dm_seg(data: bytes) -> list[dict]:
    """``DmSegMobileReply`` bytes → list of elem dicts.

    Field 1 (repeated ``elems``) is decoded; everything else the reply
    carries (state=2, ai_flag=3, colorfulSrc=5, future fields) is
    skipped by wire type — mirroring ``decode_protobuf`` in the
    reference, which touches only ``danmaku_seg.elems``."""
    elems: list[dict] = []
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, pos = read_varint(data, pos)
            if pos + n > len(data):
                raise ValueError("elem submessage overruns buffer")
            elems.append(parse_danmaku_elem(data[pos : pos + n]))
            pos += n
        else:
            pos = skip_field(data, pos, wt)
    return elems


# --- encoder (test double / fixture generator) --------------------------------


def write_varint(u: int) -> bytes:
    """Unsigned value → base-128 varint bytes."""
    if u < 0:
        raise ValueError("write_varint takes the unsigned representation")
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _signed_varint(v: int) -> bytes:
    """proto3 int32/int64 value → varint bytes (sign-extended to 64)."""
    return write_varint(v & ((1 << 64) - 1))


def encode_danmaku_elem(elem: dict) -> bytes:
    """Dict (``parse_danmaku_elem`` keys) → ``DanmakuElem`` bytes.

    proto3 canonical form: default-valued scalars are omitted, fields in
    ascending number order — so encode(parse(x)) == x for canonical
    input, the property the round-trip tests pin."""
    fields = sorted(
        [(num, name, 0) for num, (name, _) in _ELEM_VARINT.items()]
        + [(num, name, 2) for num, name in _ELEM_LEN.items()]
    )
    out = bytearray()
    for num, name, wt in fields:
        val = elem.get(name, _ELEM_DEFAULTS[name])
        if val == _ELEM_DEFAULTS[name]:
            continue
        out += write_varint(num << 3 | wt)
        if wt == 0:
            out += _signed_varint(val)
        else:
            raw = val.encode("utf-8")
            out += write_varint(len(raw))
            out += raw
    return bytes(out)


def encode_dm_seg(elems: list[dict], *, state: int = 0) -> bytes:
    """Elem dicts → ``DmSegMobileReply`` bytes (field 1 repeated LEN,
    plus the ``state`` varint the real replies carry as field 2)."""
    out = bytearray()
    for elem in elems:
        raw = encode_danmaku_elem(elem)
        out += write_varint(1 << 3 | 2)
        out += write_varint(len(raw))
        out += raw
    if state:
        out += write_varint(2 << 3 | 0)
        out += _signed_varint(state)
    return bytes(out)


# --- Spark plumbing -----------------------------------------------------------

DANMAKU_ELEM_SCHEMA = StructType(
    [
        StructField("seg_key", StringType()),
        StructField("dmid", LongType()),
        StructField("progress_ms", IntegerType()),
        StructField("mode", IntegerType()),
        StructField("fontsize", IntegerType()),
        StructField("color", LongType()),
        StructField("uid", StringType()),
        StructField("text", StringType()),
        StructField("ctime", LongType()),
        StructField("weight", IntegerType()),
        StructField("pool", IntegerType()),
    ]
)


def decode_danmaku_segments(
    segments: DataFrame, *, key_col: str, payload_col: str
) -> DataFrame:
    """(key, binary payload) rows → one row per ``DanmakuElem``
    (:data:`DANMAKU_ELEM_SCHEMA`).

    Arrow-batched ``mapInPandas`` flat map: zero shuffle, and the
    decode runs where the bytes already live — at 100 TB of crawled
    segments this is a pure map stage whose parallelism is the file
    split count. NULL payloads yield no rows (the reference's
    parse-failure path: the raw bin is retried later, not
    half-ingested); corrupt payloads raise — fail loud, never silently
    drop data that LOOKED like protobuf."""
    import pandas as pd

    cols = segments.select(
        F.col(key_col).cast("string").alias("seg_key"),
        F.col(payload_col).alias("_payload"),
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            rows = []
            for key, payload in zip(batch["seg_key"], batch["_payload"]):
                if payload is None:
                    continue
                for elem in parse_dm_seg(bytes(payload)):
                    rows.append({"seg_key": key, **elem})
            yield pd.DataFrame(
                rows, columns=[f.name for f in DANMAKU_ELEM_SCHEMA.fields]
            )

    return cols.mapInPandas(fn, DANMAKU_ELEM_SCHEMA)


def read_danmaku_bin_dir(spark: SparkSession, path: str) -> DataFrame:
    """The crawler's ``.bin`` fallback dir → (seg_key, payload) via the
    ``binaryFile`` source (S5-compatible: any Hadoop filesystem URI).
    ``seg_key`` is the file path — the same provenance the CSV rows get
    from S4's filename column."""
    return spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("seg_key"), F.col("content").alias("payload")
    )


def reference_row_columns() -> list[Column]:
    """THE reference CSV row mapping (``spider_worker.py:38-46``), in
    one place: batch :func:`danmaku_table` and the streaming ingest
    (streaming/danmaku_stream.py) both project through this list, so
    an edit to the mapping (rounding, timezone, a new column) cannot
    silently break their pinned batch ≡ stream parity (r12 review)."""
    return [
        F.col("dmid").cast("string").alias("dmid"),
        (F.col("progress_ms").cast("double") / F.lit(1000.0)).alias(
            "video_time"
        ),
        F.col("text"),
        F.from_unixtime("ctime", "yyyy-MM-dd HH:mm:ss").alias("send_date"),
        F.col("uid"),
        F.lit("api").alias("source"),
    ]


def danmaku_table(elems: DataFrame) -> DataFrame:
    """Decoded elems → the reference's CSV row shape
    (``spider_worker.py:38-46``): dmid (string), video_time (seconds,
    3dp — their ``round(progress/1000.0, 3)``; exact here because ms/1000
    at 3dp never half-rounds), text, send_date
    ('%Y-%m-%d %H:%M:%S' of ctime), uid, source='api'; deduplicated by
    dmid (their ``seen_ids`` set — distributed: group, keep min ctime
    then min seg_key for determinism instead of arrival order)."""
    ranked = elems.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("dmid").orderBy(
                F.asc("ctime"), F.asc("seg_key"), F.asc("progress_ms")
            )
        ),
    ).filter(F.col("_rk") == 1)
    return ranked.select(*reference_row_columns())
