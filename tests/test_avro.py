"""Pure-stdlib Avro OCF codec: spec byte vectors (the encoding is
pinned by the published Avro specification, not by our own decoder),
container framing, nullable unions, both codecs, and property-style
roundtrips.  The Spark-side source/sink path is certified end-to-end
by the registered ``source_avro_roundtrip`` row (tests/test_oracle_parity)."""

from __future__ import annotations

import io
import json
import os
import tempfile
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_server_vector_search_spark.functions import avro_ocf as A


def enc_long(n: int) -> bytes:
    b = io.BytesIO()
    A.write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_spec_vectors():
    """The exact table from the Avro spec's 'Binary Encoding' section."""
    assert enc_long(0) == b"\x00"
    assert enc_long(-1) == b"\x01"
    assert enc_long(1) == b"\x02"
    assert enc_long(-2) == b"\x03"
    assert enc_long(2) == b"\x04"
    assert enc_long(-64) == b"\x7f"
    assert enc_long(64) == b"\x80\x01"


def test_string_encoding_spec_vector():
    """'foo' encodes as length 3 (zigzag 0x06) + utf-8 bytes — the
    spec's worked example."""
    b = io.BytesIO()
    A.write_string(b, "foo")
    assert b.getvalue() == b"\x06foo"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_long_roundtrip_full_range(n):
    assert A.read_long(io.BytesIO(enc_long(n))) == n


def test_header_layout_byte_exact():
    """Magic, metadata map (schema + codec), injectable sync marker —
    parse our own header back field by field."""
    sch = A.schema_json("t", [("a", "bigint", False)])
    sync = bytes(range(16))
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [(1,)], codec="null", sync=sync)
        raw = open(p, "rb").read()
        assert raw[:4] == b"Obj\x01"
        with open(p, "rb") as f:
            schema, codec, got_sync = A.read_header(f)
        assert schema == json.loads(sch)
        assert codec == "null"
        assert got_sync == sync
    finally:
        os.remove(p)


def test_null_codec_block_payload_is_plain_encoding():
    """With codec=null the block payload bytes are exactly the record
    encoding — decodable by hand, which pins the framing arithmetic."""
    sch = A.schema_json("t", [("a", "bigint", False), ("s", "string", False)])
    sync = bytes(range(0xE0, 0xF0))  # distinctive: cannot occur in the header
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [(1, "foo")], codec="null", sync=sync)
        raw = open(p, "rb").read()
        # header ends at the first sync marker; block = count,size,data,sync
        head_end = raw.index(sync) + 16
        body = io.BytesIO(raw[head_end:])
        assert A.read_long(body) == 1  # row count
        size = A.read_long(body)
        payload = body.read(size)
        assert payload == b"\x02\x06foo"  # long 1, string "foo"
    finally:
        os.remove(p)


def test_deflate_payload_is_raw_deflate():
    sch = A.schema_json("t", [("s", "string", False)])
    sync = b"\xff" * 16
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [("hello",)] * 10, codec="deflate", sync=sync)
        raw = open(p, "rb").read()
        head_end = raw.index(sync) + 16
        body = io.BytesIO(raw[head_end:])
        assert A.read_long(body) == 10
        size = A.read_long(body)
        decoded = zlib.decompress(body.read(size), wbits=-15)
        assert decoded == b"\x0ahello" * 10
    finally:
        os.remove(p)


ROW_STRATEGY = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.one_of(st.none(), st.binary(max_size=20)),
)

SCHEMA5 = A.schema_json(
    "t",
    [
        ("a", "bigint", False),
        ("s", "string", True),
        ("d", "double", False),
        ("b", "boolean", False),
        ("x", "binary", True),
    ],
)


@given(st.lists(ROW_STRATEGY, max_size=25), st.sampled_from(["null", "deflate"]))
@settings(max_examples=40, deadline=None)
def test_ocf_roundtrip_property(rows, codec):
    p = tempfile.mktemp(suffix=".avro")
    try:
        n = A.write_ocf(p, SCHEMA5, iter(rows), codec=codec, block_rows=7)
        assert n == len(rows)
        assert list(A.read_ocf(p)) == rows
    finally:
        os.remove(p)


def test_unsupported_type_fails_at_schema_build():
    with pytest.raises(ValueError, match="unsupported column type"):
        A.schema_json("t", [("m", "map<string,int>", False)])


def test_none_in_non_nullable_field_raises():
    sch = A.schema_json("t", [("a", "bigint", False)])
    p = tempfile.mktemp(suffix=".avro")
    try:
        with pytest.raises(ValueError, match="non-nullable"):
            A.write_ocf(p, sch, [(None,)])
    finally:
        if os.path.exists(p):
            os.remove(p)


def test_nested_union_rejected_at_plan():
    with pytest.raises(ValueError, match="unions supported"):
        A._field_plan(
            {
                "type": "record",
                "name": "t",
                "fields": [{"name": "u", "type": ["null", "long", "string"]}],
            }
        )


def test_block_sync_mismatch_detected():
    sch = A.schema_json("t", [("a", "bigint", False)])
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [(i,) for i in range(10)], codec="null", block_rows=4)
        raw = bytearray(open(p, "rb").read())
        raw[-1] ^= 0xFF  # corrupt the final block's sync marker
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="sync mismatch"):
            list(A.read_ocf(p))
    finally:
        os.remove(p)


# ---------------------------------------------------------------------------
# ADVICE r15 fixes: reversed-union decode, mid-varint truncation, and
# boolean truncation must all fail loudly (or decode correctly) instead
# of silently corrupting.
# ---------------------------------------------------------------------------


def test_reversed_null_union_decodes_correctly():
    """A spec-valid OCF whose union is ["long","null"] (null SECOND)
    must decode by the schema's branch order — branch 0 is the value,
    branch 1 is null."""
    sch = json.dumps(
        {
            "type": "record",
            "name": "t",
            "fields": [{"name": "a", "type": ["long", "null"]}],
        }
    )
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [(7,), (None,), (9,)], codec="null")
        assert list(A.read_ocf(p)) == [(7,), (None,), (9,)]
        # wire check: branch indexes follow the schema order (value=0)
        plan = A._field_plan(json.loads(sch))
        assert plan == [("a", "long", 1)]
    finally:
        if os.path.exists(p):
            os.remove(p)


def test_mid_varint_truncation_raises():
    """A file cut mid-way through a block row-count varint must raise,
    not silently yield fewer rows."""
    sch = A.schema_json("t", [("a", "bigint", False)])
    p = tempfile.mktemp(suffix=".avro")
    try:
        A.write_ocf(p, sch, [(i,) for i in range(4)], codec="null", block_rows=4)
        raw = open(p, "rb").read()
        # append a lone continuation byte (varint started, never ends)
        open(p, "wb").write(raw + b"\x80")
        with pytest.raises(A.TruncatedVarint):
            list(A.read_ocf(p))
        # clean EOF (no trailing garbage) still terminates normally
        open(p, "wb").write(raw)
        assert len(list(A.read_ocf(p))) == 4
    finally:
        if os.path.exists(p):
            os.remove(p)


def test_truncated_boolean_raises():
    buf = io.BytesIO(b"")
    with pytest.raises(EOFError, match="boolean"):
        A._decode_value(buf, "boolean")
    with pytest.raises(ValueError, match="boolean"):
        A._decode_value(io.BytesIO(b"\x02"), "boolean")
    assert A._decode_value(io.BytesIO(b"\x01"), "boolean") is True
    assert A._decode_value(io.BytesIO(b"\x00"), "boolean") is False
