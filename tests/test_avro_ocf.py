"""Avro binary-encoding golden bytes + container round-trips.

The golden values are worked examples from the public Avro spec
("Binary Encoding" section) — they pin the writer to the real wire format
so the self-consistent writer/reader pair cannot drift into a dialect.
"""

from __future__ import annotations

import io
import zlib

import pytest

from triangle_counting_spark.sources.avro_ocf import (
    MAGIC,
    read_long,
    read_ocf,
    read_value,
    write_long,
    write_ocf,
    write_value,
)


def enc_long(n: int) -> bytes:
    b = io.BytesIO()
    write_long(b, n)
    return b.getvalue()


@pytest.mark.parametrize(
    ("n", "expect"),
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),  # spec's own worked example
        (-65, b"\x81\x01"),
        (2**31 - 1, b"\xfe\xff\xff\xff\x0f"),
        (-(2**63), b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
        (2**63 - 1, b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    ],
)
def test_zigzag_varint_golden(n, expect):
    assert enc_long(n) == expect
    assert read_long(io.BytesIO(expect)) == n


def test_string_golden():
    # spec: "foo" encodes as 06 66 6f 6f
    b = io.BytesIO()
    write_value(b, "string", "foo")
    assert b.getvalue() == b"\x06foo"


def test_array_golden():
    # spec: array<long> [3, 27] encodes as 04 06 36 00
    b = io.BytesIO()
    write_value(b, {"type": "array", "items": "long"}, [3, 27])
    assert b.getvalue() == b"\x04\x06\x36\x00"


def test_union_golden():
    # spec: union ["null","string"] null → 00 ; "a" → 02 02 61
    b = io.BytesIO()
    write_value(b, ["null", "string"], None)
    assert b.getvalue() == b"\x00"
    b = io.BytesIO()
    write_value(b, ["null", "string"], "a")
    assert b.getvalue() == b"\x02\x02a"


RECORD = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"], "default": None},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
        {"name": "kv", "type": {"type": "map", "values": "string"}},
        {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 4}},
    ],
}

ROWS = [
    {
        "s": "héllo",
        "n": None,
        "d": 2.5,
        "flag": True,
        "raw": b"\x00\x01",
        "xs": [1, -2, 3],
        "kv": {"a": "x", "b": "y"},
        "fx": b"abcd",
    },
    {
        "s": "",
        "n": -(2**40),
        "d": -0.5,
        "flag": False,
        "raw": b"",
        "xs": [],
        "kv": {},
        "fx": b"\xff\xfe\xfd\xfc",
    },
]


def test_value_roundtrip_all_types():
    b = io.BytesIO()
    for r in ROWS:
        write_value(b, RECORD, r)
    b.seek(0)
    assert [read_value(b, RECORD) for _ in ROWS] == ROWS


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t-{codec}.avro")
    write_ocf(p, RECORD, ROWS * 7, codec=codec, block_records=5)  # multi-block
    schema, got = read_ocf(p)
    assert schema["name"] == "t"
    assert got == ROWS * 7
    with open(p, "rb") as f:
        assert f.read(4) == MAGIC


def test_container_deflate_is_raw_rfc1951(tmp_path):
    """The payload must be raw deflate (no zlib wrapper) per the spec —
    inflate it independently with wbits=-15 at the first block boundary."""
    p = str(tmp_path / "t.avro")
    write_ocf(p, {"type": "record", "name": "one", "fields": [{"name": "x", "type": "long"}]},
              [{"x": 7}], codec="deflate")
    with open(p, "rb") as f:
        data = f.read()
    # find the sync marker (bytes 16 after header map end) by re-reading header
    buf = io.BytesIO(data)
    buf.read(4)
    read_value(buf, {"type": "map", "values": "bytes"})
    buf.read(16)
    assert read_long(buf) == 1  # record count
    payload_len = read_long(buf)
    payload = buf.read(payload_len)
    assert zlib.decompress(payload, wbits=-15) == b"\x0e"  # long 7 zigzagged


def test_sync_marker_corruption_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, {"type": "record", "name": "one", "fields": [{"name": "x", "type": "long"}]},
              [{"x": 1}], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(p)
