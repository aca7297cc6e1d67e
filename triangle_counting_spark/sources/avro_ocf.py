"""Minimal Apache Avro Object Container File reader/writer (stdlib only).

Iceberg's manifest-list and manifest files are Avro OCF — reading a real
Iceberg table without the JVM runtime means decoding Avro. No avro library
is bundled in this sandbox, so this module implements the subset of the
public Avro 1.11 specification those files need:

- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, array, map, fixed, union (any member count)
- codecs: ``null`` and ``deflate`` (raw zlib, stdlib)
- the container layout: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema`` / ``avro.codec``, 16-byte sync marker, sync-delimited
  data blocks of (count, byte-size, payload).

Values decode to plain Python (records → dict, bytes/fixed → bytes).
Logical types are left raw (Iceberg timestamps stay micros-since-epoch
longs) — callers interpret them.

The binary encoding (zigzag varint longs, length-prefixed strings, block
arrays) is pinned by golden-byte tests against worked examples from the
spec, so the writer/reader pair can't drift into a private dialect.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive binary encoding (Avro spec "Binary Encoding")
# --------------------------------------------------------------------------


def write_long(buf: io.BytesIO, n: int) -> None:
    """Variable-length zigzag (spec: int and long share this encoding)."""
    z = (n << 1) ^ (n >> 63)  # zigzag; Python's arithmetic >> keeps this exact
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BufferedIOBase) -> bytes:
    n = read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# --------------------------------------------------------------------------
# schema-driven value encode/decode
# --------------------------------------------------------------------------


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_value(buf: io.BytesIO, schema: Any, value: Any) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(value)} != {schema['size']}")
        buf.write(bytes(value))
    elif t == "union":
        idx = _union_branch(schema, value)
        write_long(buf, idx)
        write_value(buf, schema[idx], value)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                write_value(buf, f["type"], f["default"])
            else:
                write_value(buf, f["type"], value[f["name"]])
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                write_value(buf, schema["items"], it)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                write_value(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _union_branch(union: list, value: Any) -> int:
    """Pick the union member matching the Python value — null first, then
    by broad kind. Iceberg unions are all ["null", X] so this stays simple."""
    for i, member in enumerate(union):
        if _type_name(member) == "null" and value is None:
            return i
    for i, member in enumerate(union):
        mt = _type_name(member)
        if mt == "null":
            continue
        if mt == "boolean" and isinstance(value, bool):
            return i
        if mt in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if mt in ("float", "double") and isinstance(value, float):
            return i
        if mt == "string" and isinstance(value, str):
            return i
        if mt in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if mt == "record" and isinstance(value, dict):
            return i
        if mt == "array" and isinstance(value, (list, tuple)):
            return i
        if mt == "map" and isinstance(value, dict):
            return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


def read_value(buf: io.BufferedIOBase, schema: Any) -> Any:
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "union":
        return read_value(buf, schema[read_long(buf)])
    if t == "record":
        return {f["name"]: read_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec allows skipping)
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_value(buf, schema["items"]))
    if t == "map":
        out: dict[str, Any] = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_value(buf, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def _sync_marker(seed: bytes) -> bytes:
    """Deterministic 16-byte sync marker (spec only requires randomness
    per-file; deriving it from content keeps fixtures reproducible)."""
    import hashlib

    return hashlib.sha256(b"avro-sync:" + seed).digest()[:16]


def write_ocf(
    path: str,
    schema: dict,
    records: Iterable[dict],
    codec: str = "deflate",
    block_records: int = 1000,
) -> None:
    """Write records as one Avro OCF at ``path``."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = _sync_marker(schema_json.encode() + path.encode())
    out = io.BytesIO()
    out.write(MAGIC)
    write_value(
        out,
        _META_SCHEMA,
        {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()},
    )
    out.write(sync)

    batch: list[dict] = []

    def flush() -> None:
        if not batch:
            return
        payload = io.BytesIO()
        for rec in batch:
            write_value(payload, schema, rec)
        raw = payload.getvalue()
        if codec == "deflate":
            raw = zlib.compress(raw)[2:-4]  # spec: raw deflate, no zlib wrapper
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        write_long(out, len(batch))
        write_bytes(out, raw)
        out.write(sync)
        batch.clear()

    for rec in records:
        batch.append(rec)
        if len(batch) >= block_records:
            flush()
    flush()
    with open(path, "wb") as f:
        f.write(out.getvalue())


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro OCF → (writer schema, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = read_value(buf, _META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        payload = read_bytes(buf)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(read_value(block, schema))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block boundary)")
    return schema, records
