"""Minimal Apache Avro object-container-file codec, pure Python.

Iceberg's table metadata layer is JSON, but its manifest lists and
manifests are Avro container files (Apache Avro 1.11 spec + Apache
Iceberg spec §Manifests). No Avro library ships in this container, so
this module implements exactly the subset the Iceberg metadata path
needs, both directions:

- container framing: `Obj\\x01` magic, file-metadata map carrying
  ``avro.schema`` (JSON) + ``avro.codec``, 16-byte sync marker,
  blocks of (count, byte-length, payload, sync);
- codecs: ``null`` and ``deflate`` (raw zlib);
- types: null, boolean, int/long (zigzag varints), float, double,
  bytes, string, fixed, enum, array, map, union, record — decoded
  against the *writer schema embedded in the file*, which is how Avro
  defines reads, so files written by real Iceberg/avro libraries
  decode here and vice versa.

Everything is metadata-scale (manifest files are KBs-to-MBs); the data
plane stays native Spark parquet scans.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


class AvroError(Exception):
    pass


# ---------------------------------------------------------------- decode


_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class _Reader:
    def __init__(self, buf: bytes, names: dict[str, Any] | None = None):
        self.buf = buf
        self.pos = 0
        # named-type registry: real Iceberg manifests reference partition
        # record types by name (e.g. "r102") after first definition
        self.names: dict[str, Any] = names if names is not None else {}

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("unexpected EOF")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def zigzag(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def decode(self, schema: Any) -> Any:
        if isinstance(schema, str):
            if schema not in _PRIMITIVES and schema in self.names:
                return self.decode(self.names[schema])
            t = schema
        elif isinstance(schema, list):  # union: branch index prefix
            return self.decode(schema[self.zigzag()])
        else:
            if schema.get("name") and schema["type"] in (
                "record", "fixed", "enum"
            ):
                self.names.setdefault(schema["name"], schema)
            t = schema["type"]

        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.zigzag()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.zigzag())
        if t == "string":
            return self.read(self.zigzag()).decode("utf-8")
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.zigzag()]
        if t == "array":
            out = []
            while True:
                n = self.zigzag()
                if n == 0:
                    break
                if n < 0:  # negative count: byte size follows
                    self.zigzag()
                    n = -n
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.zigzag()
                if n == 0:
                    break
                if n < 0:
                    self.zigzag()
                    n = -n
                for _ in range(n):
                    k = self.read(self.zigzag()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
            return out
        if t == "record":
            return {
                f["name"]: self.decode(f["type"]) for f in schema["fields"]
            }
        # named-type reference or nested {"type": {...}} wrapper
        if isinstance(schema, dict) and isinstance(schema["type"], (dict, list)):
            return self.decode(schema["type"])
        raise AvroError(f"unsupported avro type: {t!r}")


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroError(f"not an avro container file: {path}")
    meta = r.decode({"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        count = r.zigzag()
        size = r.zigzag()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise AvroError(f"unsupported avro codec: {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(br.decode(schema))
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


# ---------------------------------------------------------------- encode


class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()
        self.names: dict[str, Any] = {}

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def zigzag(self, n: int) -> None:
        n = (n << 1) ^ (n >> 63)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                break

    def encode(self, schema: Any, val: Any) -> None:
        if isinstance(schema, str):
            if schema not in _PRIMITIVES and schema in self.names:
                return self.encode(self.names[schema], val)
            t = schema
        elif isinstance(schema, list):  # union: pick the matching branch
            idx = _union_branch(schema, val)
            self.zigzag(idx)
            return self.encode(schema[idx], val)
        else:
            if schema.get("name") and schema["type"] in (
                "record", "fixed", "enum"
            ):
                self.names.setdefault(schema["name"], schema)
            t = schema["type"]

        if t == "null":
            return
        if t == "boolean":
            return self.write(b"\x01" if val else b"\x00")
        if t in ("int", "long"):
            return self.zigzag(int(val))
        if t == "float":
            return self.write(struct.pack("<f", float(val)))
        if t == "double":
            return self.write(struct.pack("<d", float(val)))
        if t == "bytes":
            self.zigzag(len(val))
            return self.write(bytes(val))
        if t == "string":
            raw = val.encode("utf-8")
            self.zigzag(len(raw))
            return self.write(raw)
        if t == "fixed":
            if len(val) != schema["size"]:
                raise AvroError("fixed size mismatch")
            return self.write(bytes(val))
        if t == "enum":
            return self.zigzag(schema["symbols"].index(val))
        if t == "array":
            if val:
                self.zigzag(len(val))
                for item in val:
                    self.encode(schema["items"], item)
            return self.zigzag(0)
        if t == "map":
            if val:
                self.zigzag(len(val))
                for k, v in val.items():
                    self.encode("string", k)
                    self.encode(schema["values"], v)
            return self.zigzag(0)
        if t == "record":
            for f in schema["fields"]:
                self.encode(f["type"], val.get(f["name"]))
            return
        if isinstance(schema, dict) and isinstance(schema["type"], (dict, list)):
            return self.encode(schema["type"], val)
        raise AvroError(f"unsupported avro type: {t!r}")


def _union_branch(union: list, val: Any) -> int:
    """Pick the union branch for a Python value (null/record-or-scalar
    unions — the only shapes Iceberg manifests use)."""
    for i, branch in enumerate(union):
        bt = branch if isinstance(branch, str) else branch.get("type")
        if val is None and bt == "null":
            return i
        if val is not None and bt != "null":
            return i
    raise AvroError(f"no union branch for {type(val)} in {union}")


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    metadata: dict[str, str] | None = None,
) -> None:
    """Write an Avro object container file readable by any Avro
    implementation (and by read_container). ``metadata`` adds extra
    file-metadata entries (Iceberg manifests carry their table schema
    and partition spec this way)."""
    w = _Writer()
    w.write(MAGIC)
    file_meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    for k, v in (metadata or {}).items():
        file_meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    w.encode({"type": "map", "values": "bytes"}, file_meta)
    w.write(sync)
    body = _Writer()
    for rec in records:
        body.encode(schema, rec)
    payload = body.out.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise AvroError(f"unsupported avro codec: {codec}")
    if records:
        w.zigzag(len(records))
        w.zigzag(len(payload))
        w.write(payload)
        w.write(sync)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(w.out.getvalue())
