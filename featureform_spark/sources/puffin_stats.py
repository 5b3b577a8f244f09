"""Apache Iceberg Puffin statistics files: table-level NDV sketches.

The Iceberg spec's table-metadata ``statistics`` field points at Puffin
files holding per-column distinct-value sketches (blob type
``apache-datasketches-theta-v1``) that engines read for CBO cardinality
estimates (join ordering, broadcast-side selection). The reference
delegates statistics to its warehouse providers; here the format itself
is implemented so any Iceberg reader can consume the files:

* **Puffin container** — the published file layout
  (iceberg.apache.org/puffin-spec): ``Magic``, blobs, then a footer of
  ``Magic | FooterPayload (UTF-8 JSON FileMetadata) | PayloadSize
  (int32 LE) | Flags (4 bytes) | Magic``.
* **Compact theta sketch** — the Apache DataSketches serialized form
  (datasketches.apache.org, theta sketch family): 8-byte preamble
  (preamble-longs, serial-version 3, family COMPACT=3, flags, seed
  hash), retained-entry count, optional theta long, then the ordered
  retained 64-bit hashes. Values hash with MurmurHash3 x64-128 under
  the default seed 9001; the retained key is ``h1 >>> 1`` (zero
  excluded). String values hash their UTF-8 bytes (the
  datasketches-cpp/-python convention; datasketches-java hashes UTF-16
  char arrays — a documented cross-language incompatibility, and the
  C++/Python side is what Spark/Trino native readers use).

Sketch behavior: exact below the nominal capacity ``k = 2**lg_k``
(theta stays 1.0, the retained set IS the distinct set), KMV-style
beyond it (theta drops to the evicted k+1-th smallest hash; the
standard theta estimate ``retained / (theta / 2**63)`` applies). Unions
are loss-free merges of retained sets under ``min(theta)`` — which is
what makes the one-pass distributed build in
``IcebergProtocolTable.analyze_table`` correct: each partition emits a
fixed-size serialized sketch and the driver folds them, so sketch
bytes, never values, cross the wire.
"""

from __future__ import annotations

import heapq
import json
import struct
from typing import Any, Iterable

DEFAULT_SEED = 9001  # DataSketches DEFAULT_UPDATE_SEED
MAX_THETA = (1 << 63) - 1  # Long.MAX_VALUE == "theta = 1.0"
_M64 = (1 << 64) - 1

PUFFIN_MAGIC = b"PFA1"
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"


# --------------------------------------------------------------- hashing


def murmur3_x64_128(key: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (Austin Appleby's public-domain
    algorithm, the variant DataSketches builds on). Returns (h1, h2)
    as unsigned 64-bit ints."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = seed & _M64
    h2 = seed & _M64
    ln = len(key)
    nblocks = ln // 16

    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(key[o : o + 8], "little")
        k2 = int.from_bytes(key[o + 8 : o + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = ((k1 << 31) | (k1 >> 33)) & _M64
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = ((h1 << 27) | (h1 >> 37)) & _M64
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = ((k2 << 33) | (k2 >> 31)) & _M64
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = ((h2 << 31) | (h2 >> 33)) & _M64
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = key[nblocks * 16 :]
    k1 = 0
    k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M64
        k2 = ((k2 << 33) | (k2 >> 31)) & _M64
        k2 = (k2 * c1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _M64
        k1 = ((k1 << 31) | (k1 >> 33)) & _M64
        k1 = (k1 * c2) & _M64
        h1 ^= k1

    h1 ^= ln
    h2 ^= ln
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64

    def _fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _M64
        k ^= k >> 33
        return k

    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def compute_seed_hash(seed: int) -> int:
    """DataSketches seed hash: low 16 bits of murmur3(seed as 8-byte
    LE long, seed=0). Written into every serialized sketch so readers
    reject unions across mismatched seeds."""
    h1, _ = murmur3_x64_128(struct.pack("<q", seed), 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to the reserved 0 seed-hash")
    return sh


def _canonical_bytes(value: Any) -> bytes | None:
    """Injective value→bytes encoding fed to the hash. Longs are 8-byte
    LE (the datasketches update(int64) convention), doubles their
    canonicalized IEEE bits (-0.0 folded to +0.0, one NaN pattern),
    strings/bytes their UTF-8/raw bytes. Temporal and decimal values
    take their ISO/string form — any injective encoding yields the same
    NDV; the choice is recorded in the blob properties as
    ``value-encoding``. None (SQL NULL) is excluded, matching
    COUNT(DISTINCT col)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return struct.pack("<q", int(value))
    if isinstance(value, bytes):
        return value
    if isinstance(value, bytearray):
        return bytes(value)
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, int):
        if -(1 << 63) <= value < (1 << 63):
            return struct.pack("<q", value)
        return str(value).encode("utf-8")
    if isinstance(value, float):
        if value != value:  # NaN: one canonical bit pattern
            return struct.pack("<Q", 0x7FF8000000000000)
        if value == 0.0:
            value = 0.0  # folds -0.0
        return struct.pack("<d", value)
    # numpy scalars (pandas paths) without importing numpy eagerly
    t = type(value).__module__
    if t == "numpy":
        import numpy as np

        if isinstance(value, np.bool_):
            return struct.pack("<q", int(value))
        if isinstance(value, np.integer):
            return struct.pack("<q", int(value))
        if isinstance(value, np.floating):
            return _canonical_bytes(float(value))
        if isinstance(value, np.str_):
            return str(value).encode("utf-8")
        if isinstance(value, np.bytes_):
            return bytes(value)
    # datetime/date/Decimal/anything with a stable str form
    return str(value).encode("utf-8")


# ---------------------------------------------------------------- sketch


class ThetaSketch:
    """KMV-flavored theta sketch, exact below ``k``: retains the up-to-k
    smallest distinct value hashes; past capacity the k+1-th smallest
    becomes theta (the exclusive retention threshold). Serializes to
    the DataSketches compact-ordered layout so the blob is readable
    outside this repo."""

    __slots__ = ("k", "lg_k", "seed", "theta", "_set", "_neg")

    def __init__(self, lg_k: int = 12, seed: int = DEFAULT_SEED):
        if not 4 <= lg_k <= 26:
            raise ValueError(f"lg_k {lg_k} out of range [4, 26]")
        self.lg_k = lg_k
        self.k = 1 << lg_k
        self.seed = seed
        self.theta = MAX_THETA
        self._set: set[int] = set()
        self._neg: list[int] = []  # max-heap over retained (negated)

    # -- updates

    def _update_hash(self, h: int) -> None:
        if h <= 0 or h >= self.theta or h in self._set:
            return
        self._set.add(h)
        heapq.heappush(self._neg, -h)
        if len(self._set) > self.k:
            worst = -heapq.heappop(self._neg)
            self._set.discard(worst)
            self.theta = worst

    def update(self, value: Any) -> None:
        data = _canonical_bytes(value)
        if data is None:
            return
        h1, _ = murmur3_x64_128(data, self.seed)
        self._update_hash(h1 >> 1)

    def update_all(self, values: Iterable[Any]) -> None:
        for v in values:
            self.update(v)

    def union(self, other: "ThetaSketch") -> None:
        """Loss-free in-place union (both sketches must share a seed).
        The result is the same sketch a single pass over both inputs
        would build, which is what makes per-partition partials
        mergeable."""
        if other.seed != self.seed:
            raise ValueError("cannot union sketches with different seeds")
        if other.theta < self.theta:
            self.theta = other.theta
            self._set = {h for h in self._set if h < self.theta}
            self._neg = [-h for h in self._set]
            heapq.heapify(self._neg)
        for h in other._set:
            self._update_hash(h)

    # -- reads

    @property
    def retained(self) -> int:
        return len(self._set)

    def is_exact(self) -> bool:
        return self.theta >= MAX_THETA

    def estimate(self) -> float:
        if self.is_exact():
            return float(len(self._set))
        return len(self._set) * float(1 << 63) / self.theta

    # -- serialization (DataSketches compact layout)

    _FLAG_READONLY = 1 << 1
    _FLAG_EMPTY = 1 << 2
    _FLAG_COMPACT = 1 << 3
    _FLAG_ORDERED = 1 << 4

    def serialize(self) -> bytes:
        seed_hash = compute_seed_hash(self.seed)
        base = self._FLAG_READONLY | self._FLAG_COMPACT | self._FLAG_ORDERED
        # byte 3 carries lgNomLongs so deserialize/union recover the
        # build-time k (a fresh reader must not silently degrade an
        # exact lg_k=14 sketch down to a smaller default)
        if not self._set:
            return struct.pack(
                "<BBBBBBH",
                1, 3, 3, self.lg_k, 0, base | self._FLAG_EMPTY, seed_hash,
            )
        entries = sorted(self._set)
        if self.is_exact():
            head = struct.pack(
                "<BBBBBBHIi",
                2, 3, 3, self.lg_k, 0, base, seed_hash, len(entries), 0,
            )
        else:
            head = struct.pack(
                "<BBBBBBHIiq",
                3, 3, 3, self.lg_k, 0, base, seed_hash,
                len(entries), 0, self.theta,
            )
        return head + struct.pack(f"<{len(entries)}q", *entries)

    @classmethod
    def deserialize(
        cls, data: bytes, lg_k: int | None = None, seed: int = DEFAULT_SEED
    ) -> "ThetaSketch":
        """``lg_k`` overrides the blob's recorded lgNomLongs; when the
        blob carries 0 there (compact sketches from writers that drop
        it) the fallback is 12."""
        if len(data) < 8:
            raise ValueError("theta sketch blob shorter than the preamble")
        pre, ser, family, lg_nom, _, flags, seed_hash = struct.unpack(
            "<BBBBBBH", data[:8]
        )
        if ser != 3:
            raise ValueError(f"unsupported theta serial version {ser}")
        if family != 3:
            raise ValueError(f"not a COMPACT theta sketch (family {family})")
        if seed_hash != compute_seed_hash(seed):
            raise ValueError(
                "seed hash mismatch: sketch was built under a different seed"
            )
        eff_lg_k = lg_k if lg_k is not None else (
            lg_nom if 4 <= lg_nom <= 26 else 12
        )
        sk = cls(lg_k=eff_lg_k, seed=seed)
        if flags & cls._FLAG_EMPTY:
            return sk
        if pre == 1:
            # DataSketches single-item compact form: preLongs=1, EMPTY
            # clear, one retained hash at bytes 8-16
            if len(data) < 16:
                return sk
            (h,) = struct.unpack("<q", data[8:16])
            sk._set = {h}
            sk._neg = [-h]
            return sk
        (count,) = struct.unpack("<I", data[8:12])
        off = 16
        if pre >= 3:
            (sk.theta,) = struct.unpack("<q", data[16:24])
            off = 24
        entries = struct.unpack(f"<{count}q", data[off : off + 8 * count])
        sk._set = set(entries)
        sk._neg = [-h for h in entries]
        heapq.heapify(sk._neg)
        return sk


# ----------------------------------------------------------- puffin file


def composite_bytes(values: tuple) -> bytes | None:
    """Injective encoding of a VALUE TUPLE for composite-key NDV
    sketches: each component's canonical bytes, length-prefixed (a
    plain join would make ("ab","c") collide with ("a","bc")).
    Returns None when any component is NULL — matching SQL's
    multi-argument COUNT(DISTINCT a, b), which skips such rows."""
    parts = []
    for v in values:
        b = _canonical_bytes(v)
        if b is None:
            return None
        parts.append(len(b).to_bytes(4, "little") + b)
    return b"".join(parts)


def estimate_intersection(a: ThetaSketch, b: ThetaSketch) -> float:
    """Inclusion-exclusion over theta sketches: |A∩B| ≈ |A| + |B| −
    |A∪B|. Exact when both sketches are exact; otherwise inherits the
    union's error (clamped at 0). The planner input for "how many join
    keys actually match" across two analyzed tables."""
    u = ThetaSketch(lg_k=min(a.lg_k, b.lg_k), seed=a.seed)
    u.union(a)
    u.union(b)
    return max(0.0, a.estimate() + b.estimate() - u.estimate())


def write_puffin(
    path: str,
    blobs: list[dict],
    properties: dict[str, str] | None = None,
) -> tuple[list[dict], int]:
    """Write a Puffin file. Each blob dict carries ``type``, ``fields``
    (source field ids), ``snapshot-id``, ``sequence-number``,
    optional ``properties``, and ``data`` (bytes). Returns the
    BlobMetadata list (offsets/lengths filled in, ready to copy into
    the table metadata's statistics entry) and the footer size in
    bytes — the two things the ``statistics`` field records so planners
    can use blob metadata without opening the file."""
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(PUFFIN_MAGIC)
        for b in blobs:
            data = b["data"]
            m = {
                "type": b["type"],
                "fields": list(b["fields"]),
                "snapshot-id": int(b["snapshot-id"]),
                "sequence-number": int(b["sequence-number"]),
                "offset": fh.tell(),
                "length": len(data),
            }
            if b.get("properties"):
                m["properties"] = dict(b["properties"])
            fh.write(data)
            metas.append(m)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})},
            sort_keys=True,
        ).encode("utf-8")
        fh.write(PUFFIN_MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(struct.pack("<i", 0))  # flags: uncompressed footer
        fh.write(PUFFIN_MAGIC)
    footer_size = 4 + len(payload) + 4 + 4 + 4
    return metas, footer_size


def read_puffin(path: str) -> tuple[dict, list[tuple[dict, bytes]]]:
    """Read a Puffin file: (FileMetadata JSON, [(BlobMetadata, raw
    blob bytes)])."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != PUFFIN_MAGIC or data[-4:] != PUFFIN_MAGIC:
        raise ValueError(f"not a puffin file: {path}")
    flags = struct.unpack("<I", data[-8:-4])[0]
    if flags & 1:
        raise ValueError(
            "compressed puffin footer payloads are not supported"
        )
    (size,) = struct.unpack("<i", data[-12:-8])
    payload_start = len(data) - 12 - size
    if data[payload_start - 4 : payload_start] != PUFFIN_MAGIC:
        raise ValueError(f"corrupt puffin footer in {path}")
    meta = json.loads(data[payload_start : payload_start + size])
    out = []
    for m in meta.get("blobs", []):
        off, ln = int(m["offset"]), int(m["length"])
        if off < 4 or off + ln > payload_start - 4:
            raise ValueError(f"blob range out of bounds in {path}")
        out.append((m, data[off : off + ln]))
    return meta, out
