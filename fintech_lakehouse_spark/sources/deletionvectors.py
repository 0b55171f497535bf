"""Delta Lake DELETION VECTOR decode — pure Python, read side.

Closes the last protocol gap the r8 offline Delta bridge refused
(VERDICT r8 "Missing surface" #1): a modern Delta table whose add
actions carry ``deletionVector`` descriptors (rows deleted without
rewriting the data file — DELETE/UPDATE/MERGE on Databricks and
delta-spark 3.x write these by default) previously failed CLOSED at
the protocol guard. This module decodes the public formats
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + the RoaringBitmap format spec at
https://github.com/RoaringBitmap/RoaringFormatSpec):

* descriptor resolution — inline (``storageType="i"``, Base85 payload),
  relative-file (``"u"``, Base85 UUID with optional prefix),
  absolute-file (``"p"``); Base85 uses the Z85 alphabet
  (https://rfc.zeromq.org/spec/32 — the character set delta-spark's
  ``Base85Codec`` implements; NOT Python's RFC 1924 ``base64.b85``),
  with zero-padding to 4-byte blocks truncated by ``sizeInBytes``,
* the DV FILE layout — format-version byte, then per-DV
  ``[int32 BE dataSize][bitmap bytes][int32 BE CRC-32 of the bitmap]``
  at the descriptor's byte ``offset``,
* the bitmap payload — "RoaringBitmapArray portable" serialization:
  LE int32 magic ``1681511377``, LE int64 bitmap count, then per
  bitmap a LE int32 high-32 key + a STANDARD 32-bit RoaringBitmap
  (array / bitmap / run containers, both cookie forms).

The decoded value set is the 64-bit ROW INDEXES (within the data
file) of deleted rows; ``read_delta_table`` anti-joins them against
the scan's ``_metadata.row_index`` column (the engine-side row index
Spark exposes on parquet scans precisely for DV semantics).

Scale note: decode is driver-side and linear in DV bytes — the same
contract as Delta's own driver, which ships decoded DVs to executors
as broadcast filters. Row-index removal is a broadcast anti-join keyed
(file, row_index); at 100 TB with multi-million-row DVs, materialize
the decoded indexes to a table and let the join shuffle instead.
"""

from __future__ import annotations

import os
import struct
import uuid
import zlib

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85)}


def z85_decode(s: str) -> bytes:
    """Z85 decode (4-byte blocks; input length must be a multiple of
    5). The DV consumer truncates the zero-padding via sizeInBytes."""
    if len(s) % 5:
        raise ValueError(f"z85: length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for ch in s[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"z85: invalid character {ch!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Z85 encode with zero-padding to 4-byte alignment (the
    Base85Codec convention — callers record the TRUE length in
    sizeInBytes)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85[r])
        out.extend(reversed(chunk))
    return "".join(out)


MAGIC = 1681511377  # RoaringBitmapArray portable magic (LE int32)
_SERIAL_COOKIE = 12347  # with run containers
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4


def _read_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one STANDARD 32-bit RoaringBitmap at ``buf[pos:]``;
    return (sorted values, next position). Implements both cookie
    forms and all three container kinds per the RoaringFormatSpec."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        k, c1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c1 + 1)
    if has_offsets:
        pos += 4 * n  # container byte offsets — sequential read skips them
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        is_run = bool(run_flags[i // 8] & (1 << (i % 8))) if run_flags else False
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base | (wi << 6) | low.bit_length() - 1)
                    w ^= low
    return values, pos


def decode_roaring_bitmap_array(data: bytes) -> list[int]:
    """Sorted 64-bit values from a 'RoaringBitmapArray portable'
    buffer — the DV bitmap payload. Value = (high32 key << 32) | v32."""
    if len(data) < 12:
        raise ValueError("deletion vector bitmap truncated")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(
            f"deletion vector bitmap: bad magic {magic} (want {MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _read_roaring32(data, pos)
        out.extend((key << 32) | v for v in vals)
    return sorted(out)


def encode_roaring_bitmap_array(values) -> bytes:
    """Encode sorted 64-bit row indexes as a 'RoaringBitmapArray
    portable' buffer — the WRITE half (r10, VERDICT r9 item 2): array
    containers to cardinality 4096, bitmap containers above, the
    no-run cookie with container offsets (spec-legal; run detection is
    an optimization the reader doesn't require). Round-trips through
    :func:`decode_roaring_bitmap_array` bit-exactly for the shapes we
    emit."""
    from collections import defaultdict

    by_key: dict = defaultdict(lambda: defaultdict(list))
    last = None
    for v in sorted(values):
        if v == last:
            continue
        if v < 0:
            raise ValueError(f"row index {v} is negative")
        last = v
        by_key[v >> 32][(v & 0xFFFFFFFF) >> 16].append(v & 0xFFFF)
    out = struct.pack("<i", MAGIC) + struct.pack("<q", len(by_key))
    for key in sorted(by_key):
        containers = by_key[key]
        out += struct.pack("<i", key)
        out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
        out += struct.pack("<I", len(containers))
        for hk in sorted(containers):
            out += struct.pack("<HH", hk, len(containers[hk]) - 1)
        # RoaringFormatSpec: offsets are from the START of the 32-bit
        # bitmap stream (the cookie), not the containers section —
        # base covers cookie + size + descriptive + offset headers
        # (ADVICE r10: offset-honoring readers like
        # ImmutableRoaringBitmap misread containers-relative values).
        pos = 4 + 4 + 8 * len(containers)
        for hk in sorted(containers):
            n = len(containers[hk])
            out += struct.pack("<I", pos)
            pos += 2 * n if n <= 4096 else 8192
        for hk in sorted(containers):
            vals = containers[hk]
            if len(vals) <= 4096:
                out += struct.pack(f"<{len(vals)}H", *vals)
            else:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                out += struct.pack("<1024Q", *words)
    return bytes(out)


def write_deletion_vector_file(
    table_path: str, bitmaps: list[bytes]
) -> tuple[str, list[int]]:
    """Write ONE on-disk DV file carrying ``bitmaps`` (one per data
    file, the multi-DV packing delta-spark uses) in the protocol
    layout — format-version byte 1, then per DV ``[int32 BE size]
    [bitmap][int32 BE CRC-32]``. Returns the descriptor
    ``pathOrInlineDv`` payload (Z85 of the random file UUID, no
    prefix) and the byte offset of each DV."""
    u = uuid.uuid4()
    blob = bytearray(b"\x01")
    offsets: list[int] = []
    for b in bitmaps:
        offsets.append(len(blob))
        blob += struct.pack(">i", len(b))
        blob += b
        blob += struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF)
    name = f"deletion_vector_{u}.bin"
    tmp = os.path.join(table_path, name + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, os.path.join(table_path, name))
    return z85_encode(u.bytes), offsets


def make_dv_descriptor(
    table_path: str, row_indexes, inline_max_bytes: int = 1024
) -> dict:
    """Build an add-action ``deletionVector`` descriptor for
    ``row_indexes``: INLINE (storageType "i") when the encoded bitmap
    is small, else an on-disk DV file (storageType "u"). The returned
    descriptor decodes back through :func:`decode_deletion_vector`."""
    rows = sorted(set(row_indexes))
    bitmap = encode_roaring_bitmap_array(rows)
    if len(bitmap) <= inline_max_bytes:
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(bitmap),
            "offset": None,
            "sizeInBytes": len(bitmap),
            "cardinality": len(rows),
        }
    payload, offsets = write_deletion_vector_file(table_path, [bitmap])
    return {
        "storageType": "u",
        "pathOrInlineDv": payload,
        "offset": offsets[0],
        "sizeInBytes": len(bitmap),
        "cardinality": len(rows),
    }


def _dv_file_path(table_path: str, dv: dict) -> str:
    """Resolve a 'u'/'p' descriptor to the DV file's local path."""
    st = dv["storageType"]
    if st == "p":
        p = dv["pathOrInlineDv"]
        return p[7:] if p.startswith("file://") else p
    raw = dv["pathOrInlineDv"]
    # 'u': <optional random prefix><20-char Base85 of the 16-byte UUID>
    prefix, enc = raw[:-20], raw[-20:]
    u = uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def decode_deletion_vector(table_path: str, dv: dict) -> list[int]:
    """Deleted ROW INDEXES for one add-action descriptor. Fails CLOSED
    (raises) on any structural mismatch — version, size, checksum,
    cardinality — because silently under-deleting returns deleted
    rows."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        size = int(dv["sizeInBytes"])
        if not len(data) - 4 < size <= len(data):
            raise ValueError(
                "inline deletion vector: sizeInBytes mismatch "
                f"({len(data)} decoded vs {size} declared)"
            )
        data = data[:size]  # strip the z85 block padding
    elif st in ("u", "p"):
        path = _dv_file_path(table_path, dv)
        with open(path, "rb") as fh:
            blob = fh.read()
        if not blob or blob[0] != 1:
            raise ValueError(
                f"deletion vector file {path}: unsupported format version "
                f"{blob[0] if blob else 'EMPTY'}"
            )
        off = int(dv["offset"])
        (size,) = struct.unpack_from(">i", blob, off)
        if size != int(dv["sizeInBytes"]):
            raise ValueError(
                f"deletion vector file {path}: dataSize {size} != "
                f"descriptor sizeInBytes {dv['sizeInBytes']}"
            )
        data = blob[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"deletion vector file {path}: CRC mismatch")
    else:
        raise NotImplementedError(
            f"deletion vector storageType {st!r} unsupported"
        )
    rows = decode_roaring_bitmap_array(data)
    if len(rows) != int(dv["cardinality"]):
        raise ValueError(
            "deletion vector cardinality mismatch: decoded "
            f"{len(rows)}, descriptor says {dv['cardinality']}"
        )
    return rows
