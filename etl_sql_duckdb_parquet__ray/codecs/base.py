"""Codec base interface and shared buffer utilities.

A codec operates on the *non-null* values of one column chunk and must
round-trip bit-identically. Null handling is factored out once in
``encode_column`` / ``decode_column``: the validity bitmap is packed and
zstd-compressed as a separate payload section, the codec only ever sees
dense values.

Value representations handed to codecs:

- integer / timestamp columns -> ``np.ndarray`` of int64 (timestamps are
  viewed as their epoch-int64 representation; the Arrow type string in the
  column meta restores the logical type on decode);
- float columns -> ``np.ndarray`` of float64 (bit-preserving via tobytes);
- string / binary columns -> ``StringBlob`` (lengths int64 array + one
  contiguous data ``bytes``), built zero-copy from the Arrow buffers.

Every payload is a flat ``bytes``; multi-part payloads use
``pack_sections`` framing (u32 count, u64 lengths, parts).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, Protocol

import numpy as np
import pyarrow as pa

_ZSTD = pa.Codec("zstd", compression_level=3)
# heavy level for the big string/FSST payload sections: ~10% smaller output
# for ~0.1s per 16 MB — cheap next to the encode kernel, and the decompress
# side is level-agnostic (zstd frames are self-describing)
_ZSTD_HEAVY = pa.Codec("zstd", compression_level=8)
# FSST code/literal sections: round-5 level sweep (BASELINE.md) found the
# knee at level 10 — at the production 64k-row chunk size the section
# shrinks 3.0-3.4% vs level 7 for ~+0.08 s/chunk/core (levels 8-9 buy
# less, 11-12 cost 50% more CPU for <0.2% further). Level 7 had been kept
# from a 7-vs-8-only comparison; zstd's larger btree search params start
# paying off on the ~6 MB code streams from level 9 up. Raw-text sections
# keep level 8 (heavy). Decompression is level-agnostic (frames
# self-describe).
_ZSTD_FSST = pa.Codec("zstd", compression_level=10)


def zstd_compress(data: bytes) -> bytes:
    return _ZSTD.compress(data, asbytes=True)


def zstd_compress_heavy(data: bytes) -> bytes:
    return _ZSTD_HEAVY.compress(data, asbytes=True)


def zstd_compress_fsst(data: bytes) -> bytes:
    return _ZSTD_FSST.compress(data, asbytes=True)


def zstd_decompress(data: bytes, size: int) -> bytes:
    return _ZSTD.decompress(data, size, asbytes=True)


def pack_sections(parts: list[bytes]) -> bytes:
    head = struct.pack("<I", len(parts)) + b"".join(
        struct.pack("<Q", len(p)) for p in parts
    )
    return head + b"".join(parts)


def unpack_sections(data: bytes) -> list[bytes]:
    (n,) = struct.unpack_from("<I", data, 0)
    off = 4 + 8 * n
    lens = struct.unpack_from(f"<{n}Q", data, 4)
    out = []
    for ln in lens:
        out.append(data[off : off + ln])
        off += ln
    return out


@dataclass
class StringBlob:
    """Dense string column values: per-value byte lengths + concatenated data."""

    lengths: np.ndarray  # int64, shape (n,)
    data: bytes

    def __len__(self) -> int:
        return len(self.lengths)

    @property
    def nbytes(self) -> int:
        return len(self.data) + self.lengths.nbytes


def string_array_to_blob(arr: pa.Array) -> StringBlob:
    """Zero-copy-ish extraction of (lengths, data) from a null-free
    string/large_string/binary Arrow array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return StringBlob(np.empty(0, dtype=np.int64), b"")
    buffers = arr.buffers()
    off_width = 8 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else 4
    dt = np.int64 if off_width == 8 else np.int32
    offsets = np.frombuffer(buffers[1], dtype=dt, count=len(arr) + 1 + arr.offset)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = buffers[2].to_pybytes()[offsets[0] : offsets[-1]] if buffers[2] is not None else b""
    lengths = np.diff(offsets)
    return StringBlob(lengths, data)


def blob_to_string_array(blob: StringBlob, arrow_type: pa.DataType) -> pa.Array:
    offsets = np.concatenate(([0], np.cumsum(blob.lengths)))
    if pa.types.is_large_string(arrow_type) or pa.types.is_large_binary(arrow_type):
        off_arr = offsets.astype(np.int64)
    else:
        off_arr = offsets.astype(np.int32)
    return pa.Array.from_buffers(
        arrow_type,
        len(blob.lengths),
        [None, pa.py_buffer(off_arr.tobytes()), pa.py_buffer(blob.data)],
    )


class Codec(Protocol):
    """encode(values) -> (payload, meta); decode(payload, meta, n) -> values.

    ``values`` is an np.ndarray (numeric) or StringBlob (strings); ``meta``
    must be JSON-serializable. ``n`` on decode is the dense value count.
    """

    name: str

    def encode(self, values: Any) -> tuple[bytes, dict]: ...

    def decode(self, payload: bytes, meta: dict, n: int) -> Any: ...


def values_from_array(arr: pa.Array) -> Any:
    """Extract the dense (null-free) value representation from an Arrow array
    that has already had nulls dropped."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return string_array_to_blob(arr)
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        return np.asarray(arr.cast(pa.int64()))
    if pa.types.is_integer(t):
        return np.asarray(arr.cast(pa.int64()))
    if pa.types.is_floating(t):
        return np.asarray(arr.cast(pa.float64()))
    if pa.types.is_boolean(t):
        return np.asarray(arr).astype(np.int64)
    raise TypeError(f"unsupported column type for encoding: {t}")


def values_to_array(values: Any, arrow_type: pa.DataType) -> pa.Array:
    """Rebuild a null-free Arrow array of ``arrow_type`` from dense values."""
    if isinstance(values, StringBlob):
        return blob_to_string_array(values, arrow_type)
    if pa.types.is_boolean(arrow_type):
        return pa.array(values.astype(bool), type=arrow_type)
    if pa.types.is_timestamp(arrow_type) or pa.types.is_date(arrow_type) or pa.types.is_time(arrow_type):
        return pa.array(values.astype(np.int64)).cast(arrow_type)
    if pa.types.is_integer(arrow_type):
        return pa.array(values.astype(np.int64)).cast(arrow_type)
    if pa.types.is_floating(arrow_type):
        return pa.array(values.astype(np.float64)).cast(arrow_type)
    raise TypeError(f"unsupported column type for decoding: {arrow_type}")
