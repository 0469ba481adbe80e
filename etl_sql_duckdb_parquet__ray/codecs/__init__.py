"""Codec kernels + column-level encode/decode with uniform null handling.

``encode_column`` / ``decode_column`` are the only entry points the chunk
container uses: they split off the validity bitmap (packed + zstd), hand the
dense values to the selected codec, and restore the exact Arrow array —
type, nulls and values bit-identical — on decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .base import (
    StringBlob,
    pack_sections,
    string_array_to_blob,
    unpack_sections,
    values_from_array,
    values_to_array,
    zstd_compress,
    zstd_decompress,
)
from .fsst import train_fsst
from .selector import (
    REGISTRY,
    chunk_stats,
    register_codec,
    select_codec,
    select_codec_cached,
)

__all__ = [
    "REGISTRY",
    "register_codec",
    "chunk_stats",
    "select_codec",
    "select_codec_cached",
    "train_fsst",
    "encode_column",
    "decode_column",
    "column_checksum",
]


def column_checksum(arr: pa.Array | pa.ChunkedArray) -> str:
    """Canonical content hash of a column chunk (order-sensitive), recorded
    in the lineage manifest — the vectorized analog of the reference's
    per-row SHA-256 ``row_hash`` (``src/etl/ingest.py:56-58``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = hashlib.sha256()
    mask = arr.is_null()
    h.update(np.asarray(mask).tobytes() if arr.null_count else b"\x00")
    dense = arr.drop_null()
    vals = values_from_array(dense)
    if isinstance(vals, StringBlob):
        h.update(vals.lengths.tobytes())
        h.update(vals.data)
    else:
        h.update(np.ascontiguousarray(vals).tobytes())
    return h.hexdigest()


def encode_column(
    arr: pa.Array | pa.ChunkedArray,
    codec_name: str | None = None,
    mode: str = "balanced",
    selector_cache: dict | None = None,
    cache_key: str | None = None,
) -> tuple[bytes, dict]:
    """Encode one column chunk. Returns (payload, meta); meta is JSON-safe
    and self-describing (codec, arrow type, row/null counts).

    ``selector_cache``/``cache_key`` opt into cross-chunk probe reuse
    (``select_codec_cached``): stats stay per-chunk, candidate probes are
    skipped while the stats match the cached winner's."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    null_mask = np.asarray(arr.is_null()) if arr.null_count else None
    dense = arr.drop_null() if arr.null_count else arr
    values = values_from_array(dense)
    if codec_name:
        name = codec_name
    elif selector_cache is not None and cache_key is not None:
        name = select_codec_cached(
            values, arr.type, selector_cache, cache_key, mode=mode
        )
    else:
        name = select_codec(values, arr.type, mode=mode)
    payload, vmeta = REGISTRY[name].encode(values)
    if null_mask is not None:
        validity = zstd_compress(np.packbits(null_mask).tobytes())
    else:
        validity = b""
    meta = {
        "codec": name,
        "type": str(arr.type),
        "n": n,
        "nulls": int(arr.null_count),
        "vmeta": vmeta,
    }
    return pack_sections([validity, payload]), meta


_TYPE_PARSE = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "date32[day]": pa.date32(),
}


def _parse_type(s: str) -> pa.DataType:
    if s in _TYPE_PARSE:
        return _TYPE_PARSE[s]
    if s.startswith("timestamp["):
        inner = s[len("timestamp[") : -1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    raise TypeError(f"cannot parse arrow type {s!r}")


def decode_column(payload: bytes, meta: dict) -> pa.Array:
    validity_b, codec_payload = unpack_sections(payload)
    n, nulls = meta["n"], meta["nulls"]
    arrow_type = _parse_type(meta["type"])
    dense_n = n - nulls
    values = REGISTRY[meta["codec"]].decode(codec_payload, meta["vmeta"], dense_n)
    if nulls == 0:
        return values_to_array(values, arrow_type)
    nbytes = (n + 7) // 8
    null_mask = np.unpackbits(
        np.frombuffer(zstd_decompress(validity_b, nbytes), dtype=np.uint8), count=n
    ).astype(bool)
    if isinstance(values, StringBlob):
        full_lens = np.zeros(n, dtype=np.int64)
        full_lens[~null_mask] = values.lengths
        offsets = np.concatenate(([0], np.cumsum(full_lens)))
        off_arr = (
            offsets.astype(np.int64)
            if pa.types.is_large_string(arrow_type) or pa.types.is_large_binary(arrow_type)
            else offsets.astype(np.int32)
        )
        validity = pa.py_buffer(np.packbits(~null_mask, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            arrow_type,
            n,
            [validity, pa.py_buffer(off_arr.tobytes()), pa.py_buffer(values.data)],
            null_count=nulls,
        )
    # numeric: scatter dense values into full-length buffer
    if np.issubdtype(values.dtype, np.floating):
        full = np.zeros(n, dtype=np.float64)
    else:
        full = np.zeros(n, dtype=np.int64)
    full[~null_mask] = values
    dense_arr = values_to_array(full, arrow_type)
    validity = pa.py_buffer(np.packbits(~null_mask, bitorder="little").tobytes())
    buffers = dense_arr.buffers()
    return pa.Array.from_buffers(arrow_type, n, [validity, buffers[1]], null_count=nulls)
