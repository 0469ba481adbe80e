"""Plain + zstd fallback codecs.

``zstd`` is the correctness-preserving fallback the auto-selector can always
choose (the analog of the reference's Parquet+zstd default,
``src/etl/load.py:18`` / ``load.py:47``): raw little-endian value bytes (or
lengths+data for strings) through pyarrow's zstd.
"""

from __future__ import annotations

import numpy as np

from .base import (
    StringBlob,
    pack_sections,
    unpack_sections,
    zstd_compress,
    zstd_compress_heavy,
    zstd_decompress,
)
from .bitpack import bitpack, bitpack_nbytes, bitunpack, required_width


def _encode_lengths(lengths: np.ndarray) -> tuple[bytes, int]:
    width = required_width(int(lengths.max())) if len(lengths) else 0
    return bitpack(lengths.astype(np.uint64), width), width


class ZstdCodec:
    name = "zstd"

    def encode(self, values) -> tuple[bytes, dict]:
        if isinstance(values, StringBlob):
            lens, width = _encode_lengths(values.lengths)
            payload = pack_sections([zstd_compress(lens), zstd_compress_heavy(values.data)])
            return payload, {"kind": "str", "lw": width, "raw_lens": len(lens), "raw_data": len(values.data)}
        raw = np.ascontiguousarray(values).tobytes()
        return zstd_compress(raw), {"kind": "num", "dtype": str(values.dtype), "raw": len(raw)}

    def decode(self, payload: bytes, meta: dict, n: int):
        if meta["kind"] == "str":
            lens_c, data_c = unpack_sections(payload)
            lens = bitunpack(zstd_decompress(lens_c, meta["raw_lens"]), meta["lw"], n).astype(np.int64)
            data = zstd_decompress(data_c, meta["raw_data"])
            return StringBlob(lens, data)
        raw = zstd_decompress(payload, meta["raw"])
        return np.frombuffer(raw, dtype=np.dtype(meta["dtype"])).copy()


class PlainCodec:
    """Uncompressed; exists so the selector's measured-size tie-break has a
    true baseline and tiny chunks avoid zstd overhead."""

    name = "plain"

    def encode(self, values) -> tuple[bytes, dict]:
        if isinstance(values, StringBlob):
            lens, width = _encode_lengths(values.lengths)
            return pack_sections([lens, values.data]), {"kind": "str", "lw": width}
        return np.ascontiguousarray(values).tobytes(), {"kind": "num", "dtype": str(values.dtype)}

    def probe_size(self, values) -> int:
        """Exact uncompressed size — pure arithmetic."""
        if isinstance(values, StringBlob):
            n = len(values.lengths)
            width = required_width(int(values.lengths.max())) if n else 0
            return 20 + bitpack_nbytes(n, width) + len(values.data)
        return len(values) * values.dtype.itemsize

    def decode(self, payload: bytes, meta: dict, n: int):
        if meta["kind"] == "str":
            lens_b, data = unpack_sections(payload)
            lens = bitunpack(lens_b, meta["lw"], n).astype(np.int64)
            return StringBlob(lens, data)
        return np.frombuffer(payload, dtype=np.dtype(meta["dtype"])).copy()
