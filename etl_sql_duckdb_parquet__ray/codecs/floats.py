"""Byte-stream-split codec for float columns (Parquet BYTE_STREAM_SPLIT,
also Lemire/BtrBlocks-family): transpose the value bytes so each byte
plane is stored contiguously, then zstd the planes. Floats that share
exponents/high mantissa bytes (sensor values, scores, prices) compress
far better plane-major because each plane is locally near-constant —
the general-purpose compressor sees long runs instead of interleaved
noise. Lossless and order-preserving: decode is the exact inverse
transpose, bit-identical."""
from __future__ import annotations

import numpy as np

from .base import zstd_compress, zstd_decompress


class ByteStreamSplitCodec:
    name = "bss"

    def encode(self, values: np.ndarray) -> tuple[bytes, dict]:
        v = np.ascontiguousarray(values, dtype=np.float64)
        if len(v) == 0:
            return b"", {"raw": 0}
        planes = np.ascontiguousarray(v.view(np.uint8).reshape(-1, 8).T)
        raw = planes.tobytes()
        return zstd_compress(raw), {"raw": len(raw)}

    def decode(self, payload: bytes, meta: dict, n: int) -> np.ndarray:
        if n == 0:
            return np.empty(0, dtype=np.float64)
        raw = zstd_decompress(payload, meta["raw"])
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(8, n)
        return (
            np.ascontiguousarray(planes.T).reshape(-1).view(np.float64).copy()
        )
