"""Run-length encoding over numeric or string values.

Runs are detected vectorized (np.diff on numerics, Arrow ``not_equal`` on
shifted string slices); run lengths are bit-packed, run values recurse into
the zstd fallback codec. Wins on long-run columns (sorted ``role`` / sparse
``tool``); the selector's measured-size tie-break keeps it off high-churn
chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import StringBlob, blob_to_string_array, pack_sections, string_array_to_blob, unpack_sections
from .bitpack import bitpack, bitpack_nbytes, bitunpack, required_width
from .zstd_plain import ZstdCodec

_zstd = ZstdCodec()


def run_boundaries(values) -> np.ndarray:
    """Indices where a new run starts (always includes 0 for non-empty)."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if isinstance(values, StringBlob):
        arr = blob_to_string_array(values, pa.string())
        neq = np.asarray(pc.not_equal(arr.slice(1), arr.slice(0, n - 1)))
    else:
        neq = np.diff(values) != 0
    return np.concatenate(([0], np.flatnonzero(neq) + 1))


class RleCodec:
    name = "rle"

    def encode(self, values) -> tuple[bytes, dict]:
        n = len(values)
        starts = run_boundaries(values)
        lengths = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
        if isinstance(values, StringBlob):
            arr = blob_to_string_array(values, pa.string())
            run_vals = string_array_to_blob(arr.take(pa.array(starts, type=pa.int64())))
        else:
            run_vals = values[starts]
        width = required_width(int(lengths.max())) if len(lengths) else 0
        vals_payload, vals_meta = _zstd.encode(run_vals)
        payload = pack_sections([bitpack(lengths, width), vals_payload])
        return payload, {"runs": len(starts), "lw": width, "vmeta": vals_meta}

    def probe_size(self, values) -> int:
        """Exact encoded size without bit-packing the length stream (the
        run-values zstd section is still really compressed — its size has
        no closed form, but runs are few by construction when RLE is even
        a candidate)."""
        n = len(values)
        starts = run_boundaries(values)
        lengths = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
        if isinstance(values, StringBlob):
            arr = blob_to_string_array(values, pa.string())
            run_vals = string_array_to_blob(arr.take(pa.array(starts, type=pa.int64())))
        else:
            run_vals = values[starts]
        width = required_width(int(lengths.max())) if len(lengths) else 0
        vals_payload, _ = _zstd.encode(run_vals)
        # pack_sections header (4 + 8*2) + packed lengths + values section
        return 20 + bitpack_nbytes(len(lengths), width) + len(vals_payload)

    def decode(self, payload: bytes, meta: dict, n: int):
        lens_b, vals_b = unpack_sections(payload)
        runs = meta["runs"]
        lengths = bitunpack(lens_b, meta["lw"], runs).astype(np.int64)
        run_vals = _zstd.decode(vals_b, meta["vmeta"], runs)
        idx = np.repeat(np.arange(runs, dtype=np.int64), lengths)
        if isinstance(run_vals, StringBlob):
            arr = blob_to_string_array(run_vals, pa.string())
            return string_array_to_blob(arr.take(pa.array(idx, type=pa.int64())))
        return run_vals[idx]
