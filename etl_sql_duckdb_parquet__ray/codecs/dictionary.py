"""Dictionary encoding: distinct values + bit-packed (or run-length) codes.

The index stream is encoded with whichever of {FOR+bitpack, RLE-of-codes} is
measured smaller — dictionary+RLE is the natural fit for the low-cardinality
``role`` / ``tool`` columns once rows are ordered by ``(conv_id, turn_idx)``
(analog of the closed enum domains in the reference,
``src/etl/settings.py:13-24``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (
    StringBlob,
    blob_to_string_array,
    pack_sections,
    string_array_to_blob,
    unpack_sections,
)
from .bitpack import bitpack, bitpack_nbytes, bitunpack, required_width
from .rle import run_boundaries
from .zstd_plain import ZstdCodec

_zstd = ZstdCodec()


def _codes_and_dict(values):
    if isinstance(values, StringBlob):
        arr = blob_to_string_array(values, pa.string())
        denc = pc.dictionary_encode(arr)
        codes = np.asarray(denc.indices, dtype=np.int64)
        dict_vals = string_array_to_blob(denc.dictionary)
        return codes, dict_vals, len(denc.dictionary)
    uniq, codes = np.unique(values, return_inverse=True)
    return codes.astype(np.int64), uniq, len(uniq)


class DictCodec:
    name = "dict"

    def encode(self, values) -> tuple[bytes, dict]:
        n = len(values)
        if n == 0:
            # record the value kind so empty chunks decode to the right shape
            kind = "str" if isinstance(values, StringBlob) else str(values.dtype)
            return (
                pack_sections([b"", b""]),
                {"card": 0, "idx": "bitpack", "width": 0, "vmeta": None, "kind": kind},
            )
        codes, dict_vals, card = _codes_and_dict(values)
        width = required_width(card - 1)
        # index stream: bit-packed vs RLE of codes, measured
        packed = bitpack(codes.astype(np.uint64), width)
        starts = run_boundaries(codes)
        run_lens = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
        rw = required_width(int(run_lens.max())) if len(run_lens) else 0
        rle_payload = pack_sections(
            [bitpack(run_lens, rw), bitpack(codes[starts].astype(np.uint64), width)]
        )
        vals_payload, vals_meta = _zstd.encode(dict_vals)
        if len(rle_payload) < len(packed):
            idx_payload, idx_meta = rle_payload, {"idx": "rle", "runs": len(starts), "rw": rw}
        else:
            idx_payload, idx_meta = packed, {"idx": "bitpack"}
        meta = {"card": card, "width": width, "vmeta": vals_meta, **idx_meta}
        return pack_sections([idx_payload, vals_payload]), meta

    def probe_size(self, values) -> int:
        """Exact encoded size: the dictionary-build (the unavoidable cost)
        still runs, but the index stream is priced from bit widths instead
        of being packed twice (bitpack vs RLE-of-codes)."""
        n = len(values)
        if n == 0:
            return 20  # pack_sections header + two empty sections
        codes, dict_vals, card = _codes_and_dict(values)
        width = required_width(card - 1)
        packed_size = bitpack_nbytes(n, width)
        starts = run_boundaries(codes)
        run_lens = np.diff(np.concatenate((starts, [n])))
        rw = required_width(int(run_lens.max())) if len(run_lens) else 0
        rle_size = 20 + bitpack_nbytes(len(starts), rw) + bitpack_nbytes(len(starts), width)
        vals_payload, _ = _zstd.encode(dict_vals)
        # same strict-less tie-break as encode(): rle wins only when smaller
        idx_size = rle_size if rle_size < packed_size else packed_size
        return 20 + idx_size + len(vals_payload)

    def decode(self, payload: bytes, meta: dict, n: int):
        idx_b, vals_b = unpack_sections(payload)
        card = meta["card"]
        if card == 0:
            kind = meta.get("kind", "str")
            if kind == "str":
                return StringBlob(np.empty(0, dtype=np.int64), b"")
            return np.empty(0, dtype=np.dtype(kind))
        dict_vals = _zstd.decode(vals_b, meta["vmeta"], card)
        if meta["idx"] == "rle":
            lens_b, rv_b = unpack_sections(idx_b)
            runs = meta["runs"]
            run_lens = bitunpack(lens_b, meta["rw"], runs).astype(np.int64)
            run_codes = bitunpack(rv_b, meta["width"], runs).astype(np.int64)
            codes = np.repeat(run_codes, run_lens)
        else:
            codes = bitunpack(idx_b, meta["width"], n).astype(np.int64)
        if isinstance(dict_vals, StringBlob):
            arr = blob_to_string_array(dict_vals, pa.string())
            return string_array_to_blob(arr.take(pa.array(codes, type=pa.int64())))
        return dict_vals[codes]
