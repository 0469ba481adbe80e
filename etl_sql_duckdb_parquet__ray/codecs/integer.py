"""Lightweight integer codecs: frame-of-reference + bit-packing, delta,
delta-of-delta (for near-monotone timestamps).

Design per the published lightweight-compression literature (FOR/PFOR,
Gorilla-style delta-of-delta; see PAPERS.md "Can Delta Compete with
Frame-of-Reference…", VLDB 2024): FOR subtracts the chunk minimum and
bit-packs the residuals; DELTA packs zigzagged first differences; DELTA2
packs zigzagged second differences — ideal when deltas are near-constant
(per-conversation timestamps, contiguous ``turn_idx``).

All operate on int64 numpy arrays (timestamps arrive as epoch int64).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bitpack, bitunpack, required_width, zigzag_decode, zigzag_encode
from .pfor import pack_pfor, pack_pfor_nbytes, unpack_pfor


class ForBitpackCodec:
    name = "for_bitpack"

    def encode(self, values: np.ndarray) -> tuple[bytes, dict]:
        if len(values) == 0:
            return b"", {"ref": 0, "pf": {"w": 0, "k": 0}}
        v = values.astype(np.int64)
        ref = int(v.min())
        resid = (v - ref).astype(np.uint64)
        payload, pf = pack_pfor(resid)
        return payload, {"ref": ref, "pf": pf}

    def probe_size(self, values: np.ndarray) -> int:
        """Exact ``len(encode(values)[0])`` without packing the stream —
        the selector's probe path (closed-form size, same PFOR plan)."""
        if len(values) == 0:
            return 0
        v = values.astype(np.int64)
        return pack_pfor_nbytes((v - int(v.min())).astype(np.uint64))

    def decode(self, payload: bytes, meta: dict, n: int) -> np.ndarray:
        if "pf" not in meta:  # pre-PFOR chunks
            resid = bitunpack(payload, meta["width"], n)
        else:
            resid = unpack_pfor(payload, meta["pf"], n)
        return (resid.astype(np.int64) + np.int64(meta["ref"])).astype(np.int64)


class DeltaCodec:
    """first value stored raw; zigzag(diff) bit-packed."""

    name = "delta"
    _order = 1

    def encode(self, values: np.ndarray) -> tuple[bytes, dict]:
        v = values.astype(np.int64)
        firsts = []
        for _ in range(self._order):
            if len(v) == 0:
                break
            firsts.append(int(v[0]))
            v = np.diff(v)
        zz = zigzag_encode(v)
        payload, pf = pack_pfor(zz)
        return payload, {"firsts": firsts, "pf": pf}

    def probe_size(self, values: np.ndarray) -> int:
        """Exact encoded-payload size via the shared PFOR plan (the raw
        ``firsts`` live in the meta, not the payload)."""
        v = values.astype(np.int64)
        for _ in range(self._order):
            if len(v) == 0:
                break
            v = np.diff(v)
        return pack_pfor_nbytes(zigzag_encode(v))

    def decode(self, payload: bytes, meta: dict, n: int) -> np.ndarray:
        firsts = meta["firsts"]
        k = len(firsts)
        m = max(n - k, 0)
        if "pf" not in meta:  # pre-PFOR chunks
            v = zigzag_decode(bitunpack(payload, meta["width"], m))
        else:
            v = zigzag_decode(unpack_pfor(payload, meta["pf"], m))
        for first in reversed(firsts):
            v = np.concatenate(([first], first + np.cumsum(v))) if len(v) else np.array([first], dtype=np.int64)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        return v.astype(np.int64)


class DeltaDeltaCodec(DeltaCodec):
    name = "delta_delta"
    _order = 2
