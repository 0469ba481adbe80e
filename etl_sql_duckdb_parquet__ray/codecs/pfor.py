"""Patched bit-packing (PFOR-style exception lists, per the classic
PFOR/PFORDelta literature): pick the bit width that minimizes
``n*w + exceptions*(pos_width + full_width)`` from the residual bit-length
histogram, store out-of-width outliers (positions + full values) in side
sections. This is what keeps one conversation-boundary timestamp jump from
inflating every delta in the chunk to 43 bits.
"""

from __future__ import annotations

import numpy as np

from .base import pack_sections, unpack_sections
from .bitpack import bitpack, bitpack_nbytes, bitunpack, required_width


def _bit_lengths(u: np.ndarray) -> np.ndarray:
    bl = np.zeros(len(u), dtype=np.uint8)
    v = u.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v > 0).astype(np.uint8)
    return bl


def _pfor_plan(u: np.ndarray) -> tuple[int, int, int, int, np.ndarray]:
    """(width, maxw, pos_w, n_exceptions, bit_lengths) chosen from the
    bit-length histogram — the shared decision for ``pack_pfor`` (which
    materializes the stream) and ``pack_pfor_nbytes`` (which only prices
    it)."""
    n = len(u)
    bl = _bit_lengths(u)
    maxw = int(bl.max())
    hist = np.bincount(bl, minlength=maxw + 1)
    # count of exceptions if width=w: items with bl > w
    above = n - np.cumsum(hist)
    pos_w = required_width(n - 1) if n > 1 else 1
    costs = [
        n * w + int(above[w]) * (pos_w + maxw) + 32 for w in range(maxw + 1)
    ]
    w = int(np.argmin(costs))
    k = int(above[w]) if w < maxw else 0
    return w, maxw, pos_w, k, bl


def pack_pfor_nbytes(u: np.ndarray) -> int:
    """Exact ``len(pack_pfor(u)[0])`` without building the payload."""
    n = len(u)
    if n == 0:
        return 0
    w, maxw, pos_w, k, _bl = _pfor_plan(u.astype(np.uint64))
    if w >= maxw:
        return bitpack_nbytes(n, maxw)
    # pack_sections header (4 + 8*3) + the three bit-packed sections
    return 28 + bitpack_nbytes(n, w) + bitpack_nbytes(k, pos_w) + bitpack_nbytes(k, maxw)


def pack_pfor(u: np.ndarray) -> tuple[bytes, dict]:
    """u: uint64 residuals -> (payload, meta). Chooses the cheapest width
    from the bit-length histogram; falls back to plain full-width packing
    when exceptions don't pay."""
    n = len(u)
    if n == 0:
        return b"", {"w": 0, "k": 0}
    u = u.astype(np.uint64)
    w, maxw, pos_w, _k, bl = _pfor_plan(u)
    if w >= maxw:
        return bitpack(u, maxw), {"w": maxw, "k": 0}
    exc = np.flatnonzero(bl > w)
    main = u.copy()
    main[exc] = 0
    payload = pack_sections(
        [
            bitpack(main, w),
            bitpack(exc.astype(np.uint64), pos_w),
            bitpack(u[exc], maxw),
        ]
    )
    return payload, {"w": w, "k": int(len(exc)), "pw": pos_w, "ew": maxw}


def unpack_pfor(payload: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if meta.get("k", 0) == 0:
        return bitunpack(payload, meta["w"], n)
    main_b, pos_b, val_b = unpack_sections(payload)
    u = bitunpack(main_b, meta["w"], n)
    pos = bitunpack(pos_b, meta["pw"], meta["k"]).astype(np.int64)
    vals = bitunpack(val_b, meta["ew"], meta["k"])
    u[pos] = vals
    return u
