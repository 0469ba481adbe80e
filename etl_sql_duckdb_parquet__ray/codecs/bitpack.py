"""Vectorized bit-packing of unsigned integers (numpy only, no Python loops).

``bitpack(a, width)`` packs each value of ``a`` (must fit in ``width`` bits)
into a dense bitstream, MSB-first per value; ``bitunpack`` reverses it.
Widths 8/16/32/64 short-circuit to dtype casts; other widths go through
``np.unpackbits``/``np.packbits`` on a (n, 64) bit matrix — one vectorized
pass, no per-element Python.
"""

from __future__ import annotations

import numpy as np


def required_width(max_value: int) -> int:
    if max_value < 0:
        raise ValueError("bitpack operates on unsigned values")
    return max(int(max_value).bit_length(), 1) if max_value > 0 else 0


def bitpack_nbytes(n: int, width: int) -> int:
    """Exact byte length of ``bitpack(a, width)`` for ``len(a) == n`` —
    lets the codec selector price a candidate without materializing the
    packed stream (see ``selector.select_codec`` probe path)."""
    if width == 0 or n == 0:
        return 0
    if width in (8, 16, 32, 64):
        return n * (width // 8)
    return (n * width + 7) // 8


def bitpack(a: np.ndarray, width: int) -> bytes:
    if width == 0 or len(a) == 0:
        return b""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if width == 8:
        return a.astype(np.uint8).tobytes()
    if width == 16:
        return a.astype(np.uint16).tobytes()
    if width == 32:
        return a.astype(np.uint32).tobytes()
    if width == 64:
        return a.tobytes()
    # big-endian byte view -> 64 bits per value -> keep low `width` bits
    bits = np.unpackbits(a.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    return np.packbits(bits[:, 64 - width :].ravel()).tobytes()


def bitunpack(data: bytes, width: int, n: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width == 8:
        return np.frombuffer(data, dtype=np.uint8, count=n).astype(np.uint64)
    if width == 16:
        return np.frombuffer(data, dtype=np.uint16, count=n).astype(np.uint64)
    if width == 32:
        return np.frombuffer(data, dtype=np.uint32, count=n).astype(np.uint64)
    if width == 64:
        return np.frombuffer(data, dtype=np.uint64, count=n).copy()
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    mat = np.zeros((n, 64), dtype=np.uint8)
    mat[:, 64 - width :] = bits.reshape(n, width)
    return np.packbits(mat, axis=1).view(">u8").ravel().astype(np.uint64)


def zigzag_encode(a: np.ndarray) -> np.ndarray:
    """Map signed int64 -> uint64 so small magnitudes pack into few bits."""
    a = a.astype(np.int64)
    return ((a.astype(np.uint64) << np.uint64(1)) ^ (a >> np.int64(63)).astype(np.uint64)).astype(np.uint64)


def zigzag_decode(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.uint64)
    return ((a >> np.uint64(1)) ^ (np.uint64(0) - (a & np.uint64(1)))).astype(np.int64)
