"""Per-chunk text trigram Bloom filters — substring data skipping.

A chunk record in the lineage manifest may carry a ``tri_filter``: a Bloom
filter over every distinct BYTE TRIGRAM of the chunk's ``text`` column (the
pg_trgm / code-search indexing idea: a substring of length >= 3 can only
occur in a chunk that contains ALL of the substring's trigrams). Pruning is
exact-safe by construction:

- Bloom false positives only cause an unnecessary chunk read (the exact
  row filter still runs on survivors) — never a missed match.
- The filter is built from the CONCATENATED row bytes, so row-boundary
  trigrams are extra set bits (again: only ever false positives).
- Terms shorter than 3 bytes, and chunks encoded without filters, never
  prune.

Sizing is content-adaptive: ``m`` = smallest power of two >= 8 bits per
distinct trigram (k=2 hashes -> ~5% false-positive rate), clamped to
[1024, 2^17] bits — a few hundred bytes to 16 KiB per chunk, independent
of chunk payload size, stored base64 in the chunk's manifest record (the
data file is untouched; old manifests simply lack the key).
"""
from __future__ import annotations

import base64

import numpy as np

_H1 = np.uint32(0x9E3779B1)  # Fibonacci / Murmur-style odd multipliers
_H2 = np.uint32(0x85EBCA6B)
MIN_BITS = 1 << 10
MAX_BITS = 1 << 17


def trigram_values(data: bytes | np.ndarray) -> np.ndarray:
    """Distinct byte-trigram codes (b0<<16 | b1<<8 | b2) as uint32."""
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    if len(b) < 3:
        return np.empty(0, dtype=np.uint32)
    x = (
        b[:-2].astype(np.uint32) << np.uint32(16)
    ) | (
        b[1:-1].astype(np.uint32) << np.uint32(8)
    ) | b[2:].astype(np.uint32)
    return np.unique(x)


def _bit_positions(tri: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    shift = np.uint32(32 - (m - 1).bit_length())
    with np.errstate(over="ignore"):
        h1 = (tri * _H1) >> shift
        h2 = (tri * _H2) >> shift
    return h1, h2


def build_trigram_filter(flat: bytes | np.ndarray) -> dict | None:
    """Bloom filter dict ``{"m": bits, "n": distinct trigrams, "b64":
    payload}`` over the distinct trigrams of ``flat``; None when there is
    nothing indexable (< 3 bytes).

    ``n`` makes a degraded filter OBSERVABLE (ADVICE r3): when the MAX_BITS
    clamp binds (more than ~16k distinct trigrams), the realized
    false-positive rate drifts above the ~5% design point — correctness is
    unaffected (Bloom FPs only cost an extra chunk read), but ``n/m`` tells
    an operator (and ``expected_fpr``) how much skipping a chunk's filter
    can still deliver."""
    tri = trigram_values(flat)
    if not len(tri):
        return None
    m = max(MIN_BITS, min(MAX_BITS, 1 << int(8 * len(tri) - 1).bit_length()))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    for h in _bit_positions(tri, m):
        np.bitwise_or.at(bits, h >> np.uint32(3), np.uint8(1) << (h & np.uint32(7)).astype(np.uint8))
    return {
        "m": m,
        "n": int(len(tri)),
        "b64": base64.b64encode(bits.tobytes()).decode(),
    }


def expected_fpr(filt: dict | None) -> float:
    """Realized per-trigram false-positive estimate (k=2 hashes):
    ``(1 - e^(-2n/m))^2``. ~0.05 at the 8-bits/trigram design point; tends
    to 1.0 as a clamped filter saturates. Filters recorded before the ``n``
    key report NaN (unknown load, still safe to probe)."""
    if filt is None or "n" not in filt:
        return float("nan")
    load = 2.0 * float(filt["n"]) / float(filt["m"])
    return float((1.0 - np.exp(-load)) ** 2)


def filter_may_contain(filt: dict | None, term: str | bytes) -> bool:
    """False ONLY when the chunk provably cannot contain ``term`` as a
    substring (every one of the term's trigrams must test positive)."""
    if filt is None:
        return True
    tb = term.encode("utf-8", "surrogatepass") if isinstance(term, str) else term
    if len(tb) < 3:
        return True  # too short to index — no pruning possible
    # same packing as the build side (uniqueness is irrelevant for the
    # membership test; sharing the code keeps build/probe bit-identical)
    tri = trigram_values(tb)
    m = int(filt["m"])
    bits = np.frombuffer(base64.b64decode(filt["b64"]), dtype=np.uint8)
    for h in _bit_positions(tri, m):
        hit = (bits[h >> np.uint32(3)] >> (h & np.uint32(7)).astype(np.uint8)) & 1
        if not hit.all():
            return False
    return True
