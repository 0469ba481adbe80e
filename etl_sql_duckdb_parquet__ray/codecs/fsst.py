"""From-scratch FSST (Fast Static Symbol Table) string compression.

Public-algorithm implementation (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020): train a table of up to 255 symbols
of 1..8 bytes on a bounded sample by iteratively merging frequent adjacent
token pairs ranked by gain = freq x len; encode greedily longest-match; code
255 marks an escaped literal byte.

Engineering for Python: the greedy longest-match scan is a *segment-parallel
numpy simulation* — the buffer is cut into ~1 KiB segments whose cursors all
advance together; each step does one vectorized longest-match (8 prefix-code
``searchsorted`` probes against the per-length symbol arrays) across every
active segment, so per-token Python cost is amortized over thousands of
segments. Greedy restarts at segment boundaries cost <0.1% size. Literals go
to a side section so decode is a single vectorized gather; the column's
original string lengths are bit-packed separately so the blob splits back
exactly.

The ``fsst_zstd`` variant zstd-compresses the token/literal sections — the
chunk auto-selector measures both against plain zstd and picks the smallest
(cf. SURVEY.md §7.4 "keep plain+zstd as a fallback the selector can choose").
"""

from __future__ import annotations

import re
import weakref

import numpy as np

from .base import (
    StringBlob,
    pack_sections,
    unpack_sections,
    zstd_compress_heavy,
    zstd_decompress,
)
from .bitpack import bitpack, bitunpack, required_width

_MAX_SYMBOLS = 255  # code 255 reserved as escape marker
# symbols are capped at 4 bytes: prefix codes then fit uint32, roughly
# halving the encode kernel's memory traffic — the kernel is BANDWIDTH-bound
# (every pass streams whole-window arrays), so bytes-per-input-byte of array
# traffic is what sets multi-core scaling. Decode still accepts length<=8
# symbols for forward compatibility.
_MAX_SYM_LEN = 4
_TRAIN_CAP = 1 << 15
_ITERS = 3


def _compile(table: list[bytes]) -> re.Pattern | None:
    if not table:
        return None
    pats = sorted(table, key=len, reverse=True)
    return re.compile(b"|".join(re.escape(s) for s in pats))


_SEG = 1024  # greedy-restart segment size for the parallel matcher


class _TableIndex:
    """Vectorized longest-match structures: direct lookup tables for 1- and
    2-byte symbols (a fancy-index gather), sorted uint32 prefix-code arrays
    + searchsorted for 3/4-byte symbols, gated by a 2-byte-prefix bitmask so
    the probes only touch positions that can start a long symbol."""

    def __init__(self, table: list[bytes]):
        table = [s for s in table if len(s) <= _MAX_SYM_LEN]
        self.lengths: list[int] = sorted({len(s) for s in table}, reverse=True)
        self.by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.lut1 = np.full(256, 255, dtype=np.uint8)
        self.lut2 = np.full(65536, 255, dtype=np.uint8)
        self.len_mask2 = np.zeros(65536, dtype=np.uint8)
        # direct 24-bit LUT for 3-byte symbols: one gather replaces
        # gate+searchsorted for L=3. Only allocated when the table actually
        # has 3-byte symbols, and recycled through a pool — the non-shared
        # encode path builds a fresh index per chunk / selector probe, and
        # repeated 16 MB first-touch allocations are what _scratch exists
        # to avoid (matcher skips the L=3 block when lut3 is None)
        self.lut3 = _acquire_lut3() if any(len(s) == 3 for s in table) else None
        if self.lut3 is not None:
            weakref.finalize(self, _LUT3_POOL.append, self.lut3)
        for L in self.lengths:
            syms = sorted(
                (int.from_bytes(s, "big"), i) for i, s in enumerate(table) if len(s) == L
            )
            if L == 1:
                for v, i in syms:
                    self.lut1[v] = i
            elif L == 2:
                for v, i in syms:
                    self.lut2[v] = i
            elif L == 3:
                for v, i in syms:
                    self.lut3[v] = i
            else:
                self.by_len[L] = (
                    np.array([v for v, _ in syms], dtype=np.uint32),
                    np.array([i for _, i in syms], dtype=np.uint8),
                )
                for v, _ in syms:
                    self.len_mask2[v >> (8 * (L - 2))] |= 1 << (L - 3)
        # combined (code | len<<8) table over the 2-byte prefix: one uint16
        # gather yields the best 1/2-byte match per position
        base1 = np.repeat(
            self.lut1.astype(np.uint16) | np.uint16(1 << 8), 256
        )
        self.combo2 = np.where(
            self.lut2 != 255, self.lut2.astype(np.uint16) | np.uint16(2 << 8), base1
        )


_LUT3_POOL: list[np.ndarray] = []


def _acquire_lut3() -> np.ndarray:
    """Pooled 16 MB L=3 lookup table: `.fill(255)` on a recycled buffer
    touches already-faulted pages, avoiding the first-touch cost of a fresh
    ``np.full(1 << 24)`` per index construction."""
    buf = _LUT3_POOL.pop() if _LUT3_POOL else np.empty(1 << 24, dtype=np.uint8)
    buf.fill(255)
    return buf


_BUFS: dict[tuple, np.ndarray] = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    """Per-process reusable buffers — on this class of virtualized host,
    first-touch page faults on fresh large allocations are pathologically
    slow, so steady-state kernels must not allocate. Capacity is rounded up
    to the next power of two so variable input sizes reuse the same buffer
    (≤2x memory, ~log distinct sizes)."""
    cap = 1 << max(int(n) - 1, 1).bit_length()
    key = (name, np.dtype(dtype).str)
    buf = _BUFS.get(key)
    if buf is None or len(buf) < cap:
        buf = np.empty(cap, dtype=dtype)
        _BUFS[key] = buf
    return buf[:n]


def _prefix_codes(pad: np.ndarray, n: int) -> np.ndarray:
    """code4[i] = big-endian uint32 of bytes data[i:i+4] (zero-padded)."""
    code4 = _scratch("code4", n, np.uint32)
    tmp = _scratch("ptmp", n, np.uint32)
    np.multiply(pad[:n], 1, out=code4, casting="unsafe")
    for j in range(1, 4):
        np.left_shift(code4, 8, out=code4)
        np.multiply(pad[j : j + n], 1, out=tmp, casting="unsafe")
        np.bitwise_or(code4, tmp, out=code4)
    return code4


_WINDOW = 512 << 10  # bound live ndarray memory; windows restart greedy (free)


def _match_positions(arr: np.ndarray, idx: _TableIndex) -> tuple[np.ndarray, np.ndarray]:
    """Per-POSITION longest match over the whole buffer, fully vectorized:
    two direct-LUT gathers for 1/2-byte symbols, then one gated searchsorted
    per longer length. Returns (best_code, best_len) scratch views; no
    boundary handling (the caller fixes up its own segment ends)."""
    n = len(arr)
    pad = _scratch("pad", n + 4, np.uint8)
    pad[:n] = arr
    pad[n:] = 0
    code4 = _prefix_codes(pad, n)
    p2 = _scratch("p2", n, np.int32)
    sh = _scratch("sh", n, np.uint32)
    np.right_shift(code4, 16, out=sh)
    np.multiply(sh, 1, out=p2, casting="unsafe")
    # one combined-LUT gather resolves the best 1/2-byte match per position
    combo = _scratch("combo", n, np.uint16)
    np.take(idx.combo2, p2, out=combo)
    best_code = _scratch("bc", n, np.uint8)
    best_len = _scratch("bl", n, np.uint8)
    np.multiply(combo, 1, out=best_code, casting="unsafe")  # low byte
    np.right_shift(combo, 8, out=combo)
    np.multiply(combo, 1, out=best_len, casting="unsafe")
    # L=3 via the 24-bit direct LUT (absent when the table has no 3-byte
    # symbols — no hits possible, skip the gather entirely)
    if idx.lut3 is not None:
        np.right_shift(code4, 8, out=sh)
        p3 = _scratch("p3", n, np.int32)
        np.multiply(sh, 1, out=p3, casting="unsafe")
        id3 = _scratch("id3", n, np.uint8)
        np.take(idx.lut3, p3, out=id3)
        m3 = id3 != 255
        np.copyto(best_code, id3, where=m3)
        np.copyto(best_len, np.uint8(3), where=m3)
    # L=4: gated searchsorted over the rare candidate positions
    if 4 in idx.by_len:
        m2 = _scratch("m2", n, np.uint8)
        np.take(idx.len_mask2, p2, out=m2)
        cand = np.flatnonzero(m2 & 2)
        if cand.size:
            vals, ids = idx.by_len[4]
            pos_c = np.minimum(np.searchsorted(vals, code4[cand]), len(vals) - 1)
            found = vals[pos_c] == code4[cand]
            hit = cand[found]
            best_code[hit] = ids[pos_c[found]]
            best_len[hit] = 4
    esc0 = best_code == 255
    best_len[esc0] = 1
    return best_code, best_len


def _encode_segments(
    arr: np.ndarray, seg_starts: np.ndarray, seg_ends: np.ndarray, idx: _TableIndex
) -> np.ndarray:
    """Greedy parse with restarts at the given segment boundaries (matches
    never cross a boundary). Returns the token_start bool mask (a scratch
    view); with best_code from ``_match_positions`` still valid, the code /
    literal streams fall out of boolean masks in position order."""
    n = len(arr)
    best_code, best_len = _match_positions(arr, idx)
    # boundary fixup: escape anything overrunning its segment end (only the
    # last ≤3 positions of a segment can, with 4-byte max symbols)
    for off in (1, 2, 3):
        tp = seg_ends - off
        tp = tp[tp >= seg_starts[0]]
        over = tp[best_len[tp] > off]
        if over.size:
            best_code[over] = 255
            best_len[over] = 1
    # lockstep cursor chase: only MARK token-start positions (~4 vector ops
    # per token consumed across all active segments)
    cur = seg_starts.copy()
    token_start = _scratch("ts", n, bool)
    token_start[:] = False
    active = np.flatnonzero(cur < seg_ends)
    while active.size:
        p = cur[active]
        token_start[p] = True
        cur[active] = p + best_len[p]
        active = active[cur[active] < seg_ends[active]]
    return token_start


def fsst_encode_buffer(data: bytes, idx: _TableIndex) -> tuple[bytes, bytes]:
    """Greedy FSST over one byte buffer -> (code stream, literal stream),
    processed in windows to bound live scratch memory."""
    n = len(data)
    if n == 0:
        return b"", b""
    arr = np.frombuffer(data, dtype=np.uint8)
    codes_parts, lits_parts = [], []
    for lo in range(0, n, _WINDOW):
        w = arr[lo : lo + _WINDOW]
        wn = len(w)
        starts = np.arange(0, wn, _SEG, dtype=np.int64)
        ends = np.minimum(starts + _SEG, wn)
        token_start = _encode_segments(w, starts, ends, idx)
        best_code = _scratch("bc", wn, np.uint8)
        codes_parts.append(best_code[token_start].copy())
        lits_parts.append(w[token_start & (best_code == 255)].copy())
    return (
        np.concatenate(codes_parts).tobytes(),
        np.concatenate(lits_parts).tobytes(),
    )


def fsst_encode_rows(
    data: bytes, lengths: np.ndarray, idx: _TableIndex
) -> tuple[bytes, bytes, np.ndarray, np.ndarray]:
    """Row-preserving FSST: encode the concatenated row buffer with greedy
    restarts at every row boundary (rows longer than _SEG get internal
    restarts too), returning per-row code/literal counts so each row's
    compressed stream can be sliced back out.

    This is what makes *pre-shuffle* encoding possible: rows compress before
    the conv_id exchange, the shuffle moves ~40% fewer bytes, and the
    post-shuffle chunk assembly is pure concatenation — bit-compatible with
    ``FsstCodec`` decode, which decodes the chunk buffer then splits by the
    stored lengths.

    Returns (codes, lits, codes_per_row, lits_per_row).
    """
    nrows = len(lengths)
    n = len(data)
    if n == 0:
        return b"", b"", np.zeros(nrows, np.int64), np.zeros(nrows, np.int64)
    full = np.frombuffer(data, dtype=np.uint8)
    lengths = lengths.astype(np.int64)
    full_off = np.concatenate(([0], np.cumsum(lengths)))

    # process row-groups of ≤_WINDOW bytes so scratch stays bounded no
    # matter the caller's batch size (greedy restarts at window edges land
    # on row boundaries, which restart anyway)
    codes_parts, lits_parts = [], []
    cpr = np.empty(nrows, dtype=np.int64)
    lpr = np.empty(nrows, dtype=np.int64)
    r0 = 0
    while r0 < nrows:
        r1 = int(np.searchsorted(full_off, full_off[r0] + _WINDOW, side="right")) - 1
        r1 = max(r1, r0 + 1)
        r1 = min(r1, nrows)
        lo, hi = full_off[r0], full_off[r1]
        arr = full[lo:hi]
        wlen = lengths[r0:r1]
        row_off = full_off[r0 : r1 + 1] - lo
        nr = r1 - r0
        pieces = np.maximum(1, -(-wlen // _SEG))
        total_p = int(pieces.sum())
        seg_row = np.repeat(np.arange(nr), pieces)
        k = np.arange(total_p, dtype=np.int64) - np.repeat(
            np.cumsum(pieces) - pieces, pieces
        )
        seg_starts = row_off[seg_row] + k * _SEG
        seg_ends = np.minimum(seg_starts + _SEG, row_off[seg_row + 1])

        token_start = _encode_segments(arr, seg_starts, seg_ends, idx)
        best_code = _scratch("bc", len(arr), np.uint8)
        esc = token_start & (best_code == 255)
        codes_parts.append(best_code[token_start].copy())
        lits_parts.append(arr[esc].copy())
        cs = np.concatenate(([0], np.cumsum(token_start, dtype=np.int64)))
        ls = np.concatenate(([0], np.cumsum(esc, dtype=np.int64)))
        cpr[r0:r1] = cs[row_off[1:]] - cs[row_off[:-1]]
        lpr[r0:r1] = ls[row_off[1:]] - ls[row_off[:-1]]
        r0 = r1
    return (
        np.concatenate(codes_parts).tobytes(),
        np.concatenate(lits_parts).tobytes(),
        cpr,
        lpr,
    )


def train_fsst(
    sample: bytes,
    iters: int = _ITERS,
    max_symbols: int = _MAX_SYMBOLS,
    cap: int = _TRAIN_CAP,
) -> list[bytes]:
    """Iterative symbol-table construction on a bounded sample. Per-chunk
    candidate probes use the small default cap; the once-per-job SHARED
    table (broadcast to every worker) can afford a bigger sample."""
    sample = sample[:cap]
    if not sample:
        return []
    table: list[bytes] = []
    for _ in range(iters):
        # tokenize sample with current table (single bytes fill the gaps)
        tokens: list[bytes] = []
        if table:
            pat = _compile(table)
            pos = 0
            for m in pat.finditer(sample):
                s, e = m.span()
                for i in range(pos, s):
                    tokens.append(sample[i : i + 1])
                tokens.append(m.group())
                pos = e
            for i in range(pos, len(sample)):
                tokens.append(sample[i : i + 1])
        else:
            tokens = [sample[i : i + 1] for i in range(len(sample))]
        # gain of current tokens and of adjacent-pair concatenations
        gains: dict[bytes, int] = {}
        for t in tokens:
            gains[t] = gains.get(t, 0) + len(t)
        for a, b in zip(tokens, tokens[1:]):
            cat = a + b
            if len(cat) <= _MAX_SYM_LEN:
                gains[cat] = gains.get(cat, 0) + len(cat)
        table = [s for s, _ in sorted(gains.items(), key=lambda kv: -kv[1])[:max_symbols]]
    return table


class FsstCodec:
    name = "fsst"
    _post_zstd = False

    def __init__(self, table: list[bytes] | None = None):
        # a pre-trained (shared/broadcast) table may be injected; otherwise
        # each chunk trains its own on the chunk's own sample.
        self._shared = table
        self._shared_idx: _TableIndex | None = None

    def _index(self, table: list[bytes]) -> _TableIndex:
        if self._shared is not None:
            if self._shared_idx is None:
                self._shared_idx = _TableIndex(table)  # built once per actor
            return self._shared_idx
        return _TableIndex(table)

    def encode(self, values: StringBlob) -> tuple[bytes, dict]:
        data = values.data
        table = self._shared if self._shared is not None else train_fsst(data)
        if table and data:
            codes, lits = fsst_encode_buffer(data, self._index(table))
        else:
            codes, lits = b"\xff" * len(data), data
        lw = required_width(int(values.lengths.max())) if len(values.lengths) else 0
        lens_packed = bitpack(values.lengths.astype(np.uint64), lw)
        tbl = pack_sections(table) if table else b""
        sections = [tbl, bytes(codes), bytes(lits), lens_packed]
        meta = {
            "lw": lw,
            "n_codes": len(codes),
            "n_lits": len(lits),
            "z": self._post_zstd,
            "raw": [len(s) for s in sections],
        }
        if self._post_zstd:
            sections = [zstd_compress_heavy(s) for s in sections]
        return pack_sections(sections), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> StringBlob:
        sections = unpack_sections(payload)
        if meta["z"]:
            sections = [zstd_decompress(s, r) for s, r in zip(sections, meta["raw"])]
        tbl_b, codes_b, lits_b, lens_b = sections
        table = unpack_sections(tbl_b) if tbl_b else []
        codes = np.frombuffer(codes_b, dtype=np.uint8)
        nc = len(codes)
        # fully vectorized decode: pad symbols into a (256, w) byte matrix,
        # gather rows by code, then boolean-mask-flatten (row-major) — this
        # IS the concatenation, with zero per-token Python. Gathers land in
        # reusable scratch (see _scratch: fresh pages are pathologically slow
        # to first-touch on this host class).
        w = max((len(s) for s in table), default=1)
        mat = np.zeros((256, w), dtype=np.uint8)
        slen = np.zeros(256, dtype=np.uint8)
        for i, s in enumerate(table):
            mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            slen[i] = len(s)
        slen[255] = 1  # escape: one literal byte
        big = _scratch("dec_big", nc * w, np.uint8).reshape(nc, w)
        np.take(mat, codes, axis=0, out=big)
        ln = _scratch("dec_ln", nc, np.uint8)
        np.take(slen, codes, out=ln)
        esc = codes == 255
        if esc.any():
            big[esc, 0] = np.frombuffer(lits_b, dtype=np.uint8)
        data = big[np.arange(w, dtype=np.uint8) < ln[:, None]].tobytes()
        lengths = bitunpack(lens_b, meta["lw"], n).astype(np.int64)
        return StringBlob(lengths, data)


class FsstZstdCodec(FsstCodec):
    name = "fsst_zstd"
    _post_zstd = True
