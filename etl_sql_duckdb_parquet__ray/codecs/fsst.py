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
    zstd_compress_fsst,
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
    """Vectorized longest-match structures, all keyed LITTLE-endian (so the
    matcher reads each position's 4-byte window with one overlapping-stride
    uint32 load and derives every key with a mask, no byte shifting):

    - ``combo2``: 2^16 uint16 (code | len<<8) — one gather resolves the best
      1/2-byte match per position.
    - ``lut34``: 2^24 uint16 over the 3-byte prefix — low byte is the 3-byte
      symbol's code (255 = none), high byte is the start of the 4-byte
      symbol GROUP sharing that prefix in ``vals4g`` (255 = none). One
      gather serves both lengths; 4-byte resolution is then an exact-match
      scan of the (tiny, usually size-1) group — no searchsorted.
    """

    def __init__(self, table: list[bytes]):
        table = [s for s in table if len(s) <= _MAX_SYM_LEN]
        self.lengths: list[int] = sorted({len(s) for s in table}, reverse=True)
        self.lut1 = np.full(256, 255, dtype=np.uint8)
        self.lut2 = np.full(65536, 255, dtype=np.uint8)
        # combined 24-bit LUT (see class docstring). Pooled: the non-shared
        # encode path builds a fresh index per chunk / selector probe, and
        # repeated 32 MB first-touch allocations are what _scratch exists
        # to avoid (matcher skips the L>=3 block when lut34 is None)
        need34 = any(len(s) >= 3 for s in table)
        self.lut34 = _acquire_lut34() if need34 else None
        if self.lut34 is not None:
            weakref.finalize(self, _LUT34_POOL.append, self.lut34)
        syms4: list[tuple[int, int]] = []  # (LE value, code), grouped later
        for i, s in enumerate(table):
            v = int.from_bytes(s, "little")
            L = len(s)
            if L == 1:
                self.lut1[v] = i
            elif L == 2:
                self.lut2[v] = i
            elif L == 3:
                self.lut34[v] = (self.lut34[v] & 0xFF00) | i
            else:
                syms4.append((v, i))
        # group 4-byte symbols by 3-byte prefix; within a group keep table
        # order (training emits by descending gain, so scan pass j=0 catches
        # the most frequent member first)
        groups: dict[int, list[tuple[int, int]]] = {}
        for v, i in syms4:
            groups.setdefault(v & 0xFFFFFF, []).append((v, i))
        self.maxc4 = max((len(g) for g in groups.values()), default=0)
        vals, ids = [], []
        for p, members in groups.items():
            self.lut34[p] = (self.lut34[p] & 0x00FF) | (len(vals) << 8)
            for v, i in members:
                vals.append(v)
                ids.append(i)
        if groups:
            # sentinel padding so scan pass j may read past a group's end:
            # its 3-byte prefix is chosen to be no group's prefix, so no
            # probing position (whose code4 prefix == its group's prefix)
            # can ever equal it
            free = next(p for p in range(1 << 24) if p not in groups)
            vals.extend([free] * self.maxc4)
            ids.extend([255] * self.maxc4)
        self.vals4g = np.array(vals, dtype=np.uint32)
        self.ids4g = np.array(ids, dtype=np.uint8)
        # combined (code | len<<8) table over the 2-byte prefix: one uint16
        # gather yields the best 1/2-byte match per position
        base1 = np.tile(self.lut1.astype(np.uint16) | np.uint16(1 << 8), 256)
        self.combo2 = np.where(
            self.lut2 != 255, self.lut2.astype(np.uint16) | np.uint16(2 << 8), base1
        )


_LUT34_POOL: list[np.ndarray] = []


def _acquire_lut34() -> np.ndarray:
    """Pooled 32 MB combined L3/L4 lookup table: `.fill(0xFFFF)` on a
    recycled buffer touches already-faulted pages, avoiding the first-touch
    cost of a fresh ``np.full(1 << 24)`` per index construction."""
    buf = _LUT34_POOL.pop() if _LUT34_POOL else np.empty(1 << 24, dtype=np.uint16)
    buf.fill(0xFFFF)
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
    """code4[i] = LITTLE-endian uint32 of bytes data[i:i+4] (zero-padded):
    one overlapping-stride unaligned uint32 load (a single memcpy-like pass)
    instead of four shift/or byte passes."""
    code4 = _scratch("code4", n, np.uint32)
    view = np.ndarray(buffer=pad, shape=(n,), dtype=np.uint32, strides=(1,))
    np.copyto(code4, view)
    return code4


_WINDOW = 512 << 10  # bound live ndarray memory; windows restart greedy (free)


def _match_positions(arr: np.ndarray, idx: _TableIndex) -> tuple[np.ndarray, np.ndarray]:
    """Per-POSITION longest match over the whole buffer, fully vectorized:
    two direct-LUT gathers for 1/2-byte symbols, then one gated searchsorted
    per longer length. Returns (best_code, best_len) scratch views; no
    boundary handling (the caller fixes up its own segment ends)."""
    n = len(arr)
    pad = _scratch("pad", n + 8, np.uint8)
    pad[:n] = arr
    pad[n:] = 0
    code4 = _prefix_codes(pad, n)
    sh = _scratch("sh", n, np.uint32)
    p2 = _scratch("p2", n, np.int32)
    np.bitwise_and(code4, np.uint32(0xFFFF), out=sh)
    np.multiply(sh, 1, out=p2, casting="unsafe")
    # one combined-LUT gather resolves the best 1/2-byte match per position
    combo = _scratch("combo", n, np.uint16)
    np.take(idx.combo2, p2, out=combo)
    best_code = _scratch("bc", n, np.uint8)
    best_len = _scratch("bl", n, np.uint8)
    np.multiply(combo, 1, out=best_code, casting="unsafe")  # low byte
    np.right_shift(combo, 8, out=combo)
    np.multiply(combo, 1, out=best_len, casting="unsafe")
    # L=3 and L=4 share ONE gather of the combined 24-bit LUT (absent when
    # the table has no symbols longer than 2 — skip entirely)
    if idx.lut34 is not None:
        np.bitwise_and(code4, np.uint32(0xFFFFFF), out=sh)
        p3 = _scratch("p3", n, np.int32)
        np.multiply(sh, 1, out=p3, casting="unsafe")
        c34 = _scratch("c34", n, np.uint16)
        np.take(idx.lut34, p3, out=c34)
        id3 = _scratch("id3", n, np.uint8)
        np.multiply(c34, 1, out=id3, casting="unsafe")  # low byte
        m3 = id3 != 255
        np.copyto(best_code, id3, where=m3)
        np.copyto(best_len, np.uint8(3), where=m3)
        if idx.maxc4:
            np.right_shift(c34, 8, out=c34)  # high byte: L4 group start
            # full-width scan pass j=0 (nearly every position is an L4
            # candidate on text, so compressing to a candidate list costs
            # more than it saves): remap 'none' (255) to the sentinel pad so
            # one clipless gather is safe, then exact-compare. Later passes
            # (rare multi-member groups) run on the small miss remainder.
            pad_start = len(idx.vals4g) - idx.maxc4
            gidx = _scratch("gidx", n, np.int32)
            np.multiply(c34, 1, out=gidx, casting="unsafe")
            none34 = c34 == 255
            np.copyto(gidx, np.int32(pad_start), where=none34)
            v4 = _scratch("v4", n, np.uint32)
            np.take(idx.vals4g, gidx, out=v4)
            hit = v4 == code4
            id4 = _scratch("id4", n, np.uint8)
            np.take(idx.ids4g, gidx, out=id4)
            np.copyto(best_code, id4, where=hit)
            np.copyto(best_len, np.uint8(4), where=hit)
            if idx.maxc4 > 1:
                rem = np.flatnonzero(~(hit | none34))
                if rem.size:
                    gs = gidx[rem]
                    k4 = code4[rem]
                    for j in range(1, idx.maxc4):
                        hj = idx.vals4g[gs + j] == k4
                        h = rem[hj]
                        best_code[h] = idx.ids4g[gs[hj] + j]
                        best_len[h] = 4
                        miss = ~hj
                        rem = rem[miss]
                        if not rem.size:
                            break
                        gs = gs[miss]
                        k4 = k4[miss]
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


def fsst_decode_stream(codes_b: bytes, lits_b: bytes, table: list[bytes]) -> bytes:
    """Decode a flat FSST code stream back to the concatenated plaintext
    bytes. Fully vectorized: pad symbols into a (256, wp) byte matrix
    (wp = symbol width rounded to a power of two), gather rows by code
    as SINGLE WORDS (uint16/32/64 view — ~4x faster than a 2-D
    axis-0 take), then boolean-mask-flatten (row-major) — this IS the
    concatenation, with zero per-token Python. The prefix mask is
    itself a 256-row table gathered the same way (it depends only on
    the code), so no per-row length compare is materialized. Gathers
    land in reusable scratch (see _scratch: fresh pages are
    pathologically slow to first-touch on this host class)."""
    codes = np.frombuffer(codes_b, dtype=np.uint8)
    nc = len(codes)
    w = max((len(s) for s in table), default=1)
    wp = 1 << max(w - 1, 0).bit_length()  # 1,2,4,8
    word = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[wp]
    mat = np.zeros((256, wp), dtype=np.uint8)
    msk = np.zeros((256, wp), dtype=np.uint8)
    for i, s in enumerate(table):
        mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        msk[i, : len(s)] = 1
    msk[255, 0] = 1  # escape: one literal byte
    matw = mat.view(word).ravel()
    mskw = msk.view(word).ravel()
    bw = _scratch("dec_bw", nc, word)
    mw = _scratch("dec_mw", nc, word)
    np.take(matw, codes, out=bw)
    np.take(mskw, codes, out=mw)
    big = bw.view(np.uint8).reshape(nc, wp)
    mask = mw.view(np.uint8).reshape(nc, wp).view(np.bool_)
    esc = codes == 255
    if esc.any():
        big[esc, 0] = np.frombuffer(lits_b, dtype=np.uint8)
    # boolean compress INTO reusable scratch (np.compress out=): the fancy
    # index `big[mask]` allocates fresh pages every call, and first-touch
    # faults dominate on this host class — measured 17-23% faster at 8M
    # codes (223 -> 270 MB/s)
    flat_mask = mask.ravel()
    n_out = int(np.count_nonzero(flat_mask))
    out = _scratch("dec_out", n_out, np.uint8)
    np.compress(flat_mask, big.ravel(), out=out)
    return out.tobytes()


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
            sections = [zstd_compress_fsst(s) for s in sections]
        return pack_sections(sections), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> StringBlob:
        sections = unpack_sections(payload)
        if meta["z"]:
            sections = [zstd_decompress(s, r) for s, r in zip(sections, meta["raw"])]
        tbl_b, codes_b, lits_b, lens_b = sections
        table = unpack_sections(tbl_b) if tbl_b else []
        data = fsst_decode_stream(codes_b, lits_b, table)
        lengths = bitunpack(lens_b, meta["lw"], n).astype(np.int64)
        return StringBlob(lengths, data)


class FsstZstdCodec(FsstCodec):
    name = "fsst_zstd"
    _post_zstd = True
