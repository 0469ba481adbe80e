"""From-scratch FSST (Fast Static Symbol Table) string compression.

Public-algorithm implementation (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020): train a table of up to 255 symbols
of 1..8 bytes on a bounded sample by iteratively merging frequent adjacent
token pairs ranked by gain = freq x len; encode greedily longest-match; code
255 marks an escaped literal byte.

Engineering for Python: matching is done by a compiled alternation regex
(longest-first) so the scan runs in C; literals go to a side section so
decode is a single vectorized object-array gather + ``bytes.join`` — no
per-byte Python on the decode path. The column's original string lengths are
bit-packed separately so the blob splits back exactly.

The ``fsst_zstd`` variant zstd-compresses the token/literal sections — the
chunk auto-selector measures both against plain zstd and picks the smallest
(cf. SURVEY.md §7.4 "keep plain+zstd as a fallback the selector can choose").
"""

from __future__ import annotations

import re

import numpy as np

from .base import (
    StringBlob,
    pack_sections,
    unpack_sections,
    zstd_compress,
    zstd_decompress,
)
from .bitpack import bitpack, bitunpack, required_width

_MAX_SYMBOLS = 255  # code 255 reserved as escape marker
_MAX_SYM_LEN = 8
_TRAIN_CAP = 1 << 16
_ITERS = 4


def _compile(table: list[bytes]) -> re.Pattern | None:
    if not table:
        return None
    pats = sorted(table, key=len, reverse=True)
    return re.compile(b"|".join(re.escape(s) for s in pats))


def train_fsst(sample: bytes, iters: int = _ITERS, max_symbols: int = _MAX_SYMBOLS) -> list[bytes]:
    """Iterative symbol-table construction on a bounded sample."""
    sample = sample[:_TRAIN_CAP]
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

    def encode(self, values: StringBlob) -> tuple[bytes, dict]:
        data = values.data
        table = self._shared if self._shared is not None else train_fsst(data)
        pat = _compile(table)
        codes = bytearray()
        lits = bytearray()
        if pat is not None and data:
            code_of = {s: i for i, s in enumerate(table)}
            pos = 0
            for m in pat.finditer(data):
                s, e = m.span()
                if s > pos:
                    gap = data[pos:s]
                    codes.extend(b"\xff" * len(gap))
                    lits.extend(gap)
                codes.append(code_of[m.group()])
                pos = e
            if pos < len(data):
                gap = data[pos:]
                codes.extend(b"\xff" * len(gap))
                lits.extend(gap)
        else:
            codes.extend(b"\xff" * len(data))
            lits.extend(data)
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
            sections = [zstd_compress(s) for s in sections]
        return pack_sections(sections), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> StringBlob:
        sections = unpack_sections(payload)
        if meta["z"]:
            sections = [zstd_decompress(s, r) for s, r in zip(sections, meta["raw"])]
        tbl_b, codes_b, lits_b, lens_b = sections
        table = unpack_sections(tbl_b) if tbl_b else []
        codes = np.frombuffer(codes_b, dtype=np.uint8)
        # fully vectorized decode: pad symbols into a (256, 8) byte matrix,
        # gather rows by code, then boolean-mask-flatten (row-major) — this
        # IS the concatenation, with zero per-token Python (bytes.join over
        # millions of small pieces measures ~5us/item here).
        mat = np.zeros((256, _MAX_SYM_LEN), dtype=np.uint8)
        slen = np.zeros(256, dtype=np.int64)
        for i, s in enumerate(table):
            mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            slen[i] = len(s)
        slen[255] = 1  # escape: one literal byte
        big = mat[codes]
        ln = slen[codes]
        esc = codes == 255
        if esc.any():
            big[esc, 0] = np.frombuffer(lits_b, dtype=np.uint8)
        data = big[np.arange(_MAX_SYM_LEN) < ln[:, None]].tobytes()
        lengths = bitunpack(lens_b, meta["lw"], n).astype(np.int64)
        return StringBlob(lengths, data)


class FsstZstdCodec(FsstCodec):
    name = "fsst_zstd"
    _post_zstd = True
