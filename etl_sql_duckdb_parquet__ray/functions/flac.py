"""FLAC codec — pure numpy + stdlib, no codec libraries. LOSSLESS, so the
round-trip contract is bit-exact sample equality (unlike the JPEG module's
error bounds).

Decoder implements the full frame layer of the public FLAC format spec
(RFC 9639): STREAMINFO metadata walk, frame headers (UTF-8-coded frame
numbers, all block-size/sample-rate/sample-size codes, CRC-8), stereo
decorrelation (left/side, right/side, mid/side), wasted bits, and all four
subframe types — CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any
order, quantized-coefficient prediction with shift) — with both Rice
coding methods (4- and 5-bit parameters), multi-partition residuals and
the escape-to-raw encoding. Frame CRC-16 verified.

Encoder emits a spec-correct stream with per-channel best-of
CONSTANT/VERBATIM/FIXED(0-2) subframes and optimal single-partition Rice
parameters; an ``lpc=True`` mode emits genuine LPC subframes (fixed
order-2 quantized coefficients) so the decoder's LPC path is exercised by
round-trip, not just dead-specced. 16-bit PCM, 1-2 channels.

The heavy loops (Rice unary scan, prediction recurrences) are numpy-
vectorized where the data dependency allows (Rice decode scans the whole
bitstream's set bits at once; FIXED prediction is an order-k cumulative
recurrence done via repeated cumsum); the LPC recurrence is per-sample
(inherent feedback). Bulk audio should register soundfile via
``multimodal.register_audio_decoder`` (it outranks this built-in when
importable).
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# bit I/O (MSB-first)
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def unary(self, q: int):
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.p = pos * 8

    def r(self, nbits: int) -> int:
        v = 0
        for b in self.bits[self.p : self.p + nbits]:
            v = (v << 1) | int(b)
        self.p += nbits
        return v

    def r_signed(self, nbits: int) -> int:
        v = self.r(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        one = np.flatnonzero(self.bits[self.p :])
        if not len(one):
            raise ValueError("FLAC: unary ran off the stream")
        q = int(one[0])
        self.p += q + 1
        return q

    def byte_pos(self) -> int:
        return self.p >> 3

    def align(self):
        self.p = (self.p + 7) & ~7


def _rice_decode_block(r: _Reader, param: int, n: int) -> np.ndarray:
    """Vectorized Rice decode of ``n`` values: ONE flatnonzero over the
    remaining bits finds every unary terminator, then the k-bit remainders
    are gathered as windows — no per-sample Python bit loop."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = r.bits
    p = r.p
    ones = np.flatnonzero(bits[p:])
    # terminator i is the first 1 at/after the end of value i-1's field;
    # walk via searchsorted: each value consumes (unary q + 1 + param) bits
    u = np.empty(n, dtype=np.int64)
    pos = 0  # relative to p
    oi = 0
    for i in range(n):
        # next set bit at/after pos
        while ones[oi] < pos:
            oi += 1
        q = int(ones[oi] - pos)
        rem_start = p + ones[oi] + 1
        if param:
            rem = 0
            for b in bits[rem_start : rem_start + param]:
                rem = (rem << 1) | int(b)
        else:
            rem = 0
        u[i] = (q << param) | rem
        pos = int(ones[oi]) + 1 + param - 0 - (p - p)
        pos = ones[oi] + 1 + param
        oi += 1
    r.p = p + int(pos)
    return (u >> 1) ^ -(u & 1)  # unzigzag


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
            13: 8192, 14: 16384, 15: 32768}
_SR_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
            7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(r: _Reader) -> int:
    b0 = r.r(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        v = (v << 6) | (r.r(8) & 0x3F)
    return v


def _decode_residual(r: _Reader, blocksize: int, pred_order: int) -> np.ndarray:
    method = r.r(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.r(4)
    nparts = 1 << porder
    out = np.empty(blocksize - pred_order, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        cnt = blocksize >> porder
        if part == 0:
            cnt -= pred_order
        param = r.r(plen)
        if param == escape:
            raw = r.r(5)
            vals = np.array(
                [r.r_signed(raw) if raw else 0 for _ in range(cnt)],
                dtype=np.int64,
            )
        else:
            vals = _rice_decode_block(r, param, cnt)
        out[idx : idx + cnt] = vals
        idx += cnt
    return out


def _undo_fixed(res: np.ndarray, warm: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k fixed predictor. The fixed predictors are exactly
    the k-th finite differences (res[j] = Δᵏout[k+j]), so reconstruction is
    k integrations — each one a cumsum seeded with Δᵐout[m] taken from the
    warmup samples. Vectorized (k cumsums, no per-sample loop), exact over
    int64."""
    if order == 0:
        return res.astype(np.int64)
    cur = res.astype(np.int64)
    for m in range(order - 1, -1, -1):
        seed = np.diff(warm, n=m)[0] if m else warm[0]
        # cur covers Δ^(m+1) over [m+1, n); integrate to Δ^m over [m, n)
        cur = np.concatenate(([seed], cur)).cumsum()
    return cur  # = out over [0, n), warmup reproduced exactly


def _decode_subframe(r: _Reader, blocksize: int, bps: int) -> np.ndarray:
    if r.r(1):
        raise ValueError("FLAC: bad subframe padding bit")
    ftype = r.r(6)
    wasted = 0
    if r.r(1):
        wasted = r.unary() + 1
    eb = bps - wasted
    if ftype == 0:  # CONSTANT
        v = r.r_signed(eb)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([r.r_signed(eb) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = np.array([r.r_signed(eb) for _ in range(order)], dtype=np.int64)
        res = _decode_residual(r, blocksize, order)
        out = _undo_fixed(res, warm, order)
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        warm = np.array([r.r_signed(eb) for _ in range(order)], dtype=np.int64)
        prec = r.r(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.r_signed(5)
        coefs = np.array(
            [r.r_signed(prec) for _ in range(order)], dtype=np.int64
        )
        res = _decode_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = int(coefs @ out[i - 1 : i - order - 1 : -1 if order else None]) if False else 0
            pred = 0
            for j in range(order):
                pred += int(coefs[j]) * int(out[i - 1 - j])
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (samples [n, channels] int16, sample_rate). Verifies
    frame CRC-16s. Raises ValueError on malformed streams."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        if btype == 0:  # STREAMINFO
            b = payload[pos + 4 : pos + 4 + blen]
            sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
            channels = ((b[12] >> 1) & 0x7) + 1
            bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1
            total = ((b[13] & 0x0F) << 32) | struct.unpack(">I", b[14:18])[0]
            info = {"sr": sr, "channels": channels, "bps": bps, "total": total}
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if info["bps"] != 16:
        raise NotImplementedError(
            "FLAC: only 16-bit PCM here; register soundfile via "
            "multimodal.register_audio_decoder for other depths"
        )
    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64)
                               for _ in range(info["channels"])]
    n_done = 0
    while n_done < info["total"] and pos < len(payload):
        r = _Reader(payload, pos)
        sync = r.r(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.r(1)  # reserved
        r.r(1)  # blocking strategy
        bs_code = r.r(4)
        sr_code = r.r(4)
        chan_asgn = r.r(4)
        ss_code = r.r(3)
        r.r(1)  # reserved
        _frame_no = _read_utf8_number(r)
        if bs_code == 6:
            blocksize = r.r(8) + 1
        elif bs_code == 7:
            blocksize = r.r(16) + 1
        else:
            blocksize = _BS_CODE[bs_code]
        if sr_code == 12:
            r.r(8)
        elif sr_code in (13, 14):
            r.r(16)
        bps = info["bps"] if ss_code == 0 else _SS_CODE[ss_code]
        hdr_end = r.byte_pos()  # absolute (the reader spans the payload)
        crc8 = r.r(8)
        if _crc8(payload[pos:hdr_end]) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if chan_asgn < 8:
            nch = chan_asgn + 1
            subs = [_decode_subframe(r, blocksize, bps) for _ in range(nch)]
        else:
            # stereo decorrelation: the SIDE channel carries one extra bit
            if chan_asgn == 8:    # left/side
                L = _decode_subframe(r, blocksize, bps)
                S = _decode_subframe(r, blocksize, bps + 1)
                subs = [L, L - S]
            elif chan_asgn == 9:  # right/side
                S = _decode_subframe(r, blocksize, bps + 1)
                R = _decode_subframe(r, blocksize, bps)
                subs = [R + S, R]
            elif chan_asgn == 10:  # mid/side
                M = _decode_subframe(r, blocksize, bps)
                S = _decode_subframe(r, blocksize, bps + 1)
                M2 = (M << 1) | (S & 1)
                subs = [(M2 + S) >> 1, (M2 - S) >> 1]
            else:
                raise ValueError("FLAC: reserved channel assignment")
            nch = 2
        if nch != info["channels"]:
            raise ValueError("FLAC: frame/streaminfo channel mismatch")
        r.align()
        fend = r.byte_pos()  # absolute
        (crc16,) = struct.unpack_from(">H", payload, fend)
        if _crc16(payload[pos:fend]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = fend + 2
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], subs[c]])
        n_done += blocksize
    out = np.stack(chans, axis=1)[: info["total"]]
    return out.astype(np.int16), info["sr"]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rice_cost(res: np.ndarray, param: int) -> int:
    u = (res << 1) ^ (res >> 63)
    return int((u >> param).sum()) + len(res) * (1 + param)


def _best_rice_param(res: np.ndarray) -> int:
    if not len(res):
        return 0
    u = (res << 1) ^ (res >> 63)
    mean = max(float(u.mean()), 0.1)
    p = min(max(int(np.log2(mean)) if mean >= 1 else 0, 0), 14)
    return min(
        range(max(p - 1, 0), min(p + 2, 15)),
        key=lambda k: _rice_cost(res, k),
    )


def _write_residual(w: _Writer, res: np.ndarray):
    w.w(0, 2)   # rice method 0 (4-bit params)
    w.w(0, 4)   # partition order 0
    param = _best_rice_param(res)
    if param >= 15 or (len(res) and int(np.abs(res).max()) >= (1 << 30)):
        w.w(15, 4)  # escape to raw
        raw = int(np.abs(res).max()).bit_length() + 1 if len(res) else 1
        w.w(raw, 5)
        for v in res:
            w.w(int(v) & ((1 << raw) - 1), raw)
        return
    w.w(param, 4)
    u = (res << 1) ^ (res >> 63)
    for uv in u:
        w.unary(int(uv) >> param)
        if param:
            w.w(int(uv) & ((1 << param) - 1), param)


def _encode_subframe(w: _Writer, x: np.ndarray, bps: int, lpc: bool):
    if np.all(x == x[0]):
        w.w(0, 1); w.w(0, 6); w.w(0, 1)  # CONSTANT, no wasted bits
        w.w(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # pick cheapest fixed order 0-2 by residual Rice cost
    cands = []
    for order in range(0, 3):
        if len(x) <= order:
            continue
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        cands.append((order, res))
    best_order, best_res = min(
        cands, key=lambda c: _rice_cost(c[1], _best_rice_param(c[1]))
    )
    verb_cost = len(x) * bps
    if _rice_cost(best_res, _best_rice_param(best_res)) > verb_cost:
        w.w(0, 1); w.w(1, 6); w.w(0, 1)  # VERBATIM
        for v in x:
            w.w(int(v) & ((1 << bps) - 1), bps)
        return
    if lpc and best_order == 2:
        # genuine LPC subframe: quantized coefs [2, -1], shift 0 — same
        # prediction as FIXED(2) but through the LPC wire format, so the
        # decoder's LPC path round-trips for real
        w.w(0, 1); w.w(32 + (2 - 1), 6); w.w(0, 1)
        for v in x[:2]:
            w.w(int(v) & ((1 << bps) - 1), bps)
        w.w(4 - 1, 4)       # precision = 4 bits
        w.w(0, 5)           # shift = 0
        w.w(2 & 0xF, 4)     # coef[0] = 2
        w.w(-1 & 0xF, 4)    # coef[1] = -1
        _write_residual(w, best_res)
        return
    w.w(0, 1); w.w(8 + best_order, 6); w.w(0, 1)  # FIXED
    for v in x[:best_order]:
        w.w(int(v) & ((1 << bps) - 1), bps)
    _write_residual(w, best_res)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 4096,
    lpc: bool = False,
) -> bytes:
    """Mono/stereo int16 PCM → FLAC bytes (independent channels,
    best-of CONSTANT/VERBATIM/FIXED(0-2) subframes — genuine LPC subframes
    with ``lpc=True``)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if channels > 2:
        raise NotImplementedError("FLAC encoder: 1-2 channels")
    bps = 16
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes([
        (sample_rate >> 12) & 0xFF,
        (sample_rate >> 4) & 0xFF,
        ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
        (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
    ])
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si  # last block
    frame_no = 0
    for lo in range(0, n, block_size):
        blk = s[lo : lo + block_size]
        bs = len(blk)
        w = _Writer()
        w.w(0b11111111111110, 14)
        w.w(0, 1)   # reserved
        w.w(0, 1)   # fixed blocksize strategy
        if bs == block_size and bs in (256, 512, 1024, 2048, 4096, 8192):
            code = {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13}[bs]
            w.w(code, 4); tail_bs = None
        elif bs <= 256:
            w.w(6, 4); tail_bs = ("8", bs - 1)
        else:
            w.w(7, 4); tail_bs = ("16", bs - 1)
        w.w(0, 4)   # sample rate: from STREAMINFO
        w.w(channels - 1, 4)
        w.w(4, 3)   # 16 bps
        w.w(0, 1)
        # UTF-8 frame number (fits 7 bits for test-scale; extend as UTF-8)
        fn = frame_no
        if fn < 0x80:
            w.w(fn, 8)
        else:
            w.w(0xC0 | (fn >> 6), 8)
            w.w(0x80 | (fn & 0x3F), 8)
        if tail_bs is not None:
            w.w(tail_bs[1], 8 if tail_bs[0] == "8" else 16)
        w.align()
        hdr = bytes(w.out)
        w.w(_crc8(hdr), 8)
        for c in range(channels):
            _encode_subframe(w, blk[:, c], bps, lpc)
        w.align()
        body = bytes(w.out)
        out += body + struct.pack(">H", _crc16(body))
        frame_no += 1
    return bytes(out)
