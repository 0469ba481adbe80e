"""Baseline JPEG (JFIF) codec — pure numpy + stdlib, no codec libraries.

This is a GENUINE implementation of ITU-T T.81 baseline sequential DCT:
marker walk (SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI), canonical Huffman entropy
coding with byte stuffing and restart markers, dequantize + de-zigzag,
vectorized 2-D IDCT over all blocks at once (one matmul pair), chroma
upsampling (4:4:4 / 4:2:2 / 4:2:0) and JFIF YCbCr<->RGB. The encoder emits
baseline JFIF with the Annex-K quantization tables (quality-scaled, IJG
formula) and Annex-K "typical" Huffman tables, at 4:4:4, 4:2:0 or
grayscale.

Scope/honesty notes:
- The bit-serial entropy loop is Python (per-symbol); everything after it
  (dequant, IDCT, color) is vectorized numpy. Fast enough for thumbnails
  and test assets — a bulk-media production stage should register a codec
  library via ``multimodal.register_image_decoder`` (the PIL seam), which
  outranks this built-in when present.
- Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
  modes raise NotImplementedError naming that seam.

Reference: the public T.81 spec (Annex F flowcharts for DECODE/EXTEND,
Annex K tables). No analog in /root/reference (its pipeline is tabular).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, Annex K quant + Huffman tables, DCT basis
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (natural order via zigzag below)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: coefs = C @ pixels @ C.T."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2)
    return C


_C = _dct_matrix()


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> base table, 100 -> all ones."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# Huffman code plumbing
# ---------------------------------------------------------------------------

def _canonical_codes(bits, values):
    """symbol -> (code, length) for a canonical (bits, values) table."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical min/max-code decoder (T.81 F.2.2.3 DECODE)."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits, values):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker and exposes restart handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker is hit

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.acc |= 0  # pad zeros past the end (T.81 allows)
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed data byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via restart()
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        """Consume a restart marker: discard partial bits, skip FF Dn."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        # scan to the marker (pos may sit just before it)
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")


def _decode_huff(r: _BitReader, h: _HuffDecoder) -> int:
    code = r.bit()
    for length in range(1, 17):
        if code <= h.maxcode[length]:
            return h.values[h.valptr[length] + code - h.mincode[length]]
        code = (code << 1) | r.bit()
    raise ValueError("JPEG: bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG → HxWxC uint8 (C=1 gray, C=3 RGB). Raises
    NotImplementedError for progressive/arithmetic/12-bit streams (register
    a codec-library decoder via multimodal.register_image_decoder for
    those)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: bad marker alignment at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=p + 1
                ).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                values = list(seg[p + 17 : p + 17 + cnt])
                dec = _HuffDecoder(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: only baseline sequential (SOF0/1) supported here; "
                "register a codec-library decoder via "
                "multimodal.register_image_decoder for progressive/other"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            data_pos = pos + seglen
            return _decode_scan(
                payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG: no scan data found")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes (in blocks)
    planes = {}
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes[c["id"]] = np.zeros((bh * bw, 64), dtype=np.int32)
    r = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.restart()
                for k in pred:
                    pred[k] = 0
            for comp, td, ta in scan:
                cid = comp["id"]
                bw = mcux * comp["h"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = planes[cid][
                            (my * comp["v"] + by) * bw + mx * comp["h"] + bx
                        ]
                        # DC
                        s = _decode_huff(r, huff_dc[td])
                        diff = _extend(r.receive(s), s) if s else 0
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        # AC
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, huff_ac[ta])
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            blk[k] = _extend(r.receive(ss), ss)
                            k += 1
            mcu_count += 1
    # dequantize + de-zigzag + IDCT, all blocks of a component at once
    out_planes = []
    for c in comps:
        coef = planes[c["id"]].astype(np.float64) * qt[c["tq"]][None, :]
        nat = np.zeros_like(coef)
        nat[:, ZIGZAG] = coef  # zigzag index k lives at natural ZIGZAG[k]
        blocks = nat.reshape(-1, 8, 8)
        pix = _C.T @ blocks @ _C  # batched 2-D IDCT
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest — JFIF centers ignored)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0][:, :, None]
    Y, Cb, Cr = (p.astype(np.float64) for p in out_planes[:3])
    R = Y + 1.402 * (Cr - 128)
    G = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
    B = Y + 1.772 * (Cb - 128)
    return np.clip(np.stack([R, G, B], axis=2).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (T.81 F.1.2.3)


def _mag(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(wtr, blk_zz, pred, dc_codes, ac_codes):
    """Huffman-encode one zigzagged quantized block; returns new DC pred."""
    dc = int(blk_zz[0])
    diff = dc - pred
    s = _mag(diff)
    code, length = dc_codes[s]
    wtr.write(code, length)
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(blk_zz[1:])
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        s = _mag(v)
        code, length = ac_codes[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wtr.write(code, length)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replication), batched forward DCT, quantize,
    zigzag. Returns [n_blocks_y, n_blocks_x, 64] int32 in zigzag order."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((H, W), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    shifted = padded - 128.0
    blocks = (
        shifted.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    )
    coef = _C @ blocks @ _C.T
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int32)
    return qz.reshape(H // 8, W // 8, 64)[:, :, ZIGZAG]


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → baseline JFIF bytes.
    ``subsampling``: "444" (no chroma subsampling) or "420"."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    h, w = px.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
        qtabs = [0]
    else:
        pf = px.astype(np.float64)
        R, G, B = pf[:, :, 0], pf[:, :, 1], pf[:, :, 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128
        if subsampling == "420":
            # average 2x2 (pad odd dims by edge replication first)
            H2, W2 = -(-h // 2) * 2, -(-w // 2) * 2

            def ds(p):
                pp = np.empty((H2, W2))
                pp[:h, :w] = p
                pp[h:, :w] = p[-1:, :]
                pp[:, w:] = pp[:, w - 1 : w]
                return pp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))

            planes = [Y, ds(Cb), ds(Cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [Y, Cb, Cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qtabs = [0, 1, 1]

    # quantized zigzag blocks per component
    zz = [
        _fdct_quant(p, qy if qt == 0 else qc)
        for p, qt in zip(planes, qtabs)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT
    for tq, tbl in ([(0, qy)] if gray else [(0, qy), (1, qc)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(tbl[ZIGZAG].astype(np.uint8))
    # SOF0
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        sh, sv = samps[i]
        out += struct.pack(">BBB", i + 1, (sh << 4) | sv, qtabs[i])
    # DHT
    tables = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += struct.pack(">BB", i + 1, 0x00 if i == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_y = _canonical_codes(*_HT_DC_LUMA)
    ac_y = _canonical_codes(*_HT_AC_LUMA)
    dc_c = _canonical_codes(*_HT_DC_CHROMA)
    ac_c = _canonical_codes(*_HT_AC_CHROMA)
    wtr = _BitWriter()
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                sh, sv = samps[ci]
                dc_codes = dc_y if ci == 0 else dc_c
                ac_codes = ac_y if ci == 0 else ac_c
                zzc = zz[ci]
                for by in range(sv):
                    for bx in range(sh):
                        yy = my * sv + by
                        xx = mx * sh + bx
                        # components smaller than the MCU grid never index
                        # out of range: their block counts ARE mcu counts
                        blk = zzc[min(yy, zzc.shape[0] - 1),
                                  min(xx, zzc.shape[1] - 1)]
                        _encode_block(wtr, blk, pred[ci], dc_codes, ac_codes)
                        pred[ci] = int(blk[0])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
