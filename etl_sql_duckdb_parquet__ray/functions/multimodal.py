"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode paths:

- ``RealDecoder`` — GENUINE decode kernels, no codec library: WAV (RIFF
  PCM16 — header walk + ``np.frombuffer``), PPM P6 (ASCII header + raw
  RGB), 24-bit uncompressed BMP (BITMAPINFOHEADER walk, row padding, BGR
  order, bottom-up or top-down) and PNG (8-bit gray/gray+alpha/RGB/RGBA/
  palette — chunk walk with CRC checks, stdlib ``zlib`` IDAT inflate, all
  five scanline defilters including Paeth). Features are real signal
  statistics (dims/sample counts, channel means, RMS, zero-crossing rate).
  Baseline JPEG (SOF0: Huffman entropy decode, batched IDCT, 4:4:4/4:2:2/
  4:2:0 chroma upsampling) decodes genuinely too — see ``jpeg.py``.
  Decoders live in a pluggable registry (``register_image_decoder`` /
  ``register_audio_decoder``); formats that genuinely need PIL/libsndfile
  (progressive JPEG/MP3/FLAC) raise ``NotImplementedError`` naming the
  registration call shape, and PIL/soundfile auto-register where
  importable (outranking the built-ins).
- ``FakeDecoder`` — deterministic pseudo-decode (seeded from payload bytes)
  for plumbing tests on arbitrary payloads.

Scale notes: binary payloads are large, so stages here run with SMALL
``batch_size`` (payload_bytes × batch_size × concurrency must fit the worker
heap) and ``batch_format="pyarrow"`` to keep payloads zero-copy in the
object store until the decode actor touches them.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # images; -1 for audio
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; -1 for images
    ]
)

FEATURE_DIM = 8


# ---------------------------------------------------------------------------
# pure-numpy codecs (no external libraries): WAV/RIFF PCM16 and PPM P6
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono/stereo int16 PCM → RIFF WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAVE PCM16 → (samples [n, channels] int16, sample_rate).
    Walks the chunk list (some writers put LIST/INFO chunks before data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (fmt={audio_fmt}, bits={bits}); "
            "production impl: soundfile.read(io.BytesIO(payload))"
        )
    n = len(data) // (2 * channels)
    samples = np.frombuffer(data[: n * 2 * channels], dtype="<i2").reshape(
        n, channels
    )
    return samples, rate


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 → PPM P6 bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 → HxWx3 uint8 (handles comments/whitespace in the header)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval; '#' starts a comment
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → HxWx3 uint8 RGB (bottom-up or top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed (BI_RGB) BMP")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 4, level: int = 6) -> bytes:
    """HxW (gray), HxWx2 (gray+alpha), HxWx3 (RGB) or HxWx4 (RGBA) uint8 →
    PNG bytes (8-bit, non-interlaced, one IDAT). The scanline filter
    (0=None 1=Sub 2=Up 3=Average 4=Paeth, RFC 2083 §6) is applied to every
    row; filtering is fully vectorized because the predictors read RAW
    neighbor bytes — only the DECODE side has the sequential dependency."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad PNG filter type {filter_type}")
    raw = px.reshape(h, w * c).astype(np.int16)
    left = np.zeros_like(raw)
    left[:, c:] = raw[:, :-c]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, c:] = raw[:-1, :-c]
    if filter_type == 0:
        pred = np.zeros_like(raw)
    elif filter_type == 1:
        pred = left
    elif filter_type == 2:
        pred = up
    elif filter_type == 3:
        pred = (left + up) >> 1
    else:  # Paeth
        p = left + up - ul
        da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((da <= db) & (da <= dc), left, np.where(db <= dc, up, ul))
    filt = ((raw - pred) % 256).astype(np.uint8)
    lines = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), filt], axis=1
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(lines.tobytes(), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → HxWxC uint8 (C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA; palette
    images come back expanded to RGB). Real stdlib decode: chunk walk with
    CRC verification, one ``zlib.decompress`` over the concatenated IDATs,
    then per-row defilter. Sub(1) defilters as a vectorized per-lane prefix
    sum mod 256 and Up(2) as one add; Average(3)/Paeth(4) are inherently
    sequential along the row (the predictor reads the just-reconstructed
    left neighbor) so they loop per pixel with the byte lanes vectorized —
    fine for thumbnails/test assets; a production stage registers a codec-
    library decoder via ``register_image_decoder`` for bulk JPEG/PNG.

    Supports 8-bit depth, non-interlaced only (16-bit and Adam7 raise
    NotImplementedError with the production call shape)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, trns, idat = 8, None, None, None, []
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt_m, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt_m != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} unsupported here; "
            "production impl: register_image_decoder('pil', ..., "
            "lambda p: np.asarray(PIL.Image.open(io.BytesIO(p))))"
        )
    c = _PNG_CHANNELS.get(color)
    if c is None:
        raise ValueError(f"bad PNG color type {color}")
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG IDAT truncated")
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    ftypes = lines[:, 0]
    data = lines[:, 1:].astype(np.int32)
    out = np.empty((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(ftypes[y]), data[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = (row.reshape(w, c).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f in (3, 4):
            rv = row.reshape(w, c)
            pv = prior.reshape(w, c)
            rec2 = np.empty((w, c), dtype=np.int32)
            left = np.zeros(c, dtype=np.int32)
            if f == 3:  # Average
                for x in range(w):
                    left = (rv[x] + ((left + pv[x]) >> 1)) % 256
                    rec2[x] = left
            else:  # Paeth
                ulv = np.zeros(c, dtype=np.int32)
                for x in range(w):
                    p = left + pv[x] - ulv
                    da, db, dc = (
                        np.abs(p - left),
                        np.abs(p - pv[x]),
                        np.abs(p - ulv),
                    )
                    pred = np.where(
                        (da <= db) & (da <= dc),
                        left,
                        np.where(db <= dc, pv[x], ulv),
                    )
                    left = (rv[x] + pred) % 256
                    ulv = pv[x]
                    rec2[x] = left
            rec = rec2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter byte {f} on row {y}")
        out[y] = rec
        prior = rec
    px = out.astype(np.uint8).reshape(h, w, c)
    if color == 3:  # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return px


def rgb_view(px: np.ndarray) -> np.ndarray:
    """Any decoded image layout → HxWx3 RGB (gray broadcast, alpha dropped)."""
    if px.ndim == 2:
        px = px[:, :, None]
    c = px.shape[2]
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]


# ---------------------------------------------------------------------------
# pluggable decoder registry: the seam where codec-library decoders
# (PIL/cv2/soundfile) plug in without touching the pipeline stages.
# Entries are (name, sniff(payload)->bool, decode); first sniff match wins,
# user registrations take priority over the built-ins.
# ---------------------------------------------------------------------------

IMAGE_DECODERS: list[tuple] = []
AUDIO_DECODERS: list[tuple] = []


def register_image_decoder(name: str, sniff, decode) -> None:
    """``decode(payload: bytes) -> np.ndarray`` (HxW[xC] uint8). Later
    registrations outrank earlier ones (and the built-ins)."""
    IMAGE_DECODERS.insert(0, (name, sniff, decode))


def register_audio_decoder(name: str, sniff, decode) -> None:
    """``decode(payload: bytes) -> (samples [n, channels], sample_rate)``."""
    AUDIO_DECODERS.insert(0, (name, sniff, decode))


def decode_image(payload: bytes) -> np.ndarray:
    for name, sniff, decode in IMAGE_DECODERS:
        if sniff(payload):
            return decode(payload)
    raise NotImplementedError(
        "no registered decoder sniffs this image payload "
        f"(registered: {[n for n, _, _ in IMAGE_DECODERS]}); production "
        "impl: register_image_decoder('pil', sniff, lambda p: "
        "np.asarray(PIL.Image.open(io.BytesIO(p)).convert('RGB')))"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    for name, sniff, decode in AUDIO_DECODERS:
        if sniff(payload):
            return decode(payload)
    raise NotImplementedError(
        "no registered decoder sniffs this audio payload "
        f"(registered: {[n for n, _, _ in AUDIO_DECODERS]}); production "
        "impl: register_audio_decoder('soundfile', sniff, lambda p: "
        "soundfile.read(io.BytesIO(p)))"
    )


def sniff_image(payload: bytes) -> bool:
    return any(sniff(payload) for _, sniff, _ in IMAGE_DECODERS)


def sniff_audio(payload: bytes) -> bool:
    return any(sniff(payload) for _, sniff, _ in AUDIO_DECODERS)


# built-ins (pure numpy/stdlib, genuinely decode their formats)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: E402  (registry wiring)

register_image_decoder("bmp24", lambda p: p[:2] == b"BM", decode_bmp)
register_image_decoder("ppm6", lambda p: p[:2] == b"P6", decode_ppm)
register_image_decoder("png", lambda p: p[:8] == _PNG_SIG, decode_png)
register_image_decoder(
    "jpeg_baseline", lambda p: p[:3] == b"\xff\xd8\xff", decode_jpeg
)
register_audio_decoder(
    "wav_pcm16", lambda p: p[:4] == b"RIFF" and p[8:12] == b"WAVE", decode_wav
)
from .flac import decode_flac, encode_flac  # noqa: E402  (registry wiring)

register_audio_decoder("flac16", lambda p: p[:4] == b"fLaC", decode_flac)

# codec-library decoders when available (not in this container; the
# registration is the production seam for JPEG/MP3/FLAC)
try:  # pragma: no cover - PIL absent here
    import io as _io

    from PIL import Image as _PILImage

    register_image_decoder(
        "pil_jpeg",
        lambda p: p[:3] == b"\xff\xd8\xff",
        lambda p: np.asarray(_PILImage.open(_io.BytesIO(p)).convert("RGB")),
    )
except ImportError:
    pass
try:  # pragma: no cover - soundfile absent here
    import io as _io2

    import soundfile as _sf

    def _sf_decode(p: bytes):
        data, rate = _sf.read(_io2.BytesIO(p), dtype="int16", always_2d=True)
        return data, rate

    register_audio_decoder(
        "soundfile_flac", lambda p: p[:4] == b"fLaC", _sf_decode
    )
except ImportError:
    pass


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic media payloads in MEDIA_SCHEMA — REAL format bytes
    (RIFF/PCM16 WAV for audio, P6 PPM for images) so the decode kernel is
    exercised genuinely, not just the plumbing."""
    rng = np.random.default_rng(seed)
    kinds = np.where(rng.random(n) < 0.5, "image", "audio")
    payloads, ws, hs, srs = [], [], [], []
    for k in kinds:
        if k == "image":
            w, h = int(rng.integers(4, 33)), int(rng.integers(4, 33))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            # rotate image containers: PPM P6, 24-bit BMP, PNG (RGB, the
            # filter type cycling through all five defilter paths),
            # grayscale PNG, and baseline JPEG (4:4:4 and 4:2:0)
            pick = rng.integers(0, 6)
            if pick == 0:
                payloads.append(encode_ppm(px))
            elif pick == 1:
                payloads.append(encode_bmp(px))
            elif pick == 2:
                payloads.append(encode_png(px, filter_type=int(rng.integers(0, 5))))
            elif pick == 3:
                payloads.append(
                    encode_png(px[:, :, 0], filter_type=int(rng.integers(0, 5)))
                )
            else:
                payloads.append(
                    encode_jpeg(
                        px, quality=95,
                        subsampling="444" if pick == 4 else "420",
                    )
                )
            ws.append(w); hs.append(h); srs.append(-1)
        else:
            n_s = int(rng.integers(128, 2049))
            samples = rng.integers(-20000, 20000, n_s, dtype=np.int16)
            # alternate audio containers: WAV (PCM16) and FLAC (lossless —
            # identical samples either way)
            if rng.random() < 0.5:
                payloads.append(encode_wav(samples, 16000))
            else:
                payloads.append(encode_flac(samples, 16000, block_size=1024))
            ws.append(-1); hs.append(-1); srs.append(16000)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(np.array(ws, dtype=np.int32)),
            "height": pa.array(np.array(hs, dtype=np.int32)),
            "sample_rate": pa.array(np.array(srs, dtype=np.int32)),
        }
    )


class RealDecoder:
    """Actor-pool decode/feature stage over the pluggable decoder registry;
    the built-ins are GENUINE pure-numpy/stdlib kernels for WAV (RIFF
    PCM16), PPM P6, 24-bit BMP and PNG (8-bit gray/RGB/RGBA/palette, zlib
    inflate + full defilter). Feature vector (FEATURE_DIM floats):

    - image: [width, height, 3, mean_r/255, mean_g/255, mean_b/255,
      std/255, 0]
    - audio: [n_samples, sample_rate, channels, rms (of full-scale),
      zero_crossing_rate, peak (of full-scale), 0, 1]

    Baseline JPEG (jpeg.py) and FLAC (flac.py) decode natively via the
    registry; progressive JPEG and MP3 raise NotImplementedError unless a
    codec-library decoder is registered (``register_image_decoder`` /
    ``register_audio_decoder`` — the PIL/soundfile registrations at module
    scope activate automatically where those libraries exist)."""

    def _features(self, payload: bytes) -> np.ndarray:
        f = np.zeros(FEATURE_DIM, dtype=np.float64)
        if sniff_image(payload):
            px = rgb_view(decode_image(payload))
            h, w, _ = px.shape
            means = px.reshape(-1, 3).mean(axis=0) / 255.0
            f[:7] = [w, h, 3, means[0], means[1], means[2], px.std() / 255.0]
        elif sniff_audio(payload):
            samples, rate = decode_audio(payload)
            x = samples.astype(np.float64) / 32768.0
            mono = x.mean(axis=1)
            zcr = (
                float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                if len(mono) > 1 else 0.0
            )
            f[:6] = [
                samples.shape[0], rate, samples.shape[1],
                float(np.sqrt((x * x).mean())), zcr, float(np.abs(x).max()),
            ]
            f[7] = 1.0
        else:
            # unknown container: decode_image's error names the registered
            # decoders and the registration call shape
            decode_image(payload)
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        feats = [self._features(p.as_py()) for p in payloads]
        n_bytes = pa.array([len(p.as_py()) for p in payloads], type=pa.int64())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": n_bytes,
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


class FakeDecoder:
    """Actor-pool decode/feature stage with a deterministic pseudo-decode:
    features are derived from a SHA-256 of the payload, so outputs are
    stable across runs/processes — making the full multimodal pipeline
    testable on ARBITRARY payload bytes (formats RealDecoder rejects)."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.feature_dim * 8) // len(digest) + 1))[: self.feature_dim * 8], dtype=np.uint64)
        return (raw % 1000).astype(np.float64) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p.as_py()) for p in batch.column("payload")]
        n_bytes = pa.array(
            [len(p.as_py()) for p in batch.column("payload")], type=pa.int64()
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": n_bytes,
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64())),
            }
        )


def media_features(ds, batch_size: int = 64, concurrency=(1, 4),
                   decoder: str = "real"):
    """Decode/feature-extract pipeline: small batches, actor pool, arrow
    batches in and out. ``decoder="real"`` runs the genuine WAV/PPM kernels;
    ``"fake"`` runs the hash pseudo-decode (any payload bytes)."""
    cls = RealDecoder if decoder == "real" else FakeDecoder
    return ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# transform kernels: resize / frame-sample (pure numpy, actor-pool stage)
# ---------------------------------------------------------------------------

def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (one fancy-gather — the decode
    lane of a thumbnail stage; production impl swaps in PIL/cv2 bilinear
    with the same (H, W, 3) -> (out_h, out_w, 3) contract)."""
    h, w, _ = px.shape
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[ri[:, None], ci[None, :], :]


def audio_frame_rms(samples: np.ndarray, rate: int, frame_ms: int = 20,
                    hop_ms: int = 10) -> np.ndarray:
    """Per-frame RMS envelope (float64, full-scale units) over sliding
    windows — the frame-sample primitive of audio featurization. Vectorized
    via a cumsum of squares; frames shorter than frame_len at the tail are
    dropped (standard STFT convention)."""
    x = samples.astype(np.float64) / 32768.0
    if x.ndim == 2:
        x = x.mean(axis=1)
    frame = max(int(rate * frame_ms / 1000), 1)
    hop = max(int(rate * hop_ms / 1000), 1)
    if len(x) < frame:
        return np.empty(0, dtype=np.float64)
    cs = np.concatenate(([0.0], np.cumsum(x * x)))
    starts = np.arange(0, len(x) - frame + 1, hop)
    return np.sqrt((cs[starts + frame] - cs[starts]) / frame)


class MediaTransformer:
    """Actor-pool transform stage over REAL payloads: images are decoded
    (via the pluggable registry), nearest-neighbor-resized to ``thumb x
    thumb`` and re-encoded in their input container (PNG in -> PNG thumb,
    else PPM); audio is decoded and reduced to a per-frame RMS envelope
    (the frame-sample lane). Same small-batch / arrow-zero-copy shape as
    the feature stage; formats needing codec libraries raise with the
    registration call shape (see RealDecoder)."""

    def __init__(self, thumb: int = 16, frame_ms: int = 20, hop_ms: int = 10):
        self.thumb = thumb
        self.frame_ms = frame_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, envs = [], []
        for p in batch.column("payload"):
            payload = p.as_py()
            if sniff_image(payload):
                px = rgb_view(decode_image(payload))
                thumb = resize_image(px, self.thumb, self.thumb)
                # match the input container: PNG in -> PNG thumbnail out,
                # JPEG in -> JPEG out, everything else re-encodes as PPM
                if payload[:8] == _PNG_SIG:
                    outs.append(encode_png(thumb, filter_type=2))
                elif payload[:3] == b"\xff\xd8\xff":
                    outs.append(encode_jpeg(thumb, quality=90))
                else:
                    outs.append(encode_ppm(thumb))
                envs.append([])
            elif sniff_audio(payload):
                samples, rate = decode_audio(payload)
                outs.append(b"")
                envs.append(
                    audio_frame_rms(samples, rate, self.frame_ms, self.hop_ms)
                    .tolist()
                )
            else:
                decode_image(payload)  # raises with the registration shape
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "thumbnail": pa.array(outs, type=pa.large_binary()),
                "rms_envelope": pa.array(envs, type=pa.list_(pa.float64())),
            }
        )


def media_transform(ds, thumb: int = 16, batch_size: int = 64,
                    concurrency=(1, 4)):
    """Thumbnail + frame-sample pipeline over a media Dataset (small
    batches — large binary payloads — actor pool, arrow in/out)."""
    return ds.map_batches(
        MediaTransformer,
        fn_constructor_kwargs={"thumb": thumb},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def thumbnail_summary_reference(n: int = 512, thumb: int = 16,
                                frame_ms: int = 20,
                                hop_ms: int = 10) -> pa.Table:
    """Single-process ORACLE MIRROR of the distributed thumbnail pipeline:
    a plain Python loop over :func:`synth_media_table` — no Ray, no actor
    pool, no batching — reduced to the deterministic hashable columns
    ``(media_id, kind, thumb_w, thumb_h, thumb_len, thumb_crc32, env_len,
    env_mean_micro)``. The decoders/encoders are deterministic pure numpy,
    so these checksums are stable across runs and processes; the driver's
    value-hash compare against the Ray pipeline then pins the distributed
    plumbing (actor batching, union order, arrow conversion) bit-exactly.
    Thumbnail dims come from RE-DECODING the emitted thumbnail, proving the
    re-encode is parseable, not just byte-stable."""
    import zlib

    media = synth_media_table(n)
    ids, kinds = media.column("media_id").to_pylist(), media.column("kind").to_pylist()
    rows = {k: [] for k in ("media_id", "kind", "thumb_w", "thumb_h",
                            "thumb_len", "thumb_crc32", "env_len",
                            "env_mean_micro")}
    for mid, kind, pay in zip(ids, kinds, media.column("payload")):
        payload = pay.as_py()
        rows["media_id"].append(mid)
        rows["kind"].append(kind)
        if sniff_image(payload):
            px = rgb_view(decode_image(payload))
            tpx = resize_image(px, thumb, thumb)
            if payload[:8] == _PNG_SIG:
                out = encode_png(tpx, filter_type=2)
            elif payload[:3] == b"\xff\xd8\xff":
                out = encode_jpeg(tpx, quality=90)
            else:
                out = encode_ppm(tpx)
            h, w, _ = rgb_view(decode_image(out)).shape
            rows["thumb_w"].append(w)
            rows["thumb_h"].append(h)
            rows["thumb_len"].append(len(out))
            rows["thumb_crc32"].append(zlib.crc32(out))
            rows["env_len"].append(-1)
            rows["env_mean_micro"].append(-1)
        else:
            samples, rate = decode_audio(payload)
            env = audio_frame_rms(samples, rate, frame_ms, hop_ms)
            rows["thumb_w"].append(-1)
            rows["thumb_h"].append(-1)
            rows["thumb_len"].append(-1)
            rows["thumb_crc32"].append(-1)
            rows["env_len"].append(len(env))
            rows["env_mean_micro"].append(
                int(np.floor(env.mean() * 1_000_000)) if len(env) else -1
            )
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "thumb_w": pa.array(rows["thumb_w"], pa.int64()),
        "thumb_h": pa.array(rows["thumb_h"], pa.int64()),
        "thumb_len": pa.array(rows["thumb_len"], pa.int64()),
        "thumb_crc32": pa.array(rows["thumb_crc32"], pa.int64()),
        "env_len": pa.array(rows["env_len"], pa.int64()),
        "env_mean_micro": pa.array(rows["env_mean_micro"], pa.int64()),
    })
