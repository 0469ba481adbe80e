"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode paths:

- ``RealDecoder`` — a GENUINE decode kernel for the container-friendly
  formats that need no codec library: WAV (RIFF PCM16 — header walk +
  ``np.frombuffer``), PPM P6 (ASCII header + raw RGB) and 24-bit
  uncompressed BMP (BITMAPINFOHEADER walk, row padding, BGR order,
  bottom-up or top-down). Features are real
  signal statistics (dims/sample counts, channel means, RMS, zero-crossing
  rate). Formats that genuinely need PIL/libsndfile (JPEG/PNG/MP3/FLAC)
  raise ``NotImplementedError`` with the exact production call shape.
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
            # alternate image container: PPM P6 and 24-bit BMP
            payloads.append(encode_ppm(px) if rng.random() < 0.5 else encode_bmp(px))
            ws.append(w); hs.append(h); srs.append(-1)
        else:
            n_s = int(rng.integers(128, 2049))
            samples = rng.integers(-20000, 20000, n_s, dtype=np.int16)
            payloads.append(encode_wav(samples, 16000))
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
    """Actor-pool decode/feature stage with GENUINE decode kernels for
    WAV (RIFF PCM16), PPM P6 and 24-bit BMP — pure numpy, no codec
    libraries. Feature
    vector (FEATURE_DIM floats):

    - image: [width, height, 3, mean_r/255, mean_g/255, mean_b/255,
      std/255, 0]
    - audio: [n_samples, sample_rate, channels, rms (of full-scale),
      zero_crossing_rate, peak (of full-scale), 0, 1]

    JPEG/PNG/MP3/FLAC payloads raise NotImplementedError (production impl:
    ``PIL.Image.open(io.BytesIO(p)).convert('RGB')`` /
    ``soundfile.read(io.BytesIO(p))``)."""

    def _features(self, payload: bytes) -> np.ndarray:
        f = np.zeros(FEATURE_DIM, dtype=np.float64)
        if payload[:2] in (b"P6", b"BM"):
            px = decode_ppm(payload) if payload[:2] == b"P6" else decode_bmp(payload)
            h, w, _ = px.shape
            means = px.reshape(-1, 3).mean(axis=0) / 255.0
            f[:7] = [w, h, 3, means[0], means[1], means[2], px.std() / 255.0]
        elif payload[:4] == b"RIFF":
            samples, rate = decode_wav(payload)
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
            raise NotImplementedError(
                "only WAV(PCM16)/PPM(P6)/BMP(24-bit) decodable without codec libraries; "
                "production impl: PIL.Image.open(io.BytesIO(payload)) for "
                "images, soundfile.read(io.BytesIO(payload)) for audio"
            )
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
    """Actor-pool transform stage over REAL payloads: images are decoded,
    nearest-neighbor-resized to ``thumb x thumb`` and re-encoded as PPM
    (the thumbnail lane); audio is decoded and reduced to a per-frame RMS
    envelope (the frame-sample lane). Same small-batch / arrow-zero-copy
    shape as the feature stage; formats needing codec libraries raise with
    the production call shape (see RealDecoder)."""

    def __init__(self, thumb: int = 16, frame_ms: int = 20, hop_ms: int = 10):
        self.thumb = thumb
        self.frame_ms = frame_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, envs = [], []
        for p in batch.column("payload"):
            payload = p.as_py()
            if payload[:2] in (b"P6", b"BM"):
                px = (
                    decode_ppm(payload) if payload[:2] == b"P6"
                    else decode_bmp(payload)
                )
                outs.append(encode_ppm(resize_image(px, self.thumb, self.thumb)))
                envs.append([])
            elif payload[:4] == b"RIFF":
                samples, rate = decode_wav(payload)
                outs.append(b"")
                envs.append(
                    audio_frame_rms(samples, rate, self.frame_ms, self.hop_ms)
                    .tolist()
                )
            else:
                raise NotImplementedError(
                    "only WAV(PCM16)/PPM(P6)/BMP(24-bit) decodable without "
                    "codec libraries (production: PIL / soundfile)"
                )
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
