"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The image/audio codec libraries are not installed in this container, so the
*decode kernel* is stubbed: ``RealDecoder`` raises ``NotImplementedError``
with the exact call shape a PIL/libsndfile implementation would use, and
``FakeDecoder`` produces a deterministic pseudo-decode (seeded from the
payload bytes) so the Ray-side plumbing — schema, actor signature, batch
sizing, output layout — is real and tested end-to-end.

Scale notes: binary payloads are large, so stages here run with SMALL
``batch_size`` (payload_bytes × batch_size × concurrency must fit the worker
heap) and ``batch_format="pyarrow"`` to keep payloads zero-copy in the
object store until the decode actor touches them.
"""

from __future__ import annotations

import hashlib

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


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media payloads (seeded bytes) in MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = np.where(rng.random(n) < 0.5, "image", "audio")
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(256, 4096, n)]
    w = np.where(kinds == "image", rng.integers(16, 256, n), -1).astype(np.int32)
    h = np.where(kinds == "image", rng.integers(16, 256, n), -1).astype(np.int32)
    sr = np.where(kinds == "audio", 16000, -1).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(w),
            "height": pa.array(h),
            "sample_rate": pa.array(sr),
        }
    )


class RealDecoder:
    """The production decode stage — requires PIL / soundfile, absent here."""

    def __init__(self):
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "production impl: PIL.Image.open(io.BytesIO(payload)).convert('RGB') "
            "for images, soundfile.read(io.BytesIO(payload)) for audio. "
            "Use FakeDecoder for plumbing tests."
        )


class FakeDecoder:
    """Actor-pool decode/feature stage with a deterministic pseudo-decode:
    features are derived from a SHA-256 of the payload, so outputs are
    stable across runs/processes — making the full multimodal pipeline
    testable without codec libraries."""

    def __init__(self, feature_dim: int = 8):
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


def media_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    """Decode/feature-extract pipeline: small batches, actor pool, arrow
    batches in and out."""
    return ds.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
