"""Baseline JPEG codec (pure numpy + stdlib, ITU-T T.81 Annex K tables).

JPEG is lossy, so round-trips assert reconstruction ERROR BOUNDS (tight at
high quality / smooth content) plus exact structural facts: dims, channel
count, marker layout, restart-interval handling, and the graceful
NotImplementedError for progressive streams.
"""
import struct

import numpy as np
import pytest

from etl_sql_duckdb_parquet__ray.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from etl_sql_duckdb_parquet__ray.functions.multimodal import decode_image


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-pin the spec values
    assert ZIGZAG[1] == 1 and ZIGZAG[2] == 8 and ZIGZAG[63] == 63


def test_constant_color_roundtrips_within_one_level():
    px = np.full((16, 24, 3), (120, 64, 200), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=95))
    assert back.shape == (16, 24, 3)
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 75])
def test_gradient_roundtrip_error_bounds(subsampling, quality):
    y, x = np.mgrid[0:40, 0:56]
    px = np.stack(
        [(x * 3) % 256, (y * 2) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=subsampling))
    assert back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int)).mean()
    assert err < (3.0 if subsampling == "444" else 6.0), err


def test_odd_dimensions_and_tiny_images():
    rng = np.random.default_rng(4)
    for h, w in [(1, 1), (3, 5), (7, 9), (17, 23), (8, 8)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ss in ("444", "420"):
            back = decode_jpeg(encode_jpeg(px, quality=95, subsampling=ss))
            assert back.shape == (h, w, 3), (h, w, ss)


def test_grayscale_roundtrip():
    g = (np.outer(np.arange(32), np.arange(40)) % 256).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(g, quality=92))
    assert back.shape == (32, 40, 1)
    assert np.abs(back[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0


def test_noise_worst_case_stays_bounded():
    # random noise is the DCT's worst case; q=95 keeps mean error small
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=95))
    assert np.abs(back.astype(int) - px.astype(int)).mean() < 8.0


def test_quality_monotonicity_in_size_and_error():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes, errs = [], []
    for q in (30, 60, 90):
        b = encode_jpeg(px, quality=q)
        sizes.append(len(b))
        errs.append(np.abs(decode_jpeg(b).astype(int) - px.astype(int)).mean())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_byte_stuffing_survives():
    # images full of value patterns that force 0xFF bytes into the entropy
    # stream exercise the 0xFF00 stuff/unstuff path; any slip desyncs the
    # decoder (wrong dims/garbage), so a clean bounded decode proves it
    rng = np.random.default_rng(11)
    for seed in range(5):
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        b = encode_jpeg(px, quality=98)
        back = decode_jpeg(b)
        assert back.shape == (16, 16, 3)
        assert np.abs(back.astype(int) - px.astype(int)).mean() < 8.0


def test_progressive_raises_not_implemented():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    b = bytearray(encode_jpeg(px))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_registry_dispatches_jpeg():
    px = np.full((9, 11, 3), (10, 200, 30), dtype=np.uint8)
    back = decode_image(encode_jpeg(px, quality=95))
    assert back.shape == (9, 11, 3)
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 3


def test_jfif_marker_layout():
    b = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    # SOF0 present with the right dims
    i = b.find(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", b, i + 4)
    assert (prec, h, w, nc) == (8, 8, 8, 3)


def test_synth_table_and_transformer_cover_jpeg():
    from etl_sql_duckdb_parquet__ray.functions.multimodal import (
        MediaTransformer, synth_media_table,
    )

    t = synth_media_table(128)
    heads = [bytes(p[:3]) for p in t.column("payload").to_pylist()]
    n_jpeg = sum(h == b"\xff\xd8\xff" for h in heads)
    assert n_jpeg > 10
    out = MediaTransformer(thumb=8)(t)
    for p, th in zip(
        t.column("payload").to_pylist(), out.column("thumbnail").to_pylist()
    ):
        if p[:3] == b"\xff\xd8\xff":
            back = decode_jpeg(th)  # JPEG in -> JPEG thumbnail out
            assert back.shape == (8, 8, 3)
