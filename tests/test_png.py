"""PNG codec (stdlib zlib decode/encode) + pluggable decoder registry.

The PNG kernel is the real format: chunk CRCs, IDAT inflate, and all five
scanline filters. Round-trips are checked per (filter type x color layout),
and the registry seam is exercised with a user-registered decoder.
"""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.functions.multimodal import (
    IMAGE_DECODERS,
    MediaTransformer,
    RealDecoder,
    _PNG_SIG,
    _png_chunk,
    decode_image,
    decode_png,
    encode_png,
    register_image_decoder,
    rgb_view,
    synth_media_table,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_layouts(filter_type, channels):
    rng = np.random.default_rng(100 * channels + filter_type)
    px = rng.integers(0, 256, (11, 7, channels), dtype=np.uint8)
    if channels == 1:
        px = px[:, :, 0]  # 2-D gray input path
    back = decode_png(encode_png(px, filter_type=filter_type))
    want = px[:, :, None] if px.ndim == 2 else px
    assert back.shape == want.shape
    assert np.array_equal(back, want)


def test_png_roundtrip_gradient_exercises_predictors():
    # smooth gradients are where Sub/Average/Paeth predictors actually
    # shrink residuals — and where an off-by-one in the defilter shows up
    y, x = np.mgrid[0:40, 0:33]
    px = np.stack([(x * 7) % 256, (y * 5) % 256, (x + y) % 256], axis=2).astype(
        np.uint8
    )
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), px)
    # Paeth should beat None on a gradient (the point of filtering)
    assert len(encode_png(px, filter_type=4)) < len(encode_png(px, filter_type=0))


def test_png_palette_decode():
    # hand-build a palette PNG: 4 palette entries, 2x3 indexed image
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    px = decode_png(payload)
    want = np.frombuffer(plte, dtype=np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(px, want)


def test_png_crc_corruption_raises():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    # flip one byte inside the IDAT body (past the IHDR chunk: 8 sig + 25)
    idat_off = payload.index(b"IDAT") + 6
    payload[idat_off] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_unsupported_depth_and_interlace_raise():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(px)

    def rebuild_ihdr(depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace)
        rest = good[8 + 25 :]  # skip sig + old IHDR chunk (12 + 13 bytes)
        return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + rest

    with pytest.raises(NotImplementedError):
        decode_png(rebuild_ihdr(depth=16))
    with pytest.raises(NotImplementedError):
        decode_png(rebuild_ihdr(interlace=1))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNG....")


def test_rgb_view_layouts():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert rgb_view(gray).shape == (2, 3, 3)
    ga = np.zeros((2, 3, 2), dtype=np.uint8)
    assert rgb_view(ga).shape == (2, 3, 3)
    rgba = np.zeros((2, 3, 4), dtype=np.uint8)
    assert rgb_view(rgba).shape == (2, 3, 3)


def test_decoder_registry_dispatch_and_priority():
    calls = []

    def sniff(p):
        return p[:4] == b"XIMG"

    def dec(p):
        calls.append(p)
        return np.zeros((2, 2, 3), dtype=np.uint8)

    register_image_decoder("custom", sniff, dec)
    try:
        out = decode_image(b"XIMG anything")
        assert out.shape == (2, 2, 3) and calls
        # user registration outranks built-ins in the scan order
        assert IMAGE_DECODERS[0][0] == "custom"
        # built-ins still reachable
        px = np.full((3, 3, 3), 7, dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(px)), px)
        with pytest.raises(NotImplementedError, match="register_image_decoder"):
            decode_image(b"GIF89a no-decoder-for-gif")
    finally:
        IMAGE_DECODERS[:] = [e for e in IMAGE_DECODERS if e[0] != "custom"]


def test_real_decoder_handles_png_payloads():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    batch = pa.table(
        {
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_png(px)], type=pa.large_binary()),
        }
    )
    out = RealDecoder()(batch)
    f = out.column("features")[0].as_py()
    assert int(f[0]) == 13 and int(f[1]) == 9
    assert abs(f[3] - px[:, :, 0].mean() / 255.0) < 1e-12


def test_media_transformer_png_thumbnails_roundtrip():
    t = synth_media_table(96)
    out = MediaTransformer(thumb=8)(t)
    kinds = t.column("kind").to_pylist()
    payloads = t.column("payload").to_pylist()
    thumbs = out.column("thumbnail").to_pylist()
    n_png = 0
    for k, p, th in zip(kinds, payloads, thumbs):
        if k != "image":
            assert th == b""
            continue
        if p[:8] == _PNG_SIG:
            n_png += 1
            px = decode_png(th)  # PNG in -> PNG thumbnail out
            assert px.shape == (8, 8, 3)
        elif p[:3] == b"\xff\xd8\xff":
            assert th[:3] == b"\xff\xd8\xff"  # JPEG in -> JPEG thumb out
        else:
            assert th[:2] == b"P6"
    assert n_png > 5  # the synth table really emits PNGs


def test_synth_table_mixes_png_containers():
    t = synth_media_table(128)
    heads = {bytes(p[:2]) for p in t.column("payload").to_pylist()}
    assert b"\x89P" in heads and b"P6" in heads and b"BM" in heads
