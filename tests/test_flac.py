"""FLAC codec (pure numpy + stdlib, RFC 9639 frame layer). Lossless: every
round-trip asserts BIT-EXACT sample equality, plus structural facts (CRCs,
stream marker, subframe-type coverage) and corruption detection.
"""
import numpy as np
import pytest

from etl_sql_duckdb_parquet__ray.functions.flac import (
    _FIXED_COEFS,
    _undo_fixed,
    decode_flac,
    encode_flac,
)
from etl_sql_duckdb_parquet__ray.functions.multimodal import decode_audio


def _sine(n, seed=0, noise=200):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        8000 * np.sin(t / 30) + rng.integers(-noise, noise, n)
    ).astype(np.int16)


def test_mono_roundtrip_bit_exact_and_smaller():
    x = _sine(20000)
    b = encode_flac(x, 16000)
    back, sr = decode_flac(b)
    assert sr == 16000
    assert back.shape == (20000, 1)
    assert np.array_equal(back[:, 0], x)
    assert len(b) < 2 * len(x)  # beats raw PCM on tonal content


def test_stereo_roundtrip_bit_exact():
    x = _sine(9000, seed=1)
    st = np.stack([x, (x // 2 + 100).astype(np.int16)], axis=1)
    back, sr = decode_flac(encode_flac(st, 44100, block_size=1024))
    assert sr == 44100
    assert np.array_equal(back, st)


def test_subframe_type_coverage():
    rng = np.random.default_rng(3)
    # CONSTANT
    c = np.full(3000, -123, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(c, 8000))[0][:, 0], c)
    # VERBATIM (full-range noise defeats every predictor)
    noise = rng.integers(-32768, 32767, 2000).astype(np.int16)
    assert np.array_equal(decode_flac(encode_flac(noise, 8000))[0][:, 0], noise)
    # FIXED order 2 (linear ramp -> zero second differences)
    ramp = (np.arange(5000) % 4000 - 2000).astype(np.int16)
    assert np.array_equal(decode_flac(encode_flac(ramp, 8000))[0][:, 0], ramp)
    # genuine LPC wire format
    x = _sine(5000, seed=4)
    b = encode_flac(x, 16000, lpc=True)
    assert np.array_equal(decode_flac(b)[0][:, 0], x)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 255, 256, 257, 4096, 4097, 9001])
def test_edge_lengths_bit_exact(n):
    rng = np.random.default_rng(n)
    x = (rng.integers(-5000, 5000, n)).astype(np.int16)
    back, _ = decode_flac(encode_flac(x, 8000))
    assert np.array_equal(back[:, 0], x)


def test_undo_fixed_inverts_every_order():
    rng = np.random.default_rng(9)
    x = rng.integers(-30000, 30000, 500).astype(np.int64)
    for order in range(5):
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        got = _undo_fixed(res[:], x[:order], order)
        assert np.array_equal(got, x), order
    assert len(_FIXED_COEFS) == 5


def test_crc_corruption_detected():
    x = _sine(4000)
    b = bytearray(encode_flac(x, 16000))
    # flip a byte in the entropy data (past streaminfo = 4 + 4 + 34 bytes)
    b[len(b) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(b))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFnope")


def test_registry_dispatches_flac():
    x = _sine(2500, seed=6)
    samples, rate = decode_audio(encode_flac(x, 16000))
    assert rate == 16000
    assert np.array_equal(samples[:, 0], x)


def test_synth_table_mixes_flac_and_features_agree():
    from etl_sql_duckdb_parquet__ray.functions.multimodal import (
        RealDecoder, synth_media_table,
    )

    t = synth_media_table(96)
    heads = [bytes(p[:4]) for p in t.column("payload").to_pylist()]
    assert sum(h == b"fLaC" for h in heads) > 5
    out = RealDecoder()(t)
    # FLAC rows decode with the same feature contract as WAV rows
    kinds = t.column("kind").to_pylist()
    for k, h, f in zip(kinds, heads, out.column("features").to_pylist()):
        if k == "audio":
            assert f[1] == 16000.0 and f[7] == 1.0
