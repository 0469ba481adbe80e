"""Per-codec round-trip unit tests on adversarial arrays (SURVEY.md §5:
empty, all-null, single-run, max-cardinality, negative deltas, unicode/NUL,
runs crossing width boundaries) plus selector behavior."""

import numpy as np
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.codecs import (
    REGISTRY,
    chunk_stats,
    column_checksum,
    decode_column,
    encode_column,
    select_codec,
)
from etl_sql_duckdb_parquet__ray.codecs.base import (
    StringBlob,
    blob_to_string_array,
    string_array_to_blob,
    values_from_array,
)
from etl_sql_duckdb_parquet__ray.codecs.bitpack import (
    bitpack,
    bitunpack,
    zigzag_decode,
    zigzag_encode,
)
from etl_sql_duckdb_parquet__ray.codecs.fsst import train_fsst

rng = np.random.default_rng(7)


def roundtrip(arr: pa.Array, codec: str | None = None) -> str:
    payload, meta = encode_column(arr, codec)
    out = decode_column(payload, meta)
    assert out.equals(arr), f"codec={meta['codec']} type={arr.type}"
    assert column_checksum(out) == column_checksum(arr)
    return meta["codec"]


INT_CASES = {
    "empty": pa.array([], type=pa.int64()),
    "single": pa.array([42], type=pa.int64()),
    "monotone": pa.array(np.arange(5000, dtype=np.int64)),
    "neg_delta": pa.array(np.arange(5000, 0, -1, dtype=np.int64)),
    "constant": pa.array(np.full(3000, -7, dtype=np.int64)),
    "random64": pa.array(rng.integers(-(2**62), 2**62, 2000)),
    "extremes": pa.array([np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max]),
    "nullable": pa.array([1, None, 3, None, 5] * 200, type=pa.int64()),
    "all_null": pa.array([None] * 100, type=pa.int64()),
    "int32": pa.array((np.arange(4000) % 17).astype(np.int32)),
    "bool": pa.array([True, None, False] * 300),
}

STR_CASES = {
    "empty": pa.array([], type=pa.string()),
    "all_null": pa.array([None] * 50, type=pa.string()),
    "empties": pa.array(["", "", "a", ""] * 100),
    "single_run": pa.array(["x"] * 4000),
    "all_distinct": pa.array([f"id-{i:07d}" for i in range(3000)]),
    "enum": pa.array(["user", "assistant", "system", "tool"] * 1000),
    "sparse_null": pa.array([None if i % 4 else f"t{i % 11}" for i in range(2000)]),
    "unicode_nul": pa.array(["héllo", "日本語テキスト", "\x00\x00", "a\x00b", ""] * 40),
    "long_text": pa.array(
        [" ".join(rng.choice(list("abcdefgh"), 200)) for _ in range(200)]
    ),
}

TS_CASES = {
    "timestamps": pa.array(
        (1_700_000_000_000_000 + np.cumsum(rng.integers(1, 10**6, 2000))).astype(
            "datetime64[us]"
        )
    ),
    "ts_null": pa.array([1, None, 2**40], type=pa.timestamp("us")),
}


@pytest.mark.parametrize("case", list(INT_CASES))
def test_int_auto_roundtrip(case):
    roundtrip(INT_CASES[case])


@pytest.mark.parametrize("case", list(STR_CASES))
def test_str_auto_roundtrip(case):
    roundtrip(STR_CASES[case])


@pytest.mark.parametrize("case", list(TS_CASES))
def test_ts_auto_roundtrip(case):
    roundtrip(TS_CASES[case])


@pytest.mark.parametrize(
    "codec", ["plain", "zstd", "for_bitpack", "delta", "delta_delta", "rle", "dict"]
)
@pytest.mark.parametrize("case", ["monotone", "neg_delta", "constant", "nullable", "extremes"])
def test_every_int_codec(codec, case):
    assert roundtrip(INT_CASES[case], codec) == codec


@pytest.mark.parametrize("codec", ["plain", "zstd", "rle", "dict", "fsst", "fsst_zstd"])
@pytest.mark.parametrize("case", ["empties", "enum", "unicode_nul", "long_text", "all_distinct"])
def test_every_str_codec(codec, case):
    assert roundtrip(STR_CASES[case], codec) == codec


def test_float_bitexact():
    vals = np.array([0.1, -0.0, np.inf, -np.inf, np.nan, 1e-308, np.pi])
    arr = pa.array(vals)
    payload, meta = encode_column(arr, "zstd")
    out = decode_column(payload, meta)
    assert np.asarray(out).tobytes() == vals.tobytes()  # NaN bit pattern too


def test_bitpack_widths():
    for width in [0, 1, 3, 7, 8, 13, 16, 24, 32, 47, 64]:
        hi = (1 << width) - 1 if width else 0
        a = rng.integers(0, hi + 1, 257, dtype=np.uint64) if hi else np.zeros(257, np.uint64)
        a[0], a[-1] = 0, hi
        out = bitunpack(bitpack(a, width), width, len(a))
        assert (out == a).all(), width


def test_zigzag():
    a = np.array([0, -1, 1, -2, 2, np.iinfo(np.int64).min, np.iinfo(np.int64).max])
    assert (zigzag_decode(zigzag_encode(a)) == a).all()


def test_string_blob_roundtrip():
    arr = pa.array(["", "ab", "日本", "\x00"])
    blob = string_array_to_blob(arr)
    assert blob_to_string_array(blob, pa.string()).equals(arr)


def test_selector_prefers_cheap_codecs_in_balanced_mode():
    # all-distinct ids: dict must lose; selector should stay off FSST unless
    # decisively smaller (speed-penalty rule)
    vals = values_from_array(STR_CASES["all_distinct"])
    name = select_codec(vals, pa.string(), mode="fast")
    assert name not in ("fsst", "fsst_zstd")


def test_selector_dict_on_enum():
    vals = values_from_array(pa.array([f"val{i % 5}" for i in range(20000)]))
    stats = chunk_stats(vals)
    assert stats["card_ratio"] < 0.02
    assert select_codec(vals, pa.string()) in ("dict", "rle", "zstd")


def test_stats_run_length():
    vals = values_from_array(pa.array(["a"] * 500 + ["b"] * 500))
    assert chunk_stats(vals)["mean_run"] > 100


def test_fsst_train_and_manual_roundtrip():
    corpus = b"the quick brown fox jumps over the lazy dog " * 200
    table = train_fsst(corpus)
    assert 0 < len(table) <= 255
    assert all(1 <= len(s) <= 8 for s in table)
    codec = REGISTRY["fsst"]
    blob = StringBlob(np.array([10, 0, 34], dtype=np.int64), corpus[:44])
    p, m = codec.encode(blob)
    out = codec.decode(p, m, 3)
    assert out.data == blob.data and (out.lengths == blob.lengths).all()


def test_fsst_incompressible_fallback_correct():
    data = rng.integers(0, 256, 5000).astype(np.uint8).tobytes()
    blob = StringBlob(np.array([5000], dtype=np.int64), data)
    codec = REGISTRY["fsst"]
    p, m = codec.encode(blob)
    assert codec.decode(p, m, 1).data == data


def test_unknown_type_rejected():
    with pytest.raises(TypeError):
        encode_column(pa.array([[1, 2], [3]], type=pa.list_(pa.int64())))


def test_sample_windows_cover_head_middle_tail():
    from etl_sql_duckdb_parquet__ray.codecs.selector import sample_windows
    import numpy as np

    v = np.arange(100_000, dtype=np.int64)
    ws = sample_windows(v, max_rows=1024)
    assert len(ws) == 3
    assert ws[0][0] == 0                       # head window starts at 0
    assert ws[-1][-1] == 99_999                # tail window ends at the end
    for w in ws:                               # each window is contiguous
        assert (np.diff(w) == 1).all()
    small = np.arange(100, dtype=np.int64)
    assert len(sample_windows(small, max_rows=1024)) == 1


def test_selector_sees_tail_drift():
    """A chunk with a sorted head+middle but a random tail must not be
    priced on the middle window alone (delta looks perfect there)."""
    import numpy as np
    import pyarrow as pa

    from etl_sql_duckdb_parquet__ray.codecs.selector import REGISTRY, sample_windows, select_codec

    rng = np.random.default_rng(4)
    v = np.concatenate([
        np.arange(60_000, dtype=np.int64),                        # sorted 2/3
        rng.integers(0, 2**40, 30_000).astype(np.int64),          # chaotic tail
    ])
    name = select_codec(v, pa.int64())
    # whatever wins must actually be the best on the full head+mid+tail
    # measurement, not just the middle
    windows = sample_windows(v)
    measured = {}
    for cand in ("delta", "for_bitpack", "zstd", "plain"):
        try:
            measured[cand] = sum(len(REGISTRY[cand].encode(w)[0]) for w in windows)
        except Exception:
            pass
    assert measured[name] if name in measured else True
    best = min(measured, key=measured.get)
    if name in measured:
        assert measured[name] <= measured[best] * 1.2


def test_fsst_multimember_group_longest_match():
    """Deterministic coverage of the matcher's 4-byte GROUP scan: several
    4-byte symbols share one 3-byte prefix (the j>=1 remainder passes), the
    shared prefix itself is a 3-byte symbol (L3 must lose to L4 exactly when
    a group member matches), and short groups sit before longer ones so the
    scan reads past a group's end into its neighbor (must never false-hit:
    neighbors differ in the 3-byte prefix by construction)."""
    from etl_sql_duckdb_parquet__ray.codecs.fsst import (
        _TableIndex,
        fsst_encode_buffer,
    )

    table = [
        b"xyzA",  # group "xyz": member 0 (j=0 fast path)
        b"xyzB",  # member 1 (first remainder pass)
        b"xyzC",  # member 2 (second remainder pass)
        b"qrst",  # singleton group placed AFTER a multi-member one
        b"xyz",   # the shared prefix as an L3 symbol
        b"ab",
        b"a",
    ]
    idx = _TableIndex(table)
    assert idx.maxc4 == 3

    def roundtrip(data: bytes) -> list[int]:
        codes_b, lits_b = fsst_encode_buffer(data, idx)
        out, li = bytearray(), 0
        codes = list(codes_b)
        for c in codes:
            if c == 255:
                out.append(lits_b[li])
                li += 1
            else:
                out += table[c]
        assert bytes(out) == data, data
        return codes

    # every group member resolves to ITS code, not the group leader's
    assert roundtrip(b"xyzA") == [0]
    assert roundtrip(b"xyzB") == [1]
    assert roundtrip(b"xyzC") == [2]
    assert roundtrip(b"qrst") == [3]
    # a non-member with the group's prefix falls back to the L3 symbol
    assert roundtrip(b"xyzD") == [4, 255]
    # bare prefix at end-of-buffer: L3 wins (no 4th byte to extend)
    assert roundtrip(b"xyz") == [4]
    # longest-match priority among the short symbols
    assert roundtrip(b"ab") == [5]
    assert roundtrip(b"abx") == [5, 255]
    # mixed stream stressing all passes back-to-back, with escapes between
    mixed = b"xyzCxyzB!xyzAqrstxyzDab?a" * 40
    codes = roundtrip(mixed)
    assert codes[:8] == [2, 1, 255, 0, 3, 4, 255, 5]


def test_bss_roundtrip_and_wins_on_structured_floats():
    """Byte-stream-split: bit-identical roundtrip (incl. NaN/inf/-0.0),
    and decisively smaller than plain zstd on exponent-sharing floats."""
    import numpy as np
    import pyarrow as pa

    from etl_sql_duckdb_parquet__ray.codecs import decode_column, encode_column
    from etl_sql_duckdb_parquet__ray.codecs.floats import ByteStreamSplitCodec
    from etl_sql_duckdb_parquet__ray.codecs.selector import REGISTRY

    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [
            rng.uniform(100.0, 200.0, 5000),  # shared exponent band
            [np.nan, np.inf, -np.inf, -0.0, 0.0],
        ]
    )
    c = ByteStreamSplitCodec()
    payload, meta = c.encode(vals)
    back = c.decode(payload, meta, len(vals))
    assert back.tobytes() == vals.tobytes()  # bit identity, incl. NaN/-0.0
    # smaller than zstd on this distribution
    z, _ = REGISTRY["zstd"].encode(vals)
    assert len(payload) < len(z)
    # through the generic column path with nulls
    arr = pa.array(
        list(rng.uniform(1000.0, 1001.0, 2000)) + [None, 3.5], type=pa.float64()
    )
    p2, m2 = encode_column(arr, "bss")
    out = decode_column(p2, m2)
    assert out.equals(arr)
    # empty column
    p3, m3 = encode_column(pa.array([], type=pa.float64()), "bss")
    assert decode_column(p3, m3).equals(pa.array([], type=pa.float64()))


def test_selector_picks_bss_for_exponent_band_floats():
    import numpy as np
    import pyarrow as pa

    from etl_sql_duckdb_parquet__ray.codecs.selector import select_codec

    rng = np.random.default_rng(6)
    vals = rng.uniform(1e6, 1e6 + 1000, 20000)
    name = select_codec(vals, pa.float64())
    assert name == "bss"


def test_probe_size_is_exact_encoded_size():
    """The selector's closed-form probe sizes must equal the real encoded
    payload byte-for-byte — otherwise the probe path would silently change
    codec picks (and bytes/turn) vs the measured tie-break it replaces."""
    import numpy as np

    from etl_sql_duckdb_parquet__ray.codecs.base import StringBlob
    from etl_sql_duckdb_parquet__ray.codecs.selector import REGISTRY

    rng = np.random.default_rng(42)

    def ints(n, kind):
        if n == 0:
            return np.empty(0, dtype=np.int64)
        return {
            "sorted": np.sort(rng.integers(0, 1 << 40, n)).astype(np.int64),
            "runs": np.repeat(rng.integers(0, 5, max(n // 7, 1)), 7)[:n].astype(np.int64),
            "const": np.full(n, 123_456, dtype=np.int64),
            "neg": rng.integers(-(1 << 50), 1 << 50, n).astype(np.int64),
            "rand": rng.integers(0, 1000, n).astype(np.int64),
            "spiky": np.where(rng.random(n) < 0.02, 1 << 55, rng.integers(0, 64, n)).astype(np.int64),
        }[kind]

    def blob(n, kind):
        if kind == "lowcard":
            words = [b"user", b"assistant", b"system", b"tool"]
            vals = [words[i % 4] for i in rng.integers(0, 4, n)]
        elif kind == "empty_some":
            vals = [
                b"" if i % 3 == 0
                else bytes(rng.integers(97, 123, rng.integers(0, 30)).astype(np.uint8))
                for i in range(n)
            ]
        else:
            vals = [
                bytes(rng.integers(32, 127, rng.integers(1, 80)).astype(np.uint8))
                for _ in range(n)
            ]
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        return StringBlob(lens, b"".join(vals))

    int_codecs = ["plain", "for_bitpack", "delta", "delta_delta", "rle", "dict"]
    str_codecs = ["plain", "rle", "dict"]
    for n in (0, 1, 2, 341, 1024):
        for kind in ("sorted", "runs", "const", "neg", "rand", "spiky"):
            v = ints(n, kind)
            for cname in int_codecs:
                codec = REGISTRY[cname]
                assert codec.probe_size(v) == len(codec.encode(v)[0]), (cname, n, kind)
        for kind in ("lowcard", "empty_some", "rand"):
            b = blob(n, kind)
            for cname in str_codecs:
                codec = REGISTRY[cname]
                assert codec.probe_size(b) == len(codec.encode(b)[0]), (cname, n, kind)


# -- cross-chunk selector cache: probe reuse with per-chunk stat gating -----

def test_select_codec_cached_matches_uncached_choices():
    """Cached selection must elect the same codec as the full tie-break for
    every chunk — the cache only skips probes when stats vouch for reuse."""
    from etl_sql_duckdb_parquet__ray.codecs.selector import (
        select_codec,
        select_codec_cached,
    )

    rng = np.random.default_rng(3)
    cache: dict = {}
    for i in range(6):
        # low-card enum chunks with mildly oscillating cardinality
        card = 4 + (i % 3)
        vals = values_from_array(
            pa.array([f"v{int(x)}" for x in rng.integers(0, card, 20000)])
        )
        want = select_codec(vals, pa.string())
        got = select_codec_cached(vals, pa.string(), cache, "col")
        assert got == want


def test_select_codec_cached_reprobes_on_drift():
    """A column whose regime changes mid-corpus must be re-probed and get a
    fresh winner — reuse is gated by each chunk's own stats."""
    from etl_sql_duckdb_parquet__ray.codecs.selector import select_codec_cached

    cache: dict = {}
    # regime A: tiny sorted ints (delta-friendly)
    a = np.arange(20000, dtype=np.int64)
    name_a = select_codec_cached(a, pa.int64(), cache, "x")
    # regime B: huge-range random ints (delta loses badly)
    rng = np.random.default_rng(7)
    b = rng.integers(-(2**60), 2**60, 20000)
    name_b = select_codec_cached(b, pa.int64(), cache, "x")
    assert name_a != name_b
    # the region reset: the new winner owns the cache entry now
    assert cache["x"][1] == name_b


def test_select_codec_cached_region_accumulates(monkeypatch):
    """Oscillating stats around one regime stop costing probes once the
    probed points cover the oscillation range."""
    from etl_sql_duckdb_parquet__ray.codecs import selector

    calls = {"n": 0}
    orig = selector.select_codec

    def spy(values, arrow_type, stats=None, mode=selector.DEFAULT_MODE):
        calls["n"] += 1
        return orig(values, arrow_type, stats=stats, mode=mode)

    monkeypatch.setattr(selector, "select_codec", spy)
    cache: dict = {}
    rng = np.random.default_rng(11)
    chunks = []
    for i in range(12):
        card = [4, 6, 5, 4][i % 4]
        chunks.append(
            values_from_array(
                pa.array([f"v{int(x)}" for x in rng.integers(0, card, 20000)])
            )
        )
    for c in chunks:
        selector.select_codec_cached(c, pa.string(), cache, "col")
    # a handful of probes to map the region, then pure reuse
    assert calls["n"] <= 4, calls["n"]
