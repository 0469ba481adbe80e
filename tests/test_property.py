"""Property-based round-trip tests (hypothesis) — the codec layer must be
bit-exact on arbitrary inputs, not just the fixtures (SURVEY.md §5 notes the
reference has no property tests; these close that gap)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings

settings.register_profile("repo", derandomize=True, deadline=None)
settings.load_profile("repo")
from hypothesis import strategies as st

from etl_sql_duckdb_parquet__ray.chunk import decode_chunk, encode_chunk
from etl_sql_duckdb_parquet__ray.codecs import decode_column, encode_column
from etl_sql_duckdb_parquet__ray.codecs.base import StringBlob
from etl_sql_duckdb_parquet__ray.codecs.fsst import (
    FsstCodec,
    _TableIndex,
    fsst_encode_buffer,
    fsst_encode_rows,
    train_fsst,
)
from etl_sql_duckdb_parquet__ray.codecs.pfor import pack_pfor, unpack_pfor

INT_CODECS = ["plain", "zstd", "for_bitpack", "delta", "delta_delta", "rle", "dict"]
STR_CODECS = ["plain", "zstd", "dict", "rle", "fsst", "fsst_zstd"]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
    ),
    st.sampled_from(INT_CODECS),
)
def test_int_codec_roundtrip(values, codec):
    arr = pa.array(values, type=pa.int64())
    payload, meta = encode_column(arr, codec)
    back = decode_column(payload, meta)
    assert back.equals(arr)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40)), min_size=0, max_size=200
    ),
    st.sampled_from(STR_CODECS),
)
def test_string_codec_roundtrip_with_nulls(values, codec):
    arr = pa.array(values, type=pa.string())
    payload, meta = encode_column(arr, codec)
    back = decode_column(payload, meta)
    assert back.equals(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
def test_pfor_roundtrip(values):
    u = np.array(values, dtype=np.uint64)
    payload, meta = pack_pfor(u)
    back = unpack_pfor(payload, meta, len(u))
    assert np.array_equal(back, u)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_fsst_buffer_roundtrip_arbitrary_bytes(data):
    table = train_fsst(data)
    blob = StringBlob(np.array([len(data)], dtype=np.int64), data)
    codec = FsstCodec(table or None)
    payload, meta = codec.encode(blob)
    back = codec.decode(payload, meta, 1)
    assert back.data == data


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.binary(max_size=300), min_size=1, max_size=50),
)
def test_fsst_rows_matches_buffer_decoding(rows):
    corpus = b"".join(rows)
    table = train_fsst(corpus or b"x")
    if not table:
        return
    idx = _TableIndex(table)
    lens = np.array([len(r) for r in rows], dtype=np.int64)
    codes, lits, cpr, lpr = fsst_encode_rows(corpus, lens, idx)
    assert cpr.sum() == len(codes) and lpr.sum() == len(lits)
    # decoding the concatenated streams must reproduce the concatenated rows
    from etl_sql_duckdb_parquet__ray.chunk import assemble_fsst_payload
    from etl_sql_duckdb_parquet__ray.codecs import decode_column

    payload, meta = assemble_fsst_payload(
        codes, lits, lens, None, len(rows), table, arrow_type="binary"
    )
    back = decode_column(payload, meta)
    assert back.to_pylist() == list(rows)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=8), st.integers(0, 1000)),
        min_size=1,
        max_size=100,
    )
)
def test_chunk_roundtrip_property(pairs):
    t = pa.table(
        {
            "conv_id": pa.array([p[0] for p in pairs], type=pa.string()),
            "turn_idx": pa.array([p[1] for p in pairs], type=pa.int32()),
        }
    )
    blob, _ = encode_chunk(t)
    assert decode_chunk(blob).equals(t)


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=0, max_size=2000),
    st.integers(0, 1990),
    st.integers(3, 24),
)
def test_trigram_filter_never_false_prunes_property(corpus, lo, ln):
    """EXACTNESS INVARIANT of substring data skipping: for ANY byte corpus
    and ANY substring of it (len >= 3), the Bloom filter must test
    positive — a false prune would silently drop matching rows."""
    from etl_sql_duckdb_parquet__ray.filters import (
        build_trigram_filter, filter_may_contain,
    )

    filt = build_trigram_filter(corpus)
    if filt is None:
        return  # < 3 bytes: nothing indexable, never prunes (tested unit)
    term = corpus[lo : lo + ln]
    assert filter_may_contain(filt, term)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(allow_nan=True, width=64), min_size=0, max_size=500))
def test_bss_bit_identity_property(vals):
    """Byte-stream-split is lossless on arbitrary doubles (NaN payloads,
    infinities, subnormals, -0.0)."""
    import numpy as np

    from etl_sql_duckdb_parquet__ray.codecs.floats import ByteStreamSplitCodec

    v = np.array(vals, dtype=np.float64)
    c = ByteStreamSplitCodec()
    payload, meta = c.encode(v)
    assert c.decode(payload, meta, len(v)).tobytes() == v.tobytes()


def _levenshtein_ref(a: str, b: str) -> int:
    """Textbook DP reference (test-only)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abc", min_size=0, max_size=8),
    st.text(alphabet="abc", min_size=0, max_size=8),
)
def test_within_ed1_matches_dp_reference(a, b):
    """The ed1 fuzzy-join verifier agrees with a full DP Levenshtein on a
    dense small-alphabet space (equal strings excluded — the join only
    ever compares DISTINCT values)."""
    from etl_sql_duckdb_parquet__ray.functions.dedup import _within_ed1

    if a == b:
        return
    assert _within_ed1(a, b) == (_levenshtein_ref(a, b) <= 1)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab or\t\n", min_size=0, max_size=40),
        min_size=1,
        max_size=20,
    )
)
def test_explode_matching_tokens_matches_row_reference(ray_session, texts):
    """Vectorized explode == per-row split/filter reference, including
    whitespace runs, empty strings and multi-occurrence rows."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.functions.text import (
        explode_matching_tokens,
    )

    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    )
    got = sorted(
        map(tuple, explode_matching_tokens(ds, "doc_id", "text", "or")
            .to_pandas().itertuples(index=False))
    )
    import re

    exp = sorted(
        (i, w)
        for i, t in zip(ids, texts)
        for w in re.split(r"\s+", t)
        if w and "or" in w
    )
    assert got == exp


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=10),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1, max_size=30,
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(deadline=None, max_examples=60)
def test_bpe_train_apply_roundtrip_property(word_freqs, num_merges):
    """BPE invariants over arbitrary word-frequency tables: applying the
    learned merges reproduces every training word byte-for-byte, token
    counts never increase with more merges, and training is deterministic."""
    from etl_sql_duckdb_parquet__ray.functions import bpe

    # dedup words (train_bpe expects a frequency TABLE, one row per word)
    wf = sorted({w: f for w, f in word_freqs}.items())
    merges = bpe.train_bpe(wf, num_merges=num_merges)
    assert merges == bpe.train_bpe(wf, num_merges=num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wf:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w
        assert all(t for t in toks)
    if num_merges > 0:
        fewer = bpe.train_bpe(wf, num_merges=num_merges - 1)
        ranks_f = {p: i for i, p in enumerate(fewer)}
        for w, _ in wf:
            assert len(bpe.encode_word(w, ranks)) <= len(
                bpe.encode_word(w, ranks_f)
            )


@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=20).map(" ".join),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(deadline=None, max_examples=40)
def test_window_dup_matches_bruteforce_property(texts, k):
    """Sliding-window dedup vs an O(n^2) reference on tiny-alphabet
    corpora (maximum hash-group collision pressure): flagged doc set and
    per-doc distinct-dup-window counts must match exactly."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")

    import pyarrow as pa

    from etl_sql_duckdb_parquet__ray.functions.dedup import (
        duplicate_window_docs,
    )

    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    got = {
        r["doc_id"]: r["n_dup_windows"]
        for r in duplicate_window_docs(
            ray.data.from_arrow(docs), k=k
        ).take_all()
    }
    wins: dict[str, int] = {}
    per_doc = {}
    for did, s in enumerate(texts):
        toks = [x for x in s.split(" ") if x]
        per_doc[did] = {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }
        for w in per_doc[did]:
            wins[w] = min(wins.get(w, did), did)
    ref = {
        did: sum(1 for w in ws if wins[w] < did)
        for did, ws in per_doc.items() if any(wins[w] < did for w in ws)
    }
    assert got == ref


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),  # no lone surrogates
                ),
                max_size=60,
            ),
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_tokenize_flat_equals_str_split(texts):
    """The vectorized tokenizer (utf8_split_whitespace + empty-drop) must
    equal Python str.split() — per doc, any Unicode content — since the
    whole n-gram combiner family and _explode_tokens ride on it."""
    from etl_sql_duckdb_parquet__ray.functions.text import tokenize_flat

    col = pa.array(texts, type=pa.string())
    flat, offs = tokenize_flat(col)
    got = [
        flat.slice(offs[i], offs[i + 1] - offs[i]).to_pylist()
        for i in range(len(texts))
    ]
    want = [(t or "").split() for t in texts]
    assert got == want
