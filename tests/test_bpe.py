"""BPE tokenizer training + application (functions/bpe.py).

Pins: the classic Sennrich corpus learns the published first merges; greedy
application reproduces every word byte-for-byte (join(tokens) == word); more
merges never increase token counts; the distributed word/pair statistics
match a single-process recomputation exactly.
"""

import numpy as np
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.functions import bpe

SF = "/root/testdata/sf0.001"


def test_train_bpe_sennrich_example():
    # the worked example from the public BPE paper (Sennrich et al. 2016)
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(wf, num_merges=10)
    # 'es' (freq 9 = newest 6 + widest 3) then 'est' are the first merges
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wf:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w
    # determinism
    assert bpe.train_bpe(wf, num_merges=10) == merges


def test_train_bpe_tie_break_and_floor():
    # equal-frequency pairs: lexicographically smallest wins
    merges = bpe.train_bpe([("ab", 3), ("cd", 3)], num_merges=5)
    assert merges[0] == ("a", "b")
    # min_pair_freq stops the loop: every pair occurs once
    assert bpe.train_bpe([("ab", 1), ("cd", 1)], num_merges=5) == []


def test_encode_word_prefers_lowest_rank():
    # ranks say merge ('b','c') before ('a','b'); greedy application must
    # follow training order, not left-to-right position
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe.encode_word("abc", ranks) == ["a", "bc"]
    # unknown word falls back to characters
    assert bpe.encode_word("xyz", {}) == ["x", "y", "z"]


def test_word_and_pair_statistics_match_local(ray_session):
    import ray

    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    wf = {
        r["word"]: r["freq"] for r in bpe.word_frequencies(ds).take_all()
    }
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    ref: dict[str, int] = {}
    for t in texts.column("text").to_pylist():
        for w in (t or "").split(" "):
            if w:
                ref[w] = ref.get(w, 0) + 1
    assert wf == ref

    pc_rows = bpe.pair_counts_table(bpe.word_frequencies(ds)).take_all()
    got = {(r["a"], r["b"]): r["freq"] for r in pc_rows}
    ref_pairs: dict[tuple[str, str], int] = {}
    for w, f in ref.items():
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            ref_pairs[p] = ref_pairs.get(p, 0) + f
    assert got == ref_pairs


def test_bpe_tokenize_counts_end_to_end(ray_session):
    import ray

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    few = bpe.bpe_tokenize_counts(ds, num_merges=20).to_pandas()
    many = bpe.bpe_tokenize_counts(ds, num_merges=200).to_pandas()
    assert len(few) == ds.count()
    f = few.set_index("doc_id").sort_index()
    m = many.set_index("doc_id").sort_index()
    # n_words is the plain whitespace token count either way
    assert (f["n_words"] == m["n_words"]).all()
    assert (f["n_bpe_tokens"] >= f["n_words"]).all()  # merges never cross words
    # more merges => never more tokens
    assert (m["n_bpe_tokens"] <= f["n_bpe_tokens"]).all()
    # with zero merges every token is one character
    zero = bpe.bpe_tokenize_counts(ds, num_merges=0).to_pandas()
    texts = ds.to_pandas().set_index("doc_id")["text"]
    z = zero.set_index("doc_id").sort_index()
    chars = texts.map(
        lambda t: sum(len(w) for w in (t or "").split(" ") if w)
    ).sort_index()
    assert (z["n_bpe_tokens"] == chars).all()
