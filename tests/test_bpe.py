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


def test_duplicate_window_docs_planted(ray_session):
    # separate op, same file: sliding-window exact-substring dedup
    import ray

    from etl_sql_duckdb_parquet__ray.functions.dedup import (
        duplicate_window_docs,
    )

    w = [f"w{i}" for i in range(30)]
    passage = " ".join(w[:10])                       # 10 tokens
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            passage + " " + " ".join(w[10:20]),      # source of the passage
            " ".join(w[20:28]),                      # unrelated, 8 tokens
            "zz yy " + passage,                      # copy at a SHIFTED offset
            " ".join(reversed(w[:8])),               # same words, wrong order
        ]),
    })
    out = (
        duplicate_window_docs(ray.data.from_arrow(docs), k=8)
        .to_pandas().set_index("doc_id")["n_dup_windows"]
    )
    # only doc 2 shares any 8-token window with a smaller doc_id; the
    # 10-token passage contributes exactly 3 sliding windows
    assert dict(out) == {2: 3}

    # brute-force recomputation on the sf0.001 corpus
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    wins: dict[str, int] = {}
    per_doc: dict[int, set] = {}
    for did, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = [x for x in (s or "").split(" ") if x]
        per_doc[did] = {
            " ".join(toks[i:i + 8]) for i in range(len(toks) - 7)
        }
        for win in per_doc[did]:
            wins[win] = min(wins.get(win, did), did)
    ref = {
        did: sum(1 for win in ws if wins[win] < did)
        for did, ws in per_doc.items()
        if any(wins[win] < did for win in ws)
    }
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        duplicate_window_docs(ds, k=8)
        .to_pandas().set_index("doc_id")["n_dup_windows"]
    )
    assert dict(got) == ref and len(ref) > 0


def test_collocations_planted_phrase(ray_session):
    """Collocation mining: a planted always-together phrase must outrank
    independent co-occurrences, and every score must equal the exact
    integer PMI micro-ratio recomputed locally."""
    import ray

    from etl_sql_duckdb_parquet__ray.functions.text import collocations

    # "zip zap" always together (10x); filler tokens co-occur at random
    rows = [{"text": "zip zap " + " ".join(["w%d" % (i % 4) for i in range(10)])}
            for _ in range(10)]
    out = (
        collocations(ray.data.from_items(rows), k=5, min_count=5)
        .to_pandas()
    )
    assert out.iloc[0]["bigram"] == "zip zap"

    # exact recompute
    toks, bis = [], []
    for r in rows:
        w = r["text"].split()
        toks.extend(w)
        bis.extend(zip(w, w[1:]))
    from collections import Counter

    u, bcnt = Counter(toks), Counter(bis)
    n_tok, n_bi = len(toks), len(bis)
    for _, row in out.iterrows():
        a, b = row["bigram"].split(" ")
        exp = (1_000_000 * bcnt[(a, b)] * n_tok * n_tok) // (
            n_bi * u[a] * u[b]
        )
        assert row["pmi_micro"] == exp and row["n_ab"] == bcnt[(a, b)]


def test_bigram_logprob_ranks_scrambled_below_natural(ray_session):
    """Interpolated bigram LM: a document whose token SEQUENCES are
    corpus-typical outranks a scrambled version with identical unigrams;
    lam=1 edge uses pure bigram probability; <2-token docs are absent."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.functions.text import bigram_logprob

    natural = "the cat sat on the mat"
    rows = [{"doc_id": i, "text": natural} for i in range(20)]
    rows.append({"doc_id": 100, "text": "mat the on sat cat the"})  # scrambled
    rows.append({"doc_id": 101, "text": "solo"})                    # 1 token
    out = (
        bigram_logprob(ray.data.from_items(rows), lam=0.7)
        .to_pandas().set_index("doc_id")
    )
    assert 101 not in out.index
    assert out.loc[0, "logprob2"] > out.loc[100, "logprob2"]
    assert out.loc[0, "n_bigrams"] == 5

    # exact recompute for the natural doc
    from collections import Counter

    toks, bis = [], []
    for r in rows:                 # counts train on the FULL corpus
        w = r["text"].split()
        toks.extend(w)
        bis.extend((a + " " + b) for a, b in zip(w, w[1:]))
    u, bcnt = Counter(toks), Counter(bis)
    total = float(len(toks))
    w = natural.split()
    vals = [
        np.log((0.7 * bcnt[a + " " + b]) / u[a] + (0.3 * u[b]) / total)
        for a, b in zip(w, w[1:])
    ]
    assert abs(out.loc[0, "logprob2"] - np.mean(vals)) < 1e-12
