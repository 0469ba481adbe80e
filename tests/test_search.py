"""Inverted index + term search (functions/search.py) and the new text
ops (redact / top_terms / RepetitionStats). The SQL-parity path is covered
by the driver-gate rehearsal in test_analytics.py; these tests cover
semantics the oracle can't see: selective bucket reads, or-mode, empty
results, determinism of the bucket hash across processes, and edge cases
(empty docs, ties)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.functions import search, text


def _docs(ray):
    return ray.data.from_items(
        [
            {"doc_id": 1, "text": "key hash scan key"},
            {"doc_id": 2, "text": "key value"},
            {"doc_id": 3, "text": "hash join key"},
            {"doc_id": 4, "text": "nothing here"},
            {"doc_id": 5, "text": ""},
        ]
    )


def test_index_build_and_search(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "idx")
    search.build_inverted_index(_docs(ray), idx, num_buckets=8)
    # AND: docs containing both terms
    got = [r["doc_id"] for r in search.search_terms(idx, ["key", "hash"]).take_all()]
    assert got == [1, 3]
    # OR: union
    got = [
        r["doc_id"]
        for r in search.search_terms(idx, ["value", "join"], mode="or").take_all()
    ]
    assert got == [2, 3]
    # missing term -> empty
    assert search.search_terms(idx, ["zzzz"]).take_all() == []
    # duplicate query terms don't break AND counting
    got = [r["doc_id"] for r in search.search_terms(idx, ["key", "key"]).take_all()]
    assert got == [1, 2, 3]


def test_index_reads_only_probed_buckets(ray_session, tmp_path):
    """The query must touch only the buckets its terms hash to — delete
    every other bucket directory and the search still works."""
    import ray

    idx = str(tmp_path / "idx")
    search.build_inverted_index(_docs(ray), idx, num_buckets=16)
    keep = {int(b) for b in search._term_buckets(["key", "hash"], 16)}
    postings = os.path.join(idx, "postings")
    for d in os.listdir(postings):
        b = int(d.split("=")[1])
        if b not in keep:
            import shutil

            shutil.rmtree(os.path.join(postings, d))
    got = [r["doc_id"] for r in search.search_terms(idx, ["key", "hash"]).take_all()]
    assert got == [1, 3]


def test_bucket_hash_deterministic():
    """The build-time and query-time bucket assignment must agree across
    processes — pandas SipHash with its fixed default key is."""
    a = search._term_buckets(["key", "hash", "zebra"], 32)
    b = search._term_buckets(np.array(["key", "hash", "zebra"], dtype=object), 32)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a < 32).all()


def test_search_validates_args(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "idx")
    search.build_inverted_index(_docs(ray), idx, num_buckets=4)
    with pytest.raises(ValueError):
        search.search_terms(idx, [])
    with pytest.raises(ValueError):
        search.search_terms(idx, ["key"], mode="xor")
    meta = json.load(open(os.path.join(idx, "_index.json")))
    assert meta["num_buckets"] == 4


def test_redactor_counts_and_rewrites():
    red = text.Redactor(text.Redactor.PII_PRESETS["email"], "<EMAIL>")
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["mail me at bob@example.com ok", "no pii", None],
        }
    )
    out = red(t).to_pandas()
    assert out["clean_text"].tolist() == ["mail me at <EMAIL> ok", "no pii", ""]
    assert out["n_redactions"].tolist() == [1, 0, 0]


def test_repetition_stats_edges():
    rs = text.RepetitionStats()
    out = rs(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a b a b c", "x x x", None]}
        )
    )
    assert out["n_tokens"].tolist() == [5, 3, 0]
    assert out["n_distinct"].tolist() == [3, 1, 0]
    assert out["top_token_count"].tolist() == [2, 3, 0]
    # "a b" appears twice in doc 1; "x x" twice in doc 2
    assert out["top_bigram_count"].tolist() == [2, 2, 0]


def test_top_terms_ranking(ray_session):
    """tf DESC first, rarer-in-corpus (df ASC) breaks ties, then term ASC."""
    import ray

    out = text.top_terms(_docs(ray), k=2).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"]))
    # doc 1: key tf=2 first; then scan (df=1) beats hash (df=2)
    assert by_doc[1] == [("key", 2, 3), ("scan", 1, 1)]
    # empty doc -> no rows
    assert 5 not in by_doc


def _brute_bm25(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Pure-python BM25 reference (Robertson idf, Lucene numerator)."""
    import math

    toks = {d: t.split() for d, t in docs.items()}
    dls = {d: len(w) for d, w in toks.items() if w}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    scores = {}
    for t in sorted(set(terms)):
        df = sum(1 for w in toks.values() if t in w)
        if not df:
            continue
        idf = math.log1p((n - df + 0.5) / (df + 0.5))
        for d, w in toks.items():
            tf = w.count(t)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dls[d] / avgdl)
                )
    return scores


def test_bm25_search_matches_reference(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "idx")
    search.build_inverted_index(_docs(ray), idx, num_buckets=8, scored=True)
    with open(os.path.join(idx, "_index.json")) as f:
        meta = json.load(f)
    # doc 5 is empty: excluded from n_docs / avgdl
    assert meta["scored"] and meta["n_docs"] == 4
    assert meta["total_tokens"] == 4 + 2 + 3 + 2

    docs = {
        1: "key hash scan key",
        2: "key value",
        3: "hash join key",
        4: "nothing here",
        5: "",
    }
    want = _brute_bm25(docs, ["key", "hash"])
    got = {
        r["doc_id"]: r["score"]
        for r in search.bm25_search(idx, ["key", "hash"]).take_all()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    # doc 1 (tf=2 of 'key' + 'hash') must outrank the single-term docs
    assert got[1] == max(got.values())
    # top-k cut: (score DESC, doc_id ASC)
    order = [
        r["doc_id"] for r in search.bm25_search(idx, ["key", "hash"], k=2).take_all()
    ]
    full = sorted(want, key=lambda d: (-want[d], d))[:2]
    assert order == full
    # scored index still serves boolean search (backward compatible)
    both = [r["doc_id"] for r in search.search_terms(idx, ["key", "hash"]).take_all()]
    assert both == [1, 3]
    # absent term scores nothing; all-absent -> empty
    assert search.bm25_search(idx, ["zzzz"]).take_all() == []


def test_bm25_requires_scored_index(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "idx")
    search.build_inverted_index(_docs(ray), idx, num_buckets=8)
    with pytest.raises(ValueError, match="scored=True"):
        search.bm25_search(idx, ["key"])
