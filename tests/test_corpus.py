"""Corpus-preparation operators (functions/corpus.py): decontamination,
deterministic shuffle-sharding, quota sampling, sequence packing.

The SQL-parity path (hash_fn="md5") is covered by the driver-gate
rehearsal in test_analytics.py; these tests cover the production SipHash
path, the planted-contamination positive control, determinism/resume
properties, and the distributed prefix sum's invariance to bucketing.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.functions import corpus


def _docs_ds(sf_dir):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def test_word_ngram_hashes_md5_parity():
    import hashlib

    texts = pd.Series(["a b c d e f", "x y", None, ""])
    hs = corpus.word_ngram_hashes(texts, n=5, hash_fn="md5")
    assert [len(h) for h in hs] == [2, 0, 0, 0]
    want = int.from_bytes(hashlib.md5(b"a b c d e").digest()[8:16], "little")
    assert hs[0][0] == np.uint64(want)


def test_word_ngram_hashes_siphash_shape_and_equality():
    texts = pd.Series(["one two three four five six", "one two three four five six"])
    hs = corpus.word_ngram_hashes(texts, n=4, hash_fn="siphash")
    assert len(hs[0]) == 3  # 6 words -> 3 windows of 4
    np.testing.assert_array_equal(hs[0], hs[1])  # same text, same grams
    # different text -> different gram hashes (w.h.p.)
    other = corpus.word_ngram_hashes(pd.Series(["seven eight nine ten"]), n=4)
    assert other[0][0] != hs[0][0]


def test_decontaminate_planted(ray_session):
    import ray

    # bench doc 100 shares its exact 5-gram run with corpus doc 2 only
    bench = ray.data.from_items(
        [{"doc_id": 100, "text": "alpha beta gamma delta epsilon zeta"}]
    )
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "totally unrelated words in this one here"},
            {"doc_id": 2, "text": "prefix alpha beta gamma delta epsilon suffix"},
            {"doc_id": 3, "text": "alpha beta gamma delta"},  # only 4-gram overlap
        ]
    )
    out = (
        corpus.decontaminate(docs, bench, n=5, hash_fn="siphash")
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    assert bool(out[2]) is True
    assert bool(out[1]) is False
    assert bool(out[3]) is False  # needs a full 5-gram to flag


def test_decontaminate_modes_agree(ray_session, sf_dir):
    docs = _docs_ds(sf_dir)
    flags = {}
    for mode in ("siphash", "md5"):
        flags[mode] = (
            corpus.decontaminate(docs, docs.limit(20), n=5, hash_fn=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(flags["siphash"], flags["md5"])


def test_deterministic_shard_properties(ray_session, sf_dir):
    docs = _docs_ds(sf_dir)
    a = corpus.deterministic_shard(docs, n_shards=8, seed=1).to_pandas()
    b = corpus.deterministic_shard(docs, n_shards=8, seed=1).to_pandas()
    c = corpus.deterministic_shard(docs, n_shards=8, seed=2).to_pandas()
    a, b, c = (
        d.sort_values("doc_id").reset_index(drop=True) for d in (a, b, c)
    )
    # restart-stable: identical assignment across runs with the same seed
    pd.testing.assert_frame_equal(a, b)
    # seed actually changes the permutation
    assert (a["shard"] != c["shard"]).any()
    # shard = key % n, and every shard is populated at this size
    assert ((a["shuffle_key"] % 8).astype(np.int64) == a["shard"]).all()
    assert set(a["shard"].unique()) == set(range(8))


def test_write_shards_hive_layout(ray_session, sf_dir, tmp_path):
    docs = _docs_ds(sf_dir)
    out = str(tmp_path / "shards")
    corpus.write_shards(docs, out, n_shards=4, seed=7)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    import ray

    back = ray.data.read_parquet(out).to_pandas()
    src = docs.to_pandas()
    assert sorted(back["doc_id"]) == sorted(src["doc_id"])  # exactly once each


def test_quota_sample_budget_and_prefix(ray_session, sf_dir):
    budget = 3000
    docs = _docs_ds(sf_dir)
    out = corpus.quota_sample(docs, budget_tokens=budget, seed=3).to_pandas()
    # per-group budget respected
    assert (out.groupby("lang")["n_tokens"].sum() <= budget).all()
    # the sample is a PREFIX of the priority order: recompute priorities and
    # check that no excluded doc sorts before an included one within a group
    src = docs.to_pandas()
    src["n_tokens"] = src["text"].str.count(" ") + 1
    src["priority"] = corpus.det_keys(src["doc_id"].to_numpy(), 3)
    for lang, g in src.groupby("lang"):
        g = g.sort_values(["priority", "doc_id"]).reset_index(drop=True)
        cum = g["n_tokens"].cumsum()
        want = set(g.loc[cum <= budget, "doc_id"])
        got = set(out.loc[out["lang"] == lang, "doc_id"])
        assert got == want


def test_pack_sequences_matches_sequential_scan(ray_session, sf_dir):
    docs = _docs_ds(sf_dir)
    seq_len = 512
    out = (
        corpus.pack_sequences(docs, seq_len=seq_len, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    src = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    n_tok = src["text"].str.count(" ") + 1
    start = n_tok.cumsum() - n_tok
    assert (out["doc_id"] == src["doc_id"]).all()
    assert (out["n_tokens"].to_numpy() == n_tok.to_numpy()).all()
    assert (out["start_offset"].to_numpy() == start.to_numpy()).all()
    assert (out["bin_id"].to_numpy() == (start // seq_len).to_numpy()).all()


@pytest.mark.parametrize("buckets", [1, 3, 32])
def test_pack_sequences_bucket_invariance(ray_session, sf_dir, buckets):
    """The two-pass distributed prefix sum must be exactly invariant to the
    bucket count (the scan is associative; buckets only change the split)."""
    docs = _docs_ds(sf_dir)
    out = (
        corpus.pack_sequences(docs, seq_len=2048, num_buckets=buckets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        corpus.pack_sequences(docs, seq_len=2048, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)


def test_split_assignments_deterministic_and_stable(ray_session, sf_dir):
    """Same seed → identical splits across runs; a document's split never
    changes when OTHER documents are added (the no-migration property that
    keeps eval sets uncontaminated as the corpus grows); fractions are
    roughly respected; bad fractions are rejected."""
    docs = _docs_ds(sf_dir)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = corpus.split_assignments(docs, fractions=fr, seed=5).to_pandas()
    b = corpus.split_assignments(docs, fractions=fr, seed=5).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # no-migration: splitting a SUBSET assigns each doc the same split
    sub = docs.limit(50)
    s = corpus.split_assignments(sub, fractions=fr, seed=5).to_pandas()
    merged = s.merge(a[["doc_id", "split"]], on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()
    # distribution sanity at n=~500 (binomial 3-sigma)
    counts = a["split"].value_counts(normalize=True)
    assert abs(counts.get("train", 0) - 0.8) < 0.06
    with pytest.raises(ValueError):
        corpus.split_assignments(docs, fractions={"train": 0.5, "val": 0.1})


def test_sample_n_per_group_exact_and_deterministic(ray_session):
    import ray

    rows = [{"doc_id": i, "lang": ["en", "fr"][i % 2]} for i in range(50)]
    rows.append({"doc_id": 999, "lang": "tiny"})  # group smaller than n
    ds = ray.data.from_items(rows)
    out1 = sorted(
        (r["lang"], r["doc_id"])
        for r in corpus.sample_n_per_group(ds, "lang", n=5).take_all()
    )
    counts = pd.Series([lang for lang, _ in out1]).value_counts()
    assert counts["en"] == 5 and counts["fr"] == 5 and counts["tiny"] == 1
    out2 = sorted(
        (r["lang"], r["doc_id"])
        for r in corpus.sample_n_per_group(ds, "lang", n=5).take_all()
    )
    assert out1 == out2  # seeded hash, not RNG
    out3 = sorted(
        (r["lang"], r["doc_id"])
        for r in corpus.sample_n_per_group(ds, "lang", n=5, seed=7).take_all()
    )
    assert out1 != out3  # a different seed picks a different sample


def test_chunk_documents_overlap_and_edges(ray_session):
    """Chunk windows: a short doc yields ONE chunk; a doc of exactly
    chunk_tokens yields one; one token past that opens a second window;
    overlapping windows share the stride-overlap suffix/prefix; token
    counts and reassembled text are exact."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.functions import corpus

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c",                                # short: 1 chunk
                " ".join(f"t{i}" for i in range(8)),    # == C: 1 chunk
                " ".join(f"w{i}" for i in range(11)),   # C+3: 2 chunks
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    out = (
        corpus.chunk_documents(ds, chunk_tokens=8, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].chunk_text == "a b c" and d1.iloc[0].n_tokens == 3
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].n_tokens == 8
    d3 = out[out.doc_id == 3].reset_index(drop=True)
    assert len(d3) == 2
    assert d3.iloc[0].chunk_text == " ".join(f"w{i}" for i in range(8))
    # second window starts at stride=4: w4..w10 (7 tokens)
    assert d3.iloc[1].chunk_text == " ".join(f"w{i}" for i in range(4, 11))
    assert list(d3.n_tokens) == [8, 7]
    # overlap region w4..w7 appears in both windows
    assert d3.iloc[0].chunk_text.endswith("w4 w5 w6 w7")
    assert d3.iloc[1].chunk_text.startswith("w4 w5 w6 w7")


def test_mixture_sample_proportions_and_determinism(ray_session):
    """Data mixing: per-source token budgets = floor(weight * total);
    selection is a deterministic hash prefix (same seed -> identical
    sample; different seed -> different sample), budgets never exceeded,
    unlisted sources excluded."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.functions.corpus import mixture_sample

    rng = np.random.default_rng(11)
    rows = []
    for s in ("a", "b", "c"):
        for i in range(200):
            n = int(rng.integers(5, 30))
            rows.append({
                "doc_id": len(rows),
                "source": s,
                "text": " ".join(["w"] * n),
            })
    ds = ray.data.from_items(rows).repartition(4)
    weights = {"a": 0.5, "b": 0.3}   # 'c' unlisted -> excluded
    total = 3000
    out = mixture_sample(
        ds, weights, total, group_col="source", seed=7
    ).to_pandas()

    assert set(out["source"]) == {"a", "b"}
    for g, w in weights.items():
        sel = out[out["source"] == g]
        budget = int(np.floor(w * total))
        assert (sel["budget_tokens"] == budget).all()
        assert sel["n_tokens"].sum() <= budget
        # greedy prefix: adding the next doc would overflow — the budget
        # is actually approached, not trivially undershot
        assert sel["n_tokens"].sum() > budget - 30

    out2 = mixture_sample(
        ds, weights, total, group_col="source", seed=7
    ).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    out3 = mixture_sample(
        ds, weights, total, group_col="source", seed=8
    ).to_pandas()
    assert set(out3["doc_id"]) != set(out["doc_id"])


def test_contamination_fraction_planted(ray_session):
    """Graded decontamination: a doc that IS a benchmark line scores
    10000 bp; a doc quoting one line among fresh text scores its exact
    positional fraction; clean docs score 0 and stay unflagged."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.functions.corpus import (
        contamination_fraction,
    )

    bench_line = "alpha beta gamma delta epsilon zeta"      # 6 words
    docs = [
        {"doc_id": 0, "text": bench_line},                   # exact copy
        {"doc_id": 1, "text": bench_line + " q r s t u v"},  # half-quote
        {"doc_id": 2, "text": "m n o p q r s t"},            # clean
    ]
    bench = ray.data.from_items([{"doc_id": 9, "text": bench_line}])
    out = (
        contamination_fraction(
            ray.data.from_items(docs), bench, n=5, threshold_bp=2000
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    # doc 0: 2 grams, both hit -> 10000 bp
    assert out.loc[0, "overlap_bp"] == 10000 and out.loc[0, "contaminated"]
    # doc 1: 8 grams, 2 hit -> 2500 bp (>= 2000 threshold)
    assert out.loc[1, "n_grams"] == 8 and out.loc[1, "n_hit"] == 2
    assert out.loc[1, "overlap_bp"] == 2500 and out.loc[1, "contaminated"]
    # doc 2: zero overlap
    assert out.loc[2, "overlap_bp"] == 0 and not out.loc[2, "contaminated"]
