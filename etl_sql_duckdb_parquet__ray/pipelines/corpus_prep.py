"""End-to-end training-corpus preparation: the composition flagship.

One STREAMING chain over the raw documents — language ID → quality filter
→ eval-set decontamination → exact dedup — with every stage the operator
the registry already oracles individually, composed in document order:

    read(doc_id, text)
      -> map_batches(LangId)            appends lang_pred   (stateless)
      -> map_batches(QualityScore)      appends quality     (stateless)
      -> filter lang/quality/benchmark-holdout               (vectorized)
      -> map_batches(contamination flag vs broadcast n-grams) + filter
      -> 128-bit key-hash dedup (24 B/row exchange), keep MIN(doc_id)

The only shuffle in the whole pipeline is the final dedup groupby, and it
moves 24 bytes per surviving row regardless of document size. Everything
upstream is embarrassingly parallel map work; the benchmark n-gram set is
built once and broadcast via ``ray.put``.

Stage order is part of the contract (and of the SQL mirror): filters
first, THEN dedup — so a duplicate group's representative is the smallest
doc_id among *clean* members, not a contaminated one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.corpus import benchmark_ngram_set, word_ngram_hashes
from ..functions.text import LangId, QualityScore
from ..stages.relational import read_table


def corpus_prep(
    sf_dir: str,
    lang: str = "en",
    min_quality: int = 55,
    ngram: int = 5,
    hash_fn: str = "md5",
):
    """Returns the surviving ``doc_id`` column (benchmark docs — doc_id %
    20 == 0 — are the holdout, never part of the training corpus)."""
    import ray
    from ray.data.aggregate import Min

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    # benchmark n-gram set from the RAW corpus holdout, broadcast once
    bench_ds = docs.map_batches(
        lambda t: t.filter(pc.equal(_mod20(t.column("doc_id")), 0)),
        batch_format="pyarrow",
    )
    bench = benchmark_ngram_set(bench_ds, n=ngram, hash_fn=hash_fn)
    ref = ray.put(bench)

    scored = (
        docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 8))
    )

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.equal(t.column("lang_pred"), lang),
                pc.greater_equal(t.column("quality"), min_quality),
            ),
            pc.not_equal(_mod20(t.column("doc_id")), 0),
        )
        return t.filter(m).select(["doc_id", "text"])

    class _Flag:
        """Contamination flag INLINE on the (doc_id, text) stream — same
        kernel as functions.corpus.Decontaminator, but text passes through
        so the dedup stage downstream needs no join back."""

        def __init__(self):
            self.bench = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            hs = word_ngram_hashes(b["text"], n=ngram, hash_fn=hash_fn)
            lens = np.array([len(h) for h in hs], dtype=np.int64)
            flagged = np.zeros(len(b), dtype=bool)
            if lens.sum() > 0 and len(self.bench) > 0:
                flat = np.concatenate(hs)
                doc_idx = np.repeat(np.arange(len(hs)), lens)
                hit = np.isin(flat, self.bench)
                flagged = np.bincount(doc_idx[hit], minlength=len(hs)) > 0
            return b[~flagged]

    clean = scored.map_batches(keep, batch_format="pyarrow").map_batches(
        _Flag, batch_format="pandas", concurrency=(1, 8)
    )

    def key_hash(t: pa.Table) -> pa.Table:
        txt = np.asarray(t.column("text"), dtype=object)
        h1 = pd.util.hash_array(txt, hash_key="dedupexactkey__1")
        h2 = pd.util.hash_array(txt, hash_key="dedupexactkey__2")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
            }
        )

    out = (
        clean.map_batches(key_hash, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id"))
    )
    return out.map_batches(
        lambda t: t.rename_columns(["h1", "h2", "doc_id"]).select(["doc_id"]),
        batch_format="pyarrow",
    )


def _mod20(col):
    # integer doc_id % 20 via subtract(div-truncate) — pc.divide on int64
    # truncates toward zero and doc_ids are non-negative
    return pc.subtract(col, pc.multiply(pc.divide(col, 20), 20))
