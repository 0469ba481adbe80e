"""Persisted inverted index + conjunctive/disjunctive term search over the
documents table — the text analog of the persisted ANN index
(functions/similarity.py build/query split): build ONCE as a streaming Ray
Data job, query MANY times touching only the buckets the query terms hash
to.

The reference has no search surface; this extends its filter/lookup family
(SURVEY.md §2.3/§2.6 — membership checks, selective reads) to full-text
term lookup, which a 100-TB training corpus needs for targeted audits
("every document containing these two terms") without a full scan.

Scale shape:
- build: one explode map (distinct ``(term, doc_id)`` pairs — the text
  itself never leaves the scan stage), one hive-partitioned parquet write
  keyed by ``bucket = siphash(term) % num_buckets``. Postings land sorted
  by term within each file so parquet row-group stats prune at query time.
- query: read ONLY the buckets the query terms hash to, with a parquet
  ``term IN (...)`` filter pushed into the scan; AND semantics is a
  ``groupby(doc_id).count() == n_terms`` over the (already distinct)
  postings — one small shuffle over the matching postings only.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

_META = "_index.json"


def _term_buckets(terms: list[str] | np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per term: pandas SipHash (fixed key, stable
    across processes/hosts — the same determinism contract det_keys and the
    encode pipeline's conv hashing rely on) mod num_buckets."""
    arr = np.asarray(terms, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    return (pd.util.hash_array(arr) % np.uint64(num_buckets)).astype(np.int64)


def build_inverted_index(
    docs_ds,
    out_dir: str,
    num_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    scored: bool = False,
) -> str:
    """Build the index: distinct ``(term, doc_id)`` postings, hive-
    partitioned by term-hash bucket, each file sorted by term for
    row-group pruning. Returns ``out_dir``.

    ``scored=True`` additionally stores per-posting ``tf`` (term frequency
    in the doc) and ``dl`` (doc token length) — the per-posting state BM25
    needs — plus corpus stats (``n_docs`` with ≥1 token, ``total_tokens``)
    in the meta, gathered by a second columns-pruned pass over the docs
    (two tiny ints per batch to the driver). The extra columns are int32
    and dictionary/RLE-friendly; ``search_terms`` ignores them, so a scored
    index serves both boolean and ranked queries."""
    from etl_sql_duckdb_parquet__ray.functions.text import (
        _DistinctTermPairs,
        _explode_tokens,
    )

    pairs_stage = _DistinctTermPairs(id_col, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = pairs_stage(batch)
        pairs["bucket"] = _term_buckets(pairs["term"].to_numpy(), num_buckets)
        return pairs.sort_values(["term", id_col], kind="mergesort")

    def explode_scored(batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, flat, lens = _explode_tokens(batch[text_col])
        if not len(flat):
            return pd.DataFrame(
                {
                    id_col: np.empty(0, dtype=np.int64),
                    "term": [],
                    "tf": np.empty(0, dtype=np.int32),
                    "dl": np.empty(0, dtype=np.int32),
                    "bucket": np.empty(0, dtype=np.int64),
                }
            )
        tf = (
            pd.DataFrame({"d": doc_idx, "term": flat})
            .groupby(["d", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        ids = batch[id_col].to_numpy()
        d = tf["d"].to_numpy()
        out = pd.DataFrame(
            {
                id_col: ids[d],
                "term": tf["term"].to_numpy(),
                "tf": tf["tf"].to_numpy().astype(np.int32),
                "dl": lens[d].astype(np.int32),
            }
        )
        out["bucket"] = _term_buckets(out["term"].to_numpy(), num_buckets)
        return out.sort_values(["term", id_col], kind="mergesort")

    os.makedirs(out_dir, exist_ok=True)
    postings = docs_ds.map_batches(
        explode_scored if scored else explode, batch_format="pandas"
    )
    postings.write_parquet(os.path.join(out_dir, "postings"), partition_cols=["bucket"])
    meta = {"num_buckets": num_buckets, "id_col": id_col, "hash": "pd-siphash"}
    if scored:
        # corpus stats for BM25: one pruned second pass, 2 ints per batch
        def stats(batch: pd.DataFrame) -> pd.DataFrame:
            lens = batch[text_col].fillna("").str.split().str.len()
            return pd.DataFrame(
                {
                    "nd": [int((lens > 0).sum())],
                    "tt": [int(lens.sum())],
                }
            )

        agg = (
            docs_ds.map_batches(stats, batch_format="pandas")
            .sum(["nd", "tt"])
        )
        meta.update(
            scored=True,
            n_docs=int(agg["sum(nd)"]),
            total_tokens=int(agg["sum(tt)"]),
        )
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return out_dir


def search_terms(index_dir: str, terms: list[str], mode: str = "and"):
    """Find documents containing the query terms (``mode="and"``: all of
    them; ``"or"``: any). Reads ONLY the buckets the terms hash to, with
    the term membership filter pushed into the parquet scan; returns a
    Dataset of ``(doc_id,)`` sorted ascending.

    AND is exact because build wrote DISTINCT per-doc postings: a doc
    matching ``n`` query terms contributes exactly ``n`` rows, so
    ``count == n`` ⇔ every term present."""
    import pyarrow.dataset as pads
    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    buckets = sorted(set(_term_buckets(terms, meta["num_buckets"]).tolist()))
    # pyarrow wants file paths when given a list — enumerate each hit
    # bucket's parquet files (cheap: one listdir per probed bucket)
    paths = []
    for b in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return ray.data.from_items([]).map_batches(
            lambda b: pd.DataFrame({id_col: np.empty(0, dtype=np.int64)}),
            batch_format="pandas",
        )
    ds = ray.data.read_parquet(
        paths, columns=[id_col, "term"], filter=pads.field("term").isin(terms)
    )
    if mode == "or":
        return ds.groupby(id_col).count().select_columns([id_col]).sort(id_col)
    n = len(terms)

    def keep_full(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["count()"] == n, [id_col]]

    return (
        ds.groupby(id_col)
        .count()
        .map_batches(keep_full, batch_format="pandas")
        .sort(id_col)
    )


def _probed_paths(index_dir: str, terms: list[str], num_buckets: int) -> list[str]:
    """Parquet files of the buckets the query terms hash to — the path-level
    pruning shared by boolean and ranked search."""
    buckets = sorted(set(_term_buckets(terms, num_buckets).tolist()))
    paths = []
    for b in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return paths


def bm25_search(
    index_dir: str,
    terms: list[str],
    k: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25-ranked retrieval over a ``scored=True`` inverted index — the
    ranked counterpart of :func:`search_terms`, extending the reference's
    filter/lookup family to relevance-ordered corpus audits ("the documents
    MOST about these terms", not just "containing them").

    Per-doc score: ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the Robertson/Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))`` — always
    positive, so adding a matched term never lowers a score.

    Scale shape: two reads of ONLY the probed buckets' postings with the
    term filter pushed into the scan — pass 1 aggregates per-term ``df``
    (≤ n_terms rows to the driver), pass 2 maps the closed-form per-posting
    contribution (idf table rides the task closure: n_terms floats) and one
    ``groupby(doc_id).sum`` over the matched postings only. The corpus
    text never travels; N/avgdl are two scalars from the build-time meta.
    ``k=None`` returns every matching doc scored (deterministic result
    set); an integer ``k`` applies a (score DESC, doc_id ASC) top-k cut.
    """
    import pyarrow.dataset as pads
    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    if not meta.get("scored"):
        raise ValueError(
            f"index at {index_dir} was built without scored=True; "
            "BM25 needs per-posting tf/dl — rebuild with "
            "build_inverted_index(..., scored=True)"
        )
    id_col = meta["id_col"]
    n_docs, total_tokens = meta["n_docs"], meta["total_tokens"]
    avgdl = total_tokens / n_docs if n_docs else 1.0
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    paths = _probed_paths(index_dir, terms, meta["num_buckets"])
    empty = pd.DataFrame(
        {id_col: np.empty(0, dtype=np.int64), "score": np.empty(0)}
    )
    if not paths:
        return ray.data.from_items([]).map_batches(
            lambda _: empty, batch_format="pandas"
        )
    flt = pads.field("term").isin(terms)
    # pass 1: per-term document frequency (n_terms scalars to the driver)
    df_rows = (
        ray.data.read_parquet(paths, columns=["term"], filter=flt)
        .groupby("term")
        .count()
        .take_all()  # bounded: <= len(terms) rows
    )
    idf = {
        r["term"]: float(
            np.log1p((n_docs - r["count()"] + 0.5) / (r["count()"] + 0.5))
        )
        for r in df_rows
    }
    if not idf:
        return ray.data.from_items([]).map_batches(
            lambda _: empty, batch_format="pandas"
        )

    def contrib(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["term"].map(idf).to_numpy(dtype=np.float64)
        tf = batch["tf"].to_numpy(dtype=np.float64)
        dl = batch["dl"].to_numpy(dtype=np.float64)
        score = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "score": score})

    scored = (
        ray.data.read_parquet(
            paths, columns=[id_col, "term", "tf", "dl"], filter=flt
        )
        .map_batches(contrib, batch_format="pandas")
        .groupby(id_col)
        .sum("score")
        .map_batches(
            lambda t: t.rename(columns={"sum(score)": "score"}),
            batch_format="pandas",
        )
    )
    if k is None:
        return scored.sort(id_col)
    return scored.sort(
        ["score", id_col], descending=[True, False]
    ).limit(int(k))
