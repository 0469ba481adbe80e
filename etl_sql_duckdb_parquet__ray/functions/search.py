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
) -> str:
    """Build the index: distinct ``(term, doc_id)`` postings, hive-
    partitioned by term-hash bucket, each file sorted by term for
    row-group pruning. Returns ``out_dir``."""
    from etl_sql_duckdb_parquet__ray.functions.text import _DistinctTermPairs

    pairs_stage = _DistinctTermPairs(id_col, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = pairs_stage(batch)
        pairs["bucket"] = _term_buckets(pairs["term"].to_numpy(), num_buckets)
        return pairs.sort_values(["term", id_col], kind="mergesort")

    os.makedirs(out_dir, exist_ok=True)
    postings = docs_ds.map_batches(explode, batch_format="pandas")
    postings.write_parquet(os.path.join(out_dir, "postings"), partition_cols=["bucket"])
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(
            {"num_buckets": num_buckets, "id_col": id_col, "hash": "pd-siphash"}, f
        )
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
