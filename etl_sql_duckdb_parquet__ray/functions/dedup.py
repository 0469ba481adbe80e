"""Deduplication family over the documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (100 TB): every variant reduces to *hash-partition by a derived
key, then per-group work* — the same shuffle shape as the encode pipeline's
``conv_id`` bucketing. Nothing broadcasts the corpus and nothing funnels
through the driver:

- the MinHash band stage ships only ``(doc_id, band, bucket)`` rows (24
  bytes/row), never the 64-perm signatures — candidates are re-verified from
  text, so the signatures are not needed downstream;
- candidate verification is a double hash-partitioned join of the pair list
  against the corpus (``Dataset.join``), not a driver-side text dict;
- connected components run as iterative min-label propagation
  (join + groupby-min per round, O(component diameter) rounds), not a
  driver union-find;
- the final drop is a native hash-partitioned ``left_anti`` join.

The reference has no near-dedup (SURVEY.md §2.9); its exact dedup
(``src/etl/transform.py:52-57``) is the D1 analog here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import popcount64, token_hashes


def _rename(ds, mapping: dict):
    """Block-format-safe column rename: ``Dataset.rename_columns``'s Project
    operator assumes Arrow blocks and breaks on pandas-block datasets (e.g.
    ``from_pandas`` test inputs); a pyarrow map_batches normalizes both."""
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])
    return ds.map_batches(f, batch_format="pyarrow")


def _strip_empty_blocks(ds):
    """``Dataset.join`` emits zero-row blocks with an EMPTY schema, and
    ``map_batches`` passes empty blocks through without calling the UDF —
    so those schema-less blocks survive every transform and crash the next
    join's per-partition Arrow join ("No match for FieldRef ... "). Strip
    them at a materialization barrier: metadata-only (num_rows per block),
    no block ever moves to the driver. Requires Arrow-block input (all call
    sites are outputs of pyarrow map_batches stages)."""
    import ray
    import ray.data

    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if (meta.num_rows or 0) > 0
    ]
    if not refs:
        return mat
    return ray.data.from_arrow_refs(refs)


# -- MinHash -----------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(texts: pd.Series, n: int = 3) -> list[np.ndarray]:
    """Word n-gram shingles as uint64 hashes: combine consecutive token
    hashes with a polynomial mix (vectorized per doc)."""
    toks = token_hashes(texts)
    out = []
    B = np.uint64(1099511628211)
    for h in toks:
        if len(h) < n:
            out.append(np.unique(h))
            continue
        acc = h[: len(h) - n + 1].copy()
        for j in range(1, n):
            acc = acc * B + h[j : len(h) - n + 1 + j]
        out.append(np.unique(acc))
    return out


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature: min over (a*x+b mod p) per perm."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (perm, shingle) product with wraparound is fine for min-stability
    vals = (shingles[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: per-doc MinHash signatures -> LSH band rows.
    Emits ONLY ``(doc_id, band, bucket)`` — one row per (doc, band), built
    with numpy repeat/tile and a single vectorized hash over all band
    segments; the signatures themselves never leave the task (candidates
    are exact-verified from text downstream, so shipping 64x8 bytes per
    band row would only multiply shuffle volume). Permutation parameters
    are built once per actor in ``__init__``."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = shingle_hashes(batch["text"], self.shingle_n)
        sigs = np.stack([minhash_signature(s, self.a, self.b) for s in sh])
        return band_rows_from_sigs(
            batch["doc_id"].to_numpy(), sigs, self.bands
        )


def band_rows_from_sigs(doc_ids: np.ndarray, sigs: np.ndarray,
                        bands: int) -> pd.DataFrame:
    """(doc_id, band, bucket) rows from an (n, num_perm) signature matrix —
    ONE vectorized hash over all band segments (each rows-wide segment
    viewed as a struct record). Shared by the one-shot LSH stage and the
    persisted-index build/probe paths so bucketing is bit-identical."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    flat = np.ascontiguousarray(sigs).reshape(n * bands, rows)
    buckets = pd.util.hash_array(
        flat.view([("", np.uint64)] * rows).ravel()
    )
    return pd.DataFrame(
        {
            "doc_id": np.repeat(np.asarray(doc_ids), bands),
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            "bucket": buckets.astype(np.int64),
        }
    )


def _bucket_candidates(g: pd.DataFrame, max_bucket: int = 256) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket. Buckets are tiny by
    construction; a pathological mega-bucket (boilerplate text) is linked
    as a sorted chain instead of all-pairs — connectivity for the
    components stage is preserved while rows stay linear in bucket size."""
    ids = np.unique(g["doc_id"].to_numpy())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)})
    if n > max_bucket:
        return pd.DataFrame({"doc_a": ids[:-1], "doc_b": ids[1:]})
    iu, ju = np.triu_indices(n, k=1)
    return pd.DataFrame({"doc_a": ids[iu], "doc_b": ids[ju]})


def _distinct_pairs(pairs):
    """Distinct (doc_a, doc_b) via a hash aggregate — no per-group Python."""
    out = pairs.groupby(["doc_a", "doc_b"]).count()
    return out.drop_columns([c for c in out.columns() if c not in ("doc_a", "doc_b")])


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                            shingle_n: int = 3, max_bucket: int = 256):
    """documents Dataset -> distinct candidate pairs via MinHash + LSH
    banding: signature stage (actor pool) -> groupby (band, bucket) ->
    per-bucket pairs -> distinct. No signatures shipped, no threshold —
    candidates are exact-verified from text by the caller."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    pairs = band_rows.groupby(["band", "bucket"]).map_groups(
        lambda g: _bucket_candidates(g, max_bucket), batch_format="pandas"
    )
    return _distinct_pairs(pairs)


def minhash_dup_pairs(ds, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """documents Dataset -> exact-verified near-dup pairs: MinHash+LSH
    candidate generation, then distributed n-gram-Jaccard verification
    (two hash joins against the corpus — the texts never collect on the
    driver). Returns (doc_a, doc_b, jaccard) with jaccard >= threshold."""
    cands = minhash_candidate_pairs(ds.select_columns(["doc_id", "text"]),
                                    num_perm=num_perm, bands=bands)
    return verify_pairs_distributed(ds, cands, threshold)


# -- n-gram Jaccard (exact verification) ------------------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa, sb = (
        set(map(int, s))
        for s in shingle_hashes(pd.Series([text_a or "", text_b or ""]), n)
    )
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _pair_jaccard_batch(batch: pd.DataFrame, threshold: float, n: int) -> pd.DataFrame:
    """Exact Jaccard for a batch of (doc_a, text_a, doc_b, text_b) pairs:
    one vectorized shingle pass over all 2k texts, then per-pair sorted-set
    intersection (the sets are per-pair variable-length; the loop is per
    PAIR with numpy set kernels inside, not per token)."""
    texts = pd.concat([batch["text_a"], batch["text_b"]], ignore_index=True)
    sh = shingle_hashes(texts.fillna(""), n)
    k = len(batch)
    ja = np.empty(k, dtype=np.float64)
    for i in range(k):
        sa, sb = sh[i], sh[k + i]
        if len(sa) == 0 and len(sb) == 0:
            ja[i] = 1.0
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        ja[i] = inter / max(len(sa) + len(sb) - inter, 1)
    keep = ja >= threshold
    return pd.DataFrame(
        {
            "doc_a": batch["doc_a"].to_numpy()[keep],
            "doc_b": batch["doc_b"].to_numpy()[keep],
            "jaccard": ja[keep],
        }
    )


def verify_pairs_distributed(ds_docs, pairs_ds, threshold: float, n: int = 3,
                             broadcast_limit: int = 200_000):
    """Exact n-gram Jaccard over candidate pairs, size-adaptive (the same
    rule as broadcast-vs-shuffle joins): a SMALL candidate set (≤
    ``broadcast_limit`` pairs — known exactly, the pairs are materialized)
    gathers just the candidate texts with one distributed filter and
    verifies with the vectorized pair kernel, skipping two hash-join
    aggregator-actor pools whose startup dwarfs small workloads; a LARGE
    set takes the join path, where nothing ever collects on the driver."""
    from ..stages.relational import hash_join

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))
    if n_pairs <= broadcast_limit:
        import ray.data

        pairs = pairs_ds.to_pandas()
        need = np.unique(np.concatenate([
            pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()
        ]))
        need_arr = pa.array(need, type=pa.int64())
        got = pa.concat_tables([
            b for b in ds_docs.select_columns(["doc_id", "text"]).map_batches(
                lambda t: t.filter(pc.is_in(t.column("doc_id"), value_set=need_arr)),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow") if b.num_rows
        ]) if len(need) else pa.table({"doc_id": [], "text": []})
        texts = dict(zip(
            got.column("doc_id").to_pylist(), got.column("text").to_pylist()
        ))
        df = pd.DataFrame({
            "doc_a": pairs["doc_a"].to_numpy(),
            "doc_b": pairs["doc_b"].to_numpy(),
            "text_a": [texts.get(int(a), "") for a in pairs["doc_a"]],
            "text_b": [texts.get(int(b), "") for b in pairs["doc_b"]],
        })
        return ray.data.from_pandas(_pair_jaccard_batch(df, threshold, n))
    docs = ds_docs.select_columns(["doc_id", "text"])
    da = _rename(docs, {"doc_id": "doc_a", "text": "text_a"})
    db = _rename(docs, {"doc_id": "doc_b", "text": "text_b"})
    # materialize between the two joins: each JoinOperator reserves a CPU
    # budget for its aggregator actors, and two live pools deadlock small
    # clusters (see hash_join docstring); strip the join's empty blocks
    ja = _strip_empty_blocks(hash_join(pairs_ds, da, on="doc_a"))
    j = hash_join(ja, db, on="doc_b")
    return j.map_batches(
        lambda b: _pair_jaccard_batch(b, threshold, n), batch_format="pandas"
    )


def verify_pairs_exact(ds_docs, pairs: pd.DataFrame, threshold: float, n: int = 3):
    """Small-scale convenience verifier for a DRIVER-side pair DataFrame
    (tests / interactive use): broadcast only the candidate texts. For the
    scale path use :func:`verify_pairs_distributed`."""
    needed = set(int(x) for x in pairs["doc_a"]) | set(int(x) for x in pairs["doc_b"])
    need_arr = pa.array(sorted(needed), type=pa.int64())
    texts = {
        int(r["doc_id"]): r["text"]
        for r in ds_docs.map_batches(
            lambda t: t.filter(pc.is_in(t.column("doc_id"), value_set=need_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    out = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        j = ngram_jaccard(texts.get(int(a), ""), texts.get(int(b), ""), n)
        if j >= threshold:
            out.append((int(a), int(b), j))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])


# -- SimHash near-dup --------------------------------------------------------

def simhash_dup_pairs(ds, max_hamming: int = 3):
    """SimHash near-dup: 4 rotations × 16-bit block keys so any pair within
    Hamming distance ≤3 collides in ≥1 block (pigeonhole over 4 blocks);
    groupby block key, verify Hamming distance per bucket."""
    from .text import SimHash

    sh = ds.map_batches(SimHash, batch_format="pandas", concurrency=(1, 4))

    def explode_blocks(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        h = batch["simhash"].to_numpy(dtype=np.uint64)
        blk = np.tile(np.arange(4, dtype=np.int32), n)
        keys = (
            (h[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :])
            & np.uint64(0xFFFF)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), 4),
                "blk": blk,
                "key": keys.ravel(),
                "simhash": np.repeat(h, 4),
            }
        )

    exploded = sh.map_batches(explode_blocks, batch_format="pandas")

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        docs = g.drop_duplicates("doc_id")
        ids = docs["doc_id"].to_numpy()
        hs = docs["simhash"].to_numpy(dtype=np.uint64)
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        ham = popcount64(hs[iu] ^ hs[ju])
        keep = ham <= max_hamming
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "doc_a": np.minimum(a, b),
                "doc_b": np.maximum(a, b),
                "hamming": ham[keep].astype(np.int64),
            }
        )

    pairs = exploded.groupby(["blk", "key"]).map_groups(bucket_verify, batch_format="pandas")
    out = pairs.groupby(["doc_a", "doc_b"]).min("hamming")
    return _rename(out, {"min(hamming)": "hamming"})


# -- embedding cosine near-dup ----------------------------------------------

class _HyperplaneAssign:
    """Actor-pool stage: random-hyperplane LSH bucket keys, ``n_tables``
    independent plane sets per vector (multi-table amplification: a pair at
    cosine c collides in >=1 table with prob 1-(1-p^b)^L, p=1-acos(c)/pi).
    Emits ONLY ``(vec_id, table, bucket)`` — the vectors themselves never
    enter the shuffle; candidate pairs are re-verified with an exact cosine
    through a join against the embeddings table. Planes are built lazily on
    the first batch (dim read from the data) with a fixed seed, so every
    actor derives the identical plane set."""

    def __init__(self, n_planes: int, n_tables: int, seed: int):
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed
        self.planes = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((self.n_tables, self.n_planes, V.shape[1]))
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        n = len(batch)
        keys = np.empty((n, self.n_tables), dtype=np.int64)
        weights = 1 << np.arange(self.n_planes)
        for t in range(self.n_tables):
            keys[:, t] = ((V @ self.planes[t].T) > 0) @ weights
        return pd.DataFrame(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), self.n_tables),
                "table": np.tile(np.arange(self.n_tables, dtype=np.int32), n),
                "bucket": keys.ravel(),
            }
        )


def _bucket_id_pairs(g: pd.DataFrame, id_col: str, max_bucket: int) -> pd.DataFrame:
    ids = np.unique(g[id_col].to_numpy())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"vec_a": np.empty(0, np.int64), "vec_b": np.empty(0, np.int64)})
    if n > max_bucket:
        return pd.DataFrame({"vec_a": ids[:-1], "vec_b": ids[1:]})
    iu, ju = np.triu_indices(n, k=1)
    return pd.DataFrame({"vec_a": ids[iu], "vec_b": ids[ju]})


def embedding_dup_pairs(
    ds_emb,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 11,
):
    """Embedding near-dup via multi-table random-hyperplane LSH (scale
    path: no all-pairs across the corpus, no vectors in the shuffle):
    per-table sign-pattern bucket key -> per-bucket candidate ID pairs ->
    distinct -> exact cosine via two hash joins against the embeddings
    table (row-wise einsum, fully vectorized). ``n_tables`` independent
    tables amplify recall (identical vectors always collide; 0.95-cosine
    pairs collide in >=1 of 4 tables w.p. ~0.99 at 12 planes); exact
    verification keeps precision exact — LSH only gates candidates.
    Returns (vec_a, vec_b, cosine_milli)."""
    from ..stages.relational import hash_join

    assigned = ds_emb.map_batches(
        _HyperplaneAssign,
        fn_constructor_kwargs={"n_planes": n_planes, "n_tables": n_tables, "seed": seed},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    cands = assigned.groupby(["table", "bucket"]).map_groups(
        lambda g: _bucket_id_pairs(g, "vec_id", 4096), batch_format="pandas"
    )
    distinct = cands.groupby(["vec_a", "vec_b"]).count()
    distinct = distinct.drop_columns(
        [c for c in distinct.columns() if c not in ("vec_a", "vec_b")]
    )

    distinct = distinct.materialize()
    if distinct.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine_milli": pa.array([], pa.int64()),
        }))

    def pack(b: pd.DataFrame) -> pa.Table:
        # Arrow's hash join rejects list / tensor payload columns outright;
        # pack each float32 vector into one binary cell (vectorized: one
        # stack + one tobytes for the whole batch)
        V = np.ascontiguousarray(np.stack(b["embedding"].to_numpy()), dtype=np.float32)
        n, dim = V.shape
        offs = (np.arange(n + 1, dtype=np.int32) * (4 * dim))
        arr = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(V.tobytes())],
        )
        return pa.table({"vec_id": pa.array(b["vec_id"].to_numpy()), "embedding": arr})

    def unpack(col: pd.Series) -> np.ndarray:
        flat = np.frombuffer(b"".join(col.to_numpy()), dtype=np.float32)
        return flat.reshape(len(col), -1)

    def exact_cosine(b: pd.DataFrame) -> pd.DataFrame:
        Va = unpack(b["emb_a"]).astype(np.float64)
        Vb = unpack(b["emb_b"]).astype(np.float64)
        Va /= np.maximum(np.linalg.norm(Va, axis=1, keepdims=True), 1e-12)
        Vb /= np.maximum(np.linalg.norm(Vb, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", Va, Vb)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "vec_a": b["vec_a"].to_numpy()[keep],
                "vec_b": b["vec_b"].to_numpy()[keep],
                "cosine_milli": np.floor(cos[keep] * 1000).astype(np.int64),
            }
        )

    n_cands = distinct.count()
    if n_cands <= 200_000:
        # small candidate set (size-adaptive, same rule as
        # verify_pairs_distributed): gather just the candidate vectors with
        # one distributed filter; skip two join-aggregator pools
        import ray.data

        cand = distinct.to_pandas()
        need = np.unique(np.concatenate([
            cand["vec_a"].to_numpy(), cand["vec_b"].to_numpy()
        ]))
        need_arr = pa.array(need, type=pa.int64())
        got = pa.concat_tables([
            b for b in ds_emb.select_columns(["vec_id", "embedding"]).map_batches(
                pack, batch_format="pandas"
            ).map_batches(
                lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=need_arr)),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow") if b.num_rows
        ])
        vecs = dict(zip(
            got.column("vec_id").to_pylist(), got.column("embedding").to_pylist()
        ))
        df = pd.DataFrame({
            "vec_a": cand["vec_a"].to_numpy(),
            "vec_b": cand["vec_b"].to_numpy(),
            "emb_a": [vecs[int(a)] for a in cand["vec_a"]],
            "emb_b": [vecs[int(b)] for b in cand["vec_b"]],
        })
        return ray.data.from_pandas(exact_cosine(df))

    emb = ds_emb.select_columns(["vec_id", "embedding"]).map_batches(
        pack, batch_format="pandas"
    )
    ea = _rename(emb, {"vec_id": "vec_a", "embedding": "emb_a"})
    eb = _rename(emb, {"vec_id": "vec_b", "embedding": "emb_b"})
    # one live JoinOperator at a time (see hash_join docstring)
    ja = _strip_empty_blocks(hash_join(distinct, ea, on="vec_a"))
    j = hash_join(ja, eb, on="vec_b")
    return j.map_batches(exact_cosine, batch_format="pandas")


# -- distributed connected components ----------------------------------------

def _star_round(edges_ds, large: bool):
    """One large-star or small-star contraction step (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), as a single
    groupby shuffle: group the bidirectional adjacency by center node, find
    the neighborhood minimum m = min(N(n) + {n}), and re-hook
    neighbors-greater-than-n (large) or neighbors-at-most-n plus the center
    itself (small) directly onto m. Neighbor lists are deduped per group
    (np.unique) so edge multiplicity cannot snowball across rounds."""

    def bidir(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["src"].iloc[0])
        N = np.unique(g["dst"].to_numpy())
        m = min(int(N[0]), n)
        if large:
            targets = N[N > n]
        else:
            targets = np.append(N[N <= n], n)
        targets = targets[targets != m]
        return pd.DataFrame(
            {"a": np.minimum(targets, m), "b": np.maximum(targets, m)}
        )

    return edges_ds.map_batches(bidir, batch_format="pyarrow").groupby(
        "src"
    ).map_groups(per_node, batch_format="pandas")


def _edge_signature(edges_ds) -> tuple[int, int]:
    """Order-independent (count, hash-sum) fingerprint of an edge Dataset —
    the distributed convergence certificate for the star rounds (two scalars
    reach the driver, never the edges)."""
    def h(t: pa.Table) -> pa.Table:
        v = pd.util.hash_pandas_object(
            t.select(["a", "b"]).to_pandas(), index=False
        ).to_numpy()
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "s": pa.array([int(v.sum(dtype=np.uint64) & np.uint64((1 << 62) - 1))], pa.int64()),
        })

    parts = edges_ds.map_batches(h, batch_format="pyarrow").take_all()
    return (
        int(sum(p["n"] for p in parts)),
        int(sum(p["s"] for p in parts) & ((1 << 62) - 1)),
    )


def _local_components(edges: pa.Table) -> "pa.Table":
    """Union-find on a DRIVER-side edge table — used only below the
    size-adaptive cutoff (same broadcast-vs-shuffle rule as everywhere
    else: the edge list is KNOWN small, so a shuffle round-trip per star
    round is pure overhead). Path-compressed, vectorized relabel."""
    a = edges.column("a").to_numpy(zero_copy_only=False)
    b = edges.column("b").to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(ia, ib):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            # union by min label so the root IS the component minimum
            lo, hi = (rx, ry) if nodes[rx] <= nodes[ry] else (ry, rx)
            parent[hi] = lo
    roots = np.array([find(int(i)) for i in range(len(nodes))], dtype=np.int64)
    return pa.table({"node": nodes, "label": nodes[roots]})


def distributed_components(pairs_ds, max_iters: int = 32,
                           local_limit: int = 2_000_000):
    """Connected components over an edge Dataset (doc_a, doc_b) WITHOUT
    driver-side union-find: alternating large-star / small-star contraction
    (Kiveris et al. SoCC'14), O(log^2 n) rounds with ~6 observed in
    practice, every round ONE groupby shuffle over the current edge set.
    No ``Dataset.join`` anywhere — a join round would spin up a fresh
    aggregator-actor pool whose startup cost dwarfs the data work.

    Plain min-label propagation (even with pointer jumping) needs
    O(diameter)-ish rounds on path-shaped components — measured 39 rounds
    on a 100-node random path where this converges in 6.

    Returns (node, label) with label = component minimum; only two scalars
    (the edge-set fingerprint) touch the driver per round.

    Size-adaptive: an edge set at or below ``local_limit`` (count known —
    the edges are materialized either way) resolves with a driver-side
    union-find instead, because 2 shuffle rounds x ~6 star iterations is
    pure overhead when the edges fit in one task's memory; pass
    ``local_limit=0`` to force the distributed path (the planted-clique
    test does)."""
    import ray.data

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({"a": np.minimum(a, b), "b": np.maximum(a, b)})

    edges = _strip_empty_blocks(
        pairs_ds.select_columns(["doc_a", "doc_b"]).map_batches(
            canon, batch_format="pyarrow"
        )
    )
    if edges.count() <= local_limit:
        tbl = pa.concat_tables(
            b for b in edges.iter_batches(batch_format="pyarrow") if b.num_rows
        )
        return ray.data.from_arrow(_local_components(tbl))
    prev_sig = None
    for _ in range(max_iters):
        edges = _star_round(edges, large=True)
        edges = _star_round(edges, large=False).materialize()
        sig = _edge_signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged stars: every child points at its component root; labels =
    # min over (neighbors + self) per node
    def with_self(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": np.concatenate([a, b, a, b]),
            "dst": np.concatenate([b, a, a, b]),
        })

    labels = _rename(
        edges.map_batches(with_self, batch_format="pyarrow")
        .groupby("src").min("dst"),
        {"src": "node", "min(dst)": "label"},
    )
    return _strip_empty_blocks(labels)


# -- end-to-end near-dup removal --------------------------------------------

def dedup_corpus(ds_docs, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """Full near-dedup pipeline, end-to-end distributed: MinHash+LSH
    candidates -> exact n-gram Jaccard verification (hash joins, no driver
    text dict) -> min-label-propagation components -> drop every doc whose
    canonical label is a different (smaller) doc_id via a native
    hash-partitioned LEFT ANTI join. Returns the deduplicated Dataset (all
    columns preserved). No stage materializes pairs or texts on the
    driver — safe at web-scale dup ratios."""
    from ..stages.relational import hash_join

    pairs = minhash_dup_pairs(
        ds_docs.select_columns(["doc_id", "text"]),
        threshold=threshold, num_perm=num_perm, bands=bands,
    ).materialize()
    if pairs.count() == 0:
        return ds_docs
    labels = distributed_components(pairs)
    drop = labels.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("node"), t.column("label"))),
        batch_format="pyarrow",
    ).select_columns(["node"])
    drop = _strip_empty_blocks(_rename(drop, {"node": "doc_id"}))
    n_drop = drop.count()
    if n_drop == 0:
        return ds_docs
    if n_drop <= 1_000_000:
        # small drop set: broadcast an is_in filter instead of paying a
        # hash-join aggregator pool (same broadcast-vs-shuffle rule as
        # verify_pairs_distributed)
        drop_ids = pa.array(
            [r["doc_id"] for r in drop.take_all()], type=pa.int64()
        )
        return ds_docs.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("doc_id"), value_set=drop_ids))
            ),
            batch_format="pyarrow",
        )
    return hash_join(ds_docs, drop, on="doc_id", join_type="left_anti")


# -- incremental exact dedup against a persisted fingerprint index -----------

def _text_keys(t: pa.Table) -> pa.Table:
    """(doc_id, h1, h2): the 128-bit composite text key used by
    ``pipelines.analytics.dedup_exact_docs`` — two independent SipHash-64
    passes, vectorized C via ``pd.util.hash_array``. 24 B/row regardless of
    document size; expected 128-bit birthday collisions at 10^12 docs
    ~1e-15 (the argument for why hash equality == text equality here)."""
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


def build_dedup_index(docs_ds, index_dir: str) -> str:
    """Persist the corpus' exact-dedup fingerprint index: one parquet row
    per document, ``(doc_id, h1, h2)`` — 24 B/row, so a 10^12-doc corpus
    indexes in ~24 TB of cheap columnar storage that is SCANNED (never
    shuffled, never driver-resident) by incremental lookups. The analog of
    the encode manifest's build-once/query-many split for ANN indexes."""
    docs_ds.map_batches(_text_keys, batch_format="pyarrow").write_parquet(index_dir)
    return index_dir


def append_dedup_index(docs_ds, index_dir: str) -> str:
    """Add a new tick's keys to the index (new parquet files beside the old
    — readers glob the directory, so appends are atomic per file)."""
    return build_dedup_index(docs_ds, index_dir)


def incremental_exact_dedup(new_ds, index_dir: str, max_broadcast: int = 2_000_000):
    """Deduplicate a NEW batch of documents against a persisted corpus
    index without reprocessing the corpus: keep each new doc iff (a) its
    text key is absent from the index and (b) it is the min-doc_id holder
    of that key within the batch.

    Scale shape (small tick vs huge corpus): the tick's keys are broadcast
    once (``ray.put``); the index is STREAMED through ``map_batches`` with a
    vectorized ``np.isin`` prefilter on h1 and an Arrow hash-join
    verification of (h1, h2) on the prefiltered rows only — no all-to-all
    exchange sized by the corpus. Ticks above ``max_broadcast`` keys fall
    back to a hash-partitioned join against the index (the exchange is then
    unavoidable and correctly sized by the smaller side's partitions)."""
    import ray

    from ..stages.relational import hash_join

    keyed = new_ds.map_batches(_text_keys, batch_format="pyarrow").materialize()
    index_ds = ray.data.read_parquet(index_dir, columns=["h1", "h2"])

    n_tick = keyed.count()
    if n_tick <= max_broadcast:
        tick_tbl = pa.concat_tables(
            list(keyed.select_columns(["h1", "h2"]).iter_batches(batch_format="pyarrow"))
        )
        h1_sorted = np.sort(np.asarray(tick_tbl.column("h1"), dtype=np.int64))
        ref = ray.put((tick_tbl, h1_sorted))

        def probe(t: pa.Table) -> pa.Table:
            tick, h1s = ray.get(ref)
            h1 = np.asarray(t.column("h1"), dtype=np.int64)
            # prefilter: only rows whose h1 appears in the tick survive —
            # on a deduplicated corpus that is ~only the true duplicates
            if len(h1s):
                pos = np.searchsorted(h1s, h1)
                pos[pos == len(h1s)] = 0
                m = h1s[pos] == h1
            else:
                m = np.zeros(len(h1), dtype=bool)
            if not m.any():
                return pa.table(
                    {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())}
                )
            hit = t.filter(pa.array(m))
            # exact verification: Arrow C++ join of the few prefiltered
            # rows against the broadcast tick keys
            return hit.join(tick, keys=["h1", "h2"], join_type="inner").select(
                ["h1", "h2"]
            )

        dup_keys = pa.concat_tables(
            [
                b
                for b in index_ds.map_batches(probe, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
                if b.num_rows
            ]
            or [pa.table({"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())})]
        )
        # duplicate-key set is bounded by the tick size -> broadcast filter
        dup_ref = ray.put(
            (
                np.sort(np.asarray(dup_keys.column("h1"), dtype=np.int64)),
                dup_keys,
            )
        )

        def keep_new(t: pa.Table) -> pa.Table:
            dup_h1, dup_tbl = ray.get(dup_ref)
            h1 = np.asarray(t.column("h1"), dtype=np.int64)
            if len(dup_h1):
                pos = np.searchsorted(dup_h1, h1)
                pos[pos == len(dup_h1)] = 0
                maybe = dup_h1[pos] == h1
            else:
                maybe = np.zeros(len(h1), dtype=bool)
            if maybe.any():
                hit = t.filter(pa.array(maybe)).join(
                    dup_tbl, keys=["h1", "h2"], join_type="inner"
                )
                bad = hit.column("doc_id").combine_chunks()
                t = t.filter(
                    pc.invert(pc.is_in(t.column("doc_id"), value_set=bad))
                )
            return t

        fresh = keyed.map_batches(keep_new, batch_format="pyarrow")
    else:
        # large tick: hash-partitioned LEFT ANTI join against the index
        fresh = hash_join(
            keyed, index_ds, on=["h1", "h2"], join_type="left_anti"
        )

    # within-tick keep-first (min doc_id per key)
    from ray.data.aggregate import Min

    firsts = fresh.groupby(["h1", "h2"]).aggregate(Min("doc_id"))
    firsts = _rename(firsts, {"min(doc_id)": "doc_id"}).select_columns(["doc_id"])
    ids = pa.array(
        [r["doc_id"] for r in firsts.take_all()], type=pa.int64()
    ) if firsts.count() <= max_broadcast else None
    if ids is not None:
        return new_ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("doc_id"), value_set=ids)),
            batch_format="pyarrow",
        )
    return hash_join(new_ds, firsts, on="doc_id", join_type="inner")


# ---------------------------------------------------------------------------
# paragraph-level dedup (Dolma/CCNet-style: drop repeated units across docs)
# ---------------------------------------------------------------------------

def _unit_rows(t: pa.Table, unit_words: int, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, unit_idx, h1, h2) per fixed-size word block. Only 28 B/row
    hashes enter the dedup exchange — unit text never leaves the batch.
    Split semantics mirror DuckDB ``str_split(text, ' ')`` exactly
    (consecutive spaces yield empty words; NULL text yields no units)."""
    ids = np.asarray(t.column(id_col))
    txt = t.column(text_col).to_pylist()
    out_id, out_idx, units = [], [], []
    for d, s in zip(ids, txt):
        if s is None:
            continue
        words = s.split(" ")
        for i in range(0, len(words), unit_words):
            out_id.append(d)
            out_idx.append(i // unit_words)
            units.append(" ".join(words[i:i + unit_words]))
    ua = np.asarray(units, dtype=object)
    h1 = pd.util.hash_array(ua, hash_key="paradedupkey___1")
    h2 = pd.util.hash_array(ua, hash_key="paradedupkey___2")
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            "unit_idx": pa.array(np.asarray(out_idx, dtype=np.int32)),
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
        }
    )


def paragraph_dedup(docs_ds, unit_words: int = 16, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Paragraph-level exact dedup across the corpus (the Dolma/CCNet unit
    dedup): documents are split into fixed ``unit_words``-word blocks; every
    block that already occurred anywhere else in the corpus (keeper = the
    globally smallest ``(doc_id, unit_idx)``) is dropped, and documents are
    reassembled from their surviving blocks.

    Scale shape — three stages, text crosses ONE exchange:
    1. map: (doc_id, unit_idx, 128-bit block hash) — 28 B/unit, no text;
    2. groupby(hash): keeper = min composite key, emit only DROPPED
       (doc_id, unit_idx) pairs (tiny — the duplicated fraction);
    3. groupby(doc_id) over docs UNION dropped-pairs: re-split locally,
       drop flagged blocks, rejoin. The full text moves once, hash-keyed.

    Composite keeper key is ``doc_id * 2^20 + unit_idx`` (same expression
    the SQL oracle uses): requires 0 <= doc_id < 2^43 and < 2^20 units per
    document. Returns (doc_id, text_dedup, n_units, n_dropped);
    ``text_dedup`` is NULL when every block was dropped (SQL ``string_agg``
    over zero rows)."""
    units = docs_ds.map_batches(
        lambda t: _unit_rows(t, unit_words, id_col, text_col),
        batch_format="pyarrow",
    )

    def dropped_in_group(g: pa.Table) -> pa.Table:
        key = (
            np.asarray(g.column("doc_id")) * (1 << 20)
            + np.asarray(g.column("unit_idx"), dtype=np.int64)
        )
        keep = key != key.min()
        return pa.table(
            {
                "doc_id": g.column("doc_id").filter(pa.array(keep)),
                "unit_idx": g.column("unit_idx").filter(pa.array(keep)),
            }
        )

    dropped = units.groupby(["h1", "h2"]).map_groups(
        dropped_in_group, batch_format="pyarrow"
    )

    def pad_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column(id_col).cast(pa.int64()),
                "text": t.column(text_col),
                "unit_idx": pa.array(
                    np.full(t.num_rows, -1, dtype=np.int32)
                ),
            }
        )

    def pad_dropped(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": pa.nulls(t.num_rows, type=pa.string()),
                "unit_idx": t.column("unit_idx"),
            }
        )

    both = docs_ds.map_batches(pad_docs, batch_format="pyarrow").union(
        dropped.map_batches(pad_dropped, batch_format="pyarrow")
    )

    def rebuild(g: pa.Table) -> pa.Table:
        idx = np.asarray(g.column("unit_idx"))
        doc_rows = np.flatnonzero(idx == -1)
        if len(doc_rows) == 0:
            # dropped rows for a doc absent from docs_ds cannot happen
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text_dedup": pa.array([], pa.string()),
                 "n_units": pa.array([], pa.int64()),
                 "n_dropped": pa.array([], pa.int64())}
            )
        did = int(g.column("doc_id")[0].as_py())
        s = g.column("text")[int(doc_rows[0])].as_py()
        if s is None:
            # NULL text -> no units -> absent from output (mirrors the SQL:
            # generate_series over NULL emits no unit rows)
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text_dedup": pa.array([], pa.string()),
                 "n_units": pa.array([], pa.int64()),
                 "n_dropped": pa.array([], pa.int64())}
            )
        drop = set(int(x) for x in idx[idx >= 0])
        words = s.split(" ")
        kept_units = []
        n_units = 0
        for i in range(0, len(words), unit_words):
            u = i // unit_words
            n_units += 1
            if u not in drop:
                kept_units.append(" ".join(words[i:i + unit_words]))
        txt = " ".join(kept_units) if kept_units else None
        return pa.table(
            {
                "doc_id": pa.array([did], pa.int64()),
                "text_dedup": pa.array([txt], pa.string()),
                "n_units": pa.array([n_units], pa.int64()),
                "n_dropped": pa.array([len(drop)], pa.int64()),
            }
        )

    return both.groupby("doc_id").map_groups(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental NEAR-dup against a persisted MinHash index (corpus growth)
# ---------------------------------------------------------------------------

class _MinhashSigs:
    """Actor-pool signature stage for the persisted index: (doc_id,
    sig: fixed_size_list<uint64>[num_perm]). Permutation params built once
    per actor — MUST match the probe side, which is why the index dir
    records them in its meta."""

    def __init__(self, num_perm: int, shingle_n: int):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            # zero-row blocks reach stateless stages after upstream filters
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array(
                        [], pa.list_(pa.uint64(), self.num_perm)
                    ),
                }
            )
        sh = shingle_hashes(batch["text"], self.shingle_n)
        sigs = np.stack([minhash_signature(s, self.a, self.b) for s in sh])
        flat = pa.array(sigs.reshape(-1).view(np.uint64))
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy().astype(np.int64)
                ),
                "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
            }
        )


def build_minhash_index(docs_ds, index_dir: str, num_perm: int = 64,
                        bands: int = 16, shingle_n: int = 3) -> str:
    """Persist the corpus' MinHash state for incremental near-dup:

    - ``sigs/``: one parquet row per doc, (doc_id, num_perm x uint64)
      — 8*num_perm B/doc of cheap columnar storage, streamed (never
      shuffled) by probes;
    - ``bands/``: (doc_id, band, bucket) LSH rows, 16 B/row, the collision
      structure probes test membership against;
    - ``_meta.json``: the MinHash parameters — a probe with different
      params would bucket into a different space, so the probe side always
      reads them from here.

    Two streaming passes: the signature pass does the shingling work once;
    the band pass is pure vectorized hashing over the small sigs table."""
    import json
    import ray  # noqa: F401

    os.makedirs(index_dir, exist_ok=True)
    sigs = docs_ds.map_batches(
        _MinhashSigs,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="pandas",
        concurrency=(1, 8),
    )
    sigs.write_parquet(os.path.join(index_dir, "sigs"))

    import ray.data as rd

    def to_bands(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        s = np.asarray(t.column("sig").combine_chunks().flatten()).view(
            np.uint64
        ).reshape(len(ids), num_perm)
        return pa.Table.from_pandas(
            band_rows_from_sigs(ids, s, bands), preserve_index=False
        )

    rd.read_parquet(os.path.join(index_dir, "sigs")).map_batches(
        to_bands, batch_format="pyarrow"
    ).write_parquet(os.path.join(index_dir, "bands"))
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump({"num_perm": num_perm, "bands": bands,
                   "shingle_n": shingle_n}, f)
    return index_dir


def incremental_minhash_dedup(new_ds, index_dir: str,
                              threshold: float = 0.7,
                              max_candidates: int = 5_000_000):
    """Near-dedup a NEW tick of documents against a persisted MinHash
    index WITHOUT reprocessing the corpus: a new doc is dropped when its
    ESTIMATED Jaccard (signature agreement fraction — the CCNet trade:
    no exact re-verify, since the old texts would have to be re-read) to
    any indexed doc reaches ``threshold``.

    Scale shape (small tick vs huge corpus): the tick's band keys and
    signatures are broadcast once (``ray.put``); the index ``bands/`` and
    ``sigs/`` tables are STREAMED through ``map_batches`` with vectorized
    ``np.isin`` prefilters — no exchange sized by the corpus, no corpus
    texts touched. Candidate (new, old) signature comparisons are bounded
    by ``max_candidates`` (LSH collisions of a tick — a blowup past that
    means the tick itself is boilerplate and needs in-tick dedup first).

    Returns the surviving rows of ``new_ds``."""
    import json
    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    num_perm, bands = meta["num_perm"], meta["bands"]

    # collect the tick's signatures (the tick is the SMALL side by
    # contract; 8*num_perm B/doc)
    sig_batches = [
        b for b in new_ds.map_batches(
            _MinhashSigs,
            fn_constructor_kwargs={
                "num_perm": num_perm, "shingle_n": meta["shingle_n"],
            },
            batch_format="pandas",
            concurrency=(1, 8),
        ).iter_batches(batch_format="pyarrow")
    ]
    if not sig_batches:
        return new_ds  # empty tick: nothing to dedup
    new_sigs = pa.concat_tables(sig_batches)
    if new_sigs.num_rows == 0:
        return new_ds
    new_ids = np.asarray(new_sigs.column("doc_id"))
    sig_mat = np.asarray(
        new_sigs.column("sig").combine_chunks().flatten()
    ).view(np.uint64).reshape(len(new_ids), num_perm)
    new_bands = band_rows_from_sigs(new_ids, sig_mat, bands)
    # (band, bucket) composite key for one-array membership tests
    def _bb_key(band, bucket):
        return (np.asarray(band, dtype=np.int64) << np.int64(48)) ^ (
            np.asarray(bucket, dtype=np.int64) & np.int64((1 << 48) - 1)
        )

    new_keys = _bb_key(new_bands["band"], new_bands["bucket"])
    key_to_new: dict = {}
    for k, d in zip(new_keys, new_bands["doc_id"].to_numpy()):
        key_to_new.setdefault(int(k), []).append(int(d))
    keys_ref = ray.put(np.unique(new_keys))
    map_ref = ray.put(key_to_new)

    class _Probe:
        """Actor-pool stage: the broadcast tick keys/map are fetched ONCE
        per actor (same pattern as _UnigramScore) — not re-deserialized
        per streamed index batch."""

        def __init__(self, keys_ref, map_ref):
            self.keys = ray.get(keys_ref)
            self.kmap = ray.get(map_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = _bb_key(t.column("band"), t.column("bucket"))
            hit = np.isin(k, self.keys)
            if not hit.any():
                return pa.table({"new_doc": pa.array([], pa.int64()),
                                 "old_doc": pa.array([], pa.int64())})
            old = np.asarray(t.column("doc_id"))[hit]
            kk = k[hit]
            new_l, old_l = [], []
            for o, key in zip(old, kk):
                for nd in self.kmap[int(key)]:
                    new_l.append(nd)
                    old_l.append(int(o))
            return pa.table({"new_doc": pa.array(new_l, pa.int64()),
                             "old_doc": pa.array(old_l, pa.int64())})

    cand = (
        rd.read_parquet(os.path.join(index_dir, "bands"))
        .map_batches(
            _Probe, fn_constructor_args=(keys_ref, map_ref),
            batch_format="pyarrow", concurrency=(1, 8),
        )
        .groupby(["new_doc", "old_doc"]).count()
    )
    cand_batches = list(cand.iter_batches(batch_format="pyarrow"))
    cand_tbl = (
        pa.concat_tables(cand_batches) if cand_batches
        else pa.table({"new_doc": pa.array([], pa.int64()),
                       "old_doc": pa.array([], pa.int64())})
    )
    n_cand = cand_tbl.num_rows
    if n_cand > max_candidates:
        raise ValueError(
            f"{n_cand} LSH candidates exceed max_candidates="
            f"{max_candidates}; in-tick dedup the batch first"
        )
    if n_cand == 0:
        return new_ds
    old_needed = np.unique(np.asarray(cand_tbl.column("old_doc")))
    old_ref = ray.put(old_needed)

    def gather_old(t: pa.Table) -> pa.Table:
        need = ray.get(old_ref)
        ids = np.asarray(t.column("doc_id"))
        hit = np.isin(ids, need)
        return t.filter(pa.array(hit))

    old_sigs = pa.concat_tables(
        list(
            rd.read_parquet(os.path.join(index_dir, "sigs"))
            .map_batches(gather_old, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    old_ids = np.asarray(old_sigs.column("doc_id"))
    old_mat = np.asarray(
        old_sigs.column("sig").combine_chunks().flatten()
    ).view(np.uint64).reshape(len(old_ids), num_perm)
    new_pos = {int(d): i for i, d in enumerate(new_ids)}
    old_pos = {int(d): i for i, d in enumerate(old_ids)}
    ndx = np.array(
        [new_pos[int(d)] for d in np.asarray(cand_tbl.column("new_doc"))],
        dtype=np.int64,
    )
    odx = np.array(
        [old_pos[int(d)] for d in np.asarray(cand_tbl.column("old_doc"))],
        dtype=np.int64,
    )
    est = (sig_mat[ndx] == old_mat[odx]).mean(axis=1)
    dup_new = np.unique(
        np.asarray(cand_tbl.column("new_doc"))[est >= threshold]
    )
    if not len(dup_new):
        return new_ds
    dup_arr = pa.array(dup_new, type=pa.int64())
    return new_ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t.column("doc_id"), value_set=dup_arr))
        ),
        batch_format="pyarrow",
    )


def _within_ed1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check for two DISTINCT strings (equal-length
    → ≤1 substitution; length-diff-1 → one gap; anything else False)."""
    la, lb = len(a), len(b)
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return True
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is the shorter: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def ed1_self_join(ds, col: str):
    """Fuzzy self-join: all DISTINCT value pairs within edit distance 1
    (typo/variant detection over a name or term vocabulary — the
    string-similarity sibling of the minhash/simhash near-dup family).

    SymSpell deletion-neighborhood blocking: two strings with
    ``ed(a,b) ≤ 1`` always share a key in ``{s} ∪ D1(s)`` (substitution →
    delete the differing position from both; insert/delete → one IS the
    other's deletion), so candidates are exact-complete — no recall loss,
    unlike LSH. Stages, all partition-parallel:

    1. distinct values (one combiner groupby — the vocabulary, not the
       corpus, flows on);
    2. per value emit ``len+1`` (deletion-key, value) rows — the exchange
       carries ~(len+1)·(8+len) B per DISTINCT value;
    3. per key-bucket: all-pairs exact ≤1 verify (buckets are tiny for
       natural vocabularies; a pathological shared-deletion bucket
       degrades to its own all-pairs, never the global one);
    4. one (a,b) groupby dedups pairs that share several keys.

    Scale note: this is a VOCABULARY operator (names, terms, titles).
    For document-corpus near-dup use the minhash path."""
    import hashlib

    distinct = ds.groupby(col).count().select_columns([col])

    def expand(t: pa.Table) -> pa.Table:
        keys, vals = [], []
        for s in t.column(col).to_pylist():
            if s is None:
                continue
            variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            for v in variants:
                keys.append(
                    int.from_bytes(
                        hashlib.blake2b(v.encode(), digest_size=8).digest(),
                        "little",
                        signed=True,
                    )
                )
                vals.append(s)
        return pa.table(
            {"k": pa.array(keys, type=pa.int64()),
             "s": pa.array(vals, type=pa.string())}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ss = sorted(set(g["s"]))
        a_out, b_out = [], []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                if _within_ed1(ss[i], ss[j]):
                    a_out.append(ss[i])
                    b_out.append(ss[j])
        return pd.DataFrame({"a": a_out, "b": b_out})

    pairs = (
        distinct.map_batches(expand, batch_format="pyarrow")
        .groupby("k")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can share several deletion keys: one tiny pair-level groupby
    out = pairs.groupby(["a", "b"]).count()
    return out.select_columns(["a", "b"])


def variant_clusters(ds, col: str):
    """Entity-resolution lite: map every DISTINCT value of ``col`` to the
    lexicographic minimum of its edit-distance-1 connected component
    (typo/variant canonicalization — `ed1_self_join` edges +
    `distributed_components` transitive closure, both already
    partition-parallel). Values with no ed1 neighbor map to themselves.

    Node ids are 8-byte blake2b hashes of the value (the ed1 key scheme);
    a hash collision would merge two clusters — ~n²/2^65, negligible for
    any realistic vocabulary. Output: (name, canonical)."""
    import hashlib

    def h64(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little",
            signed=True,
        )

    # materialize: the edge set is consumed by the empty guard's count AND
    # distributed_components' rounds — without this the whole multi-shuffle
    # ed1 lineage would re-execute per consumer (lazy Datasets re-run)
    pairs = ed1_self_join(ds, col).materialize()

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        return pa.table(
            {
                "doc_a": pa.array([h64(x) for x in a], type=pa.int64()),
                "doc_b": pa.array([h64(x) for x in b], type=pa.int64()),
            }
        )

    # materialized: consumed twice (name_nodes join side + selfmap union)
    distinct = ds.groupby(col).count().select_columns([col]).materialize()

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    if edges.count() == 0:
        # no ed1 neighbors anywhere: every value is its own canonical
        # (distributed_components requires a non-empty edge set)
        return distinct.map_batches(
            lambda t: pa.table(
                {
                    "name": t.column(col).cast(pa.string()),
                    "canonical": t.column(col).cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    comp = distributed_components(edges)  # (node, label)

    def name_nodes(t: pa.Table) -> pa.Table:
        names = t.column(col).to_pylist()
        return pa.table(
            {
                "name": pa.array(names, type=pa.string()),
                "node": pa.array([h64(s) for s in names], type=pa.int64()),
            }
        )

    from ..stages.relational import hash_join

    named = hash_join(
        distinct.map_batches(name_nodes, batch_format="pyarrow"),
        comp,
        on="node",
    )  # (name, node, label)

    def cluster_min(g: pd.DataFrame) -> pd.DataFrame:
        canon = g["name"].min()
        return pd.DataFrame({"name": g["name"], "canonical": canon})

    clustered = (
        named.groupby("label")
        .map_groups(cluster_min, batch_format="pandas")
        .select_columns(["name", "canonical"])
        # normalize to arrow blocks: union() requires both sides to carry
        # the same block type, and map_groups(pandas) emits pandas blocks
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    # singletons: emit (name, name) for EVERY distinct value, then one
    # pair-level groupby keeps min(canonical) — the cluster minimum where
    # one exists, the value itself otherwise
    selfmap = distinct.map_batches(
        lambda t: pa.table(
            {
                "name": t.column(col).cast(pa.string()),
                "canonical": t.column(col).cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"name": [g["name"].iloc[0]], "canonical": [g["canonical"].min()]}
        )

    return (
        clustered.union(selfmap)
        .groupby("name")
        .map_groups(keep_min, batch_format="pandas")
    )


def duplicate_window_docs(docs_ds, k: int = 8, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Sliding-window exact-substring duplicate detection (the Lee et al.
    2022 "Deduplicating Training Data" shape, public algorithm): every
    OVERLAPPING ``k``-token window of every document is hashed; a window
    that also occurs in a smaller ``doc_id`` marks this document. Returns
    (doc_id, n_dup_windows) — the count of DISTINCT duplicated windows per
    flagged document. Differs from ``paragraph_dedup`` (disjoint fixed
    blocks): windows slide one token at a time, so a copied passage is
    caught at ANY offset, not only on block boundaries.

    Scale shape: text never crosses the exchange — the map stage emits
    (doc_id, window md5-low-64) pairs, distinct WITHIN each doc first (caps
    the exchange at distinct-windows, and makes the per-group keeper drop
    exact); one groupby(hash) keeps min(doc_id) per window and emits only
    the flagged mentions; one doc_id-sized groupby-count folds the result.
    The window hash is md5-low-64 of the space-joined window string so the
    DuckDB mirror (``md5_number_lower(array_to_string(t[i:i+k-1], ' '))``)
    is bit-identical. The per-window Python md5 loop is bounded by distinct
    windows per batch (a corpus-prep map cost, not a shuffle cost); swap in
    the winnowing poly-hash if it ever dominates a profile."""
    import hashlib

    def win_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        out_id: list[int] = []
        out_h: list[int] = []
        for did, s in zip(ids, texts):
            words = [w for w in (s or "").split(" ") if w]
            n = len(words) - k + 1
            if n <= 0:
                continue
            seen: set[int] = set()
            for i in range(n):
                h = int.from_bytes(
                    hashlib.md5(
                        " ".join(words[i:i + k]).encode("utf-8")
                    ).digest()[8:16],
                    "little",
                )
                if h not in seen:
                    seen.add(h)
                    out_id.append(int(did))
                    out_h.append(h)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "h": pa.array(out_h, pa.uint64()),
        })

    wins = docs_ds.map_batches(win_rows, batch_format="pyarrow")

    def flagged_in_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("doc_id"))
        keep = ids != ids.min()
        return pa.table({"doc_id": g.column("doc_id").filter(pa.array(keep))})

    flagged = wins.groupby("h").map_groups(
        flagged_in_group, batch_format="pyarrow"
    )
    agg = flagged.groupby("doc_id").count()
    return agg.map_batches(
        lambda t: t.rename_columns(["doc_id", "n_dup_windows"]),
        batch_format="pyarrow",
    )
