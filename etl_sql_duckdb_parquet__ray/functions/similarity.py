"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (one ``ray.put``, read in every task, never
re-shipped per batch), partial top-k per batch, exact merge on the driver.
Scale path: IVF — deterministic k-means-lite centroids trained on a sample,
batch-wise assignment, search restricted to the ``n_probe`` nearest lists.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


def _stack(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    return ids, V


def _stack_arrow(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native (vec_id, [n, d] float64) from a pyarrow batch — the
    list<float> values buffer is read zero-copy and reshaped, no per-row
    Python objects (the pandas hop this replaces was the one per-batch
    conversion in the ANN hot path, VERDICT r3)."""
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    if pa.types.is_list(emb.type) or pa.types.is_large_list(emb.type) or (
        pa.types.is_fixed_size_list(emb.type)
    ):
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        return ids, flat.astype(np.float64).reshape(n, -1)
    # Ray's ArrowTensorArray extension (from_items/numpy-column datasets)
    V = emb.to_numpy(zero_copy_only=False)
    return ids, np.asarray(V, dtype=np.float64).reshape(n, -1)


def _binary_to_mat(col, dim: int, dtype) -> np.ndarray:
    """Zero-copy [n, dim] matrix from a binary column of packed fixed-size
    rows (the persisted-index layout): slice the values buffer between the
    first and last offset — consecutive binary rows are contiguous — and
    reinterpret, no b''.join of per-row Python bytes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, dim), dtype=np.float64)
    width = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    off = np.frombuffer(col.buffers()[1], dtype=width)[
        col.offset : col.offset + n + 1
    ]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    return data.view(dtype).reshape(n, dim)


def _packed_binary(flat: bytes, n: int, row_bytes: int) -> pa.Array:
    """Binary array over one flat buffer of n fixed-size rows (no per-row
    Python bytes objects)."""
    offs = (np.arange(n + 1, dtype=np.int32) * row_bytes).tobytes()
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(flat)]
    )


def brute_force_topk(ds_emb, query: np.ndarray, k: int = 10):
    """Top-k by cosine against one query vector. Per-batch partial top-k
    (k rows per batch leave the task), then a final exact sort+limit —
    the whole corpus is never collected."""
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    qref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qq = ray.get(qref)
        ids, V = _stack_arrow(batch)
        cos = _normalize(V) @ qq
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({"vec_id": ids[top], "cosine": cos[top]})

    partial = ds_emb.map_batches(score, batch_format="pyarrow")
    return partial.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


def _sample_normalized(ds_emb, sample_rows: int) -> np.ndarray:
    """Block-spread normalized training sample (head of every block, then
    limit) — shared by all ANN trainers so a sorted/partitioned corpus
    never biases training to its first shard (SURVEY.md §7.4: train on a
    sample, never a full scan)."""
    per_block = max(64, sample_rows // 32)
    sample = ds_emb.map_batches(
        lambda df: df.head(per_block), batch_format="pandas"
    ).limit(sample_rows).to_pandas()
    _, V = _stack(sample)
    return _normalize(V)


def _hash_sample_normalized(ds_emb, sample_rows: int) -> np.ndarray:
    """PARTITION-INDEPENDENT normalized training sample: the
    ``sample_rows`` vectors with the globally smallest ``hash(vec_id)``
    (pandas SipHash, fixed key) — a property of the DATA, not the block
    layout. One streaming pass emits each batch's local minima (every
    global minimum is a local minimum of its batch), the driver merges
    tiny partials. The block-spread sample (``_sample_normalized``)
    changes whenever the blocking does; this one lets centroid training —
    and everything downstream of it — be mirrored single-process."""
    def sample_partial(batch: pa.Table) -> pa.Table:
        ids, V = _stack_arrow(batch)
        h = pd.util.hash_array(ids.astype(np.int64))
        keep = np.argsort(h, kind="stable")[:sample_rows]
        Vn = _normalize(V[keep])
        return pa.table({
            "h": pa.array(h[keep].astype(np.uint64)),
            "vec_id": pa.array(ids[keep]),
            "v": _packed_binary(
                np.ascontiguousarray(Vn).tobytes(), len(keep),
                Vn.shape[1] * 8,
            ),
        })

    parts = pa.concat_tables(list(
        ds_emb.map_batches(sample_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ))
    order = np.lexsort((
        parts.column("vec_id").to_numpy(),
        parts.column("h").to_numpy(),
    ))[:sample_rows]
    dim = len(parts.column("v")[0].as_py()) // 8 if len(parts) else 0
    return _binary_to_mat(parts.column("v"), dim, np.float64)[order]


def train_ivf_centroids(
    ds_emb, n_lists: int = 16, sample_rows: int = 2048, iters: int = 8,
    seed: int = 5, sample_mode: str = "block",
) -> np.ndarray:
    """Deterministic k-means-lite on a sample (train on a sample, never a
    full scan — same rule as FSST training, SURVEY.md §7.4). The default
    sample is spread across blocks (head of every block, then limit)
    rather than the head of the dataset, so a sorted/partitioned corpus
    doesn't bias the centroids to its first shard;
    ``sample_mode="hash"`` switches to the partition-independent
    globally-smallest-hash sample (:func:`_hash_sample_normalized`), which
    makes the centroids — and any ANN result derived from them — a pure
    function of the data, reproducible by a single-process mirror."""
    V = (
        _hash_sample_normalized(ds_emb, sample_rows)
        if sample_mode == "hash"
        else _sample_normalized(ds_emb, sample_rows)
    )
    rng = np.random.default_rng(seed)
    C = V[rng.choice(len(V), size=min(n_lists, len(V)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = V[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


# Per-worker-process cache for task-based ANN stages: short jobs (one query
# over a bench-scale corpus) pay ~5-10 s to start a fresh actor pool per
# call, so tasks + a per-worker state cache is the default (the same
# "setup once per worker without the actor-fleet tax" rationale as the
# encoder's _WORKER_ENCODERS); pass use_actors=True on long-lived corpora.
_ANN_STATE: dict = {}


def _cached_stage(cls, ref, **kw):
    # one live entry PER STAGE CLASS (not one global): a pipeline whose
    # batches interleave two cached stages on the same worker (e.g. IvfAssign
    # and PqEncode over shared workers) must not evict each other per batch
    key = (ref.hex(), tuple(sorted(kw.items())))
    slot = _ANN_STATE.get(cls.__name__)
    if slot is None or slot[0] != key:
        st = cls(ref, **kw)
        _ANN_STATE[cls.__name__] = (key, st)
        return st
    return slot[1]


class IvfAssign:
    """Actor-pool stage: top-``n_assign`` nearest-centroid list ids per
    vector (redundant assignment — the cluster-spilling trick from
    SPANN-style systems: a vector near a list boundary lands in both lists,
    which is what rescues recall on weakly-clustered corpora); centroids
    arrive once per actor via a ray.put handle."""

    def __init__(self, centroids_ref, n_assign: int = 2):
        import ray

        self.C = ray.get(centroids_ref)
        self.n_assign = min(n_assign, len(self.C))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, V = _stack_arrow(batch)
        Vn = _normalize(V)
        sims = Vn @ self.C.T
        r = self.n_assign
        top = np.argpartition(-sims, r - 1, axis=1)[:, :r].astype(np.int32)
        rep = np.ascontiguousarray(np.repeat(Vn, r, axis=0))
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, r)),
            "list_id": pa.array(top.ravel()),
            # packed f64 rows built from ONE flat buffer (no per-row Python
            # lists); full precision in-memory — the PERSISTED index is
            # what narrows to f32 (build_ivf_index)
            "vn": _packed_binary(rep.tobytes(), len(rep), Vn.shape[1] * 8),
        })


def ivf_topk(ds_emb, query: np.ndarray, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, n_assign: int = 2, use_actors: bool = False,
             sample_mode: str = "block"):
    """IVF approximate top-k: assign every vector to its ``n_assign``
    nearest lists, then search only the ``n_probe`` lists nearest the
    query; duplicate candidates (a vector probed via two lists) collapse
    in a groupby before the final top-k. With ``sample_mode="hash"`` the
    centroid training sample is partition-independent, making the whole
    (approximate) answer a pure function of the data — mirror-oracle-able
    single-process."""
    import ray

    C = train_ivf_centroids(ds_emb, n_lists=n_lists, sample_mode=sample_mode)
    cref = ray.put(C)
    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    probes = set(np.argsort(-(C @ q))[:n_probe].tolist())

    if use_actors:
        assigned = ds_emb.map_batches(
            IvfAssign,
            fn_constructor_kwargs={"centroids_ref": cref, "n_assign": n_assign},
            batch_format="pyarrow", concurrency=(1, 4),
        )
    else:
        assigned = ds_emb.map_batches(
            lambda b: _cached_stage(IvfAssign, cref, n_assign=n_assign)(b),
            batch_format="pyarrow",
        )
    probe_set = pa.array(sorted(probes), type=pa.int32())
    probed = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("list_id"), value_set=probe_set)),
        batch_format="pyarrow",
    )

    qref = ray.put(q)
    dim = len(q)

    def score(batch: pa.Table) -> pa.Table:
        qq = ray.get(qref)
        # dedupe within the batch (same vec via two probed lists)
        ids = batch.column("vec_id").to_numpy()
        _, first = np.unique(ids, return_index=True)
        V = _binary_to_mat(batch.column("vn"), dim, np.float64)[first]
        ids = ids[first]
        cos = V @ qq
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({"vec_id": ids[top], "cosine": cos[top]})

    partial = probed.map_batches(score, batch_format="pyarrow")
    # cross-batch dedupe, then the global top-k
    best = partial.groupby("vec_id").max("cosine")
    best = best.map_batches(
        lambda t: t.rename_columns(
            ["vec_id" if c == "vec_id" else "cosine" for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    return best.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


def brute_force_topk_many(ds_emb, queries: np.ndarray, k: int = 10):
    """Batched ANN: top-k for MANY query vectors at once — one broadcast of
    the (q, d) query matrix via ``ray.put``, one matmul per data batch
    (the batched-inference pattern: ship the model/queries once, stream the
    corpus). Returns a Dataset of (query_idx, vec_id, cosine) rows, exact.
    """
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)

    def score(batch: pa.Table) -> pa.Table:
        QQ = ray.get(qref)
        ids, V = _stack_arrow(batch)
        cos = _normalize(V) @ QQ.T  # (batch, q)
        kk = min(k, len(ids))
        top = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (k, q)
        nq = QQ.shape[0]
        # per-query partial top-k flattened query-major — one gather, no
        # per-query DataFrame loop
        return pa.table(
            {
                "query_idx": np.repeat(np.arange(nq, dtype=np.int64), kk),
                "vec_id": ids[top].ravel(order="F"),
                "cosine": np.take_along_axis(cos, top, axis=0).ravel(order="F"),
            }
        )

    partial = ds_emb.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")


def train_pq_codebooks(
    ds_emb, m: int = 16, ks: int = 32, sample_rows: int = 2048,
    iters: int = 10, seed: int = 7, sample_mode: str = "block",
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al., TPAMI'11): split the
    (normalized) vector into ``m`` subvectors and k-means each subspace
    independently on a block-spread sample. Returns ``[m, ks, d/m]``.
    Train on a sample, never a full scan (SURVEY.md §7.4).
    ``sample_mode="hash"`` = the partition-independent sample (see
    :func:`train_ivf_centroids`)."""
    V = (
        _hash_sample_normalized(ds_emb, sample_rows)
        if sample_mode == "hash"
        else _sample_normalized(ds_emb, sample_rows)
    )
    n, d = V.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    sub = V.reshape(n, m, dsub)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        X = sub[:, j, :]
        k_eff = min(ks, n)
        C = X[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            # L2 assign: argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                mask = assign == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books[j, :k_eff] = C
        if k_eff < ks:
            books[j, k_eff:] = C[0]  # degenerate corpus: pad with a real cell
    return books


class PqEncode:
    """Actor-pool stage: PQ-encode vectors to ``m`` uint8 codes (codebooks
    arrive once per actor via a ray.put handle). The downstream exchange
    then moves m bytes per vector instead of 8*d — the memory/shuffle
    footprint that makes billion-vector ANN feasible."""

    def __init__(self, books_ref):
        import ray

        self.books = ray.get(books_ref)
        self.c2 = (self.books * self.books).sum(axis=2)  # [m, ks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, V = _stack_arrow(batch)
        Vn = _normalize(V)
        n, d = Vn.shape
        m, ks, dsub = self.books.shape
        sub = Vn.reshape(n, m, dsub)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            d2 = self.c2[j][None, :] - 2.0 * (sub[:, j, :] @ self.books[j].T)
            codes[:, j] = np.argmin(d2, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                # m packed uint8 codes per vector in one flat buffer — the
                # on-disk layout of build_pq_index, no per-row objects
                "codes": _packed_binary(codes.tobytes(), n, m),
            }
        )


def pq_topk(ds_emb, query: np.ndarray, k: int = 10, m: int = 16, ks: int = 32,
            use_actors: bool = False, sample_mode: str = "block"):
    """PQ approximate top-k by asymmetric distance computation: the query
    stays exact; every database vector is m uint8 codes, and its
    approximate inner product is a sum of m table lookups
    (cos(q, v) ~ sum_j LUT[j, codes[j]] with LUT[j, c] = q_j . books[j, c]).
    Per-batch partial top-k + global sort-limit, exactly like the
    brute-force path — only the per-vector arithmetic shrinks from d
    multiplies to m byte-indexed adds."""
    import ray

    books = train_pq_codebooks(ds_emb, m=m, ks=ks, sample_mode=sample_mode)
    bref = ray.put(books)
    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    mm, _, dsub = books.shape
    lut = np.einsum("jd,jkd->jk", q.reshape(mm, dsub), books)  # [m, ks]
    lref = ray.put(lut)

    if use_actors:
        encoded = ds_emb.map_batches(
            PqEncode, fn_constructor_kwargs={"books_ref": bref},
            batch_format="pyarrow", concurrency=(1, 4),
        )
    else:
        encoded = ds_emb.map_batches(
            lambda b: _cached_stage(PqEncode, bref)(b), batch_format="pyarrow"
        )

    def score(batch: pa.Table) -> pa.Table:
        lt = ray.get(lref)
        ids = batch.column("vec_id").to_numpy()
        codes = _binary_to_mat(batch.column("codes"), lt.shape[0], np.uint8)
        approx = lt[np.arange(lt.shape[0])[None, :], codes].sum(axis=1)
        top = np.argsort(-approx, kind="stable")[:k]
        return pa.table({"vec_id": ids[top], "cosine_pq": approx[top]})

    return encoded.map_batches(score, batch_format="pyarrow").sort(
        ["cosine_pq", "vec_id"], descending=[True, False]
    ).limit(k)


# ---------------------------------------------------------------------------
# Persisted ANN indexes: build ONCE, query MANY (the per-query re-index in
# ivf_topk/pq_topk is fine for one-shot jobs but a user running a second
# query must not re-assign/re-encode the whole corpus). The index lives as
# plain files: tiny npy/json driver-side artifacts (centroids, codebooks,
# meta) next to Ray-written parquet of the per-vector data, so a query is a
# Dataset read of ONLY what it needs — the probed lists' directories for
# IVF (hive layout, path-level pruning: unprobed lists are never opened),
# or the m-bytes-per-vector codes table for PQ.
# ---------------------------------------------------------------------------

def build_ivf_index(
    ds_emb, index_dir: str, n_lists: int = 16, n_assign: int = 2,
    sample_rows: int = 2048, sample_mode: str = "block",
):
    """Build a persisted IVF index: centroids trained on a block-spread
    sample (driver-side npy — KBs), then ONE distributed pass assigning
    every vector to its ``n_assign`` nearest lists, written as parquet
    hive-partitioned by ``list_id`` (one directory per list). Vectors are
    stored normalized, packed binary float32 — half the bytes of the
    float64 list column, zero-copy unpack at query time."""
    import json

    import ray  # noqa: F401

    os.makedirs(index_dir, exist_ok=True)
    C = train_ivf_centroids(ds_emb, n_lists=n_lists, sample_rows=sample_rows,
                            sample_mode=sample_mode)
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    cref = ray.put(C)

    dim = C.shape[1]

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "list_id": pa.array([], pa.int32()),
                 "vn": pa.array([], pa.binary())}
            )
        st = _cached_stage(IvfAssign, cref, n_assign=n_assign)
        out = st(batch)
        # narrow the in-memory f64 rows to the f32 storage layout
        V32 = np.ascontiguousarray(
            _binary_to_mat(out.column("vn"), dim, np.float64).astype(np.float32)
        )
        return pa.table(
            {
                "vec_id": out.column("vec_id"),
                "list_id": out.column("list_id"),
                "vn": _packed_binary(V32.tobytes(), len(V32), dim * 4),
            }
        )

    ds_emb.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["list_id"]
    )
    meta = {"kind": "ivf", "n_lists": int(len(C)), "n_assign": int(n_assign),
            "dim": int(C.shape[1])}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_query_index(index_dir: str, query: np.ndarray, k: int = 10,
                    n_probe: int = 4):
    """Query a persisted IVF index: reads ONLY the ``n_probe`` probed lists'
    parquet directories (path-level pruning — unprobed lists are never
    opened) and never touches the raw corpus."""
    import json

    import ray

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    dim = meta["dim"]
    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    probes = np.argsort(-(C @ q))[:n_probe].tolist()
    # expand probed list dirs to their parquet files driver-side (Ray's
    # read_parquet takes a list of FILES, not of directories) — still
    # path-level pruning: unprobed lists are never opened
    paths = []
    for c in probes:
        d = os.path.join(index_dir, "lists", f"list_id={int(c)}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    qref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qq = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        _, first = np.unique(ids, return_index=True)
        V = _binary_to_mat(batch.column("vn"), dim, np.float32)[first].astype(
            np.float64
        )
        ids = ids[first]
        cos = V @ qq
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({"vec_id": ids[top], "cosine": cos[top]})

    partial = ray.data.read_parquet(paths, columns=["vec_id", "vn"]).map_batches(
        score, batch_format="pyarrow"
    )
    # ONE distributed pass (per-batch top-k), then an exact driver-side
    # merge of the bounded partials (k rows per batch — never the corpus):
    # a distributed groupby+sort+limit here would pay two more executor
    # rounds to order ~k*n_batches rows
    cand = partial.to_pandas()
    cand = (
        cand.sort_values(["cosine", "vec_id"], ascending=[False, True])
        .drop_duplicates("vec_id")  # redundant assignment dedupe
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(cand, preserve_index=False)


def build_pq_index(ds_emb, index_dir: str, m: int = 16, ks: int = 32,
                   sample_rows: int = 2048, sample_mode: str = "block"):
    """Build a persisted PQ index: codebooks trained on a sample (npy), then
    ONE distributed encode pass writing ``m`` uint8 codes per vector to
    parquet — the asymmetric-scoring query never touches raw vectors."""
    import json

    import ray  # noqa: F401

    os.makedirs(index_dir, exist_ok=True)
    books = train_pq_codebooks(ds_emb, m=m, ks=ks, sample_rows=sample_rows,
                               sample_mode=sample_mode)
    np.save(os.path.join(index_dir, "codebooks.npy"), books)
    bref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        # PqEncode already emits the packed-binary codes layout
        return _cached_stage(PqEncode, bref)(batch)

    ds_emb.map_batches(encode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "codes")
    )
    meta = {"kind": "pq", "m": int(books.shape[0]), "ks": int(books.shape[1]),
            "dim": int(books.shape[0] * books.shape[2])}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def pq_query_index(index_dir: str, query: np.ndarray, k: int = 10):
    """Query a persisted PQ index: LUT from the stored codebooks, stream the
    m-bytes-per-vector codes table, per-batch partial top-k."""
    import ray

    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    mm, _, dsub = books.shape
    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    lut = np.einsum("jd,jkd->jk", q.reshape(mm, dsub), books)
    lref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        lt = ray.get(lref)
        ids = batch.column("vec_id").to_numpy()
        codes = _binary_to_mat(batch.column("codes"), lt.shape[0], np.uint8)
        approx = lt[np.arange(lt.shape[0])[None, :], codes].sum(axis=1)
        top = np.argsort(-approx, kind="stable")[:k]
        return pa.table({"vec_id": ids[top], "cosine_pq": approx[top]})

    partial = ray.data.read_parquet(
        os.path.join(index_dir, "codes")
    ).map_batches(score, batch_format="pyarrow")
    # same one-pass shape as ivf_query_index: bounded driver-side merge
    cand = partial.to_pandas()
    cand = (
        cand.sort_values(["cosine_pq", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(cand, preserve_index=False)


def _train_pq_on_rows(V: np.ndarray, m: int, ks: int, iters: int = 10,
                      seed: int = 7) -> np.ndarray:
    """k-means PQ codebooks over an in-memory sample matrix (the residual
    variant trains on residuals, so it can't reuse the Dataset-sampling
    trainer directly). Returns [m, ks, d/m]."""
    n, d = V.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    sub = V.reshape(n, m, dsub)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        X = sub[:, j, :]
        k_eff = min(ks, n)
        C = X[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                mask = assign == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books[j, :k_eff] = C
        if k_eff < ks:
            books[j, k_eff:] = C[0]
    return books


def _pq_encode_rows(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[n, d] -> [n, m] uint8 codes against the given codebooks."""
    n = len(V)
    m, ks, dsub = books.shape
    sub = V.reshape(n, m, dsub)
    c2 = (books * books).sum(axis=2)
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        d2 = c2[j][None, :] - 2.0 * (sub[:, j, :] @ books[j].T)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def build_ivfpq_index(
    ds_emb, index_dir: str, n_lists: int = 16, m: int = 16, ks: int = 32,
    sample_rows: int = 2048, sample_mode: str = "block",
):
    """Residual-quantized IVF-PQ (the FAISS IVFPQ composition, Jegou et al.
    TPAMI'11 §IV): every vector is assigned to its nearest IVF list and PQ
    encodes the RESIDUAL ``v - centroid`` — residuals are tighter-clustered
    than raw vectors, so the same m bytes/vector buys materially better
    recall than flat PQ. Layout: centroids + codebooks driver-side (npy,
    KBs), one distributed assign+encode pass writing (vec_id, codes, vn)
    hive-partitioned by list_id. The normalized f32 vectors (``vn``) ride
    along for the IVFADC+R rerank stage (Jegou et al. TPAMI'11 §V.C) but
    are COLUMN-PRUNED out of the codes scan — the coarse pass reads
    m bytes/vector, and only the bounded rerank shortlist ever touches
    raw vectors.

    OPQ (a learned rotation before PQ) was considered and skipped: on
    residuals the rotation's gain is small while adding a dense d×d matmul
    to every encode/query — revisit only if recall at fixed bytes becomes
    the binding constraint."""
    import json

    import ray

    os.makedirs(index_dir, exist_ok=True)
    C = train_ivf_centroids(ds_emb, n_lists=n_lists, sample_rows=sample_rows,
                            sample_mode=sample_mode)
    # train PQ on SAMPLE residuals (train on a sample, never a full scan)
    V = (
        _hash_sample_normalized(ds_emb, sample_rows)
        if sample_mode == "hash"
        else _sample_normalized(ds_emb, sample_rows)
    )
    assign = np.argmax(V @ C.T, axis=1)
    books = _train_pq_on_rows(V - C[assign], m=m, ks=ks)
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    np.save(os.path.join(index_dir, "codebooks.npy"), books)
    cref = ray.put(C)
    bref = ray.put(books)

    dim = C.shape[1]

    def encode(batch: pa.Table) -> pa.Table:
        Cl, bk = ray.get(cref), ray.get(bref)
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "list_id": pa.array([], pa.int32()),
                 "codes": pa.array([], pa.binary()),
                 "vn": pa.array([], pa.binary())}
            )
        ids, Vb = _stack_arrow(batch)
        Vn = _normalize(Vb)
        a = np.argmax(Vn @ Cl.T, axis=1)
        codes = _pq_encode_rows(Vn - Cl[a], bk)
        V32 = np.ascontiguousarray(Vn.astype(np.float32))
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "list_id": pa.array(a.astype(np.int32)),
                "codes": _packed_binary(codes.tobytes(), len(codes), bk.shape[0]),
                "vn": _packed_binary(V32.tobytes(), len(V32), dim * 4),
            }
        )

    ds_emb.map_batches(encode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["list_id"]
    )
    meta = {
        "kind": "ivfpq", "n_lists": int(len(C)), "m": int(m), "ks": int(ks),
        "dim": int(C.shape[1]),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivfpq_query_index(index_dir: str, query: np.ndarray, k: int = 10,
                      n_probe: int = 4, rerank: int = 4):
    """Query a persisted IVF-PQ index: asymmetric scoring decomposed as
    ``q·v = q·c_list + q·r ≈ q·c_list + Σⱼ LUT[j, code_j]`` — one shared
    LUT (codebooks are list-independent) plus a per-list scalar offset.
    Reads ONLY the probed lists' code files (path-level pruning), and only
    the (vec_id, codes, list_id) columns — the stored vectors never travel
    in the coarse pass.

    ``rerank`` (IVFADC+R): PQ at m bytes/vector cannot rank *within* a
    tight cluster (every candidate's cosine agrees to ~the quantization
    error), so the coarse pass keeps a ``rerank*k`` shortlist and a second
    bounded read exact-rescoring only those rows (predicate-pushdown on
    vec_id, vn column read for the shortlist's row groups only) fixes the
    fine order. ``rerank=0`` disables it (pure m-bytes/vector scan)."""
    import ray
    import pyarrow.dataset as pads

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    mm, _, dsub = books.shape
    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    qc = C @ q  # per-list offsets
    probes = np.argsort(-qc)[:n_probe].tolist()
    lut = np.einsum("jd,jkd->jk", q.reshape(mm, dsub), books)
    lref = ray.put(lut)
    qcref = ray.put(qc)
    paths = []
    for c in probes:
        d = os.path.join(index_dir, "lists", f"list_id={int(c)}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "cosine_pq": pa.array([], pa.float64())}
        )
    shortlist = max(k, int(rerank) * k) if rerank else k

    def score(batch: pa.Table) -> pa.Table:
        lt, qc_all = ray.get(lref), ray.get(qcref)
        ids = batch.column("vec_id").to_numpy()
        # hive partition column: the per-row list id recovers q·c_list
        lids = batch.column("list_id").to_numpy().astype(np.int64)
        codes = _binary_to_mat(batch.column("codes"), lt.shape[0], np.uint8)
        approx = lt[np.arange(lt.shape[0])[None, :], codes].sum(axis=1)
        approx = approx + qc_all[lids]
        top = np.argsort(-approx, kind="stable")[:shortlist]
        return pa.table({"vec_id": ids[top], "cosine_pq": approx[top]})

    partial = ray.data.read_parquet(
        paths, columns=["vec_id", "codes", "list_id"]
    ).map_batches(score, batch_format="pyarrow")
    # bounded driver-side merge: <= shortlist rows per batch
    cand = partial.to_pandas()
    cand = (
        cand.sort_values(["cosine_pq", "vec_id"], ascending=[False, True])
        .head(shortlist)
        .reset_index(drop=True)
    )
    if not rerank or cand.empty:
        return pa.Table.from_pandas(cand.head(k), preserve_index=False)

    # IVFADC+R exact rescore of the bounded shortlist
    dim = mm * dsub  # == meta.json's dim; avoids re-reading it per query
    want = pa.array(cand["vec_id"].to_numpy())
    qref = ray.put(q)

    def rescore(batch: pa.Table) -> pa.Table:
        qq = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        V = _binary_to_mat(batch.column("vn"), dim, np.float32).astype(
            np.float64
        )
        cos = V @ qq
        return pa.table({"vec_id": ids, "cosine_pq": cos})

    exact = (
        ray.data.read_parquet(
            paths, columns=["vec_id", "vn"],
            filter=pads.field("vec_id").isin(want),
        )
        .map_batches(rescore, batch_format="pyarrow")
        .to_pandas()  # bounded: <= shortlist rows total
    )
    exact = (
        exact.sort_values(["cosine_pq", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(exact, preserve_index=False)


def kmeans_clusters(ds_emb, k: int = 8, iters: int = 10, seed: int = 5):
    """Distributed Lloyd's k-means over the embedding corpus (spherical:
    cosine assignment over normalized vectors — the same geometry the ANN
    family uses). Returns ``(assignments_ds, centroids)`` where
    assignments is a Dataset of ``(vec_id, cluster)``.

    Scale shape: init = deterministic sample k-means
    (:func:`train_ivf_centroids`); each Lloyd iteration is ONE streaming
    pass emitting k partial (count, sum-vector) rows per batch — the
    driver combines B×k tiny partials (k×dim floats each), never rows.
    The input projection is materialized once and consumed iters+1 times
    (re-executing a full upstream pipeline per iteration would multiply
    the corpus read). Empty clusters keep their previous centroid."""
    import ray

    base = ds_emb.materialize()
    C = train_ivf_centroids(base, n_lists=k, seed=seed)
    k_eff = len(C)

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cl = ray.get(cref)
            _, V = _stack_arrow(batch)
            Vn = _normalize(V)
            a = np.argmax(Vn @ Cl.T, axis=1)
            counts = np.bincount(a, minlength=len(Cl))
            sums = np.zeros((len(Cl), Vn.shape[1]), dtype=np.float64)
            np.add.at(sums, a, Vn)
            return pa.table(
                {
                    "c": pa.array(np.arange(len(Cl), dtype=np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                    "s": _packed_binary(
                        np.ascontiguousarray(sums).tobytes(),
                        len(Cl),
                        Vn.shape[1] * 8,
                    ),
                }
            )

        parts = pa.concat_tables(
            list(
                base.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        dim = C.shape[1]
        cs = parts.column("c").to_numpy()
        ns = parts.column("n").to_numpy()
        S = _binary_to_mat(parts.column("s"), dim, np.float64)
        new_C = C.copy()
        for c in range(k_eff):
            m = cs == c
            n = int(ns[m].sum())
            if n > 0:
                v = S[m].sum(axis=0) / n
                new_C[c] = v / max(np.linalg.norm(v), 1e-12)
        C = new_C

    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cl = ray.get(cref)
        ids, V = _stack_arrow(batch)
        Vn = _normalize(V)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(np.argmax(Vn @ Cl.T, axis=1).astype(np.int64)),
            }
        )

    return base.map_batches(assign, batch_format="pyarrow"), C


def kmeans_clusters_deterministic(ds_emb, k: int = 8, iters: int = 10,
                                  seed: int = 5, sample_rows: int = 2048):
    """PARTITION-INDEPENDENT distributed Lloyd's k-means: the result is a
    pure function of the data — rerun it on a different cluster size,
    block layout or batch schedule and every assignment is identical.
    Three changes vs :func:`kmeans_clusters` buy that property:

    1. **Init sample is data-determined, not block-determined**: the
       ``sample_rows`` vectors with the globally smallest
       ``hash(vec_id)`` (pandas SipHash, fixed key) — one streaming pass
       emitting each batch's local minima, a driver-side merge of tiny
       partials. ``_sample_normalized``'s head-of-every-block sample
       changes whenever the blocking does.
    2. **Content-sorted partial combine** per Lloyd iteration (same
       discipline as ``embedding_covariance``) so the float fold is
       reproducible run to run.
    3. **Grid-snapped centroids**: after every update the normalized
       centroid is snapped to the 2^-30 binary grid (exact in floats).
       Batch-boundary summation drift is ~1e-15 relative — six orders
       below the grid — so the snapped centroids, and hence every argmax
       assignment, are invariant to how rows were batched (the knife-edge
       caveat is the same one the micro-floor oracles carry).

    This is what makes the clustering SQL-oracle-checkable against a
    single-process mirror; production pipelines that don't need
    cross-layout reproducibility keep :func:`kmeans_clusters`."""
    import ray

    base = ds_emb.materialize()
    Vs = _hash_sample_normalized(base, sample_rows)

    rng = np.random.default_rng(seed)
    C = Vs[rng.choice(len(Vs), size=min(k, len(Vs)), replace=False)].copy()
    for _ in range(8):  # local init refinement on the sample
        a = np.argmax(Vs @ C.T, axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                v = Vs[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    snap = float(2 ** 30)
    C = np.round(C * snap) / snap

    k_eff = len(C)
    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cl = ray.get(cref)
            _, V = _stack_arrow(batch)
            Vn = _normalize(V)
            a = np.argmax(Vn @ Cl.T, axis=1)
            counts = np.bincount(a, minlength=len(Cl))
            sums = np.zeros((len(Cl), Vn.shape[1]), dtype=np.float64)
            np.add.at(sums, a, Vn)
            return pa.table({
                "c": pa.array(np.arange(len(Cl), dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "s": _packed_binary(
                    np.ascontiguousarray(sums).tobytes(), len(Cl),
                    Vn.shape[1] * 8,
                ),
            })

        rows = sorted(
            base.map_batches(partial, batch_format="pyarrow").take_all(),
            key=lambda r: (r["c"], r["n"], bytes(r["s"])),
        )
        new_C = C.copy()
        for c in range(k_eff):
            sel = [r for r in rows if r["c"] == c]
            n = sum(r["n"] for r in sel)
            if n > 0:
                S = np.sum(
                    [np.frombuffer(r["s"], dtype=np.float64) for r in sel],
                    axis=0,
                )
                v = S / n
                u = v / max(np.linalg.norm(v), 1e-12)
                new_C[c] = np.round(u * snap) / snap
        C = new_C

    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cl = ray.get(cref)
        ids, V = _stack_arrow(batch)
        Vn = _normalize(V)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(
                np.argmax(Vn @ Cl.T, axis=1).astype(np.int64)
            ),
        })

    return base.map_batches(assign, batch_format="pyarrow"), C


def semantic_dedup(ds_emb, k: int = 8, threshold: float = 0.95,
                   iters: int = 5, seed: int = 5):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding corpus, then drop near-duplicates WITHIN each cluster —
    pairwise cosine is computed only inside clusters, turning the O(N²)
    global self-join into k independent O((N/k)²) blocks. Returns the
    DROPPED ``vec_id``s (deterministic keep-min-id variant: j is dropped
    iff some i < j in its cluster has cosine ≥ threshold).

    Scale shape: centroids from the distributed Lloyd's pass
    (:func:`kmeans_clusters`); ONE assignment map over the corpus ships
    (vec_id, cluster, f32-packed normalized vector) into a cluster
    groupby; each group does one matmul. Contract: a CLUSTER must fit a
    worker — size k to corpus/k ≈ 10-50k vectors (the paper's regime).
    Near-dups split across clusters are missed (the SemDeDup trade;
    exact copies always co-assign)."""
    import ray

    base = ds_emb.materialize()  # consumed by Lloyd iters + the final map
    _, C = kmeans_clusters(base, k=k, iters=iters, seed=seed)
    cref = ray.put(C)

    def assign_pack(batch: pa.Table) -> pa.Table:
        Cl = ray.get(cref)
        ids, V = _stack_arrow(batch)
        Vn = _normalize(V)
        a = np.argmax(Vn @ Cl.T, axis=1)
        V32 = np.ascontiguousarray(Vn.astype(np.float32))
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "vec": _packed_binary(V32.tobytes(), len(V32), V32.shape[1] * 4),
            }
        )

    packed = base.map_batches(assign_pack, batch_format="pyarrow")

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        M = (
            np.frombuffer(b"".join(g["vec"]), dtype=np.float32)
            .reshape(len(g), -1)
            .astype(np.float64)
        )
        S = M @ M.T
        dropped = np.triu(S >= threshold, k=1).any(axis=0)
        return pd.DataFrame({"vec_id": g["vec_id"].to_numpy()[dropped]})

    return packed.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas"
    )


def embedding_covariance(ds_emb, col: str = "embedding"):
    """Exact-algebra distributed covariance of a ``list<float>`` column:
    per batch ONE partial row — n (int64), the d-vector column sum and the
    packed d*d outer-product sum, all float64 — then a driver-side combine
    (bounded: one row per batch, d=64 -> ~33 KB/batch). Returns
    ``(n, mean[d], cov[d,d])`` with SAMPLE covariance
    ``(X'X - n*mean*mean') / (n-1)`` — the ``covar_samp`` definition.

    The d*d partial is the standard one-pass sufficient statistic: no
    second data pass, no row exchange, numerically adequate for
    unit-scale embeddings (centered-pass refinement is unnecessary when
    ||mean|| << ||x||, which normalized/near-centered embeddings satisfy).
    """
    import ray.data  # noqa: F401  (ds_emb is already a Dataset)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.large_binary()),
                "ss": pa.array([], pa.large_binary()),
            })
        _, V = _stack_arrow(batch)
        return pa.table({
            "n": pa.array([V.shape[0]], pa.int64()),
            "s": pa.array([V.sum(axis=0).tobytes()], pa.large_binary()),
            "ss": pa.array([(V.T @ V).ravel().tobytes()], pa.large_binary()),
        })

    rows = ds_emb.map_batches(
        partial, batch_format="pyarrow"
    ).take_all()  # bounded: ONE partial row per input batch
    if not rows:
        raise ValueError("empty embedding dataset")
    # float addition is not associative: partials arrive in task-completion
    # order, which varies run to run — sort them by content so the reduce
    # is DETERMINISTIC (same input + partitioning -> bit-identical cov,
    # hence bit-identical eigenvectors downstream)
    rows = sorted(rows, key=lambda r: (r["n"], r["s"], r["ss"]))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"], dtype=np.float64) for r in rows], axis=0)
    ss = np.sum([np.frombuffer(r["ss"], dtype=np.float64) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = (ss.reshape(d, d) - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def pca_project(ds_emb, k: int = 8, whiten: bool = False,
                col: str = "embedding"):
    """Distributed PCA projection: covariance by sufficient statistics
    (:func:`embedding_covariance` — one partial row per batch), a d x d
    ``eigh`` on the DRIVER (d=64: microseconds), then a broadcast
    ``(V - mean) @ W`` map over the corpus. Deterministic: eigenvectors
    are sorted by descending eigenvalue and sign-fixed so each component's
    largest-|loading| entry is positive (eigh's sign is arbitrary;
    unfixed it would flip run to run).

    ``whiten=True`` scales components by ``1/sqrt(eigval)`` — the
    decorrelated unit-variance basis SemDeDup-style pipelines use before
    cosine clustering. Returns a Dataset of ``(vec_id, proj:
    list<double>)``; eigenvalues/vectors are also returned for callers
    that need the basis: ``(ds, eigvals[k], W[d,k], mean[d])``."""
    import ray

    n, mean, cov = embedding_covariance(ds_emb, col)
    w, U = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    w, U = w[order], U[:, order]
    # sign fix: largest-|loading| entry of each component made positive
    flip = np.sign(U[np.abs(U).argmax(axis=0), np.arange(U.shape[1])])
    flip[flip == 0] = 1.0
    W = U * flip
    if whiten:
        W = W / np.sqrt(np.maximum(w, 1e-12))
    mref, wref = ray.put(mean), ray.put(W)

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "proj": pa.array([], pa.list_(pa.float64())),
            })
        m, Wl = ray.get(mref), ray.get(wref)
        ids, V = _stack_arrow(batch)
        P = (V - m) @ Wl
        kk = P.shape[1]
        return pa.table({
            "vec_id": pa.array(ids),
            "proj": pa.ListArray.from_arrays(
                np.arange(len(ids) + 1, dtype=np.int64) * kk,
                pa.array(P.ravel(), pa.float64()),
            ),
        })

    return (
        ds_emb.map_batches(project, batch_format="pyarrow"),
        w, W, mean,
    )
