"""Deduplication family over the documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (100 TB): every variant reduces to *hash-partition by a derived
key, then per-group work* — the same shuffle shape as the encode pipeline's
``conv_id`` bucketing. Nothing broadcasts the corpus; candidate generation
happens through groupby on band/bucket keys, so all-pairs comparison is
confined to LSH buckets. The reference has no near-dedup (SURVEY.md §2.9);
its exact dedup (``src/etl/transform.py:52-57``) is the D1 analog here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import token_hashes

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
    """Actor-pool stage: per-doc MinHash signatures + LSH band keys.
    Permutation parameters are built once per actor in ``__init__``."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = shingle_hashes(batch["text"], self.shingle_n)
        sigs = np.stack([minhash_signature(s, self.a, self.b) for s in sh])
        out = {"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs)}
        # one row per (doc, band): band bucket = hash of the band's rows
        band_keys = np.empty((len(batch), self.bands), dtype=np.uint64)
        for bi in range(self.bands):
            seg = sigs[:, bi * self.rows : (bi + 1) * self.rows]
            band_keys[:, bi] = pd.util.hash_array(
                np.ascontiguousarray(seg).view([("", np.uint64)] * self.rows).ravel()
            )
        rows = []
        for i in range(len(batch)):
            for bi in range(self.bands):
                rows.append(
                    (
                        int(batch["doc_id"].iloc[i]),
                        int(bi),
                        int(band_keys[i, bi]),
                        sigs[i],
                    )
                )
        return pd.DataFrame(rows, columns=["doc_id", "band", "bucket", "sig"])


def _jaccard_from_sigs(s1: np.ndarray, s2: np.ndarray) -> float:
    return float(np.mean(s1 == s2))


def _bucket_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """All-pairs within one LSH bucket (buckets are tiny by construction),
    estimated Jaccard from signature agreement."""
    docs = g.drop_duplicates("doc_id")
    n = len(docs)
    rows = []
    ids = docs["doc_id"].to_numpy()
    sigs = list(docs["sig"])
    for i in range(n):
        for j in range(i + 1, n):
            est = _jaccard_from_sigs(sigs[i], sigs[j])
            if est >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                rows.append((a, b, est))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_est"])


def minhash_dup_pairs(ds, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """documents Dataset -> near-dup pairs via MinHash + LSH banding:
    signature stage (actor pool) -> groupby (band, bucket) -> per-bucket
    pairs -> global dedup of pairs found in multiple bands."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    pairs = sigs.groupby(["band", "bucket"]).map_groups(
        lambda g: _bucket_pairs(g, threshold), batch_format="pandas"
    )

    def first_per_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first_per_pair, batch_format="pandas")


# -- n-gram Jaccard (exact verification) ------------------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa, sb = (
        set(map(int, s))
        for s in shingle_hashes(pd.Series([text_a or "", text_b or ""]), n)
    )
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def verify_pairs_exact(ds_docs, pairs: pd.DataFrame, threshold: float, n: int = 3):
    """Exact n-gram Jaccard on candidate pairs: broadcast the (small)
    candidate texts, verify inside map_batches — candidates are rare, the
    corpus is not collected."""
    import ray

    needed = set(int(x) for x in pairs["doc_a"]) | set(int(x) for x in pairs["doc_b"])
    need_arr = pa.array(sorted(needed), type=pa.int64())
    texts = {
        int(r["doc_id"]): r["text"]
        for r in ds_docs.map_batches(
            lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=need_arr)),
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
        rows = []
        for did, h in zip(batch["doc_id"], batch["simhash"]):
            h = np.uint64(h)
            for blk in range(4):
                key = int((h >> np.uint64(16 * blk)) & np.uint64(0xFFFF))
                rows.append((int(did), blk, key, int(h)))
        return pd.DataFrame(rows, columns=["doc_id", "blk", "key", "simhash"])

    exploded = sh.map_batches(explode_blocks, batch_format="pandas")

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        docs = g.drop_duplicates("doc_id")
        ids = docs["doc_id"].to_numpy()
        hs = docs["simhash"].to_numpy(dtype=np.uint64)
        rows = []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(ham <= max_hamming):
                a, b = sorted((int(ids[i]), int(ids[i + 1 + off])))
                rows.append((a, b, int(ham[off])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    pairs = exploded.groupby(["blk", "key"]).map_groups(bucket_verify, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# -- embedding cosine near-dup ----------------------------------------------

def embedding_dup_pairs(ds_emb, threshold: float = 0.95, n_planes: int = 12, seed: int = 11):
    """Embedding near-dup via random-hyperplane LSH bucketing (scale path:
    no all-pairs across the corpus): sign-pattern bucket key -> per-bucket
    exact cosine. Pairs split across buckets are caught probabilistically;
    raise n_probes/rotations for recall at scale."""
    def assign(batch: pd.DataFrame, planes: np.ndarray) -> pd.DataFrame:
        V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        signs = (V @ planes.T) > 0
        key = signs @ (1 << np.arange(planes.shape[0]))
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "bucket": key.astype(np.int64), "vn": list(V)}
        )

    # deterministic planes, built driver-side once (tiny) and closed over
    first = ds_emb.take(1)[0]
    dim = len(first["embedding"])
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))

    assigned = ds_emb.map_batches(
        assign, batch_format="pandas", fn_kwargs={"planes": planes}
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        V = np.stack(g["vn"].to_numpy())
        S = V @ V.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cosine": np.floor(S[iu[keep], ju[keep]] * 1000).astype(np.int64) / 1000.0,
            }
        )

    return assigned.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


# -- end-to-end near-dup removal --------------------------------------------

def _components(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over candidate pairs -> {doc_id: canonical (min) doc_id}.
    Pairs are rare relative to the corpus, so this is driver-side by design;
    the corpus itself never leaves the cluster."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def dedup_corpus(ds_docs, threshold: float = 0.7, num_perm: int = 64, bands: int = 16):
    """Full near-dedup pipeline: MinHash+LSH candidates -> exact n-gram
    Jaccard verification -> connected components -> drop every doc whose
    canonical representative is a different (smaller) doc_id. Returns the
    deduplicated Dataset (all columns preserved)."""
    pairs = minhash_dup_pairs(
        ds_docs.select_columns(["doc_id", "text"]),
        threshold=threshold, num_perm=num_perm, bands=bands,
    ).to_pandas()
    if len(pairs):
        pairs = verify_pairs_exact(ds_docs, pairs, threshold)
    if not len(pairs):
        return ds_docs
    comp = _components(pairs)
    drop = pa.array(
        sorted(d for d, canon in comp.items() if canon != d), type=pa.int64()
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.invert(pc.is_in(t.column("doc_id"), value_set=drop))
        )

    return ds_docs.map_batches(keep, batch_format="pyarrow")
