"""Corpus-preparation operators for LLM training-data pipelines:
benchmark decontamination, deterministic shuffle-sharding, per-group
token-budget (quota) sampling, and fixed-length sequence packing.

These extend the reference's transform layer (SURVEY.md §2.2/§2.7 —
dedup/ordering/sampling over pandas, e.g. ``src/etl/transform.py``,
``src/profiling.py``) with the operations a 100-TB training corpus needs
between "deduplicated" and "ready to tokenize". Design rules shared with
the rest of the package:

- the big side always streams through ``map_batches`` (vectorized numpy /
  Arrow kernels); the small side (a benchmark n-gram set, per-bucket
  prefix offsets) is broadcast once via ``ray.put`` or computed from a
  bucket-count-sized aggregate — the corpus never lands on the driver;
- every operator has two hash modes: ``"siphash"`` (production — pandas'
  C-vectorized SipHash, no per-row Python) and ``"md5"`` (oracle parity —
  bit-identical to DuckDB ``md5_number_lower``, so the driver can
  hash-check results against ANSI SQL; slower, used only in the
  correctness registry);
- wide steps reuse the package's one partitioning idiom: hash-partition
  by the group key, vectorized per-group kernel inside ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Rabin-Karp base shared with functions.text's winnowing hash — used to
# combine per-word hashes into an n-gram hash without materializing the
# gram strings (production siphash mode only).
_POLY_BASE = np.uint64(1099511628211)


def _md5_u64(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def det_keys(ids: np.ndarray, seed: int, hash_fn: str = "siphash") -> np.ndarray:
    """Deterministic uint64 key per id — the engine's reproducible
    stand-in for ``random()`` in shuffle/sample operators (a seeded hash
    is restart-stable and cluster-topology-independent, which a RNG is
    not; cf. the reference's ``df.sample(random_state=...)`` idiom).

    ``md5``: ``md5_number_lower(seed || '|' || id)`` — SQL-reproducible.
    ``siphash``: ``pd.util.hash_array`` over the int64 ids with a
    seed-derived 16-byte key — C-vectorized, not SQL-reproducible."""
    ids = np.asarray(ids)
    if hash_fn == "md5":
        return np.fromiter(
            (_md5_u64(f"{seed}|{i}") for i in ids), dtype=np.uint64, count=len(ids)
        )
    # pandas ignores hash_key for numeric dtypes, so fold the seed into the
    # VALUES (wrapping add of a seed-derived odd constant) before hashing —
    # different seeds then produce genuinely different orders/shards
    mix = np.int64((_md5_u64(f"seed|{seed}") | 1) & 0x7FFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        mixed = ids.astype(np.int64) + mix
    return pd.util.hash_array(mixed)


def word_ngram_hashes(
    texts: pd.Series, n: int = 5, hash_fn: str = "siphash"
) -> list[np.ndarray]:
    """Per-doc uint64 word-n-gram hash arrays (whitespace tokenization —
    same ``str.split()`` <-> ``string_split_regex(.., '\\s+')`` parity the
    SimHash oracle relies on).

    ``md5``: hash of the space-joined gram string — equals DuckDB
    ``md5_number_lower(array_to_string(w[i:i+n-1], ' '))``.
    ``siphash``: per-word SipHash (one vectorized pass over the batch's
    flat token list) combined per window with a Rabin-Karp polynomial —
    gram strings are never materialized."""
    token_lists = texts.fillna("").str.split()
    if hash_fn == "md5":
        return [
            np.fromiter(
                (
                    _md5_u64(" ".join(ws[i : i + n]))
                    for i in range(len(ws) - n + 1)
                ),
                dtype=np.uint64,
                count=max(len(ws) - n + 1, 0),
            )
            for ws in token_lists
        ]
    lens = token_lists.str.len().to_numpy()
    n_flat = int(lens.sum()) if len(lens) else 0
    if n_flat == 0:
        return [np.empty(0, dtype=np.uint64) for _ in range(len(texts))]
    flat = np.array([w for ws in token_lists for w in ws], dtype=object)
    word_h = pd.util.hash_array(flat)
    powers = _POLY_BASE ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    out = []
    for i in range(len(lens)):
        h = word_h[bounds[i] : bounds[i + 1]]
        if len(h) < n:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        win = np.lib.stride_tricks.sliding_window_view(h, n)
        out.append((win * powers).sum(axis=1, dtype=np.uint64))
    return out


def benchmark_ngram_set(bench_ds, n: int = 5, hash_fn: str = "siphash") -> np.ndarray:
    """Collect the DISTINCT n-gram hashes of a benchmark/eval corpus as a
    sorted uint64 array. The benchmark side is small by definition (eval
    sets are thousands of documents); only 8-byte hashes reach the driver
    — per-batch dedup upstream keeps even that stream minimal."""

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        hs = word_ngram_hashes(batch["text"], n=n, hash_fn=hash_fn)
        flat = np.unique(np.concatenate(hs)) if hs else np.empty(0, dtype=np.uint64)
        return pd.DataFrame({"h": flat})

    parts = [
        b["h"].to_numpy()
        for b in bench_ds.map_batches(grams, batch_format="pandas").iter_batches(
            batch_format="pandas"
        )
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class Decontaminator:
    """map_batches stage: flag documents sharing any word n-gram with a
    broadcast benchmark set (the standard eval-decontamination pass, cf.
    GPT-3 appendix C / most open-data pipelines).

    The benchmark hash set is shipped once (``ray.put``) and resolved from
    the worker-local object store per call (zero-copy); per batch the
    membership test is ONE ``np.isin`` over the flat gram-hash list,
    folded back per doc with bincount — no per-row Python.
    64-bit gram hashing makes a false flag a ~2^-64-per-pair event; the
    DuckDB oracle compares exact gram strings, so a collision would show
    up as a hash mismatch in the driver gate."""

    def __init__(self, bench_ref, n: int = 5, hash_fn: str = "siphash"):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        )
        self.n = n
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = word_ngram_hashes(batch["text"], n=self.n, hash_fn=self.hash_fn)
        lens = np.array([len(h) for h in hs], dtype=np.int64)
        flagged = np.zeros(len(batch), dtype=bool)
        if lens.sum() > 0 and len(self.bench) > 0:
            flat = np.concatenate(hs)
            doc_idx = np.repeat(np.arange(len(hs)), lens)
            hit = np.isin(flat, self.bench)
            flagged = np.bincount(doc_idx[hit], minlength=len(hs)) > 0
        out = batch[["doc_id"]].copy()
        out["contaminated"] = flagged
        return out


def decontaminate(docs_ds, bench_ds, n: int = 5, hash_fn: str = "siphash"):
    """Flag every doc in ``docs_ds`` that shares a word n-gram with
    ``bench_ds``. Returns ``(doc_id, contaminated)`` for the full corpus —
    callers drop or quarantine flagged docs downstream."""
    import ray

    bench = benchmark_ngram_set(bench_ds, n=n, hash_fn=hash_fn)
    ref = ray.put(bench)
    return docs_ds.map_batches(
        Decontaminator,
        fn_constructor_args=(ref, n, hash_fn),
        batch_format="pandas",
        concurrency=(1, 8),
    )


def deterministic_shard(
    ds, key_col: str = "doc_id", n_shards: int = 16, seed: int = 42,
    hash_fn: str = "siphash",
):
    """Seeded, reproducible global shuffle-shard assignment: adds
    ``shuffle_key`` (uint64) and ``shard`` (int64 = key % n_shards).

    This is the training-data "global shuffle" expressed scale-first: the
    assignment is a stateless vectorized map (no all-to-all), and the
    actual data movement happens once, at the sink, keyed by ``shard`` —
    equivalent in distribution to ``random_shuffle()`` but restart-stable,
    resumable per shard, and independent of cluster topology."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        key = det_keys(batch[key_col].to_numpy(), seed, hash_fn)
        batch = batch.copy()
        batch["shuffle_key"] = key
        batch["shard"] = (key % np.uint64(n_shards)).astype(np.int64)
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def write_shards(
    ds, out_dir: str, key_col: str = "doc_id", n_shards: int = 16, seed: int = 42,
    hash_fn: str = "siphash",
):
    """Deterministic-shuffle sink: assign shards, then write hive-partitioned
    parquet (``shard=K/``) — one resumable directory per shard, never one
    giant file."""
    sharded = deterministic_shard(ds, key_col, n_shards, seed, hash_fn)
    sharded.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir


def quota_sample(
    docs_ds, group_col: str = "lang", budget_tokens: int = 5000,
    seed: int = 42, hash_fn: str = "siphash",
):
    """Per-group token-budget sampling (the "data mixing" primitive: cap
    each language/source at N tokens). Deterministic priority order — a
    seeded hash of doc_id, ties broken by doc_id — so the same corpus
    always yields the same sample, under resume and across cluster sizes.

    Shape: one vectorized map (token count + priority key), one
    hash-partition by group, one vectorized sort+cumsum per group. The
    shuffle ships only ``(doc_id, group, n_tokens, priority)`` — 28 B/row,
    never the text."""

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(batch.column("text"), " "), 1).cast(pa.int64())
        ids = np.asarray(batch.column("doc_id"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                group_col: batch.column(group_col),
                "n_tokens": n_tok,
                "priority": pa.array(det_keys(ids, seed, hash_fn)),
            }
        )

    def take_until(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["priority", "doc_id"], kind="mergesort").reset_index(drop=True)
        cum = g["n_tokens"].cumsum()
        out = g.loc[cum <= budget_tokens, ["doc_id", group_col, "n_tokens"]].copy()
        out["cum_tokens"] = cum[cum <= budget_tokens]
        return out

    return (
        docs_ds.map_batches(prep, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(take_until, batch_format="pandas")
    )


def pack_sequences(
    docs_ds, seq_len: int = 2048, id_col: str = "doc_id", num_buckets: int = 32
):
    """Fixed-length sequence packing: concatenate the corpus in ``id_col``
    order into one virtual token stream and assign each document the bin
    ``start_offset // seq_len`` — how training shards are actually laid
    out before tokenization.

    The global prefix sum is distributed in two passes, the classic
    scan-then-offset shape: (1) per-range-bucket token sums — an aggregate
    whose result is ``num_buckets`` scalars, the only thing the driver
    ever holds; (2) per-bucket vectorized cumsum + the bucket's exclusive
    prefix offset. One shuffle (the bucket groupby), 20 B/row through the
    exchange, no text. Buckets are contiguous id ranges so the per-bucket
    cumsum is a true segment of the global scan."""
    from ray.data.aggregate import Max, Min, Sum

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(batch.column("text"), " "), 1).cast(pa.int64())
        return pa.table({id_col: batch.column(id_col), "n_tokens": n_tok})

    # materialize the 16 B/row (id, n_tokens) projection: it is consumed
    # three times (id range, bucket sums, final scan) and re-executing the
    # full-text scan per consumer would triple the corpus read
    toks = docs_ds.map_batches(prep, batch_format="pyarrow").materialize()
    rng = toks.aggregate(Min(id_col), Max(id_col))
    lo, hi = int(rng[f"min({id_col})"]), int(rng[f"max({id_col})"])
    span = max(hi - lo + 1, 1)

    def bucketize(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        b = ((ids - lo) * num_buckets) // span
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    bucketed = toks.map_batches(bucketize, batch_format="pyarrow")

    # pass 1: bucket totals -> exclusive prefix (num_buckets rows on driver)
    sums = {
        int(r["bucket"]): int(r["sum(n_tokens)"])
        for r in bucketed.groupby("bucket").aggregate(Sum("n_tokens")).take_all()
    }
    offsets = {}
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += sums.get(b, 0)

    # pass 2: per-bucket cumsum + offset (buckets are contiguous id ranges)
    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        base = offsets[int(g["bucket"].iloc[0])]
        start = base + g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame(
            {
                id_col: g[id_col],
                "n_tokens": g["n_tokens"],
                "start_offset": start,
                "bin_id": start // seq_len,
            }
        )

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


def split_assignments(
    ds, key_col: str = "doc_id", fractions: dict[str, float] | None = None,
    seed: int = 42, hash_fn: str = "siphash",
):
    """Deterministic train/val/test assignment: each row lands in a named
    split with probability ~fraction, decided by ``hash(seed|key) %
    1_000_000`` against cumulative integer thresholds — so the split is
    reproducible across runs, resumes, and cluster sizes, and a document
    can never migrate between splits when the corpus grows (the property
    that keeps eval sets uncontaminated over time; a ``random()`` split
    has none of these). Stateless vectorized map, no shuffle."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fractions)
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    grains = 1_000_000
    bounds = np.cumsum(
        [int(round(fractions[n] * grains)) for n in names]
    ).astype(np.uint64)
    bounds[-1] = grains  # rounding never drops the last grain
    name_arr = np.array(names, dtype=object)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        key = det_keys(batch[key_col].to_numpy(), seed, hash_fn)
        grain = key % np.uint64(grains)
        idx = np.searchsorted(bounds, grain, side="right")
        batch = batch.copy()
        batch["split"] = name_arr[idx]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def sample_n_per_group(
    ds, group_col: str, n: int, key_col: str = "doc_id",
    seed: int = 42, hash_fn: str = "siphash",
):
    """Deterministic stratified sample: exactly ``min(n, group size)`` rows
    per group, chosen by seeded-hash priority (ties by key) — the
    count-based sibling of :func:`quota_sample` (which budgets tokens).
    Same scale shape: the one group shuffle ships only
    ``(key, group, priority)``; selection is a vectorized per-group
    sort+head. Reproducible across runs, resumes and cluster sizes."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: batch[key_col],
                group_col: batch[group_col],
                "priority": det_keys(batch[key_col].to_numpy(), seed, hash_fn),
            }
        )

    def head_n(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["priority", key_col], kind="mergesort")
        return g.head(n)[[key_col, group_col]]

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby(group_col)
        .map_groups(head_n, batch_format="pandas")
    )


def chunk_documents(
    docs_ds,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """RAG-style document chunking with overlap: split each document's
    token stream (single-space tokenization, the corpus convention shared
    with ``doc_token_stats``) into windows of ``chunk_tokens`` advancing
    by ``stride`` (< chunk_tokens ⇒ overlapping context windows). A
    document with ≤ ``chunk_tokens`` tokens yields exactly one chunk.

    Embarrassingly parallel — no exchange at all: each batch expands
    independently inside ``map_batches``. The expansion is fully
    vectorized: one Arrow ``split_pattern`` per batch, window token
    indices built with the repeat/cumsum trick, one ``take`` gather, one
    ``binary_join`` to re-join chunk text. Output: (doc_id, chunk_idx,
    n_tokens, chunk_text).

    At 100 TB this is the standard pre-embedding fan-out stage; output
    rows ≈ rows × ceil(tokens/stride), so downstream batch sizes should
    be divided accordingly."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError(f"need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}")

    def expand(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ").combine_chunks()
        n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # chunks per doc: 1 + ceil(max(n - C, 0) / S)
        extra = np.maximum(n - chunk_tokens, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        doc_rep = np.repeat(np.arange(len(n)), n_chunks)
        # chunk_idx within each doc (0..n_chunks-1), vectorized
        total = int(n_chunks.sum())
        chunk_idx = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        tok_start = chunk_idx * stride
        tok_len = np.minimum(n[doc_rep] - tok_start, chunk_tokens)
        # gather indices into the FLAT token values: doc list offset +
        # window start + intra-window arange (repeat/cumsum trick)
        doc_off = toks.offsets.to_numpy(zero_copy_only=False)[:-1].astype(np.int64)
        starts_flat = doc_off[doc_rep] + tok_start
        m = int(tok_len.sum())
        intra = np.arange(m) - np.repeat(np.cumsum(tok_len) - tok_len, tok_len)
        gather = np.repeat(starts_flat, tok_len) + intra
        flat = toks.values.take(pa.array(gather, pa.int64()))
        new_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(tok_len, out=new_off[1:])
        # per-batch token count is bounded by batch_size × doc length —
        # far under 2^31; a LargeList branch would be dead code here
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()), flat
        )
        return pa.table(
            {
                id_col: pc.take(t.column(id_col), pa.array(doc_rep, pa.int64())),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "n_tokens": pa.array(tok_len, pa.int64()),
                "chunk_text": pc.binary_join(chunk_lists, pa.scalar(" ")),
            }
        )

    return docs_ds.map_batches(expand, batch_format="pyarrow")


def mixture_sample(
    docs_ds, weights: dict[str, float], total_budget_tokens: int,
    group_col: str = "source", seed: int = 42, hash_fn: str = "siphash",
):
    """Training-mixture sampling: hit TARGET TOKEN PROPORTIONS across
    sources (the Pile/Dolma "data mixing" recipe — 60% web, 30% wiki, ...)
    rather than :func:`quota_sample`'s uniform per-group cap. Each group's
    budget is ``floor(weight * total_budget_tokens)``; groups absent from
    ``weights`` contribute nothing. Selection within a group is the same
    deterministic seeded-hash priority prefix (restart-stable,
    topology-independent, SQL-reproducible in md5 mode).

    Scale shape (same as quota_sample): one vectorized map emits
    (doc_id, group, n_tokens, priority) — 28 B/row, text never shuffles —
    then one hash-partition by group and one vectorized sort+cumsum per
    group. Returns (doc_id, group, n_tokens, cum_tokens, budget_tokens)."""
    budgets = {
        g: int(np.floor(float(w) * total_budget_tokens))
        for g, w in weights.items()
    }

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column(group_col),
            value_set=pa.array(list(budgets), pa.string()),
        )
        batch = batch.filter(keep)
        n_tok = pc.add(
            pc.count_substring(batch.column("text"), " "), 1
        ).cast(pa.int64())
        ids = np.asarray(batch.column("doc_id"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                group_col: batch.column(group_col),
                "n_tokens": n_tok,
                "priority": pa.array(det_keys(ids, seed, hash_fn)),
            }
        )

    def take_until(g: pd.DataFrame) -> pd.DataFrame:
        budget = budgets[g[group_col].iloc[0]]
        g = g.sort_values(["priority", "doc_id"], kind="mergesort").reset_index(
            drop=True
        )
        cum = g["n_tokens"].cumsum()
        out = g.loc[cum <= budget, ["doc_id", group_col, "n_tokens"]].copy()
        out["cum_tokens"] = cum[cum <= budget]
        out["budget_tokens"] = np.int64(budget)
        return out

    return (
        docs_ds.map_batches(prep, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(take_until, batch_format="pandas")
    )


class FractionDecontaminator:
    """Per-doc n-gram OVERLAP FRACTION vs the broadcast benchmark set —
    the graded refinement of the binary :class:`Decontaminator`: a doc
    quoting one benchmark line differs from a doc that IS the benchmark.
    Same vectorized shape (flat gram hashes, one ``np.isin``, bincount
    fold); the fraction is integer basis points (floor of
    ``10000*n_hit/n_grams``) and the threshold compare is pure integer
    cross-multiplication, so the SQL mirror is bit-exact."""

    def __init__(self, bench_ref, n: int = 5, threshold_bp: int = 2000,
                 hash_fn: str = "siphash"):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        )
        self.n = n
        self.threshold_bp = int(threshold_bp)
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = word_ngram_hashes(batch["text"], n=self.n, hash_fn=self.hash_fn)
        n_grams = np.array([len(h) for h in hs], dtype=np.int64)
        n_hit = np.zeros(len(batch), dtype=np.int64)
        if n_grams.sum() > 0 and len(self.bench) > 0:
            flat = np.concatenate(hs)
            doc_idx = np.repeat(np.arange(len(hs)), n_grams)
            hit = np.isin(flat, self.bench)
            n_hit = np.bincount(
                doc_idx[hit], minlength=len(hs)
            ).astype(np.int64)
        bp = np.zeros(len(batch), dtype=np.int64)
        nz = n_grams > 0
        bp[nz] = (10_000 * n_hit[nz]) // n_grams[nz]
        out = batch[["doc_id"]].copy()
        out["n_grams"] = n_grams
        out["n_hit"] = n_hit
        out["overlap_bp"] = bp
        out["contaminated"] = (
            (10_000 * n_hit >= self.threshold_bp * n_grams) & nz
        )
        return out


def contamination_fraction(docs_ds, bench_ds, n: int = 5,
                           threshold_bp: int = 2000,
                           hash_fn: str = "siphash"):
    """Graded eval-set decontamination: per-doc benchmark n-gram overlap
    fraction with an integer-exact threshold flag. Returns
    ``(doc_id, n_grams, n_hit, overlap_bp, contaminated)``."""
    import ray

    bench = benchmark_ngram_set(bench_ds, n=n, hash_fn=hash_fn)
    ref = ray.put(bench)
    return docs_ds.map_batches(
        FractionDecontaminator,
        fn_constructor_args=(ref, n, threshold_bp, hash_fn),
        batch_format="pandas",
        concurrency=(1, 8),
    )
