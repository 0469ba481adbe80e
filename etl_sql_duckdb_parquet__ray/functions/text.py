"""Text-analysis stages for the documents table — all vectorized or
per-actor-compiled, never per-row Python in the hot path.

The reference's only text ops are trim/case/length (SURVEY.md §2.10); these
stages add what a large-scale training-data pipeline needs: language ID,
quality scoring, token counting, and rolling-hash fingerprints. Each is a
``map_batches`` stage; the regex/token machinery is compiled once per actor
in ``__init__`` (the ST4 "load once per worker" pattern, SURVEY.md §2.4).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword profiles (public common-word lists) for the
# n-gram/stopword-overlap language heuristic. Deterministic, no models.
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as was at by an be this have from or".split()),
    "fr": frozenset("le la les de des du et un une est que pour dans qui sur pas au avec ne se ce il".split()),
    "es": frozenset("el la los las de del y un una es que por en con no se su para como más pero".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit nicht im für auf sich des dem als".split()),
}
_CJK = re.compile(r"[一-鿿぀-ヿ]")
_CJK_RE = r"[一-鿿぀-ヿ]"
_WORD_CHARS_RE = r"[^a-zàâäéèêëîïôöùûüñáíóúß'\s]+"

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via an 8-bit LUT (numpy<2 has no
    ``bitwise_count``)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8)].reshape(-1, 8).sum(axis=1)


def _doc_stop_hits(toks: list[np.ndarray], stop_hashes: np.ndarray) -> np.ndarray:
    """Per-doc count of tokens whose hash is in ``stop_hashes`` — one
    ``np.isin`` over the flat concatenated token hashes, folded back per doc
    with bincount (no per-row Python)."""
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    if lens.sum() == 0:
        return np.zeros(len(toks), dtype=np.int64)
    flat = np.concatenate(toks)
    doc_idx = np.repeat(np.arange(len(toks)), lens)
    hit = np.isin(flat, stop_hashes)
    return np.bincount(doc_idx[hit], minlength=len(toks)).astype(np.int64)


class LangId:
    """Heuristic language ID: CJK codepoint share, else stopword-overlap
    argmax over per-language profiles; 'und' when nothing matches.

    Fully vectorized: Arrow regex kernels strip non-word chars and detect
    CJK; stopword membership is a hashed ``np.isin`` over the batch's flat
    token list (hash sets built once per actor in ``__init__``)."""

    def __init__(self):
        self._langs = list(_LANG_STOPWORDS)
        self._stop_hashes = [
            pd.util.hash_array(np.array(sorted(sw), dtype=object))
            for sw in _LANG_STOPWORDS.values()
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        cjk = pc.greater(pc.count_substring_regex(text, _CJK_RE), 0).to_numpy(
            zero_copy_only=False
        )
        words_only = pc.replace_substring_regex(
            pc.utf8_lower(text), _WORD_CHARS_RE, " "
        )
        toks = token_hashes(words_only.to_pandas())
        hits = np.stack(
            [_doc_stop_hits(toks, sh) for sh in self._stop_hashes]
        )  # (lang, doc)
        best = hits.argmax(axis=0)
        best_hits = hits[best, np.arange(hits.shape[1])]
        lang_arr = np.array(self._langs, dtype=object)
        preds = np.where(best_hits > 0, lang_arr[best], "und")
        preds = np.where(cjk, "zh", preds)
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), type=pa.string())
        )


class QualityScore:
    """Length / punctuation / stopword-ratio quality score in [0, 100] —
    the training-data analog of the reference's data-quality score
    (``src/profiling.py:84-109``: missing% and dup% → 0-100)."""

    STOPWORDS = _LANG_STOPWORDS["en"]

    def __init__(self):
        self._stop_hashes = pd.util.hash_array(
            np.array(sorted(self.STOPWORDS), dtype=object)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # nulls are scored as empty strings (quality 0-ish), never NaN
        text = pc.fill_null(batch.column("text"), "")
        n_chars = pc.utf8_length(text).cast(pa.float64())
        # punctuation ratio via vectorized kernels
        n_punct = pc.count_substring_regex(text, r"[^\w\s]").cast(pa.float64())
        n_tokens = pc.add(pc.count_substring(text, " "), 1).cast(pa.float64())
        # stopword term: one hashed isin over the batch's flat token list
        toks = token_hashes(text.to_pandas())
        tok_lens = np.array([len(t) for t in toks], dtype=np.float64)
        hits = _doc_stop_hits(toks, self._stop_hashes).astype(np.float64)
        stop_ratio = hits / np.maximum(tok_lens, 1.0)
        nc = np.asarray(n_chars.to_pandas())
        punct_ratio = np.asarray(n_punct.to_pandas()) / np.maximum(nc, 1.0)
        mean_tok_len = nc / np.maximum(np.asarray(n_tokens.to_pandas()), 1.0)
        len_score = np.clip(nc / 500.0, 0.0, 1.0)
        punct_score = 1.0 - np.clip(punct_ratio * 4.0, 0.0, 1.0)
        stop_score = np.clip(stop_ratio * 3.0, 0.0, 1.0)
        tok_score = np.where((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 1.0, 0.5)
        score = 100.0 * (0.3 * len_score + 0.2 * punct_score + 0.3 * stop_score + 0.2 * tok_score)
        return batch.append_column("quality", pa.array(np.floor(score).astype(np.int64)))


class TokenCount:
    """Whitespace tokens plus a BPE-ish regex token count (words,
    numbers, punctuation runs) — regex compiled once per actor."""

    TOKEN_RE = r"\w+|[^\w\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        ws = pc.add(pc.count_substring(text, " "), 1).cast(pa.int64())
        # count of non-overlapping regex matches == len(findall), in RE2/C++
        bpe = pc.count_substring_regex(text, self.TOKEN_RE).cast(pa.int64())
        return batch.append_column("ws_tokens", ws).append_column("re_tokens", bpe)


def _poly_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial (Rabin-Karp) hashes of every k-byte window of a
    uint8 array — fully vectorized via cumulative products."""
    if len(data) < k:
        return np.empty(0, dtype=np.uint64)
    B = np.uint64(1099511628211)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        for i in range(1, k):
            powers[i] = powers[i - 1] * B
    # windowed dot product with powers (k small, len large): strided sum
    n = len(data) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    d = data.astype(np.uint64)
    for j in range(k):
        out += d[j : j + n] * powers[k - 1 - j]
    return out


def winnow_fingerprints(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): min
    rolling-hash per sliding window, deduplicated; deterministic."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    h = _poly_hashes(data, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def winnow_stats_batch(
    texts: list, k: int = 8, window: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Batch winnowing: (n_fingerprints, fp_min) per doc, one numpy pass.

    Equivalent to ``[winnow_fingerprints(t)]`` per doc (property-tested)
    but with NO per-doc Python in the hot loop: hash the whole batch's
    concatenated bytes once, take ONE global sliding-window minimum, and
    slice each doc's valid window range out of it. Grams/windows that
    would cross a document boundary exist in the global arrays but are
    never selected — a doc's valid window starts cover exactly its own
    grams. Per-doc distinct counts come from one lexsort over
    (doc, minimum) pairs instead of per-doc ``np.unique``."""
    enc = [
        (t if isinstance(t, str) else "").encode("utf-8", "surrogatepass")
        for t in texts
    ]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    n_docs = len(enc)
    n_fp = np.zeros(n_docs, dtype=np.int64)
    fp_min = np.zeros(n_docs, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return n_fp, fp_min
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))  # doc byte offsets
    h = _poly_hashes(data, k)  # global; includes boundary-crossing grams
    n_grams = np.maximum(lens - k + 1, 0)  # valid grams per doc

    # Small docs (1..window grams): fingerprint set == {min of the doc's
    # grams} -> reduceat over each doc's gram slice.
    small = (n_grams > 0) & (n_grams <= window)
    if small.any():
        sidx = np.flatnonzero(small)
        # reduceat segments [start, start+n) per small doc, interleaved with
        # throwaway gap segments so one call covers all docs; a sentinel
        # element keeps an end index == len(h) (doc ending the batch) legal
        seg = np.empty(2 * len(sidx), dtype=np.int64)
        seg[0::2] = starts[sidx]
        seg[1::2] = starts[sidx] + n_grams[sidx]
        h_s = np.concatenate((h, np.array([np.uint64(0xFFFFFFFFFFFFFFFF)])))
        mins = np.minimum.reduceat(h_s, seg)[0::2]
        n_fp[sidx] = 1
        fp_min[sidx] = mins

    # Large docs: global sliding min (O(L) two-pass block prefix/suffix
    # minima, not the O(L*window) strided view), then per-doc valid slices.
    big = n_grams > window
    if big.any():
        sw_min = _sliding_min(h, window)
        bidx = np.flatnonzero(big)
        counts = n_grams[bidx] - window + 1  # valid window starts per doc
        # gather all (doc, window-min) pairs batch-wide
        doc_of = np.repeat(np.arange(len(bidx), dtype=np.int64), counts)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(bounds[-1], dtype=np.int64) - bounds[doc_of] + starts[bidx][doc_of]
        vals = sw_min[pos]
        # adjacent windows usually share their minimum — drop consecutive
        # repeats first (distinct-set-preserving, ~window-fold shrink), so
        # the lexsort pays for the survivors only
        k0 = np.ones(len(vals), dtype=bool)
        k0[1:] = (vals[1:] != vals[:-1]) | (doc_of[1:] != doc_of[:-1])
        vals, doc_of = vals[k0], doc_of[k0]
        # distinct per doc: sort by (doc, val), drop duplicates
        order = np.lexsort((vals, doc_of))
        d_s, v_s = doc_of[order], vals[order]
        keep = np.ones(len(v_s), dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
        n_fp[bidx] = np.bincount(d_s[keep], minlength=len(bidx))
        first = np.concatenate(([0], np.cumsum(n_fp[bidx])[:-1]))
        fp_min[bidx] = v_s[keep][first]  # sorted per doc -> first == min
    return n_fp, fp_min


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """O(n) sliding-window minimum: per-block prefix/suffix minima (block
    size w); window [i, i+w) = min(suffix_min[i], prefix_min[i+w-1])."""
    n = len(h)
    if n < w:
        return np.empty(0, dtype=h.dtype)
    pad = (-n) % w
    hp = np.concatenate((h, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))))
    m = hp.reshape(-1, w)
    pref = np.minimum.accumulate(m, axis=1).ravel()
    suf = np.minimum.accumulate(m[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suf[: n - w + 1], pref[w - 1 : n])


class Fingerprint:
    """map_batches stage emitting winnowing fingerprint stats per doc —
    the batch-vectorized :func:`winnow_stats_batch` under the hood
    (per-doc :func:`winnow_fingerprints` is the tested reference)."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_fp, fp_min = winnow_stats_batch(
            batch.column("text").to_pylist(), self.k, self.window
        )
        return batch.append_column(
            "n_fingerprints", pa.array(n_fp, type=pa.int64())
        ).append_column("fp_min", pa.array(fp_min, type=pa.uint64()))


def token_hashes(texts: pd.Series, hash_fn: str = "siphash") -> list[np.ndarray]:
    """Per-doc uint64 token-hash arrays.

    ``hash_fn="siphash"`` (default, production): pandas' SipHash,
    C-vectorized over the concatenated token list, then split back.
    ``hash_fn="md5"``: lower half of each token's MD5 digest,
    little-endian — bit-identical to DuckDB's ``md5_number_lower``, which
    makes SimHash outputs SQL-oracle-checkable (slower: per-token hashlib
    call; use only where cross-engine determinism matters more than
    throughput)."""
    token_lists = texts.fillna("").str.split()
    lens = token_lists.str.len().to_numpy()
    n_flat = int(lens.sum()) if len(lens) else 0
    if hash_fn == "md5":
        import hashlib

        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[8:16], "little")
                for ts in token_lists
                for w in ts
            ),
            dtype=np.uint64,
            count=n_flat,
        )
    else:
        flat = np.array([w for ts in token_lists for w in ts], dtype=object)
        hashes = pd.util.hash_array(flat) if len(flat) else np.empty(0, dtype=np.uint64)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    return [hashes[bounds[i] : bounds[i + 1]] for i in range(len(lens))]


def simhash64(hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash of a token-hash multiset (Charikar'02): sign of
    per-bit vote sums — vectorized bit unpack."""
    if len(hashes) == 0:
        return np.uint64(0)
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(hashes)
    return np.uint64(np.sum((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))


class SimHash:
    """map_batches stage: simhash64 per document text.

    ``hash_fn`` selects the token hash (see :func:`token_hashes`):
    "siphash" for production throughput, "md5" when the result must be
    reproducible outside this engine (the DuckDB correctness oracle)."""

    def __init__(self, hash_fn: str = "siphash"):
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = token_hashes(batch["text"], hash_fn=self.hash_fn)
        batch = batch.copy()
        batch["simhash"] = np.array([simhash64(h) for h in hs], dtype=np.uint64)
        return batch


def _explode_tokens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch's texts into ``(doc_idx, flat_tokens, lens)`` — the
    shared explode idiom (same ``str.split()`` <->
    ``string_split_regex(.., '\\s+')`` + drop-empties parity every text
    oracle in this package relies on). One object-array build per batch;
    everything downstream is C-groupby / numpy."""
    flat_arr, offs = tokenize_flat(pa.Array.from_pandas(texts.astype(object)))
    lens = np.diff(offs)
    if len(lens) == 0 or len(flat_arr) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
            lens,
        )
    flat = flat_arr.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return doc_idx, flat, lens


class Redactor:
    """map_batches stage: global regex redaction over a text column —
    the PII-scrub pass every production corpus runs before training
    (emails, phones, IPs), generalized to any RE2 pattern.

    Extends the reference's string-normalization family (SURVEY.md §2.2,
    ``src/etl/transform.py`` trim/case ops) with a replace transform.
    Pure Arrow kernels (`replace_substring_regex` / `count_substring_regex`
    — RE2, same dialect as DuckDB's regexp_replace, which is what makes
    the redaction SQL-oracle-checkable); zero per-row Python, zero state,
    so it runs as stateless tasks at any concurrency."""

    # public, well-known PII shapes; callers compose them with '|'
    PII_PRESETS: dict[str, str] = {
        "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "phone": r"\+?\d[\d\-\s().]{7,}\d",
    }

    def __init__(
        self, pattern: str, replacement: str = "<REDACTED>", text_col: str = "text"
    ):
        self.pattern = pattern
        self.replacement = replacement
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(self.text_col), "")
        n = pc.count_substring_regex(text, self.pattern).cast(pa.int64())
        clean = pc.replace_substring_regex(
            text, pattern=self.pattern, replacement=self.replacement
        )
        return batch.append_column("clean_text", clean).append_column(
            "n_redactions", n
        )


def redact(ds, pattern: str, replacement: str = "<REDACTED>", text_col: str = "text"):
    """Redact every match of ``pattern`` in ``text_col`` corpus-wide;
    adds ``clean_text`` and ``n_redactions``. Stateless vectorized map —
    no shuffle, no driver involvement."""
    return ds.map_batches(
        Redactor(pattern, replacement, text_col), batch_format="pyarrow"
    )


class RepetitionStats:
    """map_batches stage: per-document repetition counters — the
    Gopher-style repetition quality signals (Rae et al. 2021, public) kept
    as exact integers so the result is hash-checkable against SQL:
    ``n_tokens``, ``n_distinct`` (vocabulary of the doc), ``top_token_count``
    (multiplicity of the most repeated token) and ``top_bigram_count``
    (multiplicity of the most repeated adjacent word pair). Callers derive
    the usual ratios (dup-token fraction = 1 - n_distinct/n_tokens,
    top-bigram fraction) downstream — ratios are floats and belong in the
    consumer, not the exchange.

    Vectorized: one explode per batch, pandas C-groupby for the counts,
    a shifted-array join (no Python loop) for bigrams."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, flat, lens = _explode_tokens(batch["text"])
        n = len(batch)
        n_distinct = np.zeros(n, dtype=np.int64)
        top_tok = np.zeros(n, dtype=np.int64)
        top_bg = np.zeros(n, dtype=np.int64)
        if len(flat):
            tf = (
                pd.DataFrame({"d": doc_idx, "t": flat})
                .groupby(["d", "t"], sort=False)
                .size()
                .reset_index(name="c")
            )
            agg = tf.groupby("d", sort=False)["c"].agg(["count", "max"])
            n_distinct[agg.index.to_numpy()] = agg["count"].to_numpy()
            top_tok[agg.index.to_numpy()] = agg["max"].to_numpy()
            same = doc_idx[1:] == doc_idx[:-1]
            if same.any():
                bg_doc = doc_idx[1:][same]
                grams = pd.Series(flat[:-1][same]).str.cat(
                    pd.Series(flat[1:][same]), sep=" "
                )
                bgc = (
                    pd.DataFrame({"d": bg_doc, "g": grams.to_numpy()})
                    .groupby(["d", "g"], sort=False)
                    .size()
                    .groupby(level=0)
                    .max()
                )
                top_bg[bgc.index.to_numpy()] = bgc.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_tokens": lens,
                "n_distinct": n_distinct,
                "top_token_count": top_tok,
                "top_bigram_count": top_bg,
            }
        )


class _DistinctTermPairs:
    """map_batches stage: explode each doc into its DISTINCT (doc_id, term)
    pairs — the posting-list primitive shared by document frequency and the
    inverted index. Distinctness is established per batch (docs are never
    split across rows), so downstream term-counts are exact df values."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, flat, _ = _explode_tokens(batch[self.text_col])
        if not len(flat):
            return pd.DataFrame(
                {self.id_col: np.empty(0, dtype=np.int64), "term": []}
            )
        pairs = pd.DataFrame({"d": doc_idx, "term": flat}).drop_duplicates()
        ids = batch[self.id_col].to_numpy()
        return pd.DataFrame(
            {self.id_col: ids[pairs["d"].to_numpy()], "term": pairs["term"].to_numpy()}
        )


class _TopTerms:
    """map_batches stage (pass 2 of :func:`top_terms`): per-doc term
    frequencies ranked by ``(tf DESC, df ASC, term ASC)`` — most frequent
    first, rarest-in-corpus breaking ties (the integer-exact skeleton of
    TF-IDF; the float idf = ln(N/df) is a trivial consumer-side map and
    would make the result hash-unverifiable across engines). The corpus
    document-frequency table is broadcast ONCE via ``ray.put`` and resolved
    zero-copy per actor."""

    def __init__(self, df_ref, k: int, id_col: str, text_col: str):
        import ray

        self.df = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_idx, flat, _ = _explode_tokens(batch[self.text_col])
        empty = pd.DataFrame(
            {
                self.id_col: np.empty(0, dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": np.empty(0, dtype=np.int64),
                "df": np.empty(0, dtype=np.int64),
            }
        )
        if not len(flat):
            return empty
        tf = (
            pd.DataFrame({"d": doc_idx, "term": flat})
            .groupby(["d", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        tf["df"] = tf["term"].map(self.df).astype(np.int64)
        tf = tf.sort_values(
            ["d", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        top = tf.groupby("d", sort=False).head(self.k)
        ids = batch[self.id_col].to_numpy()
        return pd.DataFrame(
            {
                self.id_col: ids[top["d"].to_numpy()],
                "term": top["term"].to_numpy(),
                "tf": top["tf"].to_numpy(dtype=np.int64),
                "df": top["df"].to_numpy(dtype=np.int64),
            }
        )


def document_frequency(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact per-term document frequency: one explode map (distinct pairs
    per doc), one ``groupby(term).count()`` shuffle whose payload is the
    distinct (doc, term) pairs — never the text. Returns a vocab-sized
    Dataset ``(term, df)``."""
    pairs = docs_ds.map_batches(
        _DistinctTermPairs(id_col, text_col), batch_format="pandas"
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["term", "df"])

    return pairs.groupby("term").count().map_batches(rename, batch_format="pyarrow")


def top_terms(docs_ds, k: int = 5, id_col: str = "doc_id", text_col: str = "text"):
    """Top-k most-characteristic terms per document, integer-exact:
    rank by ``(tf DESC, df ASC, term ASC)``.

    Two passes over the corpus (both streaming): pass 1 computes the
    corpus document-frequency table (vocab-sized — the only thing the
    driver holds; natural-language vocabularies are millions of terms ≈
    tens of MB, broadcastable); pass 2 re-reads the docs, computes per-doc
    tf entirely within the batch (a doc's text is one row, never split),
    joins df from the broadcast table and emits the top k. No per-doc
    shuffle at all — the single exchange is the vocab-sized df groupby."""
    import ray

    df_map = {
        r["term"]: int(r["df"])
        for b in document_frequency(docs_ds, id_col, text_col).iter_batches(
            batch_format="pandas"
        )
        for r in b.to_dict("records")
    }
    ref = ray.put(df_map)
    return docs_ds.map_batches(
        _TopTerms,
        fn_constructor_args=(ref, k, id_col, text_col),
        batch_format="pandas",
        concurrency=(1, 8),
    )


def corpus_bigrams(docs_ds, k: int = 20, text_col: str = "text"):
    """Corpus-level top-k bigram counts (the n-gram language-model-count
    classic). Tokenization parity with the SQL mirror: whitespace split,
    empties dropped (``str.split()`` == ``list_filter(string_split_regex
    (text, '\\s+'), w -> w <> '')`` — ASCII/no-exotic-whitespace
    precondition checked for the testdata in tests).

    Shape: each batch emits its LOCAL bigram counts (a combiner — the
    exchange carries vocabulary-sized partials, never per-occurrence
    rows), one groupby-sum on the bigram key, then a top-k sort over the
    aggregated vocabulary. Ties rank lexicographically for determinism.
    The combiner is fully vectorized (tokenize_flat + flat_bigrams +
    value_counts — no per-doc Python loop)."""

    def partial(t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(text_col))
        big = flat_bigrams(flat, offs)
        if len(big) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        v, c = term_counts(big)
        return pa.table({"bigram": v, "n": c})

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
    )

    def rn(t: pa.Table) -> pa.Table:
        return pa.table({"bigram": t.column("bigram"),
                         "n": t.column("sum(n)"),
                         "neg_n": pc.negate(t.column("sum(n)"))})

    top = (
        agg.map_batches(rn, batch_format="pyarrow")
        .sort(["neg_n", "bigram"])
        .limit(k)
    )
    return top.drop_columns(["neg_n"])


def heavy_hitter_terms(docs_ds, k: int = 20, capacity: int = 4096,
                       text_col: str = "text"):
    """Exact corpus top-k terms via a Misra-Gries sketch + exact re-count —
    the shuffle-light alternative to :func:`corpus_bigrams`'s vocab-sized
    exchange when the vocabulary itself is huge (e.g. raw web n-grams).

    Stage 1 emits each batch's MERGEABLE MG summary (Agarwal et al.,
    "Mergeable Summaries": exact batch counts minus the (C+1)-th largest,
    top-C kept) — ≤ ``capacity`` rows per batch through the exchange no
    matter the vocabulary size. Stage 2 sums summaries and takes the top
    4k candidate terms. Stage 3 re-counts ONLY the candidates exactly
    (broadcast set, one combiner groupby) and returns the true top-k.

    Exactness is CERTIFIED, never assumed: each batch also ships its MG
    threshold, so after the re-count the guarantee "every non-candidate's
    true count ≤ est(last candidate) + Σ thresholds" is checked against
    the k-th exact count. If the margin fails (near-uniform counts — MG's
    blind spot), the function falls back to the exact full-vocabulary
    groupby, so the result is ALWAYS SQL-oracle-exact; the sketch path is
    a certified fast path."""
    import ray

    # the "" term (impossible for whitespace-split tokens) carries each
    # batch's MG threshold so Σ thresholds — the total undercount bound —
    # survives the same groupby-sum as the summaries
    def mg_partial(t: pa.Table) -> pa.Table:
        flat, _ = tokenize_flat(t.column(text_col))
        v, c = term_counts(flat)
        cnp = np.asarray(c, dtype=np.int64)
        thr = 0
        if len(v) > capacity:
            # (C+1)-th largest via an O(n) partition, not a full sort
            thr = int(np.partition(cnp, len(cnp) - capacity - 1)[
                len(cnp) - capacity - 1])
            keep = cnp > thr
            v = v.filter(pa.array(keep))
            cnp = cnp[keep] - thr
        return pa.table({
            "term": pa.concat_arrays([pa.array([""], pa.string()), v]),
            "est": pa.array(np.concatenate(([thr], cnp)), pa.int64()),
        })

    cand = (
        docs_ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("est")
    )

    def neg(t: pa.Table) -> pa.Table:
        return pa.table({"term": t.column("term"),
                         "neg": pc.negate(t.column("sum(est)"))})

    cand = cand.materialize()  # consumed twice: carrier row + top-4k scan
    urows = cand.filter(
        lambda r: r["term"] == ""
    ).take_all()
    undercount = int(urows[0]["sum(est)"]) if urows else 0
    cand_est: dict[str, int] = {}
    for b in (
        cand.map_batches(neg, batch_format="pyarrow")
        .sort(["neg", "term"]).limit(4 * k + 1)
        .iter_batches(batch_format="pandas")
    ):
        for r in b.to_dict("records"):
            if r["term"] != "":
                cand_est[r["term"]] = int(-r["neg"])
    cand_est = dict(sorted(cand_est.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * k])
    cand_terms = set(cand_est)
    # any term OUTSIDE the candidate set has true count ≤ est_floor +
    # undercount: unadmitted-but-seen terms est ≤ est of the last admitted
    # candidate; never-summarized terms est ≤ 0
    est_floor = min(cand_est.values()) if len(cand_est) >= 4 * k else 0
    non_cand_bound = est_floor + undercount
    ref = ray.put(pa.array(sorted(cand_terms), pa.string()))

    def exact_partial(t: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        flat, _ = tokenize_flat(t.column(text_col))
        v, c = term_counts(flat)
        # membership filter at VOCAB size, not token count (value_counts
        # above is C-speed; candidate set is tiny)
        sel = pc.is_in(v, value_set=keep)
        v, c = v.filter(sel), c.filter(sel)
        return pa.table({"term": v, "n": c})

    exact = (
        docs_ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"term": t.column("term"),
                         "n": t.column("sum(n)"),
                         "neg": pc.negate(t.column("sum(n)"))})

    top = (
        exact.map_batches(shape, batch_format="pyarrow")
        .sort(["neg", "term"]).limit(k).drop_columns(["neg"]).to_pandas()
    )
    # CERTIFY the sketch: every non-candidate's true count is provably
    # ≤ non_cand_bound; the top-k is exact iff the k-th exact count clears
    # that bound (strict, so boundary ties can't slip through)
    kth = int(top["n"].iloc[-1]) if len(top) >= k else 0
    if len(top) >= k and kth > non_cand_bound:
        return pa.Table.from_pandas(top, preserve_index=False)

    # certification failed (near-uniform counts — MG's blind spot): exact
    # full-vocabulary fallback, same shape as corpus_bigrams' exchange
    def exact_all(t: pa.Table) -> pa.Table:
        flat, _ = tokenize_flat(t.column(text_col))
        v, c = term_counts(flat)
        return pa.table({"term": v, "n": c})

    full = docs_ds.map_batches(exact_all, batch_format="pyarrow").groupby("term").sum("n")
    return (
        full.map_batches(shape, batch_format="pyarrow")
        .sort(["neg", "term"]).limit(k).drop_columns(["neg"])
    )


# ---------------------------------------------------------------------------
# unigram language-model scoring (perplexity-proxy quality filter)
# ---------------------------------------------------------------------------

class _UnigramScore:
    """Actor-pool scorer: the broadcast (log-prob table, OOV log-prob) is
    fetched ONCE per worker in ``__init__``; ``__call__`` scores a batch
    with one vectorized pandas hash lookup over the flat token list and a
    cumsum segment reduction — no per-token Python."""

    def __init__(self, ref, id_col: str, text_col: str):
        import ray

        logp, oov = ray.get(ref)
        self.logp = logp  # pd.Series: term -> ln(n/total)
        self.oov = oov
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(self.text_col))
        lens = np.diff(offs)
        keep = lens > 0  # zero-token docs are absent (SQL: no unnest rows)
        vals = (
            flat.to_pandas().map(self.logp)
            .to_numpy(dtype=np.float64, na_value=self.oov)
        )
        cs = np.concatenate(([0.0], np.cumsum(vals)))
        sums = cs[offs[1:]] - cs[offs[:-1]]
        ids = np.asarray(t.column(self.id_col))[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "logprob": pa.array(sums[keep] / lens[keep]),
                "n_tokens": pa.array(lens[keep]),
            }
        )


def unigram_logprob(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                    vocab_top: int | None = None, alpha: float = 0.5):
    """Unigram language-model score per document — the cheap perplexity
    proxy corpus-quality filters use (a doc of improbable tokens scores
    low). ``logprob`` = mean over the doc's tokens of ``ln(count/total)``
    from the corpus' own unigram distribution; tokens outside the kept
    vocabulary (only possible with ``vocab_top``) get ``ln(alpha/total)``.

    Scale shape: pass 1 is a combiner counts exchange (vocabulary-sized
    partials per batch, one groupby-sum — never per-occurrence rows); the
    vocabulary table is held driver-side and broadcast ONCE (``ray.put``;
    natural-language vocabularies are ~1e7 terms ≈ 100s of MB — cut with
    ``vocab_top`` at web scale, which also bounds the broadcast). Pass 2
    is an actor-pool map with a vectorized lookup. Tokenization matches
    the SQL mirror (whitespace split, empties dropped — same parity
    precondition as ``corpus_bigrams``)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = tokenize_flat(t.column(text_col))
        v, c = term_counts(flat)
        return pa.table({"term": v, "n": c})

    freq = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term").sum("n").to_pandas()
    )
    freq.columns = ["term", "n"]
    total = float(freq["n"].sum())
    if vocab_top is not None and len(freq) > vocab_top:
        freq = freq.nlargest(vocab_top, "n")
    logp = pd.Series(
        np.log(freq["n"].to_numpy(dtype=np.float64) / total),
        index=freq["term"],
    )
    oov = float(np.log(alpha / total)) if total > 0 else float("nan")
    ref = ray.put((logp, oov))
    return docs_ds.map_batches(
        _UnigramScore,
        fn_constructor_args=(ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def tokenize_flat(col) -> tuple[pa.Array, np.ndarray]:
    """Vectorized whitespace tokenization of a string column: ONE RE2 split
    over the whole batch, empties dropped via a cumsum segment reduction —
    returns ``(flat token array, int64 doc offsets into it)`` (doc *d*'s
    tokens are ``flat[offs[d]:offs[d+1]]``). Replaces the per-doc
    ``str.split()`` Python loops in the n-gram combiner family.
    ``utf8_split_whitespace`` + empty-drop equals ``str.split()`` exactly
    (both split on Unicode whitespace runs) and skips the regex engine
    (~3x faster than ``\\s+``); the SQL mirrors' RE2 ``\\s+`` agrees under
    the ASCII-whitespace parity precondition checked for the testdata in
    tests."""
    toks = pc.utf8_split_whitespace(pc.coalesce(col, ""))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off0 = toks.offsets[0].as_py() if len(toks) else 0
    offs = np.asarray(toks.offsets, dtype=np.int64) - off0
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return flat, offs
    mask = np.asarray(pc.not_equal(flat, ""))
    if mask.all():
        return flat, offs
    cs = np.concatenate(([0], np.cumsum(mask)))
    return flat.filter(pa.array(mask)), cs[offs]


def flat_bigrams(flat: pa.Array, offs: np.ndarray) -> pa.Array:
    """All within-doc consecutive token pairs of a :func:`tokenize_flat`
    result, joined as ``"a b"`` strings — two vectorized takes + one
    binary join, no per-doc Python (tokens are whitespace-split so the
    space delimiter is unambiguous)."""
    n = len(flat)
    if n < 2:
        return pa.array([], type=pa.string())
    valid = np.ones(n - 1, dtype=bool)
    ends = offs[1:] - 1  # each doc's last token starts no bigram
    ends = ends[(ends >= 0) & (ends <= n - 2)]
    valid[ends] = False
    idx = np.nonzero(valid)[0]
    a = flat.take(pa.array(idx, type=pa.int64()))
    b = flat.take(pa.array(idx + 1, type=pa.int64()))
    return pc.binary_join_element_wise(a, b, " ")


def term_counts(arr: pa.Array) -> tuple[pa.Array, pa.Array]:
    """``pc.value_counts`` unpacked to ``(values, int64 counts)`` — the
    vectorized replacement for the per-batch ``collections.Counter``."""
    vc = pc.value_counts(arr)
    return vc.field("values").cast(pa.string()), vc.field("counts")


def token_count_kernel(col) -> pa.Array:
    """Per-value whitespace token count with SQL-mirror parity
    (``len(list_filter(string_split_regex(COALESCE(x, ''), '\\s+'),
    w -> w <> ''))``): one RE2 split, empties subtracted via a cumsum
    segment reduction — no per-row Python. Shared by the CLI derive
    kernel and the registry's sidecar derivation so the two can never
    drift."""
    toks = pc.split_pattern_regex(
        pc.coalesce(col, ""), r"\s+"
    ).combine_chunks()
    n_all = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    emp = np.asarray(pc.equal(pc.list_flatten(toks), "")).astype(np.int64)
    offs = np.asarray(toks.offsets, dtype=np.int64)
    cs = np.concatenate(([0], np.cumsum(emp)))
    n_emp = cs[offs[1:] - offs[0]] - cs[offs[:-1] - offs[0]]
    return pa.array((n_all - n_emp).astype(np.int32))


def explode_matching_tokens(ds, id_col: str, text_col: str, substr: str):
    """EXPLODE/UNNEST: one output row per token occurrence containing
    ``substr`` — the reshape class `Dataset.flat_map` serves, done the
    scale-right way: a vectorized ``map_batches`` (Arrow regex split →
    ListArray offsets → parent-index gather) instead of per-row Python.
    A batch fans out to a batch; the streaming executor handles the row
    multiplication with backpressure."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column(text_col), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        keep = pc.match_substring(flat, substr)
        keep = pc.and_(keep, pc.not_equal(flat, ""))
        keep = pc.fill_null(keep, False)
        return pa.table(
            {
                id_col: t.column(id_col).take(parents.filter(keep)),
                "term": flat.filter(keep),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


class TextCleaner:
    """map_batches stage: canonical text normalization — the first pass of
    every LLM-corpus pipeline (C4/Dolma-style cleanup): strip control
    characters (keep \n and \t), collapse runs of spaces/tabs, collapse 3+
    newlines to 2 (paragraph preserve), trim each line's trailing blanks,
    trim the document. Optional ``lowercase``.

    Pure Arrow RE2 kernels (same dialect as DuckDB regexp_replace, so the
    whole transform is SQL-oracle-checkable); stateless, no shuffle.
    Extends the reference's trim/case family (``src/etl/transform.py:11-17``)
    to document-scale text."""

    def __init__(self, text_col: str = "text", lowercase: bool = False):
        self.text_col = text_col
        self.lowercase = lowercase

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column(self.text_col), "")
        # control chars except \n (\x0a) and \t (\x09)
        t = pc.replace_substring_regex(
            t, pattern=r"[\x00-\x08\x0b-\x1f\x7f]", replacement=""
        )
        # runs of spaces/tabs -> one space
        t = pc.replace_substring_regex(t, pattern=r"[ \t]+", replacement=" ")
        # trailing blanks before a newline
        t = pc.replace_substring_regex(t, pattern=r" +\n", replacement="\n")
        # 3+ newlines -> paragraph break
        t = pc.replace_substring_regex(t, pattern=r"\n{3,}", replacement="\n\n")
        # document trim
        t = pc.replace_substring_regex(t, pattern=r"^[ \n]+|[ \n]+$", replacement="")
        if self.lowercase:
            t = pc.utf8_lower(t)
        i = batch.column_names.index(self.text_col)
        return batch.set_column(i, self.text_col, t)


def clean_text(ds, text_col: str = "text", lowercase: bool = False):
    """Normalize a text column corpus-wide (control-char strip, whitespace
    collapse, paragraph-preserving newline squeeze, trim). Stateless
    vectorized map — no shuffle, no driver involvement."""
    return ds.map_batches(
        TextCleaner(text_col, lowercase), batch_format="pyarrow"
    )


def collocations(docs_ds, k: int = 20, min_count: int = 5,
                 text_col: str = "text"):
    """Collocation mining: top-k bigrams by a PMI-proxy association score
    (Church & Hanks 1990, public) — the phrase-discovery classic a
    tokenizer/vocab pipeline runs before merging multiwords. Score is the
    pointwise-mutual-information RATIO in integer micro-units,
    ``floor(1e6 * n_ab * N_tok^2 / (N_bi * n_a * n_b))``, computed in
    exact arbitrary-precision ints (mirrors DuckDB HUGEINT floor division
    bit-for-bit; production at 10^13 tokens would emit the float log-PMI
    instead — the micro-ratio is the oracle-exact form).

    Shape: both count tables are VOCABULARY-sized (batch-local combiners
    feed one groupby-sum each); the unigram table is broadcast via
    ``ray.put`` and joined batch-wise onto the distributed bigram table —
    the per-row Python here runs over bigram-vocab rows, never corpus
    rows. min_count prunes the long random tail before scoring (PMI is
    notoriously noisy at count 1)."""
    import ray

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(text_col))
        n_bi = int(np.maximum(np.diff(offs) - 1, 0).sum())
        v, c = term_counts(flat)
        if len(v) == 0:
            v, c = pa.array([""], pa.string()), pa.array([0], pa.int64())
        # ride the bigram-position count along as one extra row's worth
        # of metadata: emit it under the first row (summed later anyway)
        nb = np.zeros(len(v), dtype=np.int64)
        nb[0] = n_bi
        return pa.table({"t": v, "n": c, "n_bi": pa.array(nb, pa.int64())})

    # unigram counts + totals: vocabulary-sized take_all (same bounded
    # pattern as BPE's word_frequencies)
    uni_rows = docs_ds.map_batches(
        uni_partial, batch_format="pyarrow"
    ).take_all()
    uni: dict[str, int] = {}
    n_bi_total = 0
    for r in uni_rows:
        if r["t"]:
            uni[r["t"]] = uni.get(r["t"], 0) + int(r["n"])
        n_bi_total += int(r["n_bi"])
    n_tok_total = sum(uni.values())
    uni_ref = ray.put((uni, n_tok_total, n_bi_total))

    def bi_partial(t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(text_col))
        big = flat_bigrams(flat, offs)
        v, c = term_counts(big)
        if len(v) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # split the "a b" join back into its two tokens (whitespace-split
        # tokens can't contain the space delimiter)
        parts = pc.split_pattern(v, " ", max_splits=1)
        return pa.table({
            "a": pc.list_element(parts, 0),
            "b": pc.list_element(parts, 1),
            "n": c,
        })

    agg = docs_ds.map_batches(
        bi_partial, batch_format="pyarrow"
    ).groupby(["a", "b"]).sum("n")

    def score(t: pa.Table) -> pa.Table:
        u, n_tok, n_bi = ray.get(uni_ref)
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        n_ab = t.column("sum(n)").to_pylist()
        keep, grams, counts, scores = [], [], [], []
        for x, y, nab in zip(a, b, n_ab):
            if nab < min_count:
                continue
            # Python-int cross-multiply is exact at any corpus size; the
            # micro-PMI of a rare pair in a huge corpus can exceed int64
            # (n_tok² in the numerator) — clamp instead of letting the
            # Arrow cast raise OverflowError at runtime
            s = (1_000_000 * nab * n_tok * n_tok) // (n_bi * u[x] * u[y])
            s = min(s, (1 << 63) - 1)
            grams.append(f"{x} {y}")
            counts.append(int(nab))
            scores.append(int(s))
        return pa.table({
            "bigram": pa.array(grams, pa.string()),
            "n_ab": pa.array(counts, pa.int64()),
            "pmi_micro": pa.array(scores, pa.int64()),
            "neg": pa.array([-s for s in scores], pa.int64()),
        })

    top = (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["neg", "bigram"])
        .limit(k)
    )
    return top.drop_columns(["neg"])


class _BigramScore:
    """Actor-pool scorer for :func:`bigram_logprob`: broadcast (bigram
    log-table as a pd.Series over 'a b' keys is NOT used — interpolation
    needs the raw counts) fetched once per worker; batch scoring is two
    vectorized hash lookups over the flat position list plus a cumsum
    segment reduction."""

    def __init__(self, ref, lam: float, id_col: str, text_col: str):
        import ray

        uni, bi, total = ray.get(ref)
        self.uni = uni      # pd.Series term -> count
        self.bi = bi        # pd.Series "a b" -> count
        self.total = float(total)
        self.lam = float(lam)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(self.text_col))
        n_pos = np.maximum(np.diff(offs) - 1, 0)
        keep = n_pos > 0
        n = len(flat)
        valid = np.ones(max(n - 1, 0), dtype=bool)
        if n >= 2:
            ends = offs[1:] - 1
            valid[ends[(ends >= 0) & (ends <= n - 2)]] = False
        idx = np.nonzero(valid)[0]
        a = flat.take(pa.array(idx, type=pa.int64()))
        b = flat.take(pa.array(idx + 1, type=pa.int64()))
        pair = pc.binary_join_element_wise(a, b, " ")
        n_ab = pair.to_pandas().map(self.bi).to_numpy(
            dtype=np.float64, na_value=0.0)
        n_a = a.to_pandas().map(self.uni).to_numpy(dtype=np.float64)
        n_b = b.to_pandas().map(self.uni).to_numpy(dtype=np.float64)
        # same association order as the SQL mirror: (lam*n_ab)/n_a +
        # ((1-lam)*n_b)/total — driver-gate hashing rounds to 1e-6, far
        # above ulp-level association noise
        p = (self.lam * n_ab) / n_a + ((1.0 - self.lam) * n_b) / self.total
        vals = np.log(p)
        cs = np.concatenate(([0.0], np.cumsum(vals)))
        ends = np.cumsum(n_pos)
        sums = cs[ends] - cs[ends - n_pos]
        out_ids = t.column(self.id_col).filter(pa.array(keep))
        return pa.table({
            self.id_col: out_ids,
            "logprob2": pa.array(
                (sums[keep] / n_pos[keep]).astype(np.float64)
            ),
            "n_bigrams": pa.array(n_pos[keep], pa.int64()),
        })


def bigram_logprob(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                   lam: float = 0.7):
    """Interpolated bigram language-model score per document — the CCNet-
    style perplexity-filter upgrade of :func:`unigram_logprob`: each
    bigram position scores ``ln(lam*P(b|a) + (1-lam)*P(b))`` with
    ``P(b|a) = n_ab/n_a`` from the corpus' own counts (a doc of improbable
    token SEQUENCES now scores low even when its unigrams are common).
    Docs with fewer than two tokens are absent (no bigram positions —
    mirrors the SQL unnest).

    Scale shape: two vocabulary-sized combiner exchanges (unigram +
    bigram counts), both tables broadcast ONCE, then an actor-pool map
    with vectorized lookups — the same three-stage recipe as the unigram
    scorer, one count table wider."""
    import ray

    def parts(t: pa.Table) -> pa.Table:
        flat, offs = tokenize_flat(t.column(text_col))
        uv, uc = term_counts(flat)
        bv, bc = term_counts(flat_bigrams(flat, offs))
        return pa.table({
            "term": pa.concat_arrays([uv, bv]),
            "n": pa.concat_arrays([uc, bc]),
            "is_bigram": pa.array(
                np.concatenate([np.zeros(len(uv), dtype=bool),
                                np.ones(len(bv), dtype=bool)]),
                pa.bool_(),
            ),
        })

    freq = (
        docs_ds.map_batches(parts, batch_format="pyarrow")
        .groupby(["term", "is_bigram"]).sum("n").to_pandas()
    )
    freq.columns = ["term", "is_bigram", "n"]
    uni = freq[~freq["is_bigram"]].set_index("term")["n"].astype(np.float64)
    bi = freq[freq["is_bigram"]].set_index("term")["n"].astype(np.float64)
    total = float(uni.sum())
    ref = ray.put((uni, bi, total))
    return docs_ds.map_batches(
        _BigramScore,
        fn_constructor_args=(ref, lam, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
