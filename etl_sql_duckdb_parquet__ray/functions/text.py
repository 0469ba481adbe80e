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


class Fingerprint:
    """map_batches stage emitting winnowing fingerprint sets per doc."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            winnow_fingerprints(t or "", self.k, self.window)
            for t in batch.column("text").to_pylist()
        ]
        n_fp = pa.array([len(f) for f in fps], type=pa.int64())
        fp_min = pa.array(
            [int(f.min()) if len(f) else 0 for f in fps], type=pa.uint64()
        )
        return (
            batch.append_column("n_fingerprints", n_fp).append_column("fp_min", fp_min)
        )


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
