"""BPE tokenizer training + application over the documents corpus.

The classic LLM-pipeline operator the reference lacks entirely (its text ops
are trim/case/length, SURVEY.md §2.10): learn a byte-pair-encoding merge
table from corpus statistics (Sennrich et al. 2016, public algorithm), then
tokenize every document with it.

Scale shape — the part that matters at 100 TB:

* Training does NOT iterate over the corpus. It runs ONE distributed pass
  (``word_frequencies``: per-batch ``value_counts`` partials → a
  vocabulary-sized ``groupby("word").sum``) and then the merge loop runs
  driver-side over that word-frequency table, which is bounded by the
  vocabulary (millions of rows at worst, independent of corpus size). This
  is how production BPE trainers work: corpus → word counts once, merges on
  the counts. For open-vocabulary corpora cap the table with ``top_words``
  (frequency covers the mass; the tail contributes ~nothing to pair counts).
* Application is an actor-pool ``map_batches`` stage (``BpeEncoder``): the
  merge-rank table is broadcast once via ``ray.put`` and each actor keeps a
  word→tokens cache, so per batch the work is one encode per NEW unique
  word plus a vectorized count fold — never per-row Python over documents.

No analog in ``/root/reference``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _merge_pair(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Replace every non-overlapping adjacent occurrence of ``pair`` in the
    symbol sequence with the merged symbol (left-to-right scan — the shared
    kernel of training's rewrite and greedy application)."""
    merged = pair[0] + pair[1]
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _split_words(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Split a text column on single spaces (matches DuckDB
    ``string_split(text, ' ')`` exactly, so SQL mirrors stay bit-parity) and
    return the flattened word array with empties dropped."""
    words = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat.filter(pc.not_equal(flat, ""))


def word_frequencies(docs_ds, text_col: str = "text"):
    """Distributed (word, freq) table: per-batch ``value_counts`` partials
    (vocabulary-sized, NOT row-sized) through one small groupby-sum. The
    only exchange is vocabulary-bounded."""

    def partial(t: pa.Table) -> pa.Table:
        flat = _split_words(t.column(text_col))
        vc = pc.value_counts(flat)
        return pa.table({
            "word": vc.field("values"),
            "freq": vc.field("counts").cast(pa.int64()),
        })

    agg = docs_ds.map_batches(partial, batch_format="pyarrow") \
                 .groupby("word").sum("freq")
    return agg.map_batches(
        lambda t: t.rename_columns(["word", "freq"]), batch_format="pyarrow"
    )


def pair_counts_table(word_freq_ds):
    """First-iteration BPE pair statistics: character-bigram counts weighted
    by word frequency, computed over the (already vocabulary-sized)
    word-frequency table — the loop below is per unique WORD, never per
    corpus row. Returns (a, b, freq); SQL-mirrorable (substr × generate_series)."""

    def explode(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        freqs = t.column("freq").to_numpy(zero_copy_only=False)
        a_out: list[str] = []
        b_out: list[str] = []
        f_out: list[int] = []
        for w, f in zip(words, freqs):
            for i in range(len(w) - 1):
                a_out.append(w[i])
                b_out.append(w[i + 1])
                f_out.append(int(f))
        return pa.table({
            "a": pa.array(a_out, pa.string()),
            "b": pa.array(b_out, pa.string()),
            "freq": pa.array(f_out, pa.int64()),
        })

    agg = word_freq_ds.map_batches(explode, batch_format="pyarrow") \
                      .groupby(["a", "b"]).sum("freq")
    return agg.map_batches(
        lambda t: t.rename_columns(["a", "b", "freq"]), batch_format="pyarrow"
    )


def train_bpe(
    word_freqs: list[tuple[str, int]] | pa.Table,
    num_merges: int = 200,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a (word, freq) table — Sennrich
    et al. 2016. Deterministic: ties broken by the lexicographically
    smallest (a, b) pair. Stops early when no pair reaches
    ``min_pair_freq``.

    Runs driver-side over the vocabulary-sized table (see module docstring
    for why that is the correct 100-TB shape). Keeps an inverted
    pair→word-indexes map so each merge touches only the words that contain
    the pair, not the whole vocabulary."""
    if isinstance(word_freqs, pa.Table):
        word_freqs = list(zip(
            word_freqs.column("word").to_pylist(),
            (int(f) for f in word_freqs.column("freq").to_pylist()),
        ))
    symbols: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs: list[int] = [int(f) for _, f in word_freqs]

    pair_freq: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add_word(idx: int, sign: int) -> None:
        syms, f = symbols[idx], freqs[idx] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_freq[p] = pair_freq.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)

    for idx in range(len(symbols)):
        _add_word(idx, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_f = min_pair_freq - 1
        for p, f in pair_freq.items():
            if f > best_f or (f == best_f and (best is None or p < best)):
                if f >= min_pair_freq:
                    best, best_f = p, f
        if best is None:
            break
        merges.append(best)
        for idx in sorted(pair_words.get(best, ())):
            _add_word(idx, -1)
            symbols[idx] = _merge_pair(symbols[idx], best)
            _add_word(idx, +1)
        # drop exhausted pairs so the argmax scan stays tight
        pair_freq = {p: f for p, f in pair_freq.items() if f > 0}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the present pair with
    the LOWEST merge rank (training order) until none applies — the standard
    GPT-2-style application rule, guaranteed to reproduce training's
    segmentation on the training corpus."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = _merge_pair(syms, (syms[best_i], syms[best_i + 1]))
    return syms


class BpeEncoder:
    """Actor-pool tokenize stage: merge ranks broadcast once (``ray.put``),
    word→token-count cache built per actor in ``__init__``/lazily — per
    batch the Python work is one ``encode_word`` per NEW unique word; the
    per-document fold is a vectorized bincount over word indexes."""

    def __init__(self, merges_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        merges = (
            ray.get(merges_ref)
            if isinstance(merges_ref, ray.ObjectRef)
            else merges_ref
        )
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict[str, int] = {}
        self._id_col, self._text_col = id_col, text_col

    def _ntok(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self._ranks))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(self._text_col), "")
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        # doc index of every word: repeat by list lengths, then mask empties
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch)), lens)[keep]
        flat = flat.filter(pa.array(keep))
        # dictionary-encode the flat words: ONE encode per unique word
        dict_arr = flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        per_uniq = np.array([self._ntok(w) for w in uniq], dtype=np.int64)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        n_words = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        n_tokens = np.bincount(
            doc_idx, weights=per_uniq[codes], minlength=n_rows
        ).astype(np.int64)
        return pa.table({
            self._id_col: batch.column(self._id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tokens, pa.int64()),
        })


def bpe_tokenize_counts(docs_ds, num_merges: int = 50,
                        id_col: str = "doc_id", text_col: str = "text"):
    """End-to-end BPE pipeline: one distributed word-count pass → driver
    merge loop over the vocabulary-sized table → broadcast-apply actor
    stage. Returns (doc_id, n_words, n_bpe_tokens)."""
    import ray

    # the word-frequency table is vocabulary-sized by construction — the
    # take_all() is bounded by |vocab|, not corpus rows (cap with top_words
    # for open vocabularies)
    wf_rows = word_frequencies(docs_ds, text_col).take_all()
    wf = sorted((r["word"], int(r["freq"])) for r in wf_rows)
    merges = train_bpe(wf, num_merges=num_merges)
    merges_ref = ray.put(merges)
    return docs_ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges_ref,),
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
