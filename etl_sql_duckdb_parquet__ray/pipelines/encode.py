"""The flagship encode / decode pipelines — Ray-Data-first.

Shape (SURVEY.md §3.1 "Ray Data shape of the same flow"):

    read_parquet(transcripts)
      -> map_batches(add deterministic hash bucket)        [stateless tasks]
      -> filter completed buckets (manifest diff = resume) [stateless tasks]
      -> groupby("bucket").map_groups(BucketEncoder)       [ACTOR POOL holding
             broadcast-trained FSST/dict tables via ray.put handle]
      -> per-bucket atomic chunk file + lineage record
    decode: from_items(bucket files) -> map_batches(decode, streaming chunks)

Partitioning contract (designed for the 10^12-turn cluster run, tested
single-node): the shuffle key is ``hash(conv_id) % num_buckets`` so a normal
conversation lands wholly in one bucket; a HOT conversation (sampled count
estimate above the per-group budget) is salted by ``turn_idx // salt_block``
so its contiguous turn ranges spread across buckets and no group can exceed
~salt_block rows regardless of skew. Within a bucket rows sort by
``(conv_id, turn_idx)`` and split into fixed-row chunks whose conv/turn
ranges are recorded per chunk, so decode + global sort reassembles the
stable turn order exactly. Buckets are sized by ``num_buckets`` so one group
fits a worker's heap; at 100 TB raise ``num_buckets``, not chunk size.

Nothing here calls ``ray.init``; callers own the session.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..chunk import (
    decode_chunk,
    encode_chunk,
    iter_chunks,
    write_chunk_file,
)
from ..codecs.fsst import FsstCodec, FsstZstdCodec, train_fsst
from ..state.manifest import (
    bucket_data_path,
    completed_buckets,
    load_manifest,
    load_run_meta,
    write_bucket_record,
    write_run_meta,
)
from ..state.memtune import tune_malloc

SORT_KEYS = [("conv_id", "ascending"), ("turn_idx", "ascending")]


def conv_bucket(conv_ids: pa.Array | pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Deterministic (cross-process, cross-run) hash bucket per conversation.

    Uses pandas' SipHash-based ``hash_array`` (vectorized C); stable for a
    fixed pandas version and hash key, which is all resume requires.
    """
    ids = np.asarray(conv_ids, dtype=object)
    return (pd.util.hash_array(ids) % num_buckets).astype(np.int32)


def add_bucket(
    batch: pa.Table,
    num_buckets: int,
    hot_convs: dict[str, int] | None = None,
    salt_block: int = 262144,
    dict_conv: bool = False,
) -> pa.Table:
    """Bucket assignment with SALTED-KEY skew splitting: a normal
    conversation hashes wholly into one bucket; a *hot* conversation (from
    the sampled count estimate) is salted by ``turn_idx // salt_block`` so
    its contiguous turn ranges spread across buckets and no single group can
    exceed ~salt_block rows. Decode + the global (conv_id, turn_idx) sort
    reassembles the turn order exactly — per-chunk conv/turn ranges are
    recorded in the manifest for ordered reassembly."""
    buckets = conv_bucket(batch.column("conv_id"), num_buckets)
    if hot_convs:
        conv = np.asarray(batch.column("conv_id"), dtype=object)
        hot_mask = np.isin(conv, np.array(list(hot_convs), dtype=object))
        if hot_mask.any():
            turn = np.asarray(batch.column("turn_idx"))
            salt = (turn[hot_mask].astype(np.int64) // salt_block).astype("U16")
            salted_keys = np.char.add(
                np.char.add(conv[hot_mask].astype("U"), "#"), salt
            )
            buckets[hot_mask] = (
                pd.util.hash_array(salted_keys.astype(object)) % num_buckets
            ).astype(np.int32)
    # OPT-IN: dictionary-encode conv_id for the exchange — int32 indices +
    # one small per-block dictionary instead of ~13 B of string per row;
    # the bucket encoder re-expands before its per-bucket sort, so
    # downstream semantics are unchanged (roundtrip bit-identity tested
    # both ways). Measured A/B at 3M turns: exchange bytes/turn 158.9 ->
    # 146.1 (-8%), but encode at 32 cpus 13.1 s -> 15.8-17.1 s (+20-30%:
    # the sort-shuffle's concat must UNIFY per-block dictionaries, and that
    # hash work lands in the narrow reduce stage). On shared-memory
    # single-host exchange the byte saving buys nothing, so default OFF;
    # flip on (GRAFT_DICT_CONV=1 or dict_conv=True) only for network-bound
    # multi-node clusters where 8% of exchange traffic outweighs the
    # reduce-side CPU.
    if dict_conv:
        i = batch.schema.get_field_index("conv_id")
        batch = batch.set_column(
            i, "conv_id", pc.dictionary_encode(batch.column("conv_id"))
        )
    return batch.append_column("bucket", pa.array(buckets))


def detect_hot_convs(
    ds, sample_rows: int = 100_000, est_total: int | None = None,
    hot_threshold: int = 262144,
) -> dict[str, int]:
    """Sampled hot-conversation detection (SURVEY.md §4 skew row): count
    conv frequencies in a driver-side sample, scale to the dataset size,
    return conversations whose estimated rows exceed the per-group budget."""
    try:
        paths = ds.input_files()
    except Exception:
        paths = []
    counts: dict[str, int] = {}
    seen = 0
    if paths:
        try:
            import pyarrow.parquet as pq

            # evenly spaced across ALL fragments (first and last included):
            # a hot conversation living only in later files must be seen
            paths = sorted(paths)  # input_files() order is not deterministic
            k = min(8, len(paths))
            idxs = sorted({int(i) for i in np.linspace(0, len(paths) - 1, k)})
            chosen = [paths[i] for i in idxs]
            # budget is PER FILE (no global early-stop): a global cap would
            # exhaust on the first files and never reach the last fragment
            per_file = max(sample_rows // len(chosen), 1)
            for path in chosen:
                pf = pq.ParquetFile(path)
                file_seen = 0
                for b in pf.iter_batches(
                    batch_size=min(65536, per_file), columns=["conv_id"]
                ):
                    vals, cnts = np.unique(
                        np.asarray(b.column(0), dtype=object), return_counts=True
                    )
                    for v, c in zip(vals, cnts):
                        counts[v] = counts.get(v, 0) + int(c)
                    seen += b.num_rows
                    file_seen += b.num_rows
                    if file_seen >= per_file:
                        break
        except Exception:
            # paths that aren't readable parquet with a conv_id column
            # (e.g. input_files() of a derived dataset) — fall back to
            # sampling the dataset itself
            counts, seen = {}, 0
    if not seen:
        df = ds.limit(sample_rows).select_columns(["conv_id"]).to_pandas()
        if "conv_id" in df.columns:  # empty datasets come back column-less
            counts = {k: int(v) for k, v in df["conv_id"].value_counts().items()}
            seen = len(df)
    if not seen:
        return {}
    total = est_total or seen
    scale = max(total / seen, 1.0)
    return {
        c: int(n * scale) for c, n in counts.items() if n * scale > hot_threshold
    }


@dataclass
class SharedEncodeState:
    """Broadcast-trained per-column state (ST4 in SURVEY.md §2.4): one FSST
    symbol table trained on a driver-side sample, shipped to every encoder
    actor via a single ``ray.put``."""

    fsst_table: list[bytes] | None = None

    def shared_codecs(self) -> dict[str, Any]:
        if not self.fsst_table:
            return {}
        return {"text": FsstZstdCodec(self.fsst_table)}


PRE_COLS = ["text_codes", "text_lits", "text_len"]

# per-worker cache of the broadcast FSST table index for the pre-encode map
_PRE_INDEX: dict[str, tuple] = {}


def pre_encode_text(batch: pa.Table, state_ref) -> pa.Table:
    """Pre-SHUFFLE row-level FSST: replace ``text`` (in place, order kept)
    with per-row compressed streams + original byte length, using the
    broadcast symbol table. The conv_id exchange then moves ~40-60% fewer
    bytes, and post-shuffle chunk assembly is pure concatenation — the
    shuffled binary columns' value buffers ARE the chunk code streams.

    Null text rows keep ``text_len = -1`` with empty streams (an empty row
    contributes nothing to the concatenated chunk buffer, so dense-row
    assembly stays exact)."""
    import ray

    from ..codecs.base import string_array_to_blob
    from ..codecs.fsst import _TableIndex, fsst_encode_rows

    is_ref = isinstance(state_ref, ray.ObjectRef)
    key = state_ref.hex() if is_ref else str(id(state_ref))
    cached = _PRE_INDEX.get(key)
    if cached is None:
        tune_malloc()
        state = ray.get(state_ref) if is_ref else state_ref
        cached = (state.fsst_table, _TableIndex(state.fsst_table or []))
        # small capped cache (FIFO evict): two encode jobs interleaving
        # batches on a shared worker must not thrash each other's symbol
        # tables every batch; entries are tiny (a few KB of FSST symbols)
        while len(_PRE_INDEX) >= 4:
            _PRE_INDEX.pop(next(iter(_PRE_INDEX)))
        _PRE_INDEX[key] = cached
    _, idx = cached

    text = batch.column("text").combine_chunks()
    null_mask = np.asarray(text.is_null()) if text.null_count else None
    filled = pc.fill_null(text, "") if text.null_count else text
    blob = string_array_to_blob(filled)
    codes, lits, cpr, lpr = fsst_encode_rows(blob.data, blob.lengths, idx)

    n = len(text)

    def _bin(data: bytes, counts: np.ndarray) -> pa.Array:
        # int32 offsets: the shuffle pays per byte moved, and a batch's
        # compressed text is far below the 2 GiB int32 limit
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        return pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
        )

    text_len = blob.lengths.astype(np.int32)
    if null_mask is not None:
        text_len = np.where(null_mask, np.int32(-1), text_len)
    i = batch.column_names.index("text")
    out = batch.remove_column(i)
    out = out.add_column(i, "text_codes", _bin(codes, cpr))
    out = out.add_column(i + 1, "text_lits", _bin(lits, lpr))
    out = out.add_column(i + 2, "text_len", pa.array(text_len, type=pa.int32()))
    return out


def train_shared_state(ds, sample_rows: int = 2000) -> SharedEncodeState:
    """Sample-train global FSST table for ``text`` (training must sample,
    not scan — SURVEY.md §7.4 scaling-efficiency note).

    The sample is read directly from the dataset's parquet fragments when
    possible (one row group, driver-side, microseconds) instead of running
    the Dataset pipeline — ``ds.limit().to_pandas()`` would spin up an
    executor round-trip just to fetch a training sample."""
    corpus = b""
    try:
        paths = ds.input_files()
        if paths:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(paths[0])
            batch = next(pf.iter_batches(batch_size=sample_rows, columns=["text"]))
            texts = batch.column(0).drop_null().to_pylist()[:sample_rows]
            corpus = "".join(texts).encode("utf-8", "surrogatepass")
    except Exception:
        corpus = b""
    if not corpus:
        sample = ds.limit(sample_rows).to_pandas()
        if "text" in sample.columns:
            corpus = "".join(sample["text"].dropna().tolist()).encode(
                "utf-8", "surrogatepass"
            )
    return SharedEncodeState(fsst_table=train_fsst(corpus, iters=5, cap=1 << 17) or None)


class BucketEncoder:
    """Actor-pool stage: encodes one hash-bucket group per call.

    ``__init__`` runs once per actor (malloc tuning + fetching the broadcast
    state handle); ``__call__`` runs per bucket group. The callable-class /
    ``map_groups`` pairing is the canonical "load once per worker" pattern
    (cf. reference ST1 driver-global FK set, ``src/etl/validate.py:243``).
    """

    def __init__(
        self,
        out_dir: str,
        chunk_rows: int = 65536,
        mode: str = "balanced",
        state_ref=None,
        with_checksums: bool = True,
        chunk_order: str = "conv",
        text_filters: bool = False,
        codec_overrides: dict[str, str] | None = None,
    ):
        tune_malloc()
        self.out_dir = out_dir
        self.chunk_rows = chunk_rows
        self.mode = mode
        self.with_checksums = with_checksums
        self.chunk_order = chunk_order
        self.text_filters = text_filters
        # production pin: skip the per-chunk selector for these columns
        # (text on the pre-encode path is assembled, not selected — a
        # "text" override only applies with pre_encode=False)
        self.codec_overrides = dict(codec_overrides or {})
        if state_ref is not None:
            import ray

            state = ray.get(state_ref)
        else:
            state = SharedEncodeState()
        self.shared_codecs = state.shared_codecs() if self.mode != "fast" else {}
        self.fsst_table = state.fsst_table
        # encoder-lifetime selector cache: hash buckets are samples of the
        # SAME row distribution, so probe points learned on one bucket are
        # valid for the next — reuse is still gated per chunk by that
        # chunk's own stats (select_codec_cached). One encoder instance
        # serves one job (worker task-cache keys on job params), so no
        # cross-job contamination.
        self._sel_cache: dict = {}

    def _assemble_text(self, part: pa.Table) -> tuple[pa.Table, dict]:
        """Post-shuffle half of the pre-encode path: slice the per-row code /
        literal streams back out of the (sorted) binary columns and pack them
        into an ``fsst_zstd``-compatible column payload. The binary columns'
        value buffers are already the concatenated streams in row order."""
        from ..chunk import assemble_fsst_payload
        from ..codecs.base import string_array_to_blob

        codes = string_array_to_blob(part.column("text_codes").combine_chunks())
        lits = string_array_to_blob(part.column("text_lits").combine_chunks())
        tl = np.asarray(part.column("text_len").combine_chunks())
        null_mask = tl < 0
        payload, meta = assemble_fsst_payload(
            codes.data,
            lits.data,
            tl[~null_mask],
            null_mask if null_mask.any() else None,
            part.num_rows,
            self.fsst_table,
            with_checksum=self.with_checksums,
        )
        i = part.column_names.index("text_codes")
        order = part.column_names[:i] + ["text"] + part.column_names[i + 3 :]
        return part.drop_columns(PRE_COLS), {"order": order, "text": (payload, meta)}

    def _flat_text(self, part: pa.Table) -> bytes:
        """The chunk's concatenated text bytes, for the trigram filter. On
        the pre-encode path the plaintext no longer exists post-shuffle —
        decode the row code streams once (flat, no per-row split; FSST
        decode is a vectorized gather, a few ms per chunk)."""
        from ..codecs.base import string_array_to_blob

        if "text_codes" in part.column_names:
            from ..codecs.fsst import fsst_decode_stream

            codes = string_array_to_blob(part.column("text_codes").combine_chunks())
            lits = string_array_to_blob(part.column("text_lits").combine_chunks())
            return fsst_decode_stream(codes.data, lits.data, self.fsst_table or [])
        if "text" not in part.column_names:
            return b""
        filled = pc.fill_null(part.column("text").combine_chunks(), "")
        return string_array_to_blob(filled).data

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        body = group.drop_columns(["bucket"])
        conv_col = body.column("conv_id")
        if pa.types.is_dictionary(conv_col.type):
            # re-expand the exchange's dictionary indices (see add_bucket)
            body = body.set_column(
                body.schema.get_field_index("conv_id"), "conv_id",
                conv_col.cast(pa.string()),
            )
        body = body.take(pc.sort_indices(body, sort_keys=SORT_KEYS))
        if (self.chunk_order == "time" and "ts" in body.column_names
                and body.num_rows):
            # time-clustered layout (opt-in): order whole CONVERSATIONS by
            # (min ts, conv_id) so chunks get tight ts extents and a
            # time-range read prunes ~to the window fraction. Rows within a
            # conversation keep their (turn_idx) order — the decode
            # contract (per-turn text under stable (conv_id, turn_idx)
            # ordering) is order-free across conversations.
            cids = np.asarray(body.column("conv_id").cast(pa.large_string()))
            starts = np.flatnonzero(
                np.concatenate(([True], cids[1:] != cids[:-1]))
            )
            ts64 = np.asarray(
                body.column("ts").cast(pa.int64()).fill_null(np.iinfo(np.int64).max)
            )
            run_min_ts = np.minimum.reduceat(ts64, starts)
            ends = np.append(starts[1:], len(cids))
            run_order = np.lexsort((cids[starts], run_min_ts))
            take = np.concatenate(
                [np.arange(starts[r], ends[r]) for r in run_order]
            ) if len(starts) else np.array([], dtype=np.int64)
            body = body.take(pa.array(take, type=pa.int64()))
        pre = "text_codes" in body.column_names
        chunks: list[bytes] = []
        chunk_meta: list[dict] = []
        bytes_in = 0
        sel_cache = self._sel_cache
        for lo in range(0, body.num_rows, self.chunk_rows):
            part = body.slice(lo, self.chunk_rows)
            conv = part.column("conv_id")
            turn = part.column("turn_idx")
            if self.chunk_order == "time":
                # conv order is broken by the time clustering: conv_range
                # must be a computed min/max, not first/last
                cmm = pc.min_max(conv)
                conv_lo, conv_hi = str(cmm["min"].as_py()), str(cmm["max"].as_py())
            else:
                conv_lo, conv_hi = str(conv[0]), str(conv[-1])
            # conv_range: first/last IS min/max (conv_id is the primary sort
            # key). turn_range must be the TRUE min/max — turn_idx restarts
            # per conversation inside a (conv_id, turn_idx)-sorted chunk, so
            # first/last would under-report the extent and plan_chunks would
            # false-prune (e.g. a chunk holding turns 0..999 across two convs
            # can start at turn 0 and END at turn 4).
            tmm = pc.min_max(turn)
            extra = {
                "bucket": bucket,
                "conv_range": [conv_lo, conv_hi],
                "turn_range": [int(tmm["min"].as_py()), int(tmm["max"].as_py())],
            }
            # ts zone map (time-range reads are the common transcript access
            # pattern): TRUE min/max in epoch-us — ts is not monotonic in
            # the (conv_id, turn_idx) sort order, same pitfall as turn_idx.
            # All-null ts -> no ts_range key -> plan_chunks keeps the chunk.
            if "ts" in part.column_names:
                smm = pc.min_max(part.column("ts").cast(pa.int64()))
                if smm["min"].is_valid:
                    extra["ts_range"] = [smm["min"].as_py(), smm["max"].as_py()]
            # low-cardinality value-set zone maps: the distinct role/tool
            # values of the chunk (sorted, nulls excluded — equality never
            # matches NULL in SQL) when few enough to be worth storing; a
            # role_eq/tool_eq lookup prunes chunks whose set lacks the
            # value. High-cardinality chunks just omit the key (no pruning).
            vsets = {}
            for vcol in ("role", "tool"):
                if vcol in part.column_names:
                    u = pc.unique(part.column(vcol)).drop_null()
                    if len(u) <= 32:
                        vsets[vcol] = sorted(u.to_pylist())
            if vsets:
                extra_vals = vsets
            else:
                extra_vals = None
            filt = None
            if self.text_filters:
                # substring data skipping: Bloom over the chunk's distinct
                # text trigrams, manifest-side only (the data file layout
                # is unchanged; see filters.py for the exactness argument).
                # Must run BEFORE _assemble_text consumes the code columns.
                from ..filters import build_trigram_filter

                filt = build_trigram_filter(self._flat_text(part))
            preencoded = None
            order = None
            if pre:
                part, asm = self._assemble_text(part)
                preencoded = {"text": asm["text"]}
                order = asm["order"]
            blob, summary = encode_chunk(
                part,
                shared_codecs={} if pre else self.shared_codecs,
                with_checksums=self.with_checksums,
                extra=extra,
                mode=self.mode,
                preencoded=preencoded,
                order=order,
                codec_overrides=self.codec_overrides,
                selector_cache=sel_cache,
            )
            chunks.append(blob)
            bytes_in += summary["bytes_in"]
            meta_rec = {**extra, "rows": summary["rows"], "codecs": summary["codecs"]}
            if filt is not None:
                meta_rec["tri_filter"] = filt
            if extra_vals is not None:
                meta_rec["val_sets"] = extra_vals
            chunk_meta.append(meta_rec)
        path = bucket_data_path(self.out_dir, bucket)
        # a (re)written bucket invalidates any derived-column sidecars that
        # described its OLD chunks — leaving them would silently attach a
        # previous corpus' values (or stale zone maps) to the new rows
        import glob as _glob

        for stale in _glob.glob(
            os.path.join(self.out_dir, f"column-*-{bucket:05d}.bin")
        ) + _glob.glob(
            os.path.join(self.out_dir, f"column-*-{bucket:05d}.json")
        ):
            try:
                os.remove(stale)
            except OSError:
                pass
        nbytes = write_chunk_file(path, chunks)
        record = {
            "bucket": bucket,
            "path": path,
            "rows": body.num_rows,
            "bytes_in": bytes_in,
            "bytes_out": nbytes,
            # zone-map semantics version: 2 = turn_range is true min/max.
            # Records without this tag (v1) recorded [first, last] of the
            # sorted chunk, which is NOT a valid zone map for turn_idx —
            # plan_chunks must skip turn pruning for those.
            "zone_v": 2,
            "chunks": chunk_meta,
        }
        write_bucket_record(self.out_dir, bucket, record)
        return pa.table(
            {
                "bucket": pa.array([bucket], type=pa.int32()),
                "rows": pa.array([body.num_rows], type=pa.int64()),
                "bytes_in": pa.array([bytes_in], type=pa.int64()),
                "bytes_out": pa.array([nbytes], type=pa.int64()),
            }
        )


# Per-worker-process cache for the task-based encoder path: the first task a
# worker runs builds the (shared-table) encoder once; every later task on
# that worker reuses it — the same "setup once per worker" amortization as
# the actor pool, without paying per-job actor-fleet startup (each Ray actor
# is a FRESH interpreter that re-imports numpy/pyarrow; ~5s per job on this
# host, which a 10^12-turn job amortizes but a bench job does not).
_WORKER_ENCODERS: dict[tuple, "BucketEncoder"] = {}


def _encode_group_task(group: pa.Table, out_dir: str, chunk_rows: int, mode: str, state_ref, chunk_order: str = "conv", text_filters: bool = False, codec_overrides: dict[str, str] | None = None) -> pa.Table:
    # the broadcast-state identity MUST be part of the key: a reused worker
    # serving a new job would otherwise assemble chunks with a stale symbol
    # table (codes from table B stored next to table A = silent corruption)
    skey = state_ref.hex() if hasattr(state_ref, "hex") else str(id(state_ref))
    ov_key = tuple(sorted(codec_overrides.items())) if codec_overrides else None
    key = (out_dir, chunk_rows, mode, skey, chunk_order, text_filters, ov_key)
    enc = _WORKER_ENCODERS.get(key)
    if enc is None:
        # small capped cache (FIFO evict, same policy as _PRE_INDEX): bounded
        # so a long-lived worker serving many jobs doesn't pin every past
        # job's symbol table, but ≥2 live entries so concurrent interleaved
        # jobs don't evict each other per group
        while len(_WORKER_ENCODERS) >= 4:
            _WORKER_ENCODERS.pop(next(iter(_WORKER_ENCODERS)))
        enc = BucketEncoder(
            out_dir=out_dir, chunk_rows=chunk_rows, mode=mode,
            state_ref=state_ref, chunk_order=chunk_order,
            text_filters=text_filters, codec_overrides=codec_overrides,
        )
        _WORKER_ENCODERS[key] = enc
    return enc(group)


def _split_by_bucket(block: pa.Table, num_buckets: int) -> list[pa.Table]:
    """Map-side split of one block into per-bucket sub-tables: one stable
    argsort on the dense int bucket key, then boundary slices — O(n log n)
    on ONE block, no global sort, no boundary sampling."""
    b = np.asarray(block.column("bucket"))
    order = np.argsort(b, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(num_buckets + 1))
    return [
        sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(num_buckets)
    ]


def _direct_exchange_encode(
    bucketed, num_buckets: int, out_dir: str, chunk_rows: int, mode: str,
    state_ref, text_filters: bool = False,
    codec_overrides: dict[str, str] | None = None,
) -> None:
    """Raw-task bucket-direct exchange (opt-in ``exchange="direct"``): the
    bucket key is a DENSE int in [0, num_buckets), so the generic sort
    shuffle's boundary sampling + global merge of sort runs is pure
    overhead. Here each upstream block is split map-side into
    ``num_buckets`` sub-tables (``num_returns=num_buckets`` task), and one
    reduce task per bucket gathers exactly its shards and runs the same
    ``BucketEncoder`` body — two task waves, object-store spill handles
    memory, per-bucket atomic outputs keep resume semantics identical.

    Scale note: shard-object count is blocks × buckets; at 10^12 turns
    keep blocks coarse (whole read fragments) and buckets in the 10^3-10^4
    range, or shard the exchange per bucket-range. Measured vs the sort
    exchange in BASELINE.md (round 3)."""
    import ray

    split = ray.remote(num_returns=num_buckets)(_split_by_bucket)
    shard_refs: list[list] = [[] for _ in range(num_buckets)]
    # stream upstream blocks as they finish; submit a split task per block
    for bundle in bucketed.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            outs = split.remote(block_ref, num_buckets)
            if num_buckets == 1:
                outs = [outs]
            for i, ref in enumerate(outs):
                shard_refs[i].append(ref)

    @ray.remote
    def encode_bucket(out_dir, chunk_rows, mode, wrapped_state, *shards):
        # state_ref travels WRAPPED in a list so Ray doesn't auto-deref it
        # at task-arg time — the encoder cache keys on the ref identity
        parts = [s for s in shards if s.num_rows]
        if not parts:
            return 0
        group = pa.concat_tables(parts).combine_chunks()
        _encode_group_task(
            group, out_dir, chunk_rows, mode, wrapped_state[0],
            text_filters=text_filters, codec_overrides=codec_overrides,
        )
        return group.num_rows

    done = [
        encode_bucket.remote(out_dir, chunk_rows, mode, [state_ref], *refs)
        for refs in shard_refs
    ]
    ray.get(done)


def read_for_encode(
    src,
    blocks_per_cpu: int = 3,
    target_block_bytes: int = 128 << 20,
    **read_kwargs,
):
    """``read_parquet`` planned for the encode pipeline's exchange.

    Ray's sort exchange pays one object fetch per (map block x reduce
    partition) and creates one reduce partition per input block, so the
    fetch matrix grows QUADRATICALLY in block count. The default read
    target splits a 3M-turn table into 240 blocks -> 57.6k fetches, whose
    scheduling/IPC latency — not CPU — dominated the post-barrier phase at
    32 cpus (measured: the reduce+encode phase ran at 14% cpu density).
    Planning the read at ``blocks_per_cpu`` x cluster CPUs restores load
    balance with a ~10x smaller fetch matrix (measured best-of-2 at 32
    cpus: 15.8 s vs 23.5 s default). The on-disk-bytes floor keeps
    per-task memory bounded at 100 TB scale, where it is the binding term
    and the plan converges to Ray's own default."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    paths = [src] if isinstance(src, str) else list(src)
    disk_bytes = 0
    for p in paths:
        if os.path.isdir(p):
            disk_bytes += sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        elif os.path.isfile(p):
            disk_bytes += os.path.getsize(p)
        else:
            # remote / fsspec path: let Ray plan it
            return ray.data.read_parquet(src, **read_kwargs)
    nblocks = max(blocks_per_cpu * cpus, -(-disk_bytes // target_block_bytes))
    return ray.data.read_parquet(src, override_num_blocks=nblocks, **read_kwargs)


def encode_transcripts(
    ds,
    out_dir: str,
    num_buckets: int = 32,
    chunk_rows: int = 65536,
    mode: str = "balanced",
    resume: bool = True,
    train_sample_rows: int = 2000,
    encoder_concurrency=None,
    use_actors: bool = False,
    pre_encode: bool = True,
    salt_hot: bool = True,
    salt_block: int = 262144,
    hot_convs: dict[str, int] | None = None,
    dict_conv: bool | None = None,
    exchange: str | None = None,
    chunk_order: str = "conv",
    text_filters: bool = False,
    codec_overrides: dict[str, str] | None = None,
):
    """Encode a transcript Dataset into ``out_dir`` chunk files + manifest.

    With ``text_filters`` each chunk's manifest record additionally carries
    a trigram Bloom filter over its text (``filters.py``), enabling
    substring data skipping at decode (``decode_dataset(text_contains=…)``).
    Off by default: building it costs one extra flat FSST decode per chunk
    on the pre-encode path.

    Returns the aggregated manifest stats. Idempotent and resumable: with
    ``resume=True`` already-completed buckets are filtered out *before* the
    shuffle, so a rerun only pays for unfinished partitions.

    With ``pre_encode`` (default) the ``text`` column is FSST-compressed
    row-by-row BEFORE the conv_id shuffle (broadcast symbol table, map-side,
    embarrassingly parallel), so the all-to-all exchange — the one stage
    whose cost scales with bytes moved, not cores — carries compressed
    streams. Post-shuffle assembly concatenates them; decoded output is
    identical either way.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    existing = completed_buckets(out_dir)
    done = existing if resume else set()
    if resume and len(done) >= num_buckets:
        return load_manifest(out_dir)

    state_ref = None
    shared_state = None
    if mode != "fast":
        shared_state = train_shared_state(ds, train_sample_rows)
        state_ref = ray.put(shared_state)

    if salt_hot and hot_convs is None:
        # estimate total rows from parquet METADATA when the dataset is a
        # pure read; ds.count() on a derived dataset would execute the whole
        # upstream pipeline just to size the sample scale
        est_total = None
        try:
            paths = ds.input_files()
            if paths:
                import pyarrow.parquet as pq

                est_total = sum(
                    pq.ParquetFile(p).metadata.num_rows for p in paths
                )
        except Exception:
            est_total = None
        hot_convs = detect_hot_convs(
            ds, est_total=est_total, hot_threshold=max(salt_block, chunk_rows)
        )
    # run-level partitioning metadata: lets conv_id lookups compute their
    # home bucket (deterministic hash) instead of zone-scanning every
    # partition. hot_convs are UNIONED across (re)runs — a resumed run may
    # sample a different hot set, and a conv salted by ANY past run must
    # keep falling back to the zone-map scan.
    prev_meta = load_run_meta(out_dir) or {}
    # a dir encoded under a DIFFERENT bucket count has a mixed layout: the
    # home-bucket shortcut would silently drop rows, so poison the hash tag
    # and let plan_chunks fall back to the (always-correct) zone scan.
    # A dir with completed bucket records but NO run meta (written before
    # _run.json existed, or meta lost) is equally unknowable — its buckets
    # may have been laid out under a different num_buckets — so poison too.
    mixed = (
        (
            "num_buckets" in prev_meta
            and prev_meta["num_buckets"] != num_buckets
        )
        or prev_meta.get("hash") == "mixed-layout"
        or (not prev_meta and bool(existing))
    )
    write_run_meta(
        out_dir,
        {
            "num_buckets": num_buckets,
            "hash": "mixed-layout" if mixed else "pd-siphash-default",
            "hot_convs": {**prev_meta.get("hot_convs", {}), **(hot_convs or {})},
            "salt_block": salt_block,
        },
    )
    # batch_size=None => whole blocks: the per-call fixed cost of the
    # vectorized kernels amortizes over ~read-fragment-sized batches instead
    # of Ray's 1024-row default
    if dict_conv is None:  # resolved at the DRIVER (workers may not see env)
        dict_conv = os.environ.get("GRAFT_DICT_CONV", "0") == "1"
    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", batch_size=None,
        fn_kwargs={
            "num_buckets": num_buckets,
            "hot_convs": hot_convs or None,
            "salt_block": salt_block,
            "dict_conv": dict_conv,
        },
    )
    # resume filter sits BEFORE the expensive pre-encode map so a rerun
    # only pays the row-FSST kernel for unfinished partitions
    if done:
        done_arr = pa.array(sorted(done), type=pa.int32())
        bucketed = bucketed.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("bucket"), value_set=done_arr))
            ),
            batch_format="pyarrow",
        )
    if pre_encode and shared_state is not None and shared_state.fsst_table:
        bucketed = bucketed.map_batches(
            pre_encode_text, batch_format="pyarrow", batch_size=None,
            fn_kwargs={"state_ref": state_ref},
        )
    # exchange strategy: "sort" (default — Ray's sort-based pull shuffle) or
    # "hash" (HASH_SHUFFLE: map tasks stream partition shards straight to
    # aggregator actors keyed by hash(bucket), skipping the global sort of
    # bucket ids the sort exchange pays even though the key is already a
    # dense int). Tuning caveat measured on this host: untuned hash shuffle
    # deadlocks a small cluster — it wants 64 aggregators × 0.25 cpu and
    # 200 default partitions — so we pin num_partitions=num_buckets and cap
    # aggregators at cpus/4.
    if exchange is None:
        exchange = os.environ.get("GRAFT_EXCHANGE", "sort")
    if exchange == "direct":
        # raw-task bucket-direct split+reduce (see _direct_exchange_encode)
        _direct_exchange_encode(
            bucketed, num_buckets, out_dir, chunk_rows, mode, state_ref,
            text_filters=text_filters, codec_overrides=codec_overrides,
        )
        return load_manifest(out_dir)
    # scope the shuffle-strategy override to THIS dataset chain's captured
    # DataContext (GroupedData consults `dataset.context`, a copy snapshotted
    # at source-dataset creation) — never the process-global context, which
    # would silently flip any other dataset executing concurrently in the
    # same driver onto hash shuffle with capped aggregators.
    ctx = bucketed.context
    prev_strategy = ctx.shuffle_strategy
    prev_aggs = ctx.max_hash_shuffle_aggregators
    group_kwargs: dict[str, Any] = {}
    if exchange == "hash":
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        ctx.shuffle_strategy = ray.data.context.ShuffleStrategy.HASH_SHUFFLE
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 4)
        group_kwargs["num_partitions"] = num_buckets
    try:
        if use_actors:
            # explicit actor pool (ST4 pattern): best when the job is
            # long-lived relative to actor-fleet startup — the default on a
            # real cluster run
            grouped = bucketed.groupby("bucket", **group_kwargs).map_groups(
                BucketEncoder,
                fn_constructor_kwargs={
                    "out_dir": out_dir,
                    "chunk_rows": chunk_rows,
                    "mode": mode,
                    "state_ref": state_ref,
                    "chunk_order": chunk_order,
                    "text_filters": text_filters,
                    "codec_overrides": codec_overrides,
                },
                batch_format="pyarrow",
                concurrency=encoder_concurrency or (1, 8),
            )
        else:
            # task path with per-worker encoder cache (identical semantics &
            # state amortization; reuses prestarted workers)
            import functools

            grouped = bucketed.groupby("bucket", **group_kwargs).map_groups(
                functools.partial(
                    _encode_group_task,
                    out_dir=out_dir,
                    chunk_rows=chunk_rows,
                    mode=mode,
                    state_ref=state_ref,
                    chunk_order=chunk_order,
                    text_filters=text_filters,
                    codec_overrides=codec_overrides,
                ),
                batch_format="pyarrow",
            )
        # consume the (tiny: one row per bucket) manifest dataset
        grouped.materialize()
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.max_hash_shuffle_aggregators = prev_aggs
    return load_manifest(out_dir)


def _decode_file_batches(batch: pa.Table):
    """Generator UDF: stream one decoded table per chunk so a huge bucket
    file never materializes as a single block."""
    for path in batch.column("path").to_pylist():
        for blob in iter_chunks(path):
            yield decode_chunk(blob)


def _ts_us_scalar(v) -> int | None:
    """Normalize a ts bound (int epoch-us, datetime, numpy/pandas timestamp,
    ISO string) to int epoch microseconds."""
    if v is None:
        return None
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, str) and v.lstrip("-").isdigit():  # CLI epoch-us string
        return int(v)
    return int(pa.scalar(v).cast(pa.timestamp("us")).cast(pa.int64()).as_py())


def plan_chunks(
    out_dir: str,
    conv_id: str | None = None,
    turn_lo: int | None = None,
    turn_hi: int | None = None,
    ts_lo: int | None = None,
    ts_hi: int | None = None,
    text_contains: str | None = None,
    role_eq: str | None = None,
    tool_eq: str | None = None,
    conv_ids: Sequence[str] | None = None,
    col_ranges: dict | None = None,
) -> list[dict]:
    """Zone-map pruning over the lineage manifest: each chunk record carries
    its ``(conv_id, turn_idx)`` min/max (written at encode time), so a point
    or range lookup eliminates non-overlapping chunks WITHOUT touching the
    data files — the manifest doubles as a coarse index. Returns
    ``{"path", "idx": [chunk positions within the file]}`` per surviving
    bucket file. Safe (never false-prunes): a value outside a chunk's
    min/max provably has no rows there; salted hot conversations appear in
    several chunks and every overlapping chunk is kept.

    When the run-level meta records the partitioning (num_buckets + hash
    scheme + salted hot set), a conv_id lookup first computes its HOME
    bucket from the same deterministic hash — one partition instead of a
    zone scan of all of them (hash buckets have near-full conv ranges, so
    zone maps alone barely prune across buckets). Conversations in the
    salted hot set, and outputs without meta, fall back to the zone scan."""
    meta = load_run_meta(out_dir)
    if conv_ids is not None:
        if conv_id is not None:
            raise ValueError("pass conv_id or conv_ids, not both")
        conv_ids = sorted(set(conv_ids))
    point_set = [conv_id] if conv_id is not None else conv_ids
    if (
        point_set
        and meta
        and meta.get("hash") == "pd-siphash-default"
        and not any(c in meta.get("hot_convs", {}) for c in point_set)
    ):
        # home-bucket shortcut: read only the looked-up conversations' own
        # bucket records instead of the whole manifest (at 10^5 buckets a
        # point lookup must not pay 10^5 JSON reads just to plan). A batch
        # of conv_ids reads one record per DISTINCT home bucket.
        import json

        from ..state.manifest import bucket_data_path, bucket_manifest_path

        homes = sorted(
            set(int(b) for b in conv_bucket(
                pa.array(point_set), int(meta["num_buckets"])
            ))
        )
        records = []
        for home in homes:
            mpath = bucket_manifest_path(out_dir, home)
            if not os.path.exists(mpath):
                continue  # bucket never completed -> no rows live there
            with open(mpath) as f:
                rec = json.load(f)
            rec["path"] = bucket_data_path(out_dir, home)  # re-root
            records.append(rec)
        if not records:
            return []
    else:
        records = load_manifest(out_dir)
        if not records:
            raise FileNotFoundError(f"no completed buckets under {out_dir}")
    plan = []
    for r in records:
        # per-chunk numeric zone maps of derived SIDECAR columns (see
        # derive_column): loaded once per bucket, aligned 1:1 with the main
        # chunks. A col_ranges column without a sidecar (or a sidecar chunk
        # without a range — all-null) never prunes; the exact row filter
        # still applies.
        side_ranges: dict[str, list] = {}
        if col_ranges:
            import json as _json

            for cname in col_ranges:
                sjson = sidecar_paths(r["path"], cname)[1]
                if os.path.exists(sjson):
                    with open(sjson) as f:
                        side_ranges[cname] = _json.load(f)["chunks"]
        # manifests written before zone_v=2 recorded turn_range as
        # [first_row_turn, last_row_turn] of the sorted chunk — not a valid
        # min/max zone map (turn_idx restarts per conversation), so turn
        # pruning on them would silently drop rows. Keep every chunk for
        # those and let the exact row filter do the work.
        turn_prunable = r.get("zone_v", 1) >= 2
        keep = []
        for i, c in enumerate(r["chunks"]):
            if conv_id is not None:
                lo, hi = c["conv_range"]
                if not (lo <= conv_id <= hi):
                    continue
            if conv_ids is not None:
                lo, hi = c["conv_range"]
                # sorted lookup set: any conv in [lo, hi]?
                import bisect

                j = bisect.bisect_left(conv_ids, lo)
                if j >= len(conv_ids) or conv_ids[j] > hi:
                    continue
            if turn_prunable:
                tlo, thi = c["turn_range"]
                if turn_lo is not None and thi < turn_lo:
                    continue
                if turn_hi is not None and tlo > turn_hi:
                    continue
            srange = c.get("ts_range")  # absent on older manifests / null ts
            if srange is not None:
                slo, shi = srange
                if ts_lo is not None and shi < ts_lo:
                    continue
                if ts_hi is not None and slo > ts_hi:
                    continue
            if text_contains is not None:
                # trigram Bloom data skipping (filters.py): False only when
                # the chunk provably lacks a trigram of the term; chunks
                # encoded without filters (key absent -> None) always kept
                from ..filters import filter_may_contain

                if not filter_may_contain(c.get("tri_filter"), text_contains):
                    continue
            vsets = c.get("val_sets")  # absent on older manifests
            if vsets is not None:
                # distinct-value zone maps for low-cardinality columns: an
                # equality lookup prunes chunks whose value set provably
                # lacks the value (a column omitted from val_sets had too
                # many distinct values — no pruning for it)
                if (role_eq is not None and "role" in vsets
                        and role_eq not in vsets["role"]):
                    continue
                if (tool_eq is not None and "tool" in vsets
                        and tool_eq not in vsets["tool"]):
                    continue
            if col_ranges:
                pruned = False
                for cname, (vlo, vhi) in col_ranges.items():
                    chunks_meta = side_ranges.get(cname)
                    rng = (
                        chunks_meta[i].get("range")
                        if chunks_meta is not None and i < len(chunks_meta)
                        else None
                    )
                    if rng is None:
                        continue
                    if vlo is not None and rng[1] < vlo:
                        pruned = True
                        break
                    if vhi is not None and rng[0] > vhi:
                        pruned = True
                        break
                if pruned:
                    continue
            keep.append(i)
        if keep:
            plan.append({"path": r["path"], "idx": keep})
    return plan


def sidecar_paths(main_path: str, col: str) -> tuple[str, str]:
    """(data, record) paths of a derived-column sidecar next to a bucket
    data file. Named ``column-<col>-<bucket>.bin`` — deliberately NOT the
    ``bucket-`` prefix, which the manifest's completeness scan parses."""
    d = os.path.dirname(main_path)
    num = os.path.basename(main_path)[len("bucket-"):-len(".bin")]
    stem = os.path.join(d, f"column-{col}-{num}")
    return stem + ".bin", stem + ".json"


def _base_chunk_columns(records) -> list[str]:
    """Physical column names of the corpus, read from the FIRST chunk's
    header (4-byte length + JSON) — one seek, no payload decode. Every
    chunk of a corpus shares one schema (encode_transcripts writes one
    run), so the first header is authoritative."""
    import json as _json
    import struct as _struct

    from ..chunk import chunk_spans as _chunk_spans

    first_path = records[0]["path"]
    span0 = _chunk_spans(first_path)[0]
    with open(first_path, "rb") as _f:
        _f.seek(span0[0])
        (_hlen,) = _struct.unpack("<I", _f.read(4))
        return [c["name"] for c in _json.loads(_f.read(_hlen))["columns"]]


_SCHEMA_FILE = "_schema.json"


def schema_meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, _SCHEMA_FILE)


def load_dropped_columns(out_dir: str) -> list[str]:
    """Base columns marked dropped for this corpus (metadata-only DDL —
    see :func:`drop_column`). Empty list when none / no schema file."""
    import json as _json

    path = schema_meta_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return sorted(_json.load(f).get("dropped", []))


def load_renames(out_dir: str) -> dict:
    """Base-column renames for this corpus (metadata-only DDL — see
    :func:`rename_column`): mapping STORED name -> VISIBLE name. Empty
    when none / no schema file."""
    import json as _json

    path = schema_meta_path(out_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return dict(_json.load(f).get("renamed", {}))


_ADDED_TYPES = {"int64", "double", "string", "bool"}


def _added_arrow_type(name: str) -> pa.DataType:
    return {
        "int64": pa.int64(), "double": pa.float64(),
        "string": pa.string(), "bool": pa.bool_(),
    }[name]


def load_added_columns(out_dir: str) -> dict:
    """Metadata-only ADD COLUMN entries for this corpus: mapping name ->
    ``{"value": constant, "type": "int64"|"double"|"string"|"bool"}``
    (see :func:`add_column_default`). Empty when none / no schema file."""
    import json as _json

    path = schema_meta_path(out_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return dict(_json.load(f).get("added", {}))


def add_column_default(out_dir: str, name: str, value, dtype: str,
                       lock_timeout: float = 10.0) -> dict:
    """Schema evolution: ADD COLUMN with a constant default WITHOUT
    touching any data file — the third member of the metadata-only DDL
    family (drop/rename/add), and the lakehouse semantics (Iceberg/Delta):
    the default lives in ``_schema.json``; every ``decode_dataset`` path
    synthesizes the constant per batch; the next physical rewrite
    (``purge_deleted``/``compact``) materializes it for real (those decode
    with ``_raw_names=True``, which includes added columns so the rewrite
    sees them as data).

    Use :func:`derive_column` instead when the new column is COMPUTED from
    existing ones — that stores real per-row values as sidecars; this op
    is for constants (corpus tags, schema version markers, source labels)
    where storing N copies of one value would be waste.

    ``dtype`` is one of int64/double/string/bool; ``value`` must fit it
    (or be None for an all-NULL column). Collisions with any visible,
    stored, sidecar or previously added column are refused at DDL time."""
    import json as _json

    from ._lockfile import excl_lock

    if name in ("conv_id", "turn_idx"):
        raise ValueError(f"column {name!r} is structural; pick a new name")
    if dtype not in _ADDED_TYPES:
        raise ValueError(f"dtype {dtype!r} not in {sorted(_ADDED_TYPES)}")
    if value is not None:
        ok = {"int64": (int,), "double": (int, float),
              "string": (str,), "bool": (bool,)}[dtype]
        if not isinstance(value, ok) or isinstance(value, bool) != (dtype == "bool"):
            raise ValueError(
                f"default {value!r} does not fit declared type {dtype!r}"
            )
    records = load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no completed buckets under {out_dir}")
    base_cols = set(_base_chunk_columns(records))
    renames = load_renames(out_dir)
    visible = {renames.get(c, c) for c in base_cols}
    # a dropped base column's name stays reserved too: reusing it would
    # make purge/compact materialization ambiguous
    taken = (base_cols | visible | _sidecar_column_names(out_dir)
             | set(load_dropped_columns(out_dir)))
    path = schema_meta_path(out_dir)
    with excl_lock(f"{path}.lock", lock_timeout, what="schema"):
        meta: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = _json.load(f)
        added = dict(meta.get("added", {}))
        if name in taken or name in added:
            raise ValueError(
                f"column {name!r} collides with an existing column "
                "(stored, visible, sidecar or added)"
            )
        added[name] = {"value": value, "type": dtype}
        meta["added"] = added
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, path)
    return {"added": added}


def rename_column(out_dir: str, old: str, new: str,
                  lock_timeout: float = 10.0) -> dict:
    """Schema evolution: RENAME COLUMN without rewriting the corpus —
    metadata-only, like :func:`drop_column`'s base case. The mapping
    (stored name -> visible name) lives in ``_schema.json`` under the
    same O_EXCL lock discipline; every ``decode_dataset`` path then
    presents the visible name: full scans and projections return it,
    ``columns=`` requests are translated back to the stored name before
    planning, and the old name stops resolving (consistent reads — a
    corpus must never answer to both names).

    Scope rules:
    - ``conv_id`` / ``turn_idx`` are structural (ordering, point-lookup
      planning, tombstone filtering) — not renamable, and not usable as
      targets.
    - Only BASE chunk columns rename; a derived sidecar column is its own
      file set keyed by name — drop and re-derive it instead.
    - The target must not collide with any visible base column, any
      stored base column (even one renamed away — ``columns=`` requests
      must stay unambiguous), or any sidecar column.
    - Renaming a renamed column composes (stored key stays the original
      physical name); renaming back to the stored name clears the entry.

    Physical rewrites (``purge_deleted`` / ``compact``) read with
    ``_raw_names=True`` and carry the mapping forward, so renames survive
    compaction without ever forcing a data rewrite themselves."""
    import json as _json

    from ._lockfile import excl_lock

    structural = ("conv_id", "turn_idx")
    if old in structural or new in structural:
        raise ValueError(
            f"conv_id/turn_idx are structural and cannot participate in a "
            f"rename (got {old!r} -> {new!r})"
        )
    if old == new:
        raise ValueError(f"rename {old!r} -> {new!r} is a no-op")
    records = load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no completed buckets under {out_dir}")
    base_cols = set(_base_chunk_columns(records))
    sidecars = _sidecar_column_names(out_dir)
    if old in sidecars:
        raise ValueError(
            f"{old!r} is a derived sidecar column — its files are keyed "
            "by name; drop_column + derive_column under the new name "
            "instead of renaming"
        )
    added = load_added_columns(out_dir)
    if old in added:
        raise ValueError(
            f"{old!r} is a metadata-only added column — drop_column + "
            "add_column_default under the new name instead of renaming"
        )
    path = schema_meta_path(out_dir)
    with excl_lock(f"{path}.lock", lock_timeout, what="schema"):
        meta: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = _json.load(f)
        renames: dict = dict(meta.get("renamed", {}))
        dropped = set(meta.get("dropped", []))
        visible = {renames.get(c, c) for c in base_cols if c not in dropped}
        if old not in visible:
            raise ValueError(
                f"column {old!r} not visible in this corpus (visible base "
                f"columns: {sorted(visible)})"
            )
        stored = next(s for s in base_cols if renames.get(s, s) == old)
        # new == stored means "rename back to the physical name" — always
        # legal (it clears the mapping); anything else must not collide
        if new != stored and (
            new in visible or new in base_cols or new in sidecars
            or new in added
        ):
            raise ValueError(
                f"rename target {new!r} collides with an existing column "
                "(visible, stored, sidecar or added) — reads would be "
                "ambiguous"
            )
        if new == stored:
            renames.pop(stored, None)  # renamed back to the physical name
        else:
            renames[stored] = new
        meta["renamed"] = renames
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, path)
    return {"stored": stored, "visible": renames.get(stored, stored),
            "renamed": renames}


def carry_renames(src_dir: str, dest_dir: str) -> None:
    """Copy a corpus's rename mapping onto a physically rewritten copy
    (purge/compact): renames are presentation metadata and must survive
    rewrites that decode with ``_raw_names=True``."""
    import json as _json

    renames = load_renames(src_dir)
    if not renames:
        return
    path = schema_meta_path(dest_dir)
    meta: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            meta = _json.load(f)
    meta["renamed"] = renames
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, path)


def _sidecar_column_names(out_dir: str) -> set:
    """Names of all derived sidecar columns present in this corpus (one
    glob over the record files — metadata only)."""
    import glob as _glob

    names = set()
    for p in _glob.glob(os.path.join(out_dir, "column-*-[0-9]*.json")):
        base = os.path.basename(p)
        # column-<name>-<NNNNN>.json; <name> may itself contain dashes
        names.add(base[len("column-"):base.rindex("-")])
    return names


def drop_column(out_dir: str, name: str, lock_timeout: float = 10.0) -> dict:
    """Schema evolution: DROP COLUMN without rewriting the corpus — the
    inverse of :func:`derive_column` and the columnar-engine analog of the
    reference's projection transforms (SURVEY.md §2.2 M8) as a persistent
    DDL operation.

    Two cases, resolved by where the column physically lives:

    - **derived sidecar column**: its per-bucket sidecar files are deleted
      outright (one file pair per bucket — physical, cheap and complete;
      sidecars are the corpus's own add-column mechanism, so dropping one
      restores the pre-``derive_column`` state exactly).
    - **base chunk column**: metadata-only — the name is merged into
      ``_schema.json``'s ``dropped`` list under the same O_EXCL lock
      discipline as tombstones (two concurrent DDLs must not last-writer
      -win). Every ``decode_dataset`` path then excludes the column: full
      scans project it away (per-column header offsets mean its payload
      is never read or decoded), explicit requests and pushdown predicates
      on it raise, and a later ``purge_deleted``/``compact`` rewrite drops
      it physically.

    ``conv_id`` and ``turn_idx`` are not droppable: they carry the stable
    turn ordering, point-lookup planning and tombstone filtering the rest
    of the engine is built on. Dropping an already-dropped BASE column is
    a no-op success; re-dropping a removed sidecar raises (the column no
    longer exists anywhere)."""
    import json as _json

    from ._lockfile import excl_lock

    if name in ("conv_id", "turn_idx"):
        raise ValueError(
            f"column {name!r} is structural (turn ordering / point-lookup "
            "planning / tombstone filtering) and cannot be dropped"
        )
    records = load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no completed buckets under {out_dir}")
    # renamed columns drop by their VISIBLE name; the stored (old) name of
    # a renamed column no longer resolves — same consistency rule as reads
    renames = load_renames(out_dir)
    if renames:
        inv = {v: s for s, v in renames.items()}
        if name in inv:
            name = inv[name]
        elif name in renames:
            raise ValueError(
                f"column {name!r} was renamed to {renames[name]!r}; drop "
                "it by its current name"
            )
    # added (metadata-only constant)? remove its entry — nothing physical
    # exists anywhere
    if name in load_added_columns(out_dir):
        path = schema_meta_path(out_dir)
        with excl_lock(f"{path}.lock", lock_timeout, what="schema"):
            with open(path) as f:
                meta = _json.load(f)
            meta.get("added", {}).pop(name, None)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(meta, f)
            os.replace(tmp, path)
        return {"kind": "added"}
    # sidecar? delete its files — physical and complete
    n_files = 0
    for r in records:
        for p in sidecar_paths(r["path"], name):
            if os.path.exists(p):
                os.unlink(p)
                n_files += 1
    if n_files:
        return {"kind": "sidecar", "n_files_removed": n_files}
    base_cols = _base_chunk_columns(records)
    dropped = load_dropped_columns(out_dir)
    if name in dropped:
        return {"kind": "base", "dropped": dropped, "already": True}
    if name not in base_cols:
        raise ValueError(
            f"column {name!r} not found in this corpus (base columns: "
            f"{base_cols}; no sidecar files either)"
        )
    path = schema_meta_path(out_dir)
    with excl_lock(f"{path}.lock", lock_timeout, what="schema"):
        # merge into the EXISTING schema metadata — writing {"dropped"}
        # fresh would clobber the "renamed" mapping (a renamed column
        # silently reverting to its stored name on the next read). A
        # dropped column's own rename entry is cleared: the mapping is
        # meaningless once the column is gone and must not leak into
        # purge/compact carries.
        meta: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = _json.load(f)
        meta["dropped"] = sorted(set(meta.get("dropped", [])) | {name})
        if name in meta.get("renamed", {}):
            meta["renamed"].pop(name)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, path)
    return {"kind": "base", "dropped": meta["dropped"]}


def derive_column(out_dir: str, name: str, fn, input_columns: Sequence[str],
                  out_type: pa.DataType | None = None):
    """Schema evolution WITHOUT rewriting the corpus: compute a new derived
    column over an encoded output and store it as per-bucket SIDECAR chunk
    files (same chunk framing/codecs, one column), aligned 1:1 with the
    main files' chunks. ``decode_dataset(columns=[..., name])`` then reads
    the sidecar spans next to the main spans — existing payloads are never
    touched, readers that don't ask for the column never see it.

    Scale shape: one task per bucket (embarrassingly parallel, no shuffle);
    each task streams its bucket chunk-by-chunk — decode only
    ``input_columns`` (projection pushdown), apply ``fn`` (a vectorized
    ``pa.Table -> array`` kernel), re-encode through the standard codec
    selector. Resumable: a bucket whose sidecar record already exists is
    skipped, so a killed run re-pays only unfinished buckets.

    Returns a summary table (bucket, rows, bytes_out)."""
    import json as _json

    import ray

    records = load_manifest(out_dir)
    if not records:
        raise FileNotFoundError(f"no completed buckets under {out_dir}")
    # a sidecar named like a base column would SHADOW it in selective
    # decodes (sidecar wins via main-column exclusion) while columns=None
    # scans return the original — inconsistent reads for the same corpus
    # (ADVICE r3). Validate against the actual base chunk schema.
    base_cols = _base_chunk_columns(records)
    visible = sorted(
        {load_renames(out_dir).get(c, c) for c in base_cols}
        | set(base_cols) | set(load_added_columns(out_dir))
    )
    if name in visible:
        raise ValueError(
            f"derived column {name!r} collides with a base column of this "
            f"corpus (stored, renamed or added: {visible}); pick a new "
            "name — sidecars must not shadow stored columns"
        )
    items = ray.data.from_items(
        [{"bucket": r["bucket"], "path": r["path"]} for r in records]
    )
    input_columns = list(input_columns)

    def worker(batch: pa.Table):
        from ..chunk import (
            chunk_spans, encode_chunk, read_chunk_columns, write_chunk_file,
        )

        for row in batch.to_pylist():
            main = row["path"]
            side_bin, side_json = sidecar_paths(main, name)
            if os.path.exists(side_bin) and os.path.exists(side_json):
                yield pa.table({
                    "bucket": pa.array([row["bucket"]], pa.int32()),
                    "rows": pa.array([0], pa.int64()),
                    "bytes_out": pa.array([0], pa.int64()),
                })
                continue
            blobs, metas, rows = [], [], 0
            for span in chunk_spans(main):
                t = read_chunk_columns(main, span, input_columns)
                arr = fn(t)
                if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                    arr = pa.array(arr)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if out_type is not None:
                    arr = arr.cast(out_type)
                if len(arr) != t.num_rows:
                    raise ValueError(
                        f"derive fn returned {len(arr)} values for "
                        f"{t.num_rows} rows"
                    )
                blob, summary = encode_chunk(pa.table({name: arr}))
                blobs.append(blob)
                meta = {"rows": summary["rows"], "codecs": summary["codecs"]}
                # numeric zone map: lets decode_dataset(col_ranges=...)
                # prune whole chunks on the derived column
                if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
                    mm = pc.min_max(arr)
                    if mm["min"].is_valid:
                        meta["range"] = [mm["min"].as_py(), mm["max"].as_py()]
                metas.append(meta)
                rows += summary["rows"]
            nbytes = write_chunk_file(side_bin, blobs)
            tmp = f"{side_json}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump({"column": name, "bytes_out": nbytes,
                            "chunks": metas}, f, separators=(",", ":"))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, side_json)
            yield pa.table({
                "bucket": pa.array([row["bucket"]], pa.int32()),
                "rows": pa.array([rows], pa.int64()),
                "bytes_out": pa.array([nbytes], pa.int64()),
            })

    return items.map_batches(
        worker, batch_format="pyarrow", batch_size=1
    ).to_pandas()


class _SelectiveDecode:
    """Per-chunk selective decode: reads only the planned chunks' selected
    column byte ranges (seek I/O), applies the exact row predicate, projects
    to the requested columns."""

    def __init__(self, columns, conv_id, turn_lo, turn_hi, ts_lo=None, ts_hi=None,
                 text_contains=None, role_eq=None, tool_eq=None, conv_ids=None,
                 col_ranges=None):
        self.col_ranges = col_ranges
        self.columns = columns
        self.conv_id = conv_id
        self.conv_ids = (
            pa.array(sorted(set(conv_ids)), type=pa.string())
            if conv_ids is not None else None
        )
        self.turn_lo = turn_lo
        self.turn_hi = turn_hi
        self.ts_lo = ts_lo
        self.ts_hi = ts_hi
        self.text_contains = text_contains
        self.role_eq = role_eq
        self.tool_eq = tool_eq
        need = set(columns) if columns is not None else None
        if need is not None:
            if conv_id is not None or conv_ids is not None:
                need.add("conv_id")
            if turn_lo is not None or turn_hi is not None:
                need.add("turn_idx")
            if ts_lo is not None or ts_hi is not None:
                need.add("ts")
            if text_contains is not None:
                need.add("text")
            if role_eq is not None:
                need.add("role")
            if tool_eq is not None:
                need.add("tool")
            if col_ranges:
                need.update(col_ranges)
        self.read_cols = sorted(need) if need is not None else None

    def __call__(self, batch: pa.Table):
        from ..chunk import chunk_spans, read_chunk_columns

        for row in batch.to_pylist():
            spans = chunk_spans(row["path"])
            main_cols = self.read_cols
            side: dict[str, list] = {}
            # derived-column sidecars (see derive_column): any requested or
            # range-filtered column with a sidecar file next to the bucket
            # reads from there; its chunk spans align 1:1 with the main
            # file's. With columns=None the sidecar columns are loaded ONLY
            # to evaluate col_ranges and dropped from the output (base
            # decode keeps the original schema).
            probe_cols = set(self.read_cols or [])
            if self.read_cols is None and self.col_ranges:
                probe_cols = set(self.col_ranges)
            for c in probe_cols:
                sp = sidecar_paths(row["path"], c)[0]
                if os.path.exists(sp):
                    side[c] = chunk_spans(sp)
            if side and self.read_cols is not None:
                main_cols = [c for c in self.read_cols if c not in side]
            for i in row["idx"]:
                t = None
                # None = ALL main columns (base decode); [] with sidecars =
                # an all-derived projection that starts from the sidecar
                if main_cols is None or main_cols or not side:
                    t = read_chunk_columns(row["path"], spans[i], main_cols)
                for c, sspans in side.items():
                    st = read_chunk_columns(
                        sidecar_paths(row["path"], c)[0], sspans[i], [c]
                    )
                    # an all-derived projection starts from the sidecar
                    t = st if t is None else t.append_column(c, st.column(c))
                mask = None
                if self.conv_id is not None:
                    mask = pc.equal(t.column("conv_id"), self.conv_id)
                if self.conv_ids is not None:
                    m = pc.is_in(t.column("conv_id"), value_set=self.conv_ids)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.turn_lo is not None:
                    m = pc.greater_equal(t.column("turn_idx"), self.turn_lo)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.turn_hi is not None:
                    m = pc.less_equal(t.column("turn_idx"), self.turn_hi)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.ts_lo is not None:
                    m = pc.greater_equal(t.column("ts").cast(pa.int64()), self.ts_lo)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.ts_hi is not None:
                    m = pc.less_equal(t.column("ts").cast(pa.int64()), self.ts_hi)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.text_contains is not None:
                    m = pc.match_substring(t.column("text"), self.text_contains)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.role_eq is not None:
                    m = pc.equal(t.column("role"), self.role_eq)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.tool_eq is not None:
                    m = pc.equal(t.column("tool"), self.tool_eq)
                    mask = m if mask is None else pc.and_(mask, m)
                if self.col_ranges:
                    for cname, (vlo, vhi) in self.col_ranges.items():
                        col = t.column(cname)
                        if vlo is not None:
                            m = pc.greater_equal(col, vlo)
                            mask = m if mask is None else pc.and_(mask, m)
                        if vhi is not None:
                            m = pc.less_equal(col, vhi)
                            mask = m if mask is None else pc.and_(mask, m)
                if mask is not None:
                    t = t.filter(pc.fill_null(mask, False))  # null ts never matches
                if self.columns is not None:
                    t = t.select(self.columns)
                elif side:
                    # base decode: filter-only sidecar columns don't join
                    # the output schema
                    t = t.drop_columns(
                        [c for c in side if c in t.column_names]
                    )
                if t.num_rows:
                    yield t


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    conv_id: str | None = None,
    turn_lo: int | None = None,
    turn_hi: int | None = None,
    ts_lo=None,
    ts_hi=None,
    text_contains: str | None = None,
    role_eq: str | None = None,
    tool_eq: str | None = None,
    conv_ids: Sequence[str] | None = None,
    col_ranges: dict | None = None,
    as_of_epoch: int | None = None,
    _raw_names: bool = False,
):
    """Bucket chunk files -> Dataset with the original transcript schema.

    Pushdown (mirrors ``read_parquet(columns=..., filter=...)`` for the
    engine's own format):

    - ``columns``: decode only these columns — per-column header offsets
      mean unselected payloads are neither read from disk nor decoded.
    - ``conv_id`` / ``turn_lo`` / ``turn_hi`` / ``ts_lo`` / ``ts_hi``:
      prune whole chunks via the manifest's per-chunk conv/turn/ts zone
      maps (``plan_chunks``), then apply the exact row filter to the
      survivors. ts bounds accept int epoch-us, datetime, pandas/numpy
      timestamps or ISO strings; the range is inclusive on both ends.
    - ``text_contains``: substring predicate on ``text`` — chunks encoded
      with ``text_filters=True`` are pruned via their manifest trigram
      Bloom filters (terms < 3 bytes and filter-less chunks never prune),
      survivors get the exact vectorized ``match_substring`` row filter.
    - ``conv_ids``: a BATCH of conversation point lookups — plans one
      manifest read per distinct home bucket (same deterministic-hash
      shortcut as ``conv_id``), exact ``is_in`` row filter on survivors.
    - ``role_eq`` / ``tool_eq``: equality on the low-cardinality columns —
      chunks are pruned via the manifest's per-chunk distinct-value sets
      (``val_sets``, stored when <= 32 distinct values), survivors get the
      exact equality row filter (NULL never matches).
    - ``col_ranges``: ``{column: (lo, hi)}`` inclusive numeric bounds
      (either side None = unbounded). Derived SIDECAR columns carry
      per-chunk min/max zone maps (``derive_column``) and prune whole
      chunks; any other requested column just gets the exact row filter.

    With no pushdown args the original streaming whole-file path is used
    (sequential reads beat per-column seeks when every byte is needed).

    Dropped columns: a base column hidden by :func:`drop_column`
    (``_schema.json``) is excluded from every result — full scans project
    it away (per-column offsets mean its payload is never read), and an
    explicit ``columns=`` request or pushdown predicate naming it raises.

    Renamed columns: a base column renamed by :func:`rename_column` is
    presented under its visible name everywhere; ``columns=`` and
    ``col_ranges`` requests in the visible name are translated to the
    stored name before planning, and the stored (old) name raises. The
    fixed-semantics predicates (``role_eq``/``tool_eq``/``text_contains``)
    keep addressing the role/tool/text columns whatever they are named.

    Tombstones: when the corpus has a ``_deletes.parquet``
    (``pipelines.deletes.delete_convs``), every path above additionally
    anti-filters the deleted conversations (broadcast ``is_in`` per batch,
    merge-on-read) — including projections that did not select conv_id.
    """
    import ray

    from .deletes import load_deleted_convs, tombstone_filter

    # the caller's explicit projection order, in VISIBLE names — added
    # (metadata-only) columns are synthesized after the stored decode, so
    # a mixed stored+added request needs a final reorder to honor it
    requested_order = list(columns) if columns is not None else None

    # renamed base columns (metadata-only DDL — rename_column): requests
    # arrive in VISIBLE names and are translated to stored names before
    # planning; outputs are renamed back at the end. A stored name that
    # has been renamed away no longer resolves (consistent reads).
    # ``_raw_names=True`` (purge/compact internals) disables both sides so
    # physical rewrites see the stored schema.
    renames = {} if _raw_names else load_renames(out_dir)
    if renames:
        inv = {v: s for s, v in renames.items()}

        def _to_stored(c: str) -> str:
            if c in inv:
                return inv[c]
            if c in renames:
                raise ValueError(
                    f"column {c!r} was renamed to {renames[c]!r} "
                    "(rename_column); request it by its current name"
                )
            return c

        if columns is not None:
            columns = [_to_stored(c) for c in columns]
        if col_ranges is not None:
            col_ranges = {_to_stored(c): b for c, b in col_ranges.items()}

    def _present(ds):
        """stored -> visible names on the way out (zero-copy rename)."""
        if not renames:
            return ds

        def rb(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [renames.get(c, c) for c in t.column_names]
            )

        return ds.map_batches(rb, batch_format="pyarrow")

    # added columns (metadata-only DDL — add_column_default): constants
    # synthesized per batch, never read from disk. ``_raw_names=True``
    # INCLUDES them so a physical rewrite (purge/compact) materializes the
    # default for real — the lakehouse ADD COLUMN lifecycle.
    added = load_added_columns(out_dir)
    want_added: dict = {}
    added_helper: list[str] = []
    added_force_empty = False
    if added:
        if columns is not None:
            want_added = {c: added[c] for c in columns if c in added}
            columns = [c for c in columns if c not in added]
            if not columns and want_added:
                # a request for ONLY added columns still needs real rows
                # for the row count — decode conv_id, drop it at the end
                columns = ["conv_id"]
                added_helper = ["conv_id"]
        else:
            want_added = dict(added)
        if col_ranges:
            # a range predicate on a constant column is all-or-nothing:
            # resolve it here instead of shipping it to the planner.
            # Copy first — popping the CALLER's dict would make a reused
            # predicate silently vanish on the second call.
            col_ranges = dict(col_ranges)
            for c in [c for c in col_ranges if c in added]:
                lo, hi = col_ranges.pop(c)
                v = added[c]["value"]
                if v is None or (lo is not None and v < lo) or (
                        hi is not None and v > hi):
                    added_force_empty = True
            if not col_ranges:
                col_ranges = None

    def _with_added(ds):
        if not want_added and not added_helper:
            return ds

        def ap(t: pa.Table) -> pa.Table:
            drop = [c for c in added_helper if c in t.column_names]
            if drop:
                t = t.drop_columns(drop)
            for n, spec in want_added.items():
                typ = _added_arrow_type(spec["type"])
                if spec["value"] is None:
                    col = pa.nulls(t.num_rows, type=typ)
                else:
                    col = pa.array([spec["value"]] * t.num_rows, type=typ)
                t = t.append_column(n, col)
            if requested_order is not None:
                # added columns land after the stored ones — restore the
                # caller's exact requested order (visible names; this runs
                # after _present so names match the request)
                want = [c for c in requested_order if c in t.column_names]
                if want != t.column_names:
                    t = t.select(want)
            return t

        return ds.map_batches(ap, batch_format="pyarrow")

    # dropped base columns (metadata-only DDL — drop_column): every read
    # path must exclude them. Explicit requests and pushdown predicates on
    # a dropped column raise (the caller's expectation can't be met);
    # columns=None full scans are rewritten to project the survivors —
    # via the selective path, whose per-column header offsets mean the
    # dropped payload is never even read from disk.
    dropped = set(load_dropped_columns(out_dir))
    if dropped:
        if columns is not None:
            bad = sorted(dropped.intersection(columns))
            if bad:
                raise ValueError(
                    f"column(s) {bad} were dropped from this corpus "
                    "(drop_column); a compaction/purge rewrite removes "
                    "them physically"
                )
        preds = {
            "role": role_eq is not None, "tool": tool_eq is not None,
            "ts": ts_lo is not None or ts_hi is not None,
            "text": text_contains is not None,
        }
        for c in col_ranges or ():
            preds[c] = True
        bad = sorted(c for c, used in preds.items() if used and c in dropped)
        if bad:
            raise ValueError(
                f"predicate on dropped column(s) {bad} — the column no "
                "longer exists in this corpus"
            )
        if columns is None:
            records = load_manifest(out_dir)
            if not records:
                raise FileNotFoundError(f"no completed buckets under {out_dir}")
            columns = [
                c for c in _base_chunk_columns(records) if c not in dropped
            ]

    # tombstones (merge-on-read): every read path anti-filters against the
    # corpus's deleted-conv set — a broadcast is_in per batch, so deleted
    # conversations vanish from full scans, projections and point lookups
    # alike until a purge/compaction physically drops them
    # as_of_epoch = time travel: only tombstones laid at or before that
    # mutation epoch apply, so this read sees the corpus as it stood then
    # (pipelines.deletes.read_as_of composes this across upsert ticks)
    deleted = load_deleted_convs(out_dir, as_of_epoch=as_of_epoch)
    force_empty_plan = False
    if len(deleted):
        # point lookups of tombstoned conversations prune at the METADATA:
        # the row filter would drop everything anyway, so skip planning
        dead = set(deleted.to_pylist())
        if conv_id is not None and conv_id in dead:
            force_empty_plan = True
        if conv_ids is not None:
            conv_ids = [c for c in conv_ids if c not in dead]
            if not conv_ids:
                force_empty_plan = True
    drop_helper: list[str] = []
    if len(deleted) and columns is not None and "conv_id" not in columns:
        # projection reads still need conv_id decoded to apply the filter
        columns = ["conv_id"] + list(columns)
        drop_helper = ["conv_id"]

    def _with_tombstones(ds):
        if not len(deleted):
            return ds
        return tombstone_filter(ds, deleted, drop_cols=drop_helper)

    ts_lo = _ts_us_scalar(ts_lo)
    ts_hi = _ts_us_scalar(ts_hi)
    if (columns is None and conv_id is None and turn_lo is None
            and turn_hi is None and ts_lo is None and ts_hi is None
            and text_contains is None and role_eq is None
            and tool_eq is None and conv_ids is None
            and col_ranges is None and not added_force_empty):
        records = load_manifest(out_dir)
        if not records:
            raise FileNotFoundError(f"no completed buckets under {out_dir}")
        paths = ray.data.from_items([{"path": r["path"]} for r in records])
        return _with_added(_present(_with_tombstones(paths.map_batches(
            _decode_file_batches, batch_format="pyarrow", batch_size=1
        ))))
    plan = [] if (force_empty_plan or added_force_empty) else plan_chunks(
        out_dir, conv_id, turn_lo, turn_hi, ts_lo, ts_hi,
        text_contains, role_eq, tool_eq, conv_ids, col_ranges)
    if not plan:
        # prune eliminated everything: empty dataset. Use the canonical
        # transcript dtypes when every requested column is canonical so a
        # downstream groupby/aggregate still sees its columns; otherwise
        # fall back to schema-less (fine for a no-match point lookup).
        canon = {
            "conv_id": pa.string(), "turn_idx": pa.int32(),
            "role": pa.string(), "text": pa.string(),
            "tool": pa.string(), "ts": pa.timestamp("us"),
        }
        cols = columns if columns is not None else list(canon)
        cols = [c for c in cols if c not in drop_helper]
        if all(c in canon for c in cols):
            return _with_added(ray.data.from_arrow(
                pa.table(
                    {renames.get(c, c): pa.array([], type=canon[c])
                     for c in cols}
                )
            ))
        return ray.data.from_items([]).map_batches(lambda t: t)
    items = ray.data.from_items(plan)
    return _with_added(_present(_with_tombstones(items.map_batches(
        _SelectiveDecode(columns, conv_id, turn_lo, turn_hi, ts_lo, ts_hi,
                         text_contains, role_eq, tool_eq, conv_ids,
                         col_ranges),
        batch_format="pyarrow",
        batch_size=1,
    ))))


def roundtrip_ok(input_ds, out_dir: str) -> bool:
    """Test-scale verification: decoded output == input under the stable
    ``(conv_id, turn_idx)`` total order, every column bit-identical."""
    a = input_ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = (
        decode_dataset(out_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(a).equals(pa.Table.from_pandas(b))
