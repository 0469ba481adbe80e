"""Tombstone deletes over an encoded corpus — targeted conversation removal
without rewriting data (the lakehouse delete-vector pattern; the reference's
only removal path is a full re-run of its DELETE+reload SQL,
``sql/queries.sql`` teardown + ``src/etl/load.py``).

Design for 10^12 turns:

- ``delete_convs`` appends conv_ids to ONE small tombstone parquet
  (``_deletes.parquet``) next to the manifest — an O(|deletes|) metadata
  write, never a data rewrite. Writes are atomic (tmp + ``os.replace``,
  the manifest's crash contract) and idempotent (merge + unique).
- Every ``decode_dataset`` read applies the tombstones as a broadcast
  anti-filter (``ray.put`` once, vectorized ``pc.is_in`` per batch) — the
  same shape as ``broadcast_semi``. Point lookups of a deleted conv plan
  its home bucket, then filter to zero rows: correctness never depends on
  pruning.
- ``purge_deleted`` physically drops the rows: one streaming
  decode→re-encode into a fresh directory (the compaction path), after
  which the tombstone file is gone. Until then reads pay one tiny
  ``is_in`` per batch — the standard merge-on-read / copy-on-compact
  trade.
"""

from __future__ import annotations

import os
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DELETES_FILE = "_deletes.parquet"
TICK_EPOCH_FILE = "_tick_epoch.json"
_CLOCK_KEY = b"tombstone.max_epoch"


def deletes_path(out_dir: str) -> str:
    return os.path.join(out_dir, DELETES_FILE)


def _clock_of(t: pa.Table) -> int:
    """Mutation clock carried by an already-loaded tombstone table (its
    schema metadata; pre-clock files fall back to the max epoch row)."""
    meta = t.schema.metadata or {}
    if _CLOCK_KEY in meta:
        return int(meta[_CLOCK_KEY].decode())
    return int(pc.max(t.column("epoch")).as_py()) if t.num_rows else 0


def mutation_clock(out_dir: str) -> int:
    """The corpus's mutation clock: the HIGHEST epoch any tombstone was
    ever stamped with — kept as monotonic metadata on the tombstone
    parquet, because the per-conv rows keep the MIN epoch (the filtering
    semantics) and a later re-delete of an already-hidden conv would
    otherwise be invisible to the clock."""
    p = deletes_path(out_dir)
    if not os.path.exists(p):
        return 0
    return _clock_of(_load_tombstones(out_dir))


def allocate_epoch(out_dir: str, lock_timeout: float = 10.0,
                   stale_after: float = 60.0, floor: int = 0) -> int:
    """Atomically advance the base's mutation clock and return the fresh
    epoch — the read-increment-write runs UNDER the tombstone lock, so
    two concurrent upserts can never both observe clock N and stamp the
    same N+1 (which would make every as-of view at N+1 ambiguous). A
    crash after allocation but before the tick lands leaves a harmless
    ghost epoch (no tick, no tombstones — changelog iterates past it).

    ``floor`` seeds a pre-clock layout: the returned epoch is at least
    ``floor`` and the clock jumps to it, applied UNDER the lock — flooring
    the caller's return value instead would let two concurrent upserts
    both land on the same floor when it exceeds the stored clock."""
    from ._lockfile import excl_lock

    path = deletes_path(out_dir)
    with excl_lock(f"{path}.lock", lock_timeout, stale_after, "tombstone"):
        t = _load_tombstones(out_dir)
        epoch = max(_clock_of(t) + 1, int(floor))
        t = t.replace_schema_metadata(
            {**(t.schema.metadata or {}), _CLOCK_KEY: str(epoch).encode()}
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)
    return epoch


def tick_epoch(tick_dir: str, default: int) -> int:
    """The mutation epoch an upsert tick was written at (recorded by
    ``upsert_convs``); ``default`` (position + 1) covers pre-recording
    directories."""
    import json as _json

    p = os.path.join(tick_dir, TICK_EPOCH_FILE)
    if not os.path.exists(p):
        return default
    with open(p) as f:
        return int(_json.load(f)["epoch"])


def _load_tombstones(out_dir: str) -> pa.Table:
    """The corpus's tombstone table (conv_id, epoch) — epoch is the
    mutation ordinal that hid the conversation (0 = plain deletes).
    Back-compat: files written before epochs carry conv_id only and read
    as epoch 0."""
    p = deletes_path(out_dir)
    if not os.path.exists(p):
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "epoch": pa.array([], pa.int64())})
    t = pq.read_table(p)
    if "epoch" not in t.column_names:
        t = t.append_column(
            "epoch", pa.array([0] * t.num_rows, pa.int64())
        )
    return t.select(["conv_id", "epoch"])


def load_deleted_convs(out_dir: str, as_of_epoch: int | None = None) -> pa.Array:
    """The corpus's deleted conv_id set (empty array when none). With
    ``as_of_epoch`` only tombstones laid at or before that epoch apply —
    the time-travel read: later mutations are invisible."""
    t = _load_tombstones(out_dir)
    if as_of_epoch is not None:
        t = t.filter(pc.less_equal(t.column("epoch"), as_of_epoch))
    return t.column("conv_id").combine_chunks()


def delete_convs(
    out_dir: str,
    conv_ids: Sequence[str],
    lock_timeout: float = 10.0,
    stale_after: float = 60.0,
    epoch: int | None = None,
) -> dict:
    """Mark conversations deleted. Metadata-only: merges ``conv_ids`` into
    the tombstone parquet atomically; data files are untouched. Returns
    counts so callers/schedulers can log the mutation.

    The read-merge-replace runs under an ``O_EXCL`` lock file
    (``_deletes.parquet.lock``): without it two concurrent callers would
    each write atomically but last-writer-wins, silently dropping the
    other's tombstones — deleted conversations resurfacing (ADVICE r3).
    A contended lock blocks up to ``lock_timeout`` seconds then raises
    loudly; a lock older than ``stale_after`` (a crashed writer — deletes
    are sub-second metadata merges) is stolen. ``stale_after`` must stay
    well above ``lock_timeout`` so a merely-slow holder is never mistaken
    for a dead one."""
    from ._lockfile import excl_lock

    if not os.path.isdir(out_dir):
        raise FileNotFoundError(f"not an encoded corpus dir: {out_dir}")
    uniq = sorted({str(c) for c in conv_ids})
    path = deletes_path(out_dir)
    with excl_lock(f"{path}.lock", lock_timeout, stale_after, "tombstone"):
        # merge INSIDE the lock: the read and the replace must see no
        # interleaved writer. A default-epoch delete ADVANCES the clock
        # (clock + 1) — an epoch-0 default would retroactively edit the
        # "pristine base" every as-of view and be invisible to the
        # changelog. Per-conv rows keep the MIN epoch (the earliest
        # mutation that hid a conv governs every as-of view from there
        # on); the clock itself rides the file's metadata monotonically.
        existing = _load_tombstones(out_dir)
        clock = _clock_of(existing)
        if epoch is None:
            epoch = clock + 1
        new = pa.table({
            "conv_id": pa.array(uniq, pa.string()),
            "epoch": pa.array([int(epoch)] * len(uniq), pa.int64()),
        })
        both = pa.concat_tables([existing.select(["conv_id", "epoch"]), new])
        merged = pa.TableGroupBy(both, "conv_id").aggregate([("epoch", "min")])
        merged = merged.rename_columns(["conv_id", "epoch"]).sort_by("conv_id")
        # a NO-OP delete (every conv already tombstoned at <= epoch, or an
        # empty list) must stay idempotent on the epoch axis too: retried
        # deletes neither advance the clock nor rewrite the file
        if merged.equals(
            existing.select(["conv_id", "epoch"]).sort_by("conv_id")
        ):
            return {
                "n_requested": len(uniq),
                "n_already": existing.num_rows,
                "n_total": existing.num_rows,
                "epoch": int(clock),
                "changed": False,
            }
        merged = merged.replace_schema_metadata(
            {**(existing.schema.metadata or {}),
             _CLOCK_KEY: str(max(clock, int(epoch))).encode()}
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(merged, tmp, compression="zstd")
        os.replace(tmp, path)
    return {
        "n_requested": len(uniq),
        "n_already": existing.num_rows,
        "n_total": merged.num_rows,
        "epoch": int(epoch),
        "changed": True,
    }


def tombstone_filter(ds, deleted: pa.Array, drop_cols: list[str] | None = None):
    """Anti-filter a Dataset of decoded batches against the broadcast
    tombstone set; optionally drop helper columns decoded only for the
    filter (projection reads that did not select conv_id)."""
    import ray

    ref = ray.put(deleted)
    drop = list(drop_cols or [])

    def _filter(batch: pa.Table) -> pa.Table:
        dead = ray.get(ref)
        m = pc.invert(pc.is_in(batch.column("conv_id"), value_set=dead))
        out = batch.filter(pc.fill_null(m, True))  # null conv never encoded
        return out.drop_columns(drop) if drop else out

    return ds.map_batches(_filter, batch_format="pyarrow")


def purge_deleted(out_dir: str, dest_dir: str, **encode_kw) -> dict:
    """Physically rewrite the corpus without the tombstoned conversations
    (merge-on-read → copy-on-compact): one streaming decode (tombstones
    applied by ``decode_dataset``) re-encoded into ``dest_dir``. The new
    corpus carries no ``_deletes.parquet``; the source dir is untouched
    (swap/retire is the caller's call — keeps the operation resumable and
    the old corpus readable until the new manifest is complete)."""
    from .encode import carry_renames, decode_dataset, encode_transcripts

    n_dead = len(load_deleted_convs(out_dir))
    stats = encode_transcripts(
        decode_dataset(out_dir, _raw_names=True), dest_dir, **encode_kw
    )
    # renames are presentation metadata — carry them; dropped columns were
    # excluded by the decode, so the new corpus needs no dropped list
    carry_renames(out_dir, dest_dir)
    return {"n_tombstoned_convs": n_dead, "encode": stats}


def upsert_convs(out_dir: str, new_ds, tick_dir: str,
                 prior_tick_dirs: Sequence[str] = (),
                 epoch: int | None = None, **encode_kw) -> dict:
    """MERGE / upsert at conversation granularity: replace every
    conversation present in ``new_ds`` (and add the brand-new ones).

    1. encode ``new_ds`` into ``tick_dir`` (own manifest, resumable);
    2. tombstone its conv_ids in the BASE corpus AND every earlier tick
       (``prior_tick_dirs``) — a conversation upserted twice between
       compactions must be hidden in ALL older layers or the union view
       (and a later compaction) would carry both versions.

    Order matters for crash safety: the tick lands first, so a crash
    between the steps leaves a bounded duplicate window (old + new both
    visible) that re-running the idempotent tombstone writes closes —
    never a data-loss window. Read with :func:`read_upserted`; a later
    ``compact([out_dir, *ticks], fresh)`` folds the ticks back into one
    bucket layout (tombstones applied during its decode, so replaced
    conversations are physically dropped)."""
    from .encode import decode_dataset, encode_transcripts

    import json as _json

    recorded = os.path.join(tick_dir, TICK_EPOCH_FILE)
    if epoch is None:
        if os.path.exists(recorded):
            # crash-retry of THIS tick: reuse its recorded epoch — minting
            # a fresh one would leave the base's min-merged tombstones at
            # the old epoch while the tick claims a newer one, vanishing
            # the conversations from the old as-of view
            with open(recorded) as f:
                epoch = int(_json.load(f)["epoch"])
        else:
            # allocate the next epoch UNDER the tombstone lock (two
            # concurrent upserts must never both stamp clock+1); the
            # position floor for pre-clock layouts is applied inside the
            # lock too, so concurrent upserts can't both land on it
            epoch = allocate_epoch(out_dir, floor=len(prior_tick_dirs) + 1)
    # record the tick's epoch IN the tick BEFORE encoding: read_as_of /
    # changelog align layers by this, not by list position (a plain delete
    # in between shifts the clock past position+1), and a mid-encode crash
    # finds it on retry
    tmp = f"{recorded}.tmp.{os.getpid()}"
    os.makedirs(tick_dir, exist_ok=True)
    with open(tmp, "w") as f:
        _json.dump({"epoch": int(epoch)}, f)
    os.replace(tmp, recorded)
    stats = encode_transcripts(new_ds, tick_dir, **encode_kw)
    new_convs = decode_dataset(tick_dir, columns=["conv_id"]).unique("conv_id")
    info = delete_convs(out_dir, new_convs, epoch=epoch)
    for prior in prior_tick_dirs:
        delete_convs(prior, new_convs, epoch=epoch)
    return {"n_upserted_convs": len(new_convs), "epoch": int(epoch),
            "tombstones": info, "encode": stats}


def read_upserted(out_dir: str, tick_dirs: Sequence[str]):
    """Union view of a base corpus and its upsert ticks (tombstones on the
    base hide every replaced conversation)."""
    from .encode import decode_dataset

    ds = decode_dataset(out_dir)
    for t in tick_dirs:
        ds = ds.union(decode_dataset(t))
    return ds


def read_as_of(out_dir: str, tick_dirs: Sequence[str], epoch: int):
    """TIME-TRAVEL read: the corpus exactly as it stood after mutation
    ``epoch`` (0 = the pristine base, N = after the Nth upsert/delete).

    The mutation log is already materialized on disk — the base + the
    per-tick directories, each with an epoch-stamped tombstone table — so
    no snapshot copies exist anywhere: an as-of view is the union of the
    base and the ticks up to ``epoch``, each decoded with only tombstones
    laid at or before ``epoch`` applied (``as_of_epoch`` pushdown in
    ``decode_dataset``). A conversation upserted at epochs 2 and 5 reads
    as v2 for 2 <= epoch < 5 and v5 after — tick 2's own tombstone (laid
    at epoch 5) is ignored until then. O(1) metadata per view; the same
    streaming decode paths, pruning and projection apply.

    History ends at compaction: ``compact([base, *ticks], fresh)`` folds
    the layers into one physically-clean corpus with no tombstones — the
    standard lakehouse VACUUM trade (reads get cheaper, old snapshots
    expire). Keep the layered directories when as-of reads must stay
    addressable."""
    from .encode import decode_dataset

    ds = decode_dataset(out_dir, as_of_epoch=epoch)
    for i, t in enumerate(tick_dirs):
        # align by each tick's RECORDED epoch (position+1 for pre-recording
        # dirs): a plain delete between upserts shifts the clock, so list
        # position alone would union future ticks into past views
        if tick_epoch(t, i + 1) <= int(epoch):
            ds = ds.union(decode_dataset(t, as_of_epoch=epoch))
    return ds


def changelog(out_dir: str, tick_dirs: Sequence[str],
              from_epoch: int = 0, to_epoch: int | None = None) -> pa.Table:
    """Conversation-level CHANGE FEED (CDC) between two mutation epochs:
    for every epoch e in (from_epoch, to_epoch] emit one row per changed
    conversation — ``added`` (upserted, not previously visible),
    ``replaced`` (upserted over a visible version) or ``deleted``
    (tombstoned at e without a replacement tick row). Downstream
    consumers (index refreshers, IVM views, caches) re-process exactly
    the changed conversations instead of re-reading the corpus.

    Derivation cost: conv_id-ONLY projection decodes (per-column offsets
    mean no payload bytes move) — one per tick plus one visibility
    snapshot per epoch. The driver holds distinct-conv sets, bounded by
    conversation count, not turns; a corpus whose conv list outgrows the
    driver should swap these set differences for the engine's distributed
    INTERSECT/EXCEPT over the same projections."""
    from .encode import decode_dataset

    ticks = list(tick_dirs)
    # align ticks by their RECORDED epochs (see tick_epoch) — a plain
    # delete between upserts shifts the clock past list position + 1
    epoch_of_tick = {
        t: tick_epoch(t, i + 1) for i, t in enumerate(ticks)
    }
    if to_epoch is None:
        to_epoch = max(
            [mutation_clock(out_dir), *epoch_of_tick.values()], default=0
        )
    tomb = {d: _load_tombstones(d) for d in [out_dir, *ticks]}

    def visible_at(e: int) -> set:
        out = set(
            decode_dataset(out_dir, columns=["conv_id"], as_of_epoch=e)
            .unique("conv_id")
        )
        for t in ticks:
            if epoch_of_tick[t] <= e:
                out |= set(
                    decode_dataset(t, columns=["conv_id"], as_of_epoch=e)
                    .unique("conv_id")
                )
        return out

    rows = []
    prev_visible = visible_at(from_epoch)
    for e in range(from_epoch + 1, to_epoch + 1):
        tick_convs: set = set()
        for t in ticks:
            if epoch_of_tick[t] == e:
                tick_convs |= set(
                    decode_dataset(t, columns=["conv_id"],
                                   as_of_epoch=e).unique("conv_id")
                )
        tombed_at_e: set = set()
        for t in tomb.values():
            sel = t.filter(pc.equal(t.column("epoch"), e))
            tombed_at_e |= set(sel.column("conv_id").to_pylist())
        for c in sorted(tick_convs):
            rows.append((e, c, "replaced" if c in prev_visible else "added"))
        for c in sorted(tombed_at_e - tick_convs):
            if c in prev_visible:
                rows.append((e, c, "deleted"))
        prev_visible = (prev_visible - (tombed_at_e - tick_convs)) | tick_convs
    return pa.table({
        "epoch": pa.array([r[0] for r in rows], pa.int64()),
        "conv_id": pa.array([r[1] for r in rows], pa.string()),
        "change": pa.array([r[2] for r in rows], pa.string()),
    })
