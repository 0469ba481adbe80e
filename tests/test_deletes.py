"""Tombstone deletes (merge-on-read) + physical purge over an encoded
corpus: every decode path must hide deleted conversations, and the purge
rewrite must drop them bit-identically."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
    delete_convs,
    deletes_path,
    load_deleted_convs,
    purge_deleted,
)
from etl_sql_duckdb_parquet__ray.pipelines.encode import (
    decode_dataset,
    encode_transcripts,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

N_ROWS = 8000


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    import ray

    table = generate_transcripts(N_ROWS, seed=7)
    out = str(tmp_path_factory.mktemp("delcorpus") / "enc")
    encode_transcripts(
        ray.data.from_arrow(table), out, num_buckets=4, chunk_rows=1024
    )
    convs = sorted(set(table.column("conv_id").to_pylist()))
    dead = convs[:3]
    info = delete_convs(out, dead)
    assert info["n_total"] == 3
    return out, table, dead


def _expected(table: pa.Table, dead) -> pa.Table:
    mask = pc.invert(pc.is_in(table.column("conv_id"), value_set=pa.array(dead)))
    return table.filter(mask)


def test_full_decode_hides_deleted(corpus):
    out, table, dead = corpus
    got = decode_dataset(out).to_pandas()
    assert set(got["conv_id"]).isdisjoint(dead)
    assert len(got) == _expected(table, dead).num_rows


def test_delete_is_idempotent_merge(corpus, tmp_path):
    out, _, dead = corpus
    info = delete_convs(out, dead[:1])  # re-delete: no growth
    assert info["n_total"] == len(dead)
    assert sorted(load_deleted_convs(out).to_pylist()) == sorted(dead)


def test_projection_without_conv_id_still_filtered(corpus):
    out, table, dead = corpus
    got = decode_dataset(out, columns=["turn_idx", "role"]).to_pandas()
    # helper conv_id column used for the filter must not leak out
    assert list(got.columns) == ["turn_idx", "role"]
    assert len(got) == _expected(table, dead).num_rows


def test_point_lookup_of_deleted_conv_is_empty(corpus):
    out, table, dead = corpus
    assert decode_dataset(out, conv_id=dead[0]).count() == 0
    live = next(
        c for c in set(table.column("conv_id").to_pylist()) if c not in dead
    )
    exp = pc.sum(
        pc.equal(table.column("conv_id"), live).cast(pa.int64())
    ).as_py()
    assert decode_dataset(out, conv_id=live).count() == exp


def test_purge_rewrites_without_tombstones(corpus, tmp_path):
    out, table, dead = corpus
    dest = str(tmp_path / "purged")
    info = purge_deleted(out, dest, num_buckets=4, chunk_rows=1024)
    assert info["n_tombstoned_convs"] == len(dead)
    assert not os.path.exists(deletes_path(dest))
    got = (
        decode_dataset(dest)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        _expected(table, dead)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert pa.Table.from_pandas(got).equals(pa.Table.from_pandas(exp))
    # source untouched: tombstone file still present, data still readable
    assert os.path.exists(deletes_path(out))


def test_deletes_apply_through_sidecar_projection(corpus, tmp_path):
    """Cross-feature seam: a derived SIDECAR column decode (projection that
    never selected conv_id) must still hide tombstoned conversations."""
    from etl_sql_duckdb_parquet__ray.pipelines.encode import derive_column

    out, table, dead = corpus
    derive_column(
        out, "text_len",
        lambda cols: pa.compute.utf8_length(cols["text"]).cast(pa.int64()),
        ["text"],
    )
    got = decode_dataset(out, columns=["text_len"]).to_pandas()
    assert list(got.columns) == ["text_len"]
    assert len(got) == _expected(table, dead).num_rows


def test_compact_drops_tombstoned_convs(corpus, tmp_path):
    """Compaction streams through decode_dataset, so tombstones are applied
    and the merged output is physically clean (no _deletes file)."""
    from etl_sql_duckdb_parquet__ray.state.scheduler import compact

    out, table, dead = corpus
    dest = str(tmp_path / "compacted")
    compact([out], dest, num_buckets=2, chunk_rows=1024)
    assert not os.path.exists(deletes_path(dest))
    got = decode_dataset(dest).to_pandas()
    assert set(got["conv_id"]).isdisjoint(dead)
    assert len(got) == _expected(table, dead).num_rows


def test_purge_resume_is_idempotent(corpus, tmp_path):
    """purge_deleted inherits the encode pipeline's resume contract: a
    second purge into the same dest with resume=True skips every
    completed bucket (no rewrite) and the output is unchanged."""
    out, table, dead = corpus
    dest = str(tmp_path / "purged2")
    purge_deleted(out, dest, num_buckets=4, chunk_rows=1024)
    mtimes = {
        f: os.path.getmtime(os.path.join(dest, f))
        for f in os.listdir(dest) if f.endswith(".bin")
    }
    purge_deleted(out, dest, num_buckets=4, chunk_rows=1024, resume=True)
    after = {
        f: os.path.getmtime(os.path.join(dest, f))
        for f in os.listdir(dest) if f.endswith(".bin")
    }
    assert mtimes == after  # nothing rewritten
    got = decode_dataset(dest).to_pandas()
    assert len(got) == _expected(table, dead).num_rows


def test_upsert_replaces_and_adds_convs(ray_session, tmp_path):
    """MERGE/upsert lifecycle: new versions of existing conversations
    replace them in the union view; brand-new conversations appear;
    compaction folds the tick back into one physically-clean corpus."""
    import numpy as np
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        read_upserted,
        upsert_convs,
    )
    from etl_sql_duckdb_parquet__ray.state.scheduler import compact

    table = generate_transcripts(4000, seed=11)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=4, chunk_rows=1024
    )
    df = table.to_pandas()
    convs = sorted(df["conv_id"].unique())
    replaced = convs[:2]

    # new versions: replaced convs with rewritten text, plus one new conv
    newdf = df[df["conv_id"].isin(replaced)].copy()
    newdf["text"] = "REWRITTEN " + newdf["text"]
    extra = df[df["conv_id"] == convs[2]].copy()
    extra["conv_id"] = "conv-zz-new"
    newdf = pd.concat([newdf, extra], ignore_index=True)
    new_tbl = pa.Table.from_pandas(newdf, preserve_index=False).cast(table.schema)

    tick = str(tmp_path / "tick-1")
    info = upsert_convs(
        base, ray.data.from_arrow(new_tbl), tick,
        num_buckets=2, chunk_rows=1024,
    )
    assert info["n_upserted_convs"] == 3

    got = (
        read_upserted(base, [tick]).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = (
        pd.concat([df[~df["conv_id"].isin(replaced)], newdf], ignore_index=True)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[got.columns])
    # every replaced conv reads the NEW text only
    assert got[got["conv_id"] == replaced[0]]["text"].str.startswith("REWRITTEN").all()

    # compaction folds the tick in; result physically clean and identical
    merged = str(tmp_path / "merged")
    compact([base, tick], merged, num_buckets=4, chunk_rows=1024)
    assert not os.path.exists(deletes_path(merged))
    got2 = (
        decode_dataset(merged).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, exp[got2.columns])


def test_upsert_twice_same_conv_keeps_only_latest(ray_session, tmp_path):
    """The multi-tick case: a conversation upserted in two successive
    ticks must read as the SECOND version only — upsert_convs tombstones
    prior ticks via prior_tick_dirs, so neither the union view nor a
    compaction resurrects the first replacement."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        read_upserted,
        upsert_convs,
    )
    from etl_sql_duckdb_parquet__ray.state.scheduler import compact

    table = generate_transcripts(3000, seed=13)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    conv = sorted(df["conv_id"].unique())[0]

    def version(tag):
        v = df[df["conv_id"] == conv].copy()
        v["text"] = f"{tag} " + v["text"]
        return pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)

    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    upsert_convs(base, ray.data.from_arrow(version("V1")), t1,
                 num_buckets=2, chunk_rows=1024)
    upsert_convs(base, ray.data.from_arrow(version("V2")), t2,
                 prior_tick_dirs=[t1], num_buckets=2, chunk_rows=1024)

    got = read_upserted(base, [t1, t2]).to_pandas()
    sel = got[got["conv_id"] == conv]
    assert len(sel) == (df["conv_id"] == conv).sum()  # exactly one version
    assert sel["text"].str.startswith("V2").all()

    merged = str(tmp_path / "merged2")
    compact([base, t1, t2], merged, num_buckets=2, chunk_rows=1024)
    got2 = decode_dataset(merged).to_pandas()
    sel2 = got2[got2["conv_id"] == conv]
    assert len(sel2) == len(sel)
    assert sel2["text"].str.startswith("V2").all()


def test_upsert_crash_window_and_recovery(ray_session, tmp_path):
    """The documented crash contract: a failure BETWEEN the tick encode
    and the tombstone write leaves a bounded duplicate window (old + new
    both visible, never data loss); re-running the same upsert with
    resume=True closes it without re-encoding the tick."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        read_upserted,
        upsert_convs,
    )

    table = generate_transcripts(3000, seed=17)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    conv = sorted(df["conv_id"].unique())[0]
    v = df[df["conv_id"] == conv].copy()
    v["text"] = "NEW " + v["text"]
    new_tbl = pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)
    tick = str(tmp_path / "tick")

    # crash state: the tick landed, the tombstone write never ran
    encode_transcripts(
        ray.data.from_arrow(new_tbl), tick, num_buckets=2, chunk_rows=1024
    )
    window = read_upserted(base, [tick]).to_pandas()
    sel = window[window["conv_id"] == conv]
    assert len(sel) == 2 * len(v)  # duplicate window: old AND new visible
    assert set(sel["text"].str.startswith("NEW")) == {True, False}

    # recovery: re-run the SAME upsert; resume skips the completed tick
    mtimes = {
        f: os.path.getmtime(os.path.join(tick, f))
        for f in os.listdir(tick) if f.endswith(".bin")
    }
    upsert_convs(base, ray.data.from_arrow(new_tbl), tick,
                 num_buckets=2, chunk_rows=1024, resume=True)
    after = {
        f: os.path.getmtime(os.path.join(tick, f))
        for f in os.listdir(tick) if f.endswith(".bin")
    }
    assert mtimes == after  # tick not re-encoded
    fixed = read_upserted(base, [tick]).to_pandas()
    sel2 = fixed[fixed["conv_id"] == conv]
    assert len(sel2) == len(v)
    assert sel2["text"].str.startswith("NEW").all()


def _delete_worker(out: str, i: int):
    delete_convs(out, [f"conv-{i:04d}-{j}" for j in range(50)])


def test_delete_convs_lock_prevents_lost_merges(tmp_path):
    """Concurrent tombstone writers (ADVICE r3): N processes each deleting a
    disjoint conv set must leave the UNION on disk — the O_EXCL lock
    serializes the read-merge-replace, so no writer's merge is lost."""
    import multiprocessing as mp

    out = str(tmp_path / "enc")
    os.makedirs(out)

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_delete_worker, args=(out, i)) for i in range(6)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    dead = set(load_deleted_convs(out).to_pylist())
    assert len(dead) == 6 * 50  # every writer's tombstones survived


def test_delete_convs_lock_contention_raises_and_stale_lock_steals(tmp_path):
    import time

    out = str(tmp_path / "enc2")
    os.makedirs(out)
    lock = deletes_path(out) + ".lock"
    # fresh foreign lock -> loud TimeoutError, no silent race
    with open(lock, "w") as f:
        f.write("99999")
    with pytest.raises(TimeoutError, match="tombstone lock"):
        delete_convs(out, ["c1"], lock_timeout=0.3)
    # stale lock (older than stale_after) from a crashed writer is stolen
    old = time.time() - 120
    os.utime(lock, (old, old))
    info = delete_convs(out, ["c1"], lock_timeout=0.5)
    assert info["n_total"] == 1
    assert not os.path.exists(lock)


def test_time_travel_as_of_epoch(ray_session, tmp_path):
    """Time travel: read_as_of(epoch) reconstructs the corpus exactly as
    it stood after each mutation — including a conversation upserted in
    TWO ticks (v1 visible only in the [1, 2) epoch window) and a plain
    delete as the final epoch."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        read_as_of,
        read_upserted,
        upsert_convs,
    )

    table = generate_transcripts(3000, seed=29)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    convs = sorted(df["conv_id"].unique())
    a, b = convs[0], convs[1]

    def version(conv, tag):
        v = df[df["conv_id"] == conv].copy()
        v["text"] = f"{tag} " + v["text"]
        return pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)

    # epoch 1: conv a -> A1 ; epoch 2: conv a -> A2 AND conv b -> B2
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    upsert_convs(base, ray.data.from_arrow(version(a, "A1")), t1,
                 num_buckets=2, chunk_rows=1024)
    upsert_convs(
        base,
        ray.data.from_arrow(
            pa.concat_tables([version(a, "A2"), version(b, "B2")])
        ),
        t2, prior_tick_dirs=[t1], num_buckets=2, chunk_rows=1024,
    )
    # epoch 3: plain delete of conv b
    delete_convs(base, [b], epoch=3)
    delete_convs(t2, [b], epoch=3)

    def snap(ds):
        return (
            ds.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    def expect(frames):
        return (
            pd.concat(frames, ignore_index=True)
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    rest = df[~df["conv_id"].isin([a, b])]
    a1 = version(a, "A1").to_pandas()
    a2 = version(a, "A2").to_pandas()
    b2 = version(b, "B2").to_pandas()

    ticks = [t1, t2]
    got0 = snap(read_as_of(base, ticks, 0))
    pd.testing.assert_frame_equal(got0, expect([df])[got0.columns])

    got1 = snap(read_as_of(base, ticks, 1))
    exp1 = expect([rest, df[df["conv_id"] == b], a1])
    pd.testing.assert_frame_equal(got1, exp1[got1.columns])
    assert got1[got1["conv_id"] == a]["text"].str.startswith("A1").all()

    got2 = snap(read_as_of(base, ticks, 2))
    exp2 = expect([rest, a2, b2])
    pd.testing.assert_frame_equal(got2, exp2[got2.columns])

    got3 = snap(read_as_of(base, ticks, 3))
    exp3 = expect([rest, a2])
    pd.testing.assert_frame_equal(got3, exp3[got3.columns])

    # the present-day union view agrees with the latest epoch
    now = snap(read_upserted(base, ticks))
    pd.testing.assert_frame_equal(now, exp3[now.columns])


def test_changelog_added_replaced_deleted(ray_session, tmp_path):
    """CDC feed: a brand-new conversation in a tick reads 'added', an
    existing one 'replaced'; a plain delete of a visible conv reads
    'deleted'; deleting an already-replaced conv at a later epoch names
    it once, and from_epoch windows the feed."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        changelog,
        upsert_convs,
    )

    table = generate_transcripts(2000, seed=31)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    convs = sorted(df["conv_id"].unique())
    a = convs[0]

    # tick 1: replace conv a AND add a brand-new conv
    v = df[df["conv_id"] == a].copy()
    v["text"] = "V1 " + v["text"]
    new = df[df["conv_id"] == convs[1]].copy()
    new["conv_id"] = "conv-zz-new"
    t1 = str(tmp_path / "t1")
    up = pd.concat([v, new], ignore_index=True)
    upsert_convs(
        base,
        ray.data.from_arrow(
            pa.Table.from_pandas(up, preserve_index=False).cast(table.schema)
        ),
        t1, num_buckets=2, chunk_rows=1024,
    )
    # epoch 2: plain delete of conv b (visible) — laid on base only
    b = convs[2]
    delete_convs(base, [b], epoch=2)

    log = changelog(base, [t1], from_epoch=0, to_epoch=2).to_pandas()
    got = {(r.epoch, r.conv_id): r.change for r in log.itertuples()}
    assert got[(1, a)] == "replaced"
    assert got[(1, "conv-zz-new")] == "added"
    assert got[(2, b)] == "deleted"
    assert len(got) == 3

    # windowing: from_epoch=1 sees only the delete
    w = changelog(base, [t1], from_epoch=1, to_epoch=2).to_pandas()
    assert list(w["conv_id"]) == [b] and list(w["change"]) == ["deleted"]


def test_upsert_epoch_defaults_from_base_clock(ray_session, tmp_path):
    """A second upsert that FORGOT prior_tick_dirs must still get a fresh
    epoch (derived from the base's recorded clock), so as-of views stay
    unambiguous."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import upsert_convs

    table = generate_transcripts(1500, seed=37)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    conv = sorted(df["conv_id"].unique())[0]
    v = df[df["conv_id"] == conv].copy()
    tbl = pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)

    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    i1 = upsert_convs(base, ray.data.from_arrow(tbl), t1,
                      num_buckets=2, chunk_rows=1024)
    # no prior_tick_dirs passed — the base clock still advances
    i2 = upsert_convs(base, ray.data.from_arrow(tbl), t2,
                      num_buckets=2, chunk_rows=1024)
    assert i1["epoch"] == 1 and i2["epoch"] == 2


def test_mutation_clock_survives_min_epoch_merge(ray_session, tmp_path):
    """Regression (review finding): the per-conv MIN-epoch merge used to
    erase later stamps from the clock, so a third upsert of the SAME conv
    reused epoch 2. The clock now rides the tombstone file's metadata
    monotonically; and a plain delete BETWEEN upserts shifts tick epochs,
    which read_as_of/changelog must honor via the recorded tick epoch."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        changelog,
        mutation_clock,
        read_as_of,
        upsert_convs,
    )

    table = generate_transcripts(1500, seed=41)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    conv = sorted(df["conv_id"].unique())[0]

    def version(tag):
        v = df[df["conv_id"] == conv].copy()
        v["text"] = f"{tag} " + v["text"]
        return pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)

    t1, t2, t3 = (str(tmp_path / f"t{i}") for i in (1, 2, 3))
    e1 = upsert_convs(base, ray.data.from_arrow(version("V1")), t1,
                      num_buckets=2, chunk_rows=1024)["epoch"]
    e2 = upsert_convs(base, ray.data.from_arrow(version("V2")), t2,
                      prior_tick_dirs=[t1], num_buckets=2,
                      chunk_rows=1024)["epoch"]
    e3 = upsert_convs(base, ray.data.from_arrow(version("V3")), t3,
                      prior_tick_dirs=[t1, t2], num_buckets=2,
                      chunk_rows=1024)["epoch"]
    # the same conv upserted three times: epochs must be 1, 2, 3 even
    # though the base's per-conv tombstone row stays at min epoch 1
    assert (e1, e2, e3) == (1, 2, 3)
    assert mutation_clock(base) == 3
    for e, tag in ((1, "V1"), (2, "V2"), (3, "V3")):
        got = read_as_of(base, [t1, t2, t3], e).to_pandas()
        sel = got[got["conv_id"] == conv]
        assert sel["text"].str.startswith(tag).all() and len(sel) > 0


def test_delete_between_upserts_shifts_tick_epochs(ray_session, tmp_path):
    """A plain delete (default epoch = clock+1) between upserts must NOT
    pull the next tick into older as-of views: alignment is by recorded
    tick epoch, not list position."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        changelog,
        read_as_of,
        upsert_convs,
    )

    table = generate_transcripts(1500, seed=43)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    convs = sorted(df["conv_id"].unique())
    doomed, upped = convs[0], convs[1]

    info = delete_convs(base, [doomed])          # default -> epoch 1
    assert info["epoch"] == 1
    v = df[df["conv_id"] == upped].copy()
    v["text"] = "V1 " + v["text"]
    t1 = str(tmp_path / "t1")
    e = upsert_convs(
        base,
        ray.data.from_arrow(
            pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)
        ),
        t1, num_buckets=2, chunk_rows=1024,
    )["epoch"]
    assert e == 2                                 # clock advanced past 1

    # epoch-0 view: pristine (delete invisible, upsert invisible)
    g0 = read_as_of(base, [t1], 0).to_pandas()
    assert doomed in set(g0["conv_id"])
    assert not g0[g0["conv_id"] == upped]["text"].str.startswith("V1").any()
    # epoch-1 view: delete applied, the epoch-2 tick NOT unioned
    g1 = read_as_of(base, [t1], 1).to_pandas()
    assert doomed not in set(g1["conv_id"])
    assert not g1[g1["conv_id"] == upped]["text"].str.startswith("V1").any()
    assert len(g1[g1["conv_id"] == upped]) > 0    # old version still there
    # epoch-2 view: both applied, exactly one version of the upserted conv
    g2 = read_as_of(base, [t1], 2).to_pandas()
    sel = g2[g2["conv_id"] == upped]
    assert sel["text"].str.startswith("V1").all()
    assert len(sel) == (df["conv_id"] == upped).sum()

    log = changelog(base, [t1], 0, 2).to_pandas()
    got = {(r.epoch, r.conv_id): r.change for r in log.itertuples()}
    assert got == {(1, doomed): "deleted", (2, upped): "replaced"}


def test_upsert_retry_reuses_recorded_epoch_and_noop_delete_keeps_clock(
    ray_session, tmp_path
):
    """Regressions (review findings): (a) re-running an upsert whose tick
    already recorded its epoch must REUSE it, not mint a fresh one (the
    base's min-merged tombstones stay at the old epoch — a fresh one
    would vanish the convs from that as-of view); (b) a no-op delete
    (already-tombstoned convs) must not advance the mutation clock."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        mutation_clock,
        read_as_of,
        upsert_convs,
    )

    table = generate_transcripts(1500, seed=47)
    base = str(tmp_path / "base")
    encode_transcripts(
        ray.data.from_arrow(table), base, num_buckets=2, chunk_rows=1024
    )
    df = table.to_pandas()
    conv = sorted(df["conv_id"].unique())[0]
    v = df[df["conv_id"] == conv].copy()
    v["text"] = "V1 " + v["text"]
    tbl = pa.Table.from_pandas(v, preserve_index=False).cast(table.schema)

    t1 = str(tmp_path / "t1")
    e1 = upsert_convs(base, ray.data.from_arrow(tbl), t1,
                      num_buckets=2, chunk_rows=1024)["epoch"]
    # simulate the crash-retry: the tick dir (with _tick_epoch.json)
    # already exists — the re-run must land on the SAME epoch
    e_retry = upsert_convs(base, ray.data.from_arrow(tbl), t1,
                           num_buckets=2, chunk_rows=1024)["epoch"]
    assert e_retry == e1 == 1
    got = read_as_of(base, [t1], 1).to_pandas()
    sel = got[got["conv_id"] == conv]
    assert sel["text"].str.startswith("V1").all() and len(sel) > 0

    # no-op delete: clock unchanged, file untouched
    clock = mutation_clock(base)
    info = delete_convs(base, [conv])   # conv already tombstoned at 1
    assert not info["changed"]
    assert mutation_clock(base) == clock


def test_allocate_epoch_floor_applied_under_lock(tmp_path):
    """Regression (advice r4): the pre-clock position floor used to be
    applied OUTSIDE allocate_epoch's lock — two concurrent upserts on a
    pre-clock layout could both land on the same floored epoch. The floor
    now seeds the clock inside the lock, so consecutive allocations with
    the same floor are strictly increasing."""
    import os

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import allocate_epoch

    base = str(tmp_path / "base")
    os.makedirs(base)
    # pre-clock layout (no tombstone file): clock is 0, caller's floor is 5
    e1 = allocate_epoch(base, floor=5)
    e2 = allocate_epoch(base, floor=5)   # the second concurrent upsert
    assert e1 == 5
    assert e2 == 6                        # NOT 5 — uniqueness preserved
    assert allocate_epoch(base) == 7      # clock really advanced to 6
