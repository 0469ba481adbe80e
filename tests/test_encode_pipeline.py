"""End-to-end Ray encode/decode pipeline: bit-identity under stable turn
ordering, size budget vs parquet+zstd, manifest lineage, kill-and-resume."""

import glob
import io
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.encode import (
    decode_dataset,
    encode_transcripts,
    roundtrip_ok,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
from etl_sql_duckdb_parquet__ray.state.manifest import (
    completed_buckets,
    load_manifest,
    manifest_stats,
)

N_ROWS = 20000
N_BUCKETS = 8


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(N_ROWS, seed=21)


@pytest.fixture()
def ds(ray_session, table):
    import ray

    return ray.data.from_arrow(table)


def test_encode_decode_roundtrip(ds, table, tmp_path):
    out = str(tmp_path / "enc")
    records = encode_transcripts(ds, out, num_buckets=N_BUCKETS, chunk_rows=4096)
    assert len(records) == len(completed_buckets(out)) > 0
    stats = manifest_stats(out)
    assert stats["rows"] == N_ROWS
    assert roundtrip_ok(ds, out)
    # size budget: total encoded bytes <= parquet+zstd of the same table
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    assert stats["bytes_out"] <= buf.tell(), (stats["bytes_out"], buf.tell())


def test_read_for_encode_roundtrip(ray_session, table, tmp_path):
    """The exchange-planned read (block count = max(3x cpus, disk/128MB))
    must be a drop-in for read_parquet on the encode path: same rows, same
    decode bit-identity. Also covers the multi-file and single-file path
    arithmetic and the fsspec fallback arm (non-local path -> plain read)."""
    from etl_sql_duckdb_parquet__ray.pipelines.encode import read_for_encode

    src = str(tmp_path / "src")
    os.makedirs(src)
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), os.path.join(src, "a.parquet"))
    pq.write_table(table.slice(half), os.path.join(src, "b.parquet"))
    ds = read_for_encode(src)
    assert ds.count() == N_ROWS
    out = str(tmp_path / "enc_rfe")
    encode_transcripts(ds, out, num_buckets=N_BUCKETS, chunk_rows=4096)
    assert manifest_stats(out)["rows"] == N_ROWS
    assert roundtrip_ok(read_for_encode(src), out)
    # single-file path form
    assert read_for_encode(os.path.join(src, "a.parquet")).count() == half


def test_conversations_not_split_across_buckets(ds, tmp_path):
    out = str(tmp_path / "enc2")
    encode_transcripts(ds, out, num_buckets=N_BUCKETS, chunk_rows=100000)
    # conversation -> bucket must be a function (hash partitioning)
    import pandas as pd

    from etl_sql_duckdb_parquet__ray.chunk import read_chunk_file

    frames = []
    for rec in load_manifest(out):
        t = read_chunk_file(rec["path"]).to_pandas()
        t["bucket"] = rec["bucket"]
        frames.append(t[["conv_id", "bucket"]])
    allb = pd.concat(frames)
    assert (allb.groupby("conv_id")["bucket"].nunique() == 1).all()


def test_hot_conversation_salted_into_ordered_chunks(ray_session, tmp_path):
    import ray

    # one conversation much larger than chunk_rows must split into multiple
    # chunks whose (conv, turn) ranges are contiguous and ordered
    big = generate_transcripts(50, seed=3)
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * 5000),
            "turn_idx": pa.array(range(5000), type=pa.int32()),
            "role": pa.array(["user", "assistant"] * 2500),
            "text": pa.array([f"turn {i}" for i in range(5000)]),
            "tool": pa.array([None] * 5000, type=pa.string()),
            "ts": pa.array(range(5000), type=pa.timestamp("us")),
        }
    )
    both = pa.concat_tables([big, hot])
    ds = ray.data.from_arrow(both)
    out = str(tmp_path / "enc3")
    encode_transcripts(ds, out, num_buckets=4, chunk_rows=1024)
    hot_chunks = [
        c
        for rec in load_manifest(out)
        for c in rec["chunks"]
        if c["conv_range"][0] == "conv-hot" or c["conv_range"][1] == "conv-hot"
    ]
    assert len(hot_chunks) >= 5  # 5000 rows / 1024 chunk_rows
    assert roundtrip_ok(ds, out)


def test_detect_hot_convs_sees_last_fragment(ray_session, tmp_path):
    """A hot conversation living ONLY in the last of many parquet fragments
    must still be detected — the sampler strides across all fragments
    instead of reading the first few."""
    import pyarrow.parquet as pq
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import detect_hot_convs

    d = tmp_path / "frags"
    d.mkdir()
    for i in range(16):
        if i < 15:
            t = pa.table({
                "conv_id": pa.array([f"conv-{i}-{j % 50}" for j in range(2000)]),
                "turn_idx": pa.array(range(2000), type=pa.int32()),
            })
        else:
            t = pa.table({
                "conv_id": pa.array(["conv-hot"] * 2000),
                "turn_idx": pa.array(range(2000), type=pa.int32()),
            })
        pq.write_table(t, str(d / f"part-{i:03d}.parquet"))
    ds = ray.data.read_parquet(str(d))
    hot = detect_hot_convs(ds, sample_rows=8000, est_total=32000, hot_threshold=1000)
    assert "conv-hot" in hot


def test_detect_hot_convs_derived_dataset_fallback(ray_session):
    """input_files() paths that aren't conv_id parquet (derived datasets)
    must fall back to sampling the dataset itself, not crash."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import detect_hot_convs

    t = pa.table({
        "conv_id": pa.array(["conv-hot"] * 3000 + [f"c{i}" for i in range(100)]),
        "turn_idx": pa.array(range(3100), type=pa.int32()),
    })
    ds = ray.data.from_arrow(t)
    hot = detect_hot_convs(ds, sample_rows=5000, hot_threshold=1000)
    assert "conv-hot" in hot


def test_resume_skips_completed_buckets(ds, tmp_path):
    out = str(tmp_path / "enc4")
    encode_transcripts(ds, out, num_buckets=N_BUCKETS, chunk_rows=4096)
    all_buckets = completed_buckets(out)
    # simulate a crash that lost some partitions
    lost = sorted(all_buckets)[: len(all_buckets) // 2]
    for b in lost:
        os.remove(os.path.join(out, f"bucket-{b:05d}.bin"))
        os.remove(os.path.join(out, f"bucket-{b:05d}.json"))
    kept = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "bucket-*.bin"))
    }
    encode_transcripts(ds, out, num_buckets=N_BUCKETS, chunk_rows=4096, resume=True)
    # untouched survivors (resume did not rewrite them)
    for p, mtime in kept.items():
        assert os.path.getmtime(p) == mtime, f"{p} was rewritten"
    assert completed_buckets(out) == all_buckets
    assert roundtrip_ok(ds, out)


def test_output_dir_decodable_after_move(ds, tmp_path):
    """Manifest paths are hints, not authoritative: an output directory
    moved to a new location (rsync between nodes / storage tiers) must
    still decode and resume — load_manifest re-roots every data path."""
    a = str(tmp_path / "enc-orig")
    b = str(tmp_path / "enc-moved")
    encode_transcripts(ds, a, num_buckets=4, chunk_rows=8192)
    os.rename(a, b)
    assert roundtrip_ok(ds, b)
    # resume against the moved dir sees everything complete (no rewrite)
    before = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(b, "bucket-*"))
    }
    encode_transcripts(ds, b, num_buckets=4, chunk_rows=8192)
    after = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(b, "bucket-*"))}
    assert before == after


def test_second_run_is_noop(ds, tmp_path):
    out = str(tmp_path / "enc5")
    encode_transcripts(ds, out, num_buckets=4, chunk_rows=8192)
    before = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "bucket-*"))
    }
    encode_transcripts(ds, out, num_buckets=4, chunk_rows=8192)
    after = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "bucket-*"))}
    assert before == after


def test_dict_conv_exchange_roundtrip(ray_session, tmp_path):
    """Opt-in dictionary-encoded conv_id exchange must stay bit-identical
    with the plain path (the encoder re-expands before its bucket sort)."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(6000, seed=11)
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "dictconv")
    encode_transcripts(ds, out, num_buckets=4, dict_conv=True)
    dec = decode_dataset(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    orig = t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert dec.equals(orig)


def test_hash_exchange_roundtrip(ray_session, tmp_path):
    """Opt-in HASH_SHUFFLE exchange (exchange="hash") must produce the same
    decoded table as the default sort exchange, and must restore the
    DataContext strategy afterwards. Measured at 3M turns / 32 cpus the hash
    exchange is ~2x SLOWER on a single shared-memory host (aggregator actors
    serialize partition accumulation), so it stays opt-in for network-bound
    multi-node clusters — this test pins the correctness of the option."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(6000, seed=23)
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "hashex")
    ctx = ray.data.DataContext.get_current()
    before = ctx.shuffle_strategy
    encode_transcripts(ds, out, num_buckets=4, exchange="hash")
    assert ctx.shuffle_strategy == before  # context restored
    dec = decode_dataset(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    orig = t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert dec.equals(orig)


def test_pre_encode_matches_plain_path(ray_session, tmp_path):
    """Pre-shuffle row-FSST and the plain post-shuffle path must decode to
    the same table, including null/empty/unicode text rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(8000)
    # inject nulls into text
    df = t.to_pandas()
    rng = np.random.default_rng(0)
    null_rows = rng.choice(len(df), 500, replace=False)
    df.loc[null_rows, "text"] = None
    ds = ray.data.from_pandas(df)

    outs = {}
    for pre in (True, False):
        out = str(tmp_path / f"pre{pre}")
        encode_transcripts(ds, out, num_buckets=4, resume=False, pre_encode=pre)
        outs[pre] = (
            decode_dataset(out)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    src = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert pa.Table.from_pandas(outs[True]).equals(pa.Table.from_pandas(src))
    assert pa.Table.from_pandas(outs[True]).equals(pa.Table.from_pandas(outs[False]))


def test_actor_pool_path(ray_session, tmp_path):
    """use_actors=True (explicit ST4 actor pool) must produce identical
    decodable output to the default task path."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        encode_transcripts,
        roundtrip_ok,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    ds = ray.data.from_arrow(generate_transcripts(6000))
    out = str(tmp_path / "actors")
    encode_transcripts(
        ds, out, num_buckets=4, resume=False, use_actors=True,
        encoder_concurrency=(1, 2),
    )
    assert roundtrip_ok(ds, out)


def test_conversation_split_across_input_files(ray_session, tmp_path):
    """Rows of one conversation arriving from DIFFERENT input fragments must
    reassemble into the stable (conv_id, turn_idx) order — the whole point
    of the explicit conv shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )

    rng = np.random.default_rng(4)

    def part(turns):
        n = len(turns)
        return pa.table(
            {
                "conv_id": pa.array(["conv-split"] * n),
                "turn_idx": pa.array(turns, type=pa.int32()),
                "role": pa.array(["user" if t % 2 == 0 else "assistant" for t in turns]),
                "text": pa.array([f"turn number {t} says something" for t in turns]),
                "tool": pa.array([None] * n, type=pa.string()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + t * 1_000_000 for t in turns],
                    type=pa.int64(),
                ).cast(pa.timestamp("us")),
            }
        )

    # interleave one conversation's turns across two files, shuffled order
    all_turns = np.arange(200)
    rng.shuffle(all_turns)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(part(list(all_turns[:100])), str(src / "a.parquet"))
    pq.write_table(part(list(all_turns[100:])), str(src / "b.parquet"))

    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(str(src))
    encode_transcripts(ds, out, num_buckets=4, resume=False)
    back = (
        decode_dataset(out).to_pandas().sort_values("turn_idx").reset_index(drop=True)
    )
    assert list(back["turn_idx"]) == list(range(200))
    assert list(back["text"]) == [f"turn number {t} says something" for t in range(200)]


def test_resume_fuzz(ray_session, tmp_path):
    """Randomized resume: delete arbitrary bucket subsets, re-run, always
    converge to a complete bit-identical output."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        encode_transcripts,
        roundtrip_ok,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.manifest import (
        bucket_data_path,
        bucket_manifest_path,
    )

    ds = ray.data.from_arrow(generate_transcripts(10000))
    out = str(tmp_path / "fz")
    encode_transcripts(ds, out, num_buckets=8, resume=False)
    rng = np.random.default_rng(7)
    import os

    for _ in range(3):
        victims = rng.choice(8, size=rng.integers(1, 5), replace=False)
        for b in victims:
            os.remove(bucket_data_path(out, int(b)))
            os.remove(bucket_manifest_path(out, int(b)))
        encode_transcripts(ds, out, num_buckets=8, resume=True)
        assert roundtrip_ok(ds, out)


def test_empty_input(ray_session, tmp_path):
    """Zero-row input: encode completes with an empty manifest; decode
    raises a clear error rather than returning garbage."""
    import pytest as _pytest
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    empty = ray.data.from_arrow(generate_transcripts(100).slice(0, 0))
    out = str(tmp_path / "empty")
    encode_transcripts(empty, out, num_buckets=4, resume=False)
    with _pytest.raises(FileNotFoundError):
        decode_dataset(out)


def test_salted_hot_conversation_spreads_buckets(ray_session, tmp_path):
    """A conversation dominating the table must be salted across buckets
    (bounded groups) and still decode to the exact turn order."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        add_bucket,
        decode_dataset,
        encode_transcripts,
    )

    n_hot, n_cold = 40000, 4000
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * n_hot),
            "turn_idx": pa.array(np.arange(n_hot, dtype=np.int32)),
            "role": pa.array(["user", "assistant"] * (n_hot // 2)),
            "text": pa.array([f"hot turn {i}" for i in range(n_hot)]),
            "tool": pa.array([None] * n_hot, type=pa.string()),
            "ts": pa.array(
                1_700_000_000_000_000 + np.arange(n_hot, dtype=np.int64) * 1_000_000
            ).cast(pa.timestamp("us")),
        }
    )
    cold = pa.table(
        {
            "conv_id": pa.array([f"conv-{i % 50:04d}" for i in range(n_cold)]),
            "turn_idx": pa.array((np.arange(n_cold) % 80).astype(np.int32)),
            "role": pa.array(["user"] * n_cold),
            "text": pa.array([f"cold {i}" for i in range(n_cold)]),
            "tool": pa.array([None] * n_cold, type=pa.string()),
            "ts": pa.array(
                1_700_000_000_000_000 + np.arange(n_cold, dtype=np.int64)
            ).cast(pa.timestamp("us")),
        }
    )
    t = pa.concat_tables([hot, cold])

    # unit check: salting spreads the hot conversation over many buckets
    salted = add_bucket(t, 16, hot_convs={"conv-hot": n_hot}, salt_block=4096)
    hot_buckets = set(
        salted.filter(
            pa.compute.equal(salted.column("conv_id"), "conv-hot")
        ).column("bucket").to_pylist()
    )
    assert len(hot_buckets) >= 5  # 40000/4096 = 10 salt ranges over 16 buckets

    # end-to-end: explicit hot map, bounded salt blocks, exact roundtrip
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "salted")
    encode_transcripts(
        ds, out, num_buckets=16, resume=False,
        hot_convs={"conv-hot": n_hot}, salt_block=4096,
    )
    back = (
        decode_dataset(out)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert pa.Table.from_pandas(back).equals(pa.Table.from_pandas(src))


def test_detect_hot_convs_fires_with_total_scaling(tmp_path):
    """Automatic hot detection must actually trigger: a conversation that
    dominates the sample, scaled by the dataset/sample ratio, crosses the
    per-group budget."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import detect_hot_convs

    # sample file: 50k rows, 40k of them one conversation
    conv = np.array(["conv-hot"] * 40000 + [f"conv-{i}" for i in range(10000)], dtype=object)
    t = pa.table({"conv_id": pa.array(conv), "turn_idx": pa.array(np.arange(50000, dtype=np.int32))})
    src = tmp_path / "hot"
    src.mkdir()
    pq.write_table(t, str(src / "a.parquet"))
    ds = ray.data.read_parquet(str(src))
    # dataset claimed 100x larger than the sample -> est count 4M >> 262144
    hot = detect_hot_convs(ds, sample_rows=50000, est_total=5_000_000)
    assert "conv-hot" in hot and hot["conv-hot"] > 262144
    # without scaling the 40k-count conv stays under the default threshold
    assert detect_hot_convs(ds, sample_rows=50000) == {}


def test_projection_and_predicate_pushdown(ray_session, tmp_path):
    """Selective decode: column projection and conv/turn zone-map pruning
    must return exactly what a full decode + filter returns, while the
    chunk plan provably prunes (fewer chunks touched than exist)."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
        plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(20000, seed=77)
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "pushdown")
    encode_transcripts(ds, out, num_buckets=8, chunk_rows=2048, resume=False)

    full = (
        decode_dataset(out)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )

    # projection: same rows, only the requested columns, no text decode
    proj = (
        decode_dataset(out, columns=["conv_id", "turn_idx", "role"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert list(proj.columns) == ["conv_id", "turn_idx", "role"]
    assert proj.equals(full[["conv_id", "turn_idx", "role"]])

    # point lookup: one conversation, exact rows, pruned chunk plan
    conv = full["conv_id"].iloc[len(full) // 2]
    expected = full[full["conv_id"] == conv].reset_index(drop=True)
    got = (
        decode_dataset(out, conv_id=conv)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert got.equals(expected[got.columns.tolist()])
    total_chunks = sum(len(p["idx"]) for p in plan_chunks(out))
    pruned_chunks = sum(len(p["idx"]) for p in plan_chunks(out, conv_id=conv))
    assert 0 < pruned_chunks < total_chunks

    # conv + turn range + projection combined
    hi = int(expected["turn_idx"].max())
    got2 = (
        decode_dataset(out, columns=["text"], conv_id=conv, turn_lo=1, turn_hi=hi)
        .to_pandas()
    )
    exp2 = expected[(expected["turn_idx"] >= 1) & (expected["turn_idx"] <= hi)]
    assert sorted(got2["text"]) == sorted(exp2["text"])

    # no-match lookup -> empty
    assert decode_dataset(out, conv_id="no-such-conv").count() == 0

    # unknown column -> KeyError surfaces from the task
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_dataset(out, columns=["nope"]).materialize()


def test_selective_read_matches_in_memory_decode(tmp_path):
    """chunk_spans + read_chunk_columns (seek path) must agree with
    decode_chunk on the same bytes, column for column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_sql_duckdb_parquet__ray.chunk import (
        chunk_spans,
        decode_chunk,
        encode_chunk,
        iter_chunks,
        read_chunk_columns,
        write_chunk_file,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(5000, seed=5)
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    blobs = [encode_chunk(t.slice(lo, 1024))[0] for lo in range(0, t.num_rows, 1024)]
    path = str(tmp_path / "f.bin")
    write_chunk_file(path, blobs)

    spans = chunk_spans(path)
    assert len(spans) == len(blobs)
    mem = [decode_chunk(b) for b in iter_chunks(path)]
    for span, m in zip(spans, mem):
        sel = read_chunk_columns(path, span, ["ts", "conv_id"])
        assert sel.column("ts").equals(m.column("ts"))
        assert sel.column("conv_id").equals(m.column("conv_id"))
        allc = read_chunk_columns(path, span, None)
        assert allc.equals(m)


def test_conv_lookup_uses_home_bucket_and_hot_fallback(ray_session, tmp_path):
    """With run meta present, a normal conversation's lookup plan touches
    exactly one bucket (the deterministic hash home); a SALTED hot
    conversation falls back to the zone scan and still returns every row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        conv_bucket,
        decode_dataset,
        encode_transcripts,
        plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.manifest import load_run_meta

    base = generate_transcripts(8000, seed=13)
    n_hot = 6000
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * n_hot),
            "turn_idx": pa.array(range(n_hot), type=pa.int32()),
            "role": pa.array(["user", "assistant"] * (n_hot // 2)),
            "text": pa.array([f"hot turn {i}" for i in range(n_hot)]),
            "tool": pa.array([None] * n_hot, type=pa.string()),
            "ts": pa.array(range(n_hot), type=pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([base, hot]))
    out = str(tmp_path / "homebucket")
    encode_transcripts(
        ds, out, num_buckets=8, chunk_rows=1024, resume=False,
        hot_convs={"conv-hot": n_hot}, salt_block=1024,
    )
    meta = load_run_meta(out)
    assert meta["num_buckets"] == 8 and "conv-hot" in meta["hot_convs"]

    # normal conv: plan restricted to the hash home bucket
    conv = base.column("conv_id")[0].as_py()
    home = int(conv_bucket(pa.array([conv]), 8)[0])
    plan = plan_chunks(out, conv_id=conv)
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    by_path = {r["path"]: r["bucket"] for r in load_manifest(out)}
    assert {by_path[p["path"]] for p in plan} == {home}
    got = decode_dataset(out, conv_id=conv).to_pandas()
    exp = base.to_pandas()
    exp = exp[exp["conv_id"] == conv]
    assert len(got) == len(exp)

    # salted hot conv: zone-scan fallback must recover ALL rows across buckets
    got_hot = decode_dataset(out, conv_id="conv-hot", columns=["turn_idx"]).to_pandas()
    assert sorted(got_hot["turn_idx"]) == list(range(n_hot))


def test_mixed_bucket_layout_falls_back_to_zone_scan(ray_session, tmp_path):
    """Re-encoding into the same dir with a DIFFERENT bucket count poisons
    the home-bucket shortcut (mixed layout) — conv lookups must zone-scan
    and still find every row."""
    import pyarrow.compute as pc
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.manifest import load_run_meta

    t = generate_transcripts(6000, seed=17)
    mid = t.num_rows // 2
    a, b = t.slice(0, mid), t.slice(mid)
    out = str(tmp_path / "mixed")
    encode_transcripts(ray.data.from_arrow(a), out, num_buckets=4, resume=False)
    # second batch of data, different bucket count, resume into the same dir
    encode_transcripts(ray.data.from_arrow(b), out, num_buckets=8, resume=False)
    assert load_run_meta(out)["hash"] == "mixed-layout"
    # the poison forces a zone scan, so a conv lookup sees EXACTLY what a
    # full decode sees (home-bucket math under either bucket count would
    # silently miss chunks written under the other layout)
    full = decode_dataset(out).to_pandas()
    for conv in full["conv_id"].unique()[:5]:
        expected = int((full["conv_id"] == conv).sum())
        got = decode_dataset(out, conv_id=conv).count()
        assert got == expected, (conv, got, expected)


def test_turn_range_zone_map_is_true_minmax(ray_session, tmp_path):
    """Regression: a (conv_id, turn_idx)-sorted chunk spanning several
    conversations starts at the FIRST conv's turns and ends at the LAST
    conv's — recording [first, last] as the turn zone map under-reports the
    extent (e.g. a chunk holding turns 0..999 tagged [0, 4]) and a
    turn_lo/turn_hi lookup silently drops rows."""
    import numpy as np
    import ray

    # one long conversation (turns 0..999) that sorts FIRST, then 80 short
    # ones (turns 0..4) — all in one bucket-sized chunk, so the sorted
    # chunk's last row has turn_idx 4 while the true max is 999
    n_long, n_short, short_turns = 1000, 80, 5
    conv = ["conv-aaa"] * n_long + [
        f"conv-z{j:03d}" for j in range(n_short) for _ in range(short_turns)
    ]
    turn = list(range(n_long)) + list(range(short_turns)) * n_short
    n = len(conv)
    t = pa.table(
        {
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(np.arange(n, dtype=np.int64), type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "zmm")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=1, chunk_rows=1 << 20, resume=False
    )
    recs = load_manifest(out)
    assert all(r.get("zone_v", 1) >= 2 for r in recs)
    got = decode_dataset(out, turn_lo=600).to_pandas()
    assert len(got) == 400  # turns 600..999 of the long conversation
    assert (got["conv_id"] == "conv-aaa").all()
    got2 = decode_dataset(out, turn_lo=2, turn_hi=3).to_pandas()
    assert len(got2) == 2 + n_short * 2  # long conv turns 2,3 + shorts


def test_v1_manifest_skips_turn_pruning(ray_session, tmp_path):
    """Backward compat: manifests written before zone_v=2 carry
    [first, last] turn ranges that are NOT valid zone maps — plan_chunks
    must keep every chunk for them (exact row filter still applies)."""
    import json

    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import plan_chunks
    from etl_sql_duckdb_parquet__ray.state.manifest import bucket_manifest_path

    n = 500
    t = pa.table(
        {
            "conv_id": pa.array(["conv-a"] * n),
            "turn_idx": pa.array(range(n), type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(["x"] * n),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(np.arange(n, dtype=np.int64), type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "v1")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=1, chunk_rows=1 << 20, resume=False
    )
    # simulate a v1 record: drop the version tag and plant the broken
    # [first, last] extent an old writer would have recorded
    mpath = bucket_manifest_path(out, list(completed_buckets(out))[0])
    with open(mpath) as f:
        rec = json.load(f)
    rec.pop("zone_v", None)
    for c in rec["chunks"]:
        c["turn_range"] = [0, 4]  # lies: true extent is [0, 499]
    with open(mpath, "w") as f:
        json.dump(rec, f)
    plan = plan_chunks(out, turn_lo=300)
    assert plan and plan[0]["idx"], "v1 manifest must not be turn-pruned"
    got = decode_dataset(out, turn_lo=300).to_pandas()
    assert len(got) == 200


def test_resume_without_run_meta_poisons_layout(ray_session, tmp_path):
    """A dir holding completed bucket records but NO _run.json (written
    before run meta existed, or meta lost) has an unknowable layout: a
    resumed encode must poison the home-bucket shortcut, not assume the
    current num_buckets."""
    import ray

    from etl_sql_duckdb_parquet__ray.state.manifest import (
        bucket_manifest_path,
        load_run_meta,
    )

    t = generate_transcripts(4000, seed=23)
    out = str(tmp_path / "nometa")
    encode_transcripts(ray.data.from_arrow(t), out, num_buckets=4, resume=False)
    os.remove(os.path.join(out, "_run.json"))
    # drop one bucket so the resumed run actually re-enters the encode path
    victim = sorted(completed_buckets(out))[0]
    os.remove(bucket_manifest_path(out, victim))
    encode_transcripts(ray.data.from_arrow(t), out, num_buckets=4, resume=True)
    assert load_run_meta(out)["hash"] == "mixed-layout"
    # poisoned layout must still answer conv lookups exactly (zone scan)
    full = decode_dataset(out).to_pandas()
    conv = full["conv_id"].iloc[0]
    expected = int((full["conv_id"] == conv).sum())
    assert decode_dataset(out, conv_id=conv).count() == expected


def test_concurrent_encode_jobs_bit_identical(ray_session, tmp_path):
    """Two encode jobs running CONCURRENTLY in one driver (distinct symbol
    tables, shared worker pool) must not thrash each other's per-worker
    caches into corruption — both outputs decode bit-identical."""
    import threading

    import ray

    t1 = generate_transcripts(6000, seed=31)
    t2 = generate_transcripts(6000, seed=32, conv_offset=10_000)
    outs = [str(tmp_path / "j1"), str(tmp_path / "j2")]
    errs: list[Exception] = []

    def run(table, out):
        try:
            encode_transcripts(
                ray.data.from_arrow(table), out, num_buckets=4, resume=False
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [
        threading.Thread(target=run, args=(t1, outs[0])),
        threading.Thread(target=run, args=(t2, outs[1])),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    assert roundtrip_ok(ray.data.from_arrow(t1), outs[0])
    assert roundtrip_ok(ray.data.from_arrow(t2), outs[1])


def test_direct_exchange_roundtrip(ray_session, tmp_path):
    """exchange='direct' (raw-task bucket split + per-bucket reduce) must
    produce byte-identical decoded output to the default sort exchange."""
    import ray

    t = generate_transcripts(8000, seed=41)
    ds = ray.data.from_arrow(t)
    out_d = str(tmp_path / "direct")
    encode_transcripts(ds, out_d, num_buckets=4, resume=False, exchange="direct")
    assert roundtrip_ok(ray.data.from_arrow(t), out_d)
    # resume semantics identical: drop one bucket, re-run direct
    recs = load_manifest(out_d)
    assert len(recs) == len(completed_buckets(out_d)) > 0
    victim = recs[0]["bucket"]
    os.remove(os.path.join(out_d, f"bucket-{victim:05d}.bin"))
    os.remove(os.path.join(out_d, f"bucket-{victim:05d}.json"))
    encode_transcripts(ds, out_d, num_buckets=4, resume=True, exchange="direct")
    assert roundtrip_ok(ray.data.from_arrow(t), out_d)


def test_ts_range_pushdown_matches_in_memory_filter(ray_session, tmp_path):
    """ts_lo/ts_hi selective decode == in-memory epoch-us filter, and the
    manifest ts zone maps actually PRUNE chunks for a narrow window."""
    import numpy as np
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import plan_chunks

    rng = np.random.default_rng(7)
    n_conv, turns = 40, 50
    n = n_conv * turns
    # per-conv time bases spread over a wide range so chunks get disjoint
    # ts extents; within a conv, ts increases with turn
    base = np.repeat(rng.integers(0, 10**9, n_conv), turns)
    step = np.tile(np.arange(turns, dtype=np.int64) * 1_000_000, n_conv)
    ts = (base + step).astype(np.int64)
    t = pa.table(
        {
            "conv_id": pa.array([f"conv-{i:05d}" for i in range(n_conv) for _ in range(turns)]),
            "turn_idx": pa.array(list(range(turns)) * n_conv, type=pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2)),
            "text": pa.array([f"msg {i}" for i in range(n)]),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "tsz")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=200, resume=False
    )
    lo, hi = 200_000_000, 400_000_000
    got = (
        decode_dataset(out, ts_lo=lo, ts_hi=hi)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = t.to_pandas()
    ref = ref[(ref["ts"].astype("int64") >= lo) & (ref["ts"].astype("int64") <= hi)]
    ref = ref.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    assert len(got) > 0
    # pruning: the narrow window must plan strictly fewer chunks than all
    all_chunks = sum(len(p["idx"]) for p in plan_chunks(out))
    win_chunks = sum(len(p["idx"]) for p in plan_chunks(out, ts_lo=lo, ts_hi=hi))
    assert 0 < win_chunks < all_chunks
    # datetime-typed bounds hit the same path
    got2 = decode_dataset(
        out, ts_lo=pd.Timestamp(lo, unit="us"), ts_hi=pd.Timestamp(hi, unit="us")
    ).to_pandas()
    assert len(got2) == len(ref)


def test_ts_pushdown_on_manifest_without_ts_range(ray_session, tmp_path):
    """Manifests whose chunk records lack ts_range (older encodes): no
    pruning, but the exact row filter still yields correct results."""
    import json

    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.state.manifest import bucket_manifest_path

    n = 500
    t = pa.table(
        {
            "conv_id": pa.array([f"c-{i % 10:03d}" for i in range(n)]),
            "turn_idx": pa.array([i // 10 for i in range(n)], type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"x{i}" for i in range(n)]),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000, type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "nots")
    encode_transcripts(ray.data.from_arrow(t), out, num_buckets=2, resume=False)
    # strip ts_range from every chunk record, as an older encode would be
    for b in range(2):
        p = bucket_manifest_path(out, b)
        rec = json.load(open(p))
        for c in rec["chunks"]:
            c.pop("ts_range", None)
        json.dump(rec, open(p, "w"))
    lo = 100_000  # epoch-us
    got = decode_dataset(out, ts_lo=lo).to_pandas()
    exp = (np.arange(n, dtype=np.int64) * 1000 >= lo).sum()
    assert len(got) == exp


def test_time_clustered_chunk_order(ray_session, tmp_path):
    """chunk_order='time': bit-identical roundtrip, strictly better ts-window
    pruning than the conv order, and conv point lookups still exact (the
    conv_range zone maps switch to computed min/max)."""
    import numpy as np
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import plan_chunks

    rng = np.random.default_rng(11)
    n_conv, turns = 60, 40
    n = n_conv * turns
    base = np.repeat(rng.integers(0, 10**9, n_conv), turns)
    step = np.tile(np.arange(turns, dtype=np.int64) * 1_000, n_conv)
    t = pa.table(
        {
            "conv_id": pa.array([f"conv-{i:05d}" for i in range(n_conv) for _ in range(turns)]),
            "turn_idx": pa.array(list(range(turns)) * n_conv, type=pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2)),
            "text": pa.array([f"msg {i}" for i in range(n)]),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array((base + step).astype(np.int64), type=pa.timestamp("us")),
        }
    )
    ref = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    out_t = str(tmp_path / "tord")
    encode_transcripts(
        ray.data.from_arrow(t), out_t, num_buckets=2, chunk_rows=240,
        resume=False, chunk_order="time",
    )
    got = (
        decode_dataset(out_t).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)

    out_c = str(tmp_path / "cord")
    encode_transcripts(
        ray.data.from_arrow(t), out_c, num_buckets=2, chunk_rows=240, resume=False
    )
    lo, hi = 100_000_000, 200_000_000
    pruned_t = sum(len(p["idx"]) for p in plan_chunks(out_t, ts_lo=lo, ts_hi=hi))
    pruned_c = sum(len(p["idx"]) for p in plan_chunks(out_c, ts_lo=lo, ts_hi=hi))
    assert pruned_t < pruned_c  # time clustering tightens ts extents
    win_t = decode_dataset(out_t, ts_lo=lo, ts_hi=hi).to_pandas()
    win_ref = ref[(ref["ts"].astype("int64") >= lo) & (ref["ts"].astype("int64") <= hi)]
    assert len(win_t) == len(win_ref)

    # conv point lookup under the time layout
    conv = "conv-00031"
    got_conv = (
        decode_dataset(out_t, conv_id=conv).to_pandas()
        .sort_values("turn_idx").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_conv, ref[ref["conv_id"] == conv].reset_index(drop=True)
    )


@pytest.mark.parametrize("chunk_order", ["conv", "time"])
def test_pushdown_equivalence_randomized(ray_session, tmp_path, chunk_order):
    """Randomized pushdown-equivalence sweep: for random transcripts
    (unicode text, NULs, duplicate ts, hot-ish conv sizes) and random
    conv/turn/ts filter combinations, the selective decode must equal the
    in-memory filter of the source table — under BOTH chunk layouts."""
    import numpy as np
    import pandas as pd
    import ray

    rng = np.random.default_rng(42 if chunk_order == "conv" else 43)
    sizes = rng.integers(1, 60, 30)
    conv_ids = np.repeat(
        np.array([f"c{i:04d}" for i in range(len(sizes))]), sizes
    )
    n = len(conv_ids)
    turn = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)
    ts = rng.integers(0, 10**7, n).astype(np.int64)  # duplicates likely
    texts = [
        "".join(chr(c) for c in rng.integers(0, 0x300, rng.integers(0, 12)))
        for _ in range(n)
    ]
    t = pa.table(
        {
            "conv_id": pa.array(conv_ids),
            "turn_idx": pa.array(turn),
            "role": pa.array(rng.choice(["user", "assistant", "tool"], n)),
            "text": pa.array(texts),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / f"rand-{chunk_order}")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=3, chunk_rows=128,
        resume=False, chunk_order=chunk_order,
    )
    src = t.to_pandas()
    src["ts_us"] = src["ts"].astype("int64")
    for trial in range(6):
        kw = {}
        m = pd.Series(True, index=src.index)
        if rng.random() < 0.5:
            conv = str(rng.choice(conv_ids))
            kw["conv_id"] = conv
            m &= src["conv_id"] == conv
        if rng.random() < 0.5:
            kw["turn_lo"] = int(rng.integers(0, 40))
            m &= src["turn_idx"] >= kw["turn_lo"]
        if rng.random() < 0.5:
            kw["turn_hi"] = int(rng.integers(0, 60))
            m &= src["turn_idx"] <= kw["turn_hi"]
        if rng.random() < 0.5:
            kw["ts_lo"] = int(rng.integers(0, 10**7))
            m &= src["ts_us"] >= kw["ts_lo"]
        if rng.random() < 0.5:
            kw["ts_hi"] = int(rng.integers(0, 10**7))
            m &= src["ts_us"] <= kw["ts_hi"]
        if not kw:
            kw["columns"] = ["conv_id", "turn_idx", "text"]
        got = decode_dataset(out, **kw).to_pandas()
        exp = src[m]
        assert len(got) == len(exp), (trial, kw, len(got), len(exp))
        if len(got) and "columns" not in kw:
            got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            exp2 = (
                exp.drop(columns=["ts_us"])
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, exp2)


# ---------------------------------------------------------------------------
# trigram Bloom filters — substring data skipping (filters.py)
# ---------------------------------------------------------------------------

def test_trigram_filter_never_false_prunes():
    """Exactness property: EVERY substring (len >= 3) of the indexed bytes
    must test positive — a false prune would silently drop rows."""
    import numpy as np

    from etl_sql_duckdb_parquet__ray.filters import (
        build_trigram_filter, filter_may_contain,
    )

    rng = np.random.default_rng(7)
    corpus = bytes(rng.integers(32, 127, 5000, dtype=np.uint8))
    filt = build_trigram_filter(corpus)
    for _ in range(300):
        lo = int(rng.integers(0, len(corpus) - 20))
        ln = int(rng.integers(3, 20))
        assert filter_may_contain(filt, corpus[lo:lo + ln])
    # short terms and missing filters never prune
    assert filter_may_contain(filt, "ab")
    assert filter_may_contain(None, "anything at all")
    # an absent trigram prunes (the corpus is printable ASCII; \x01 bytes
    # cannot occur)
    assert not filter_may_contain(filt, b"\x01\x01\x01")


def test_trigram_filter_adaptive_sizing():
    from etl_sql_duckdb_parquet__ray.filters import (
        MAX_BITS, MIN_BITS, build_trigram_filter, expected_fpr,
    )

    small = build_trigram_filter(b"abcabcabc")  # 3 distinct trigrams
    assert small["m"] == MIN_BITS
    assert small["n"] == 3
    import numpy as np

    rng = np.random.default_rng(1)
    big = build_trigram_filter(bytes(rng.integers(0, 256, 200000, dtype=np.uint8)))
    assert big["m"] <= MAX_BITS
    assert build_trigram_filter(b"ab") is None
    # observability (ADVICE r3): a filter sized at the 8-bits/trigram
    # design point reports ~5% expected FPR; a clamped one reports the
    # degraded number instead of silently pretending to prune
    assert expected_fpr(small) < 0.01  # tiny load, tiny fpr
    assert expected_fpr(big) > 0.2    # clamp binds: ~100k trigrams in 2^17 bits
    assert np.isnan(expected_fpr({"m": 1024, "b64": ""}))  # pre-"n" record
    assert np.isnan(expected_fpr(None))


def test_tri_fpr_summary_flags_clamped_filters():
    from etl_sql_duckdb_parquet__ray.cli import _tri_fpr_summary
    from etl_sql_duckdb_parquet__ray.filters import build_trigram_filter

    import numpy as np

    rng = np.random.default_rng(2)
    chunks = [
        {"tri_filter": build_trigram_filter(b"hello world, a small chunk")},
        {"tri_filter": build_trigram_filter(
            bytes(rng.integers(0, 256, 300000, dtype=np.uint8))
        )},
        {},  # chunk without a filter
    ]
    s = _tri_fpr_summary(chunks)
    assert 0.0 < s["mean"] < 1.0 and s["max"] > 0.2
    assert s["clamped_pct"] == 50.0
    assert _tri_fpr_summary([{}]) is None


def test_parse_pins_rejects_type_incompatible_codec():
    from etl_sql_duckdb_parquet__ray.cli import _parse_pins

    ok = _parse_pins("ts=delta,role=dict,text=fsst_zstd")
    assert ok == {"ts": "delta", "role": "dict", "text": "fsst_zstd"}
    with pytest.raises(SystemExit, match="cannot encode"):
        _parse_pins("ts=fsst")  # string-only codec on a timestamp
    with pytest.raises(SystemExit, match="cannot encode"):
        _parse_pins("text=delta_delta")  # integer codec on text
    with pytest.raises(SystemExit, match="cannot encode"):
        _parse_pins("role=bss")  # float-only codec
    with pytest.raises(SystemExit, match="unknown codec"):
        _parse_pins("ts=nope")
    with pytest.raises(SystemExit, match="unknown column"):
        _parse_pins("nope=zstd")


@pytest.mark.parametrize("pre", [True, False])
def test_text_filter_pushdown_prunes_and_stays_exact(ray_session, tmp_path, pre):
    """Both encode paths (map-side pre-FSST and plain) must write chunk
    trigram filters that (a) prune every chunk for an absent term and
    (b) never lose a matching row for a present term."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, encode_transcripts, plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(8000, seed=5)
    out = str(tmp_path / f"tf-{pre}")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=1024,
        resume=False, pre_encode=pre, text_filters=True,
    )
    # every chunk record carries a filter
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    recs = load_manifest(out)
    n_chunks = sum(len(r["chunks"]) for r in recs)
    assert n_chunks > 4
    assert all("tri_filter" in c for r in recs for c in r["chunks"])
    # absent term: the manifest alone proves no chunk can match
    assert plan_chunks(out, text_contains="zq#absent#qz") == []
    # present term: exact row set vs a pandas reference
    src = t.to_pandas()
    term = next(s[4:12] for s in src["text"] if s and len(s) > 14)
    got = (
        decode_dataset(out, columns=["conv_id", "turn_idx", "text"],
                       text_contains=term)
        .to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        src[src["text"].fillna("").str.contains(term, regex=False)]
        [["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # and the pruning is real: fewer chunks planned than the full scan
    pruned = sum(len(p["idx"]) for p in plan_chunks(out, text_contains=term))
    assert pruned <= n_chunks


def test_text_contains_exact_without_filters(ray_session, tmp_path):
    """A manifest encoded WITHOUT filters must still answer text_contains
    exactly (no pruning, row filter only)."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, encode_transcripts, plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(4000, seed=9)
    out = str(tmp_path / "nofilt")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=1024,
        resume=False,
    )
    n_all = sum(len(p["idx"]) for p in plan_chunks(out))
    # absent term cannot prune without filters — full plan survives
    assert sum(
        len(p["idx"]) for p in plan_chunks(out, text_contains="zq#absent#qz")
    ) == n_all
    src = t.to_pandas()
    term = next(s[2:9] for s in src["text"] if s and len(s) > 10)
    got = decode_dataset(out, columns=["conv_id", "turn_idx"],
                         text_contains=term).to_pandas()
    exp = src[src["text"].fillna("").str.contains(term, regex=False)]
    assert len(got) == len(exp)


def test_text_search_empty_result_keeps_schema(ray_session, tmp_path):
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import encode_transcripts
    from etl_sql_duckdb_parquet__ray.pipelines.flagship import text_search
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    out = str(tmp_path / "ts-empty")
    encode_transcripts(
        ray.data.from_arrow(generate_transcripts(2000, seed=2)), out,
        num_buckets=2, resume=False, text_filters=True,
    )
    df = text_search(out, "zq#absent#qz")  # returns a pandas DataFrame
    assert list(df.columns) == ["role", "n_hits"]
    assert len(df) == 0


def test_value_set_zone_maps_prune_and_stay_exact(ray_session, tmp_path):
    """Per-chunk distinct-value sets for role/tool: a tool value confined
    to one conversation prunes to that conversation's chunks, row results
    are exact, and an absent value plans zero chunks."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, encode_transcripts, plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(6000, seed=13)
    # plant a rare tool value into one conversation's rows
    cid = np.asarray(t.column("conv_id").cast(pa.large_string()))
    target = cid[0]
    tool = t.column("tool").to_pylist()
    planted = 0
    for i in range(len(tool)):
        if cid[i] == target:
            tool[i] = "rare-tool-x"
            planted += 1
    t = t.set_column(
        t.schema.get_field_index("tool"), "tool", pa.array(tool, type=pa.string())
    )
    out = str(tmp_path / "vset")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=512,
        resume=False,
    )
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    recs = load_manifest(out)
    n_all = sum(len(r["chunks"]) for r in recs)
    assert all(
        "val_sets" in c and "role" in c["val_sets"] and "tool" in c["val_sets"]
        for r in recs for c in r["chunks"]
    )
    kept = sum(
        len(p["idx"]) for p in plan_chunks(out, tool_eq="rare-tool-x")
    )
    assert 0 < kept < n_all
    got = decode_dataset(out, columns=["conv_id", "turn_idx"],
                         tool_eq="rare-tool-x").to_pandas()
    assert len(got) == planted
    assert set(got["conv_id"]) == {target}
    # absent value: zero chunks planned
    assert plan_chunks(out, tool_eq="no-such-tool") == []
    # role filter: exact row count (role cycles through every chunk — no
    # pruning, but the row filter must still be exact)
    src = t.to_pandas()
    got_role = decode_dataset(out, columns=["conv_id"], role_eq="system").to_pandas()
    assert len(got_role) == (src["role"] == "system").sum()


def test_multi_conv_batch_lookup(ray_session, tmp_path):
    """conv_ids batch point lookup: plans only the distinct home buckets'
    records, returns exactly the requested conversations' rows, and falls
    back safely when a requested conversation is in the salted hot set."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, encode_transcripts, plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(12000, seed=31)
    out = str(tmp_path / "multi")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=8, chunk_rows=1024,
        resume=False,
    )
    src = t.to_pandas()
    convs = sorted(src["conv_id"].unique())
    want = [convs[0], convs[7], convs[23], convs[101 % len(convs)]]
    got = (
        decode_dataset(out, conv_ids=want)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = (
        src[src["conv_id"].isin(want)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # the plan touches at most len(want) bucket files (home buckets only)
    plan = plan_chunks(out, conv_ids=want)
    assert 0 < len(plan) <= len(want)
    # conv_id and conv_ids are mutually exclusive
    with pytest.raises(ValueError):
        plan_chunks(out, conv_id=want[0], conv_ids=want)
    # empty lookups plan nothing and decode to an empty typed dataset
    assert plan_chunks(out, conv_ids=["conv-does-not-exist"]) == []
    empty = decode_dataset(out, columns=["conv_id"],
                           conv_ids=["conv-does-not-exist"]).to_pandas()
    assert len(empty) == 0


def test_multi_conv_lookup_with_hot_conversation(ray_session, tmp_path):
    """A salted hot conversation in the batch forces the zone-scan
    fallback; results stay exact across its salted chunks."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, encode_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.state.manifest import load_run_meta

    small = generate_transcripts(60, seed=3)
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * 4000),
            "turn_idx": pa.array(range(4000), type=pa.int32()),
            "role": pa.array(["user", "assistant"] * 2000),
            "text": pa.array([f"turn {i}" for i in range(4000)]),
            "tool": pa.array([None] * 4000, type=pa.string()),
            "ts": pa.array(range(4000), type=pa.timestamp("us")),
        }
    )
    both = pa.concat_tables([small, hot])
    out = str(tmp_path / "hotmulti")
    encode_transcripts(
        ray.data.from_arrow(both), out, num_buckets=4, chunk_rows=1024,
        resume=False, hot_convs={"conv-hot": 4000},
    )
    assert "conv-hot" in (load_run_meta(out) or {}).get("hot_convs", {})
    other = small.column("conv_id")[0].as_py()
    got = (
        decode_dataset(out, conv_ids=["conv-hot", other])
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = (
        both.to_pandas()
        .query("conv_id in ('conv-hot', @other)")
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_derive_column_sidecar_roundtrip_and_resume(ray_session, tmp_path):
    """Schema evolution: derive a per-turn token count over an encoded
    corpus as a sidecar column — main files untouched, decode merges it,
    reruns skip completed sidecars, and base decodes don't see it."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, derive_column, encode_transcripts, sidecar_paths,
    )
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    t = generate_transcripts(6000, seed=17)
    out = str(tmp_path / "evolve")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=1024,
        resume=False,
    )
    main_files = {
        r["path"]: os.path.getmtime(r["path"]) for r in load_manifest(out)
    }

    def n_tokens(chunk: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(
            pc.coalesce(chunk.column("text"), ""), r"\s+"
        )
        n = pc.list_value_length(toks).cast(pa.int32())
        # str.split() semantics: empty text -> 0 tokens (regex split of ''
        # yields [''])
        empty = pc.equal(pc.coalesce(chunk.column("text"), ""), "")
        return pc.if_else(empty, pa.scalar(0, pa.int32()), n).combine_chunks()

    summary = derive_column(out, "n_tokens", n_tokens, ["text"])
    assert summary["rows"].sum() == 6000
    # main data files untouched
    for p, m in main_files.items():
        assert os.path.getmtime(p) == m
    # decode merges main + sidecar; values match a pandas reference
    got = (
        decode_dataset(out, columns=["conv_id", "turn_idx", "text", "n_tokens"])
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    src = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = src["text"].fillna("").map(lambda s: len(s.split()) if s else 0)
    assert got["n_tokens"].tolist() == exp.tolist()
    assert got["text"].tolist() == src["text"].tolist()
    # derived-only projection (+ a predicate on a main column)
    only = decode_dataset(out, columns=["n_tokens"], turn_lo=0, turn_hi=3)
    assert only.count() == int((src["turn_idx"] <= 3).sum())
    # base decode (columns=None) keeps the original schema
    base = decode_dataset(out).schema().names
    assert "n_tokens" not in base
    # rerun skips every completed sidecar (bytes_out 0 = skipped)
    again = derive_column(out, "n_tokens", n_tokens, ["text"])
    assert (again["bytes_out"] == 0).all()
    side_bin, side_json = sidecar_paths(
        next(iter(main_files)), "n_tokens"
    )
    assert os.path.exists(side_bin) and os.path.exists(side_json)
    # manifest scan is not confused by sidecar files
    assert len(load_manifest(out)) == 4
    # a sidecar must not SHADOW a base column (ADVICE r3): selective
    # decodes would read the sidecar while full scans read the original
    with pytest.raises(ValueError, match="collides"):
        derive_column(out, "text", n_tokens, ["text"])
    with pytest.raises(ValueError, match="collides"):
        derive_column(out, "role", n_tokens, ["text"])


def test_derived_column_range_pushdown(ray_session, tmp_path):
    """col_ranges on a derived sidecar column: per-chunk min/max zone maps
    prune, the exact row filter matches a pandas reference, and an
    impossible range plans zero chunks."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, derive_column, encode_transcripts, plan_chunks,
    )

    t = generate_transcripts(6000, seed=23)
    out = str(tmp_path / "ranges")
    encode_transcripts(
        ray.data.from_arrow(t), out, num_buckets=4, chunk_rows=512,
        resume=False,
    )

    def text_len(chunk: pa.Table) -> pa.Array:
        import pyarrow as pa
        import pyarrow.compute as pc

        return pc.coalesce(
            pc.utf8_length(chunk.column("text")), pa.scalar(0, pa.int32())
        ).cast(pa.int32()).combine_chunks()

    derive_column(out, "text_len", text_len, ["text"])
    src = t.to_pandas()
    lens = src["text"].fillna("").str.len()
    lo, hi = int(lens.quantile(0.9)), None
    got = decode_dataset(
        out, columns=["conv_id", "turn_idx"], col_ranges={"text_len": (lo, hi)}
    ).to_pandas()
    assert len(got) == int((lens >= lo).sum())
    # pruning really happens for a selective range
    n_all = sum(len(p["idx"]) for p in plan_chunks(out))
    n_sel = sum(
        len(p["idx"])
        for p in plan_chunks(out, col_ranges={"text_len": (lo, hi)})
    )
    assert n_sel <= n_all
    mx = int(lens.max())
    assert plan_chunks(out, col_ranges={"text_len": (mx + 1, None)}) == []
    # bounded-both-sides + compose with a main-column predicate
    both = decode_dataset(
        out, columns=["turn_idx"], turn_lo=1,
        col_ranges={"text_len": (10, 20)},
    ).to_pandas()
    ref = src[(src["turn_idx"] >= 1) & lens.between(10, 20)]
    assert len(both) == len(ref)


def test_col_ranges_without_columns_and_stale_sidecar_invalidation(
    ray_session, tmp_path
):
    """Two review regressions: (a) col_ranges on a derived column must work
    with columns=None (filter-only sidecar load, base output schema);
    (b) re-encoding a directory must invalidate sidecars describing the
    OLD corpus instead of silently attaching them to the new rows."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset, derive_column, encode_transcripts, sidecar_paths,
    )
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    t = generate_transcripts(3000, seed=41)
    out = str(tmp_path / "rev")
    encode_transcripts(ray.data.from_arrow(t), out, num_buckets=2,
                       chunk_rows=512, resume=False)

    def text_len(chunk: pa.Table) -> pa.Array:
        import pyarrow as pa
        import pyarrow.compute as pc

        return pc.coalesce(
            pc.utf8_length(chunk.column("text")), pa.scalar(0, pa.int32())
        ).cast(pa.int32()).combine_chunks()

    derive_column(out, "text_len", text_len, ["text"])
    src = t.to_pandas()
    lens = src["text"].fillna("").str.len()
    lo = int(lens.quantile(0.5))
    # (a) columns=None + derived col_ranges: rows exact, base schema kept
    got = decode_dataset(out, col_ranges={"text_len": (lo, None)}).to_pandas()
    assert len(got) == int((lens >= lo).sum())
    assert "text_len" not in got.columns
    assert set(got.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    # (b) re-encode a DIFFERENT corpus into the same dir: sidecars must die
    t2 = generate_transcripts(5000, seed=42)
    encode_transcripts(ray.data.from_arrow(t2), out, num_buckets=2,
                       chunk_rows=512, resume=False)
    for r in load_manifest(out):
        sbin, sjson = sidecar_paths(r["path"], "text_len")
        assert not os.path.exists(sbin) and not os.path.exists(sjson)
    # a fresh derive over the new corpus is exact again
    derive_column(out, "text_len", text_len, ["text"])
    lens2 = t2.to_pandas()["text"].fillna("").str.len()
    lo2 = int(lens2.quantile(0.5))
    got2 = decode_dataset(
        out, columns=["turn_idx"], col_ranges={"text_len": (lo2, None)}
    ).count()
    assert got2 == int((lens2 >= lo2).sum())


def test_codec_overrides_pin_and_roundtrip(ray_session, table, tmp_path):
    """Production pin: codec_overrides skips per-chunk selection for the
    pinned columns (manifest records exactly the pinned codec) and the
    decode stays bit-identical. Measured (BASELINE.md): ~13% of the 3M-turn
    encode wall at identical bytes/turn on data where the selector would
    pick the same codecs anyway."""
    import ray

    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    ds = ray.data.from_arrow(table)
    out = str(tmp_path / "pinned")
    pins = {"conv_id": "zstd", "turn_idx": "delta_delta", "role": "dict",
            "tool": "dict", "ts": "delta"}
    encode_transcripts(ds, out, num_buckets=4, chunk_rows=4096,
                       codec_overrides=pins)
    assert roundtrip_ok(ds, out)
    for rec in load_manifest(out):
        for c in rec["chunks"]:
            for col, name in pins.items():
                assert c["codecs"][col] == name


def test_codec_override_beats_shared_codec(ray_session, table, tmp_path):
    """Explicit pin precedence: with pre_encode=False the broadcast-trained
    shared text codec would normally encode `text`; a text pin must win
    (review fix — the shared-codec branch used to shadow it)."""
    import ray

    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    ds = ray.data.from_arrow(table)
    out = str(tmp_path / "pin_text")
    encode_transcripts(ds, out, num_buckets=2, chunk_rows=4096,
                       pre_encode=False, codec_overrides={"text": "zstd"})
    assert roundtrip_ok(ds, out)
    for rec in load_manifest(out):
        for c in rec["chunks"]:
            assert c["codecs"]["text"] == "zstd"


def test_selector_cache_adapts_to_mid_corpus_drift(ray_session, tmp_path):
    """The cross-chunk probe cache must not pin a codec across a REAL
    distribution change: conversations whose ts is near-monotone (delta
    codecs win) mixed with conversations whose ts is wide-range random
    (zstd/for_bitpack-ish territory). Buckets hash-mix both regimes, so a
    single worker-lifetime cache sees drifting chunks; the per-chunk stats
    gate must re-probe and the manifest must show BOTH codec families —
    and the roundtrip must stay bit-identical."""
    import numpy as np
    import ray

    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    rng = np.random.default_rng(5)
    base = generate_transcripts(40000, seed=33)
    ts = np.asarray(base.column("ts").cast(pa.int64())).copy()
    # second half of rows: scramble ts to huge random values (distinct
    # regime; nulls kept out to keep the stats comparable)
    half = len(ts) // 2
    ts[half:] = rng.integers(10**15, 10**18, size=len(ts) - half)
    drifted = base.set_column(
        base.schema.get_field_index("ts"), "ts",
        pa.array(ts, type=pa.int64()).cast(base.column("ts").type),
    )
    ds = ray.data.from_arrow(drifted)
    out = str(tmp_path / "drift")
    encode_transcripts(ds, out, num_buckets=2, chunk_rows=4096)
    codecs_seen = set()
    for rec in load_manifest(out):
        for ch in rec["chunks"]:
            codecs_seen.add(ch["codecs"]["ts"])
    # both regimes must be represented: a pinned/stale cache would show one
    assert len(codecs_seen) >= 2, codecs_seen
    assert roundtrip_ok(ds, out)
