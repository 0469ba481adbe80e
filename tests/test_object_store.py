"""Object-store-scheme I/O through the engine's own read/write paths.

The reference pushes/pulls directories to S3 (``src/s3_handler.py:11-126``);
Ray Data reads object stores natively through fsspec/pyarrow filesystems, so
the engine claims ``read_parquet("s3://…")`` works unchanged. No network in
this sandbox — the ``file://`` scheme exercises the same URI-parsing +
filesystem-resolution code path end-to-end, which is the part the engine
owns."""

import os

import pyarrow.parquet as pq

from etl_sql_duckdb_parquet__ray.stages.relational import read_table


def test_read_parquet_uri_scheme_end_to_end(ray_session, sf_dir):
    """file:// URI through the SAME engine helper used by every pipeline."""
    local = read_table(sf_dir, "events").count()
    via_uri = read_table(f"file://{os.path.abspath(sf_dir)}", "events").count()
    assert local == via_uri > 0


def test_encode_from_uri_source_roundtrips(ray_session, tmp_path, sf_dir):
    """Full engine pipeline with a scheme'd source: derive transcripts from
    a file:// read, encode, decode, count matches the local-path run."""
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
    )

    src = ray.data.read_parquet(f"file://{os.path.abspath(sf_dir)}/events.parquet")
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows

    def to_transcripts(t):
        import pyarrow as pa

        return pa.table(
            {
                "conv_id": t.column("user_id").cast(pa.string()),
                "turn_idx": t.column("event_id").cast(pa.int32()),
                "role": t.column("event_type"),
                "text": t.column("props"),
                "tool": t.column("event_type"),
                "ts": t.column("ts"),
            }
        )

    ds = src.map_batches(to_transcripts, batch_format="pyarrow")
    out = str(tmp_path / "uri-enc")
    encode_transcripts(ds, out, num_buckets=4, resume=False)
    assert decode_dataset(out).count() == n_events


def test_write_parquet_uri_scheme(ray_session, tmp_path):
    import ray

    ds = ray.data.range(1000)
    dest = str(tmp_path / "uri-out")
    ds.write_parquet(f"file://{dest}")
    back = ray.data.read_parquet(dest).count()
    assert back == 1000


def test_orc_roundtrip_and_projection(ray_session, tmp_path):
    """ORC interchange: write sharded ORC, read back losslessly; column
    projection returns only requested columns; idempotent re-write does
    not duplicate files (content-addressed names)."""
    import os

    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.sources.ingest import read_orc, write_orc

    df = pd.DataFrame(
        {
            "ID": [1, 2, 3, 4],           # name normalization: ID -> id
            "txt": ["a", "b", None, "d"],
            "val": [1.5, 2.5, 3.5, None],
        }
    )
    out = str(tmp_path / "orc")
    man1 = write_orc(ray.data.from_pandas(df), out)
    assert man1["rows"].sum() == 4
    files1 = sorted(os.listdir(out))

    back = (
        read_orc(out)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(back.columns) == ["id", "txt", "val"]
    pd.testing.assert_series_equal(
        back["txt"], df["txt"].rename("txt"), check_names=False
    )

    # projection pushdown: only requested columns come back
    proj = read_orc(out, columns=["id"]).to_pandas()
    assert list(proj.columns) == ["id"] and len(proj) == 4

    # idempotent rewrite: same content -> same file names, no growth
    write_orc(ray.data.from_pandas(df), out)
    assert sorted(os.listdir(out)) == files1


def test_ipc_roundtrip_and_projection(ray_session, tmp_path):
    """Arrow IPC (Feather V2) interchange: same contract as the ORC pair —
    lossless roundtrip, projection pushdown, name normalization, and
    content-addressed idempotent rewrites."""
    import os

    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.sources.ingest import read_ipc, write_ipc

    df = pd.DataFrame(
        {
            "ID": [1, 2, 3, 4],           # name normalization: ID -> id
            "txt": ["a", "b", None, "d"],
            "val": [1.5, 2.5, 3.5, None],
        }
    )
    out = str(tmp_path / "ipc")
    man1 = write_ipc(ray.data.from_pandas(df), out)
    assert man1["rows"].sum() == 4
    files1 = sorted(os.listdir(out))
    assert files1 and all(f.endswith(".arrow") for f in files1)

    back = (
        read_ipc(out)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(back.columns) == ["id", "txt", "val"]
    pd.testing.assert_series_equal(
        back["txt"], df["txt"].rename("txt"), check_names=False
    )

    proj = read_ipc(out, columns=["id"]).to_pandas()
    assert list(proj.columns) == ["id"] and len(proj) == 4

    write_ipc(ray.data.from_pandas(df), out)
    assert sorted(os.listdir(out)) == files1


def test_twin_blocks_keep_all_rows(ray_session, tmp_path):
    """Two DISTINCT blocks with byte-identical content (constant data split
    evenly) collide on the content-addressed name; the driver-side twin
    repair must keep every block's rows visible to a directory read (the
    old permutation-invariant sum silently dropped the second block)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.sources.ingest import (
        read_ipc,
        read_orc,
        write_ipc,
        write_orc,
    )

    # two identical blocks, forced as separate Dataset blocks
    t = pa.table({"id": [7, 7, 7], "txt": ["x", "x", "x"]})
    ds = ray.data.from_arrow([t, t])

    out = str(tmp_path / "ipc_twin")
    man = write_ipc(ds, out)
    assert man["rows"].sum() == 6
    assert man["path"].is_unique          # twins got distinct names
    assert len(read_ipc(out).to_pandas()) == 6
    files1 = sorted(os.listdir(out))

    # idempotent re-run: same claims, same alias set, no growth
    man2 = write_ipc(ray.data.from_arrow([t, t]), out)
    assert man2["rows"].sum() == 6
    assert sorted(os.listdir(out)) == files1

    out2 = str(tmp_path / "orc_twin")
    man3 = write_orc(ds, out2)
    assert man3["rows"].sum() == 6 and man3["path"].is_unique
    assert len(read_orc(out2).to_pandas()) == 6


def test_block_name_order_sensitive(ray_session):
    """Permutations of the same multiset of rows must not collide."""
    import pandas as pd
    import pyarrow as pa

    from etl_sql_duckdb_parquet__ray.sources.ingest import _block_content_name

    a = pa.table({"v": [1, 2, 3]})
    b = pa.table({"v": [3, 2, 1]})
    assert _block_content_name(a) != _block_content_name(b)
    assert _block_content_name(a) == _block_content_name(pa.table({"v": [1, 2, 3]}))
