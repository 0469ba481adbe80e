"""DROP COLUMN schema evolution (pipelines/encode.py:drop_column): base
columns are hidden metadata-only and excluded from every decode path;
sidecar columns are removed physically; a purge/compaction rewrite drops
base columns for real. Structural columns are protected."""

import json
import os

import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.deletes import purge_deleted
from etl_sql_duckdb_parquet__ray.pipelines.encode import (
    decode_dataset,
    derive_column,
    drop_column,
    encode_transcripts,
    load_dropped_columns,
    schema_meta_path,
    sidecar_paths,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

N_ROWS = 6000


@pytest.fixture()
def corpus(ray_session, tmp_path):
    import ray

    table = generate_transcripts(N_ROWS, seed=11)
    out = str(tmp_path / "enc")
    encode_transcripts(
        ray.data.from_arrow(table), out, num_buckets=4, chunk_rows=1024
    )
    return out, table


def _sorted(df):
    return (
        df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_drop_base_column_hidden_everywhere(corpus):
    out, table = corpus
    info = drop_column(out, "tool")
    assert info["kind"] == "base" and info["dropped"] == ["tool"]
    assert load_dropped_columns(out) == ["tool"]

    # full scan: projected away, all other columns bit-identical
    got = _sorted(decode_dataset(out).to_pandas())
    want = _sorted(table.drop_columns(["tool"]).to_pandas())
    assert list(got.columns) == list(want.columns)
    assert pa.Table.from_pandas(got).equals(pa.Table.from_pandas(want))

    # explicit request and pushdown predicate on the dropped column raise
    with pytest.raises(ValueError, match="dropped"):
        decode_dataset(out, columns=["conv_id", "tool"])
    with pytest.raises(ValueError, match="dropped"):
        decode_dataset(out, tool_eq="search")

    # other pushdowns still work and exclude the column
    sel = decode_dataset(out, turn_lo=0, turn_hi=3).to_pandas()
    assert "tool" not in sel.columns and len(sel)

    # idempotent for base columns
    again = drop_column(out, "tool")
    assert again.get("already") is True

    # a second base drop merges (concurrent-writer lock path exercised
    # sequentially; the excl_lock race test lives with the tombstones)
    drop_column(out, "ts")
    assert load_dropped_columns(out) == ["tool", "ts"]
    with pytest.raises(ValueError, match="dropped"):
        decode_dataset(out, ts_lo=0)


def test_structural_and_unknown_columns_rejected(corpus):
    out, _ = corpus
    for structural in ("conv_id", "turn_idx"):
        with pytest.raises(ValueError, match="structural"):
            drop_column(out, structural)
    with pytest.raises(ValueError, match="not found"):
        drop_column(out, "nope")
    assert not os.path.exists(schema_meta_path(out))


def test_drop_sidecar_column_is_physical(corpus):
    out, _ = corpus

    def char_count(chunk):
        import pyarrow.compute as pc

        return pc.coalesce(
            pc.utf8_length(chunk.column("text")), pa.scalar(0, pa.int32())
        ).cast(pa.int32())

    derive_column(out, "nchars", char_count, ["text"])
    recs = load_manifest(out)
    files = [p for r in recs for p in sidecar_paths(r["path"], "nchars")]
    assert all(os.path.exists(p) for p in files)
    got = decode_dataset(out, columns=["conv_id", "nchars"]).to_pandas()
    assert "nchars" in got.columns

    info = drop_column(out, "nchars")
    assert info["kind"] == "sidecar"
    assert info["n_files_removed"] == len(files)
    assert not any(os.path.exists(p) for p in files)
    # no metadata entry — the column is simply gone
    assert load_dropped_columns(out) == []
    with pytest.raises(Exception):
        decode_dataset(out, columns=["conv_id", "nchars"]).to_pandas()
    # re-dropping a removed sidecar: nothing anywhere -> not found
    with pytest.raises(ValueError, match="not found"):
        drop_column(out, "nchars")


def test_purge_rewrite_removes_base_column_physically(corpus, tmp_path):
    out, table = corpus
    # drop the hardest column: text (the pre-encode path must auto-disable
    # when the re-encode input has no text column)
    drop_column(out, "text")
    dest = str(tmp_path / "purged")
    purge_deleted(out, dest)
    # the new corpus has no schema file and no text column anywhere
    assert not os.path.exists(schema_meta_path(dest))
    recs = load_manifest(dest)
    with open(recs[0]["path"], "rb") as f:
        import struct

        from etl_sql_duckdb_parquet__ray.chunk import chunk_spans

        f.seek(chunk_spans(recs[0]["path"])[0][0])
        (hlen,) = struct.unpack("<I", f.read(4))
        cols = [c["name"] for c in json.loads(f.read(hlen))["columns"]]
    assert "text" not in cols
    got = _sorted(decode_dataset(dest).to_pandas())
    want = _sorted(table.drop_columns(["text"]).to_pandas())
    assert pa.Table.from_pandas(got).equals(pa.Table.from_pandas(want))
