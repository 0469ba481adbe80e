"""RENAME COLUMN schema evolution (pipelines/encode.py:rename_column):
metadata-only display renames — every decode path presents the visible
name, the stored (old) name stops resolving, renames compose and clear,
collide loudly, and survive a purge rewrite. Structural columns are
protected."""

import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.deletes import purge_deleted
from etl_sql_duckdb_parquet__ray.pipelines.encode import (
    decode_dataset,
    derive_column,
    drop_column,
    encode_transcripts,
    load_renames,
    rename_column,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

N_ROWS = 6000


@pytest.fixture()
def corpus(ray_session, tmp_path):
    import ray

    table = generate_transcripts(N_ROWS, seed=23)
    out = str(tmp_path / "enc")
    encode_transcripts(
        ray.data.from_arrow(table), out, num_buckets=4, chunk_rows=1024
    )
    return out, table


def _sorted(df):
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_rename_visible_everywhere_and_old_name_dead(corpus):
    out, table = corpus
    info = rename_column(out, "role", "speaker")
    assert info == {"stored": "role", "visible": "speaker",
                    "renamed": {"role": "speaker"}}

    # full scan presents the visible name with identical values
    got = _sorted(decode_dataset(out).to_pandas())
    want = _sorted(table.rename_columns(
        ["speaker" if c == "role" else c for c in table.column_names]
    ).to_pandas())
    assert list(got.columns) == list(want.columns)
    assert pa.Table.from_pandas(got).equals(pa.Table.from_pandas(want))

    # projection by the visible name works; the stored name raises
    proj = decode_dataset(out, columns=["conv_id", "speaker"]).to_pandas()
    assert set(proj.columns) == {"conv_id", "speaker"}
    with pytest.raises(ValueError, match="renamed to 'speaker'"):
        decode_dataset(out, columns=["conv_id", "role"])

    # fixed-semantics predicate still addresses the role column
    assistant = decode_dataset(out, role_eq="assistant").to_pandas()
    assert len(assistant) and (assistant["speaker"] == "assistant").all()


def test_rename_compose_clear_and_collisions(corpus):
    out, _ = corpus
    rename_column(out, "role", "speaker")
    # compose: rename the renamed column; stored key stays 'role'
    rename_column(out, "speaker", "who")
    assert load_renames(out) == {"role": "who"}
    # rename back to the stored name clears the mapping
    rename_column(out, "who", "role")
    assert load_renames(out) == {}

    # collisions and protections
    with pytest.raises(ValueError, match="structural"):
        rename_column(out, "conv_id", "cid")
    with pytest.raises(ValueError, match="structural"):
        rename_column(out, "role", "turn_idx")
    with pytest.raises(ValueError, match="collides"):
        rename_column(out, "role", "text")
    with pytest.raises(ValueError, match="not visible"):
        rename_column(out, "nope", "x")
    rename_column(out, "role", "speaker")
    with pytest.raises(ValueError, match="collides"):
        # 'role' is renamed away but still a STORED name — ambiguous target
        rename_column(out, "tool", "role")


def test_rename_sidecar_refused_and_derive_collision(corpus):
    out, _ = corpus

    def nch(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        return pc.utf8_length(t.column("text")).cast(pa.int64())

    derive_column(out, "n_chars", nch, ["text"])
    with pytest.raises(ValueError, match="sidecar"):
        rename_column(out, "n_chars", "len")
    with pytest.raises(ValueError, match="collides"):
        rename_column(out, "role", "n_chars")
    # deriving a column under a rename TARGET must also collide
    rename_column(out, "role", "speaker")
    with pytest.raises(ValueError, match="collides"):
        derive_column(out, "speaker", nch, ["text"])


def test_rename_drop_interplay_and_purge_carry(corpus, tmp_path):
    out, table = corpus
    rename_column(out, "tool", "tool_name")
    # drop by the visible name works; by the stored name raises
    with pytest.raises(ValueError, match="renamed to 'tool_name'"):
        drop_column(out, "tool")
    drop_column(out, "tool_name")
    got = decode_dataset(out).to_pandas()
    assert "tool" not in got.columns and "tool_name" not in got.columns

    # a rename on a live column survives the physical purge rewrite
    rename_column(out, "role", "speaker")
    dest = str(tmp_path / "purged")
    purge_deleted(out, dest)
    assert load_renames(dest) == {"role": "speaker"}
    purged = _sorted(decode_dataset(dest).to_pandas())
    want = _sorted(
        table.drop_columns(["tool"]).rename_columns(
            ["speaker" if c == "role" else c
             for c in table.column_names if c != "tool"]
        ).to_pandas()
    )
    assert list(purged.columns) == list(want.columns)
    assert pa.Table.from_pandas(purged).equals(pa.Table.from_pandas(want))


def test_rename_survives_later_drop(corpus):
    """Regression: drop_column must MERGE into _schema.json — writing the
    dropped list fresh used to clobber the rename mapping, silently
    reverting a renamed column to its stored name on the next read."""
    out, table = corpus
    rename_column(out, "role", "speaker2")
    drop_column(out, "tool")
    got = decode_dataset(out).to_pandas()
    assert "speaker2" in got.columns and "role" not in got.columns
    assert "tool" not in got.columns
    rename_column(out, "speaker2", "role")  # restore for sibling tests
