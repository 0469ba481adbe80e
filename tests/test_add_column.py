"""ADD COLUMN schema evolution (pipelines/encode.py:add_column_default):
a constant default lands metadata-only in _schema.json, every decode path
synthesizes it, collisions/types are validated at DDL time, drop removes
the entry, and a purge rewrite MATERIALIZES the column physically."""

import os

import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
    delete_convs,
    purge_deleted,
)
from etl_sql_duckdb_parquet__ray.pipelines.encode import (
    add_column_default,
    decode_dataset,
    drop_column,
    encode_transcripts,
    load_added_columns,
    rename_column,
    schema_meta_path,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

N_ROWS = 5000


@pytest.fixture()
def corpus(ray_session, tmp_path):
    import ray

    table = generate_transcripts(N_ROWS, seed=17)
    out = str(tmp_path / "enc")
    encode_transcripts(
        ray.data.from_arrow(table), out, num_buckets=4, chunk_rows=1024
    )
    return out, table


def test_added_column_visible_everywhere(corpus):
    out, table = corpus
    add_column_default(out, "corpus_tag", "v1-clean", "string")
    add_column_default(out, "schema_ver", 3, "int64")

    full = decode_dataset(out).to_pandas()
    assert len(full) == N_ROWS
    assert (full["corpus_tag"] == "v1-clean").all()
    assert (full["schema_ver"] == 3).all()

    # projection: mixed real + added, and added-only
    proj = decode_dataset(out, columns=["text", "schema_ver"]).to_pandas()
    assert list(proj.columns) == ["text", "schema_ver"]
    assert (proj["schema_ver"] == 3).all() and len(proj) == N_ROWS
    only = decode_dataset(out, columns=["corpus_tag"]).to_pandas()
    assert list(only.columns) == ["corpus_tag"] and len(only) == N_ROWS

    # pushdown read paths still synthesize it
    conv = table.column("conv_id")[0].as_py()
    point = decode_dataset(out, conv_id=conv).to_pandas()
    assert (point["schema_ver"] == 3).all() and len(point) > 0

    # range predicate on the constant: inside -> everything, outside -> 0
    hit = decode_dataset(out, col_ranges={"schema_ver": (1, 5)}).to_pandas()
    assert len(hit) == N_ROWS
    miss = decode_dataset(out, col_ranges={"schema_ver": (4, None)}).to_pandas()
    assert len(miss) == 0


def test_added_column_null_default_and_validation(corpus):
    out, _ = corpus
    add_column_default(out, "maybe", None, "double")
    got = decode_dataset(out, columns=["maybe"]).to_pandas()
    assert got["maybe"].isna().all()

    with pytest.raises(ValueError, match="structural"):
        add_column_default(out, "conv_id", 1, "int64")
    with pytest.raises(ValueError, match="does not fit"):
        add_column_default(out, "bad", "x", "int64")
    with pytest.raises(ValueError, match="not in"):
        add_column_default(out, "bad", 1, "int32")
    with pytest.raises(ValueError, match="collides"):
        add_column_default(out, "text", "x", "string")   # base column
    with pytest.raises(ValueError, match="collides"):
        add_column_default(out, "maybe", 1.0, "double")  # already added


def test_added_column_ddl_interplay(corpus):
    out, _ = corpus
    add_column_default(out, "tag", "t", "string")
    # rename of an added column is refused; rename TARGET collision too
    with pytest.raises(ValueError, match="added column"):
        rename_column(out, "tag", "tag2")
    with pytest.raises(ValueError, match="collides"):
        rename_column(out, "role", "tag")
    # drop removes the entry (kind: added), decode stops synthesizing
    info = drop_column(out, "tag")
    assert info["kind"] == "added"
    assert "tag" not in load_added_columns(out)
    assert "tag" not in decode_dataset(out).to_pandas().columns
    # a dropped BASE column's name stays reserved for added columns
    drop_column(out, "tool")
    with pytest.raises(ValueError, match="collides"):
        add_column_default(out, "tool", "x", "string")


def test_purge_materializes_added_column(corpus, tmp_path):
    out, table = corpus
    add_column_default(out, "corpus_tag", "gold", "string")
    convs = sorted({c.as_py() for c in table.column("conv_id")})
    delete_convs(out, [convs[0]])

    dest = str(tmp_path / "purged")
    purge_deleted(out, dest)
    # the rewrite materialized the constant: no added metadata remains,
    # but the column reads back as real data
    assert "corpus_tag" not in load_added_columns(dest)
    got = decode_dataset(dest).to_pandas()
    assert (got["corpus_tag"] == "gold").all()
    assert convs[0] not in set(got["conv_id"])
    assert len(got) == N_ROWS - (
        table.to_pandas()["conv_id"] == convs[0]
    ).sum()


def test_describe_shows_added_and_epoch(corpus, capsys):
    import json

    from etl_sql_duckdb_parquet__ray.cli import main

    out, table = corpus
    add_column_default(out, "tagged", True, "bool")
    convs = sorted({c.as_py() for c in table.column("conv_id")})
    delete_convs(out, [convs[0]], epoch=2)

    assert main(["describe", "--encoded", out]) == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["added_columns"] == {"tagged": {"value": True, "type": "bool"}}
    assert d["max_tombstone_epoch"] == 2
    assert d["tombstoned_convs"] == 1


def test_fsck_detects_corruption(corpus, capsys):
    import glob
    import json

    from etl_sql_duckdb_parquet__ray.cli import main

    out, _ = corpus
    assert main(["fsck", "--encoded", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_decoded"] == N_ROWS and not rep["corrupt"]

    # flip one payload byte mid-file: fsck must name exactly that file
    victim = sorted(glob.glob(os.path.join(out, "bucket-*.bin")))[0]
    with open(victim, "r+b") as f:
        f.seek(os.path.getsize(victim) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    assert main(["fsck", "--encoded", out]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [c["path"] for c in rep["corrupt"]] == [victim]


def test_fsck_covers_sidecar_files(corpus, capsys):
    import glob
    import json

    import pyarrow.compute as pc

    from etl_sql_duckdb_parquet__ray.cli import main
    from etl_sql_duckdb_parquet__ray.pipelines.encode import derive_column

    out, _ = corpus
    derive_column(
        out, "n_chars",
        lambda cols: pc.utf8_length(cols["text"]).cast(pa.int64()),
        ["text"],
    )
    assert main(["fsck", "--encoded", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["sidecar_files"] == 4 and not rep["corrupt"]

    victim = sorted(glob.glob(os.path.join(out, "column-n_chars-*.bin")))[0]
    with open(victim, "r+b") as f:
        f.seek(os.path.getsize(victim) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    assert main(["fsck", "--encoded", out]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [c["path"] for c in rep["corrupt"]] == [victim]


def test_projection_order_honored_with_added_columns(corpus):
    """Regression (advice r4): added columns were appended after all stored
    columns, so columns=["schema_ver", "text"] came back (text, schema_ver).
    The decode must honor the caller's exact requested order."""
    out, _ = corpus
    add_column_default(out, "schema_ver", 3, "int64")

    proj = decode_dataset(out, columns=["schema_ver", "text"]).to_pandas()
    assert list(proj.columns) == ["schema_ver", "text"]
    assert (proj["schema_ver"] == 3).all() and len(proj) == N_ROWS

    # interleaved: stored, added, stored
    mixed = decode_dataset(
        out, columns=["role", "schema_ver", "conv_id"]
    ).to_pandas()
    assert list(mixed.columns) == ["role", "schema_ver", "conv_id"]
