"""Chunk container: multi-column encode/decode, checksums, file framing."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_sql_duckdb_parquet__ray.chunk import (
    chunk_header,
    decode_chunk,
    encode_chunk,
    iter_chunks,
    read_chunk_file,
    write_chunk_file,
)
from etl_sql_duckdb_parquet__ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def sorted_transcripts():
    t = generate_transcripts(5000, seed=11)
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(idx)


def test_generator_schema_and_determinism():
    a = generate_transcripts(2000, seed=5)
    b = generate_transcripts(2000, seed=5)
    assert a.schema.equals(TRANSCRIPT_SCHEMA)
    assert a.equals(b)
    assert a.num_rows == 2000
    assert a.column("tool").null_count > 0
    # turn_idx contiguous per conversation
    df = a.to_pandas()
    for _, g in list(df.groupby("conv_id"))[:20]:
        assert (np.sort(g["turn_idx"].values) == np.arange(len(g))).all()


def test_chunk_roundtrip_bit_identical(sorted_transcripts):
    chunk, summary = encode_chunk(sorted_transcripts)
    out = decode_chunk(chunk)
    assert out.equals(sorted_transcripts)
    assert summary["rows"] == sorted_transcripts.num_rows
    assert set(summary["codecs"]) == set(TRANSCRIPT_SCHEMA.names)


def test_chunk_checksum_detects_corruption(sorted_transcripts):
    chunk, _ = encode_chunk(sorted_transcripts.slice(0, 500))
    bad = bytearray(chunk)
    bad[-10] ^= 0xFF  # flip a payload byte
    with pytest.raises((ValueError, Exception)):
        decode_chunk(bytes(bad))


def test_chunk_file_framing(tmp_path, sorted_transcripts):
    chunks = [
        encode_chunk(sorted_transcripts.slice(i, 1000))[0] for i in range(0, 5000, 1000)
    ]
    path = str(tmp_path / "part-00000.bin")
    write_chunk_file(path, chunks)
    assert os.path.exists(path)
    assert len(list(iter_chunks(path))) == 5
    table = read_chunk_file(path)
    assert table.equals(sorted_transcripts.combine_chunks())


def test_chunk_header_extra(sorted_transcripts):
    chunk, _ = encode_chunk(
        sorted_transcripts.slice(0, 100), extra={"bucket": 3, "conv_range": ["a", "b"]}
    )
    hdr = chunk_header(chunk)
    assert hdr["extra"]["bucket"] == 3
    assert hdr["n_rows"] == 100


def test_codec_override_and_size_budget(sorted_transcripts):
    import io

    import pyarrow.parquet as pq

    chunk, summary = encode_chunk(sorted_transcripts)
    buf = io.BytesIO()
    pq.write_table(sorted_transcripts, buf, compression="zstd")
    # north-rule size budget: encoded bytes <= Parquet+zstd of the same data
    assert summary["bytes_out"] <= buf.tell()


def test_selective_read_detects_corruption(tmp_path):
    """A byte flip inside a column payload must raise a checksum ValueError
    through the seek-read path too (same guarantee as whole-chunk decode)."""
    import pyarrow.compute as pc
    import pytest

    from etl_sql_duckdb_parquet__ray.chunk import (
        chunk_spans,
        read_chunk_columns,
        write_chunk_file,
        encode_chunk,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(2000, seed=8)
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    blob, _ = encode_chunk(t)
    path = str(tmp_path / "c.bin")
    write_chunk_file(path, [blob])
    (off, ln) = chunk_spans(path)[0]
    # flip a byte deep inside the payload region (past the header)
    with open(path, "r+b") as f:
        f.seek(off + ln - 100)
        b = f.read(1)
        f.seek(off + ln - 100)
        f.write(bytes([b[0] ^ 0xFF]))
    spans = chunk_spans(path)
    with pytest.raises(ValueError, match="checksum"):
        for col in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]:
            read_chunk_columns(path, spans[0], [col])
