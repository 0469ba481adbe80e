"""On-disk encoded-chunk container format.

A *chunk* is one encoded horizontal slice of the transcript table (all
columns, ``chunk_rows`` rows, contiguous under ``(conv_id, turn_idx)``
ordering). A *chunk file* holds all chunks of one hash-bucket partition:

    file  := b"RTCF" u32 n_chunks (u64 chunk_len, chunk_bytes)*
    chunk := u32 header_len, header_json, column payloads (offsets in header)

The header carries per-column codec metadata, the pre-encode SHA-256
checksum (the columnar analog of the reference's per-row ``row_hash``,
``src/etl/ingest.py:56-58``) and the chunk's ``(conv_id, turn_idx)`` range
so salted sub-chunks of a hot conversation reassemble in order.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Iterator

import pyarrow as pa

from .codecs import column_checksum, decode_column, encode_column

MAGIC = b"RTCF"


def encode_chunk(
    table: pa.Table,
    codec_overrides: dict[str, str] | None = None,
    shared_codecs: dict[str, Any] | None = None,
    with_checksums: bool = True,
    extra: dict | None = None,
    mode: str = "balanced",
    preencoded: dict[str, tuple[bytes, dict]] | None = None,
    order: list[str] | None = None,
    selector_cache: dict | None = None,
) -> tuple[bytes, dict]:
    """Encode one table slice -> (chunk bytes, summary for the manifest).

    ``preencoded`` supplies columns whose (payload, meta) were already built
    upstream (the pre-shuffle row-FSST path); ``order`` fixes the on-disk
    column order when preencoded columns are absent from ``table``.
    ``selector_cache`` (a caller-held dict, typically per bucket) enables
    cross-chunk probe reuse in the codec selector — see
    ``codecs.selector.select_codec_cached``.
    """
    codec_overrides = codec_overrides or {}
    shared_codecs = shared_codecs or {}
    preencoded = preencoded or {}
    cols = []
    payloads = []
    off = 0
    bytes_in = 0
    names = order or list(table.column_names)
    for name in names:
        if name in preencoded:
            payload, meta = preencoded[name]
            bytes_in += meta.pop("bytes_in", len(payload))
        else:
            arr = table.column(name).combine_chunks()
            bytes_in += arr.nbytes
            if name in codec_overrides:
                # an explicit per-column pin beats the broadcast-trained
                # shared codec: the caller asked for THIS codec
                payload, meta = encode_column(arr, codec_overrides[name], mode=mode)
            elif name in shared_codecs:
                payload, meta = _encode_with_instance(arr, shared_codecs[name])
            else:
                payload, meta = encode_column(
                    arr, None, mode=mode,
                    selector_cache=selector_cache, cache_key=name,
                )
            if with_checksums:
                meta["sha256"] = column_checksum(arr)
        cols.append({"name": name, "meta": meta, "off": off, "len": len(payload)})
        payloads.append(payload)
        off += len(payload)
    header: dict = {"n_rows": table.num_rows, "columns": cols}
    if extra:
        header["extra"] = extra
    hjson = json.dumps(header, separators=(",", ":")).encode()
    chunk = struct.pack("<I", len(hjson)) + hjson + b"".join(payloads)
    summary = {
        "rows": table.num_rows,
        "bytes_in": bytes_in,
        "bytes_out": len(chunk),
        "codecs": {c["name"]: c["meta"]["codec"] for c in cols},
    }
    return chunk, summary


def _encode_with_instance(arr: pa.Array, codec) -> tuple[bytes, dict]:
    """Encode with a pre-built codec instance (e.g. an FSST codec holding a
    shared/broadcast symbol table). Reuses the null-handling wrapper by
    temporarily registering the instance under its own name."""
    from .codecs import REGISTRY

    prev = REGISTRY.get(codec.name)
    REGISTRY[codec.name] = codec
    try:
        return encode_column(arr, codec.name)
    finally:
        if prev is not None:
            REGISTRY[codec.name] = prev


def _decode_payload(payload: bytes, col: dict) -> pa.Array:
    """Decode + checksum-verify one column payload against its header meta."""
    if "sha256_enc" in col["meta"]:
        # pre-encoded columns checksum the ENCODED payload (the decoded
        # bytes never existed in one place on the encode side)
        import hashlib

        got = hashlib.sha256(payload).hexdigest()
        if got != col["meta"]["sha256_enc"]:
            raise ValueError(
                f"checksum mismatch on column {col['name']!r} (encoded): "
                f"{got} != {col['meta']['sha256_enc']}"
            )
    arr = decode_column(payload, col["meta"])
    if "sha256" in col["meta"]:
        got = column_checksum(arr)
        if got != col["meta"]["sha256"]:
            raise ValueError(
                f"checksum mismatch on column {col['name']!r}: "
                f"{got} != {col['meta']['sha256']}"
            )
    return arr


def _select_cols(header: dict, columns: list[str] | None) -> list[dict]:
    if columns is None:
        return header["columns"]
    by_name = {c["name"]: c for c in header["columns"]}
    missing = [n for n in columns if n not in by_name]
    if missing:
        raise KeyError(f"columns not in chunk: {missing}")
    return [by_name[n] for n in columns]


def decode_chunk(chunk: bytes, columns: list[str] | None = None) -> pa.Table:
    """Decode a chunk, optionally PROJECTING to ``columns`` (in that order):
    unselected columns are never decoded — the per-column offsets in the
    header make projection free of both decode CPU and checksum work."""
    (hlen,) = struct.unpack_from("<I", chunk, 0)
    header = json.loads(chunk[4 : 4 + hlen])
    base = 4 + hlen
    arrays, names = [], []
    for col in _select_cols(header, columns):
        payload = chunk[base + col["off"] : base + col["off"] + col["len"]]
        arrays.append(_decode_payload(payload, col))
        names.append(col["name"])
    return pa.table(dict(zip(names, arrays)))


def assemble_fsst_payload(
    codes: bytes,
    lits: bytes,
    dense_lengths,
    null_mask,
    n_rows: int,
    table: list[bytes],
    arrow_type: str = "string",
    post_zstd: bool = True,
    with_checksum: bool = True,
) -> tuple[bytes, dict]:
    """Build a column (payload, meta) byte-compatible with ``encode_column``
    + ``FsstCodec``/``FsstZstdCodec`` from PRE-ENCODED per-row streams —
    the post-shuffle half of the pre-shuffle row-FSST path: the shuffled
    binary columns' value buffers ARE the concatenated code/literal streams,
    so assembly is packing + optional zstd, no re-compression."""
    import hashlib

    import numpy as np

    from .codecs.base import pack_sections, zstd_compress, zstd_compress_fsst
    from .codecs.bitpack import bitpack, required_width

    dense_lengths = np.asarray(dense_lengths, dtype=np.int64)
    lw = required_width(int(dense_lengths.max())) if len(dense_lengths) else 0
    lens_packed = bitpack(dense_lengths.astype(np.uint64), lw)
    tbl = pack_sections(table) if table else b""
    sections = [tbl, codes, lits, lens_packed]
    vmeta = {
        "lw": lw,
        "n_codes": len(codes),
        "n_lits": len(lits),
        "z": post_zstd,
        "raw": [len(s) for s in sections],
    }
    if post_zstd:
        sections = [zstd_compress_fsst(s) for s in sections]
    codec_payload = pack_sections(sections)
    nulls = int(null_mask.sum()) if null_mask is not None else 0
    validity = (
        zstd_compress(np.packbits(np.asarray(null_mask)).tobytes()) if nulls else b""
    )
    payload = pack_sections([validity, codec_payload])
    meta = {
        "codec": "fsst_zstd" if post_zstd else "fsst",
        "type": arrow_type,
        "n": n_rows,
        "nulls": nulls,
        "vmeta": vmeta,
        "bytes_in": int(dense_lengths.sum()) + 4 * (n_rows + 1),
    }
    if with_checksum:
        meta["sha256_enc"] = hashlib.sha256(payload).hexdigest()
    return payload, meta


def chunk_header(chunk: bytes) -> dict:
    (hlen,) = struct.unpack_from("<I", chunk, 0)
    return json.loads(chunk[4 : 4 + hlen])


def write_chunk_file(path: str, chunks: list[bytes]) -> int:
    """Atomic write (tmp + rename) so a killed run never leaves a partial
    partition — the unit of resume (SURVEY.md §4). Chunks stream straight
    to the file descriptor: staging them through a BytesIO first doubles
    the memory traffic of every bucket write (measured ~20% of the
    reduce-side encode wall on this host's slow first-touch pages)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(chunks)))
        for c in chunks:
            f.write(struct.pack("<Q", len(c)))
            f.write(c)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return 8 + sum(8 + len(c) for c in chunks)


def iter_chunks(path: str) -> Iterator[bytes]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"{path}: bad magic")
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 8
        yield data[off : off + ln]
        off += ln


def read_chunk_file(path: str) -> pa.Table:
    tables = [decode_chunk(c) for c in iter_chunks(path)]
    return pa.concat_tables(tables) if tables else pa.table({})


def chunk_spans(path: str) -> list[tuple[int, int]]:
    """(offset, length) of each chunk's bytes within a chunk file, by a
    header-only scan (16 seeks for a 16-chunk file — no payload I/O).
    Chunk order equals the manifest record's ``chunks`` list order."""
    spans = []
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: bad magic")
        (n,) = struct.unpack("<I", f.read(4))
        off = 8
        for _ in range(n):
            f.seek(off)
            (ln,) = struct.unpack("<Q", f.read(8))
            spans.append((off + 8, ln))
            off += 8 + ln
    return spans


def read_chunk_columns(
    path: str, span: tuple[int, int], columns: list[str] | None = None
) -> pa.Table:
    """Selective read of one chunk: header first, then ONLY the selected
    columns' byte ranges (seek + exact-length reads). For a text-heavy
    transcript chunk, projecting to the fixed-width columns skips ~90% of
    the file's bytes — this is the I/O half of projection pushdown
    (``decode_chunk(columns=...)`` is the CPU half, used when the chunk
    bytes are already in memory)."""
    off, ln = span
    with open(path, "rb") as f:
        f.seek(off)
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen))
        base = off + 4 + hlen
        arrays, names = [], []
        for col in _select_cols(header, columns):
            f.seek(base + col["off"])
            payload = f.read(col["len"])
            arrays.append(_decode_payload(payload, col))
            names.append(col["name"])
    return pa.table(dict(zip(names, arrays)))
