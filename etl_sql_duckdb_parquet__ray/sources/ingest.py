"""CSV/TSV ingestion with separator sniffing and audit stamping — the Ray
form of the reference's ingest module (``src/etl/ingest.py:14-87``).

- ``detect_separator``: 1-line driver-side sniff (reference S1).
- ``read_delimited``: ``ray.data.read_csv`` with the sniffed delimiter,
  all columns read as string (the reference's ``dtype=str`` convention),
  lowercased/stripped names (M5).
- ``add_audit_columns``: ``ingested_at`` (fixed per-job timestamp, not
  per-row wall clock — deterministic across retries), ``source_file``, and
  ``row_hash`` — a vectorized SipHash over the row's concatenated values
  (M6/M7; the reference hashes per row in a Python loop,
  ``ingest.py:56-58``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv


def detect_separator(path: str, encoding: str = "utf-8") -> str:
    """Sniff ',' / '\\t' / ';' by counting occurrences in the header line
    (reference ``detect_separator``, ``src/etl/ingest.py:14-21``)."""
    with open(path, encoding=encoding, errors="replace") as f:
        header = f.readline()
    counts = {sep: header.count(sep) for sep in (",", "\t", ";")}
    return max(counts, key=counts.get)


def read_delimited(path: str, sep: str | None = None):
    """CSV/TSV -> Dataset, all-string columns, normalized names."""
    import ray

    sep = sep or detect_separator(path)
    # all-string read: ConvertOptions with column_types defaulting to string
    # requires known names; read the header first
    with open(path, encoding="utf-8", errors="replace") as f:
        names = [c.strip().lower() for c in f.readline().rstrip("\n").split(sep)]
    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=sep),
        read_options=pacsv.ReadOptions(column_names=names, skip_rows=1),
        convert_options=pacsv.ConvertOptions(
            column_types={n: pa.string() for n in names}
        ),
    )
    return ds


def read_jsonl(paths, columns: list[str] | None = None):
    """NDJSON / JSONL -> Dataset — the interchange format LLM corpora
    actually ship in (one JSON object per line). ``ray.data.read_json``
    handles sharded line-delimited files natively (pyarrow JSON reader per
    block, streaming, no driver materialization); this wrapper adds the
    same column-name normalization as ``read_delimited`` (lowercase/strip,
    reference M5) and optional projection. Nested objects arrive as Arrow
    struct columns and pass through untouched — project or flatten them
    downstream."""
    import ray

    ds = ray.data.read_json(paths)
    names = ds.schema().names
    norm = [n.strip().lower() for n in names]
    if norm != names:
        ds = ds.rename_columns(dict(zip(names, norm)))
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def add_audit_columns(ds, source_file: str, ingested_at: str):
    """Stamp audit columns; ``row_hash`` is a vectorized hash of all column
    values per row (hex string, like the reference's SHA-256 but computed in
    C over the whole batch)."""

    def stamp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # hash_pandas_object on the frame combines per-column C-vectorized
        # hashes row-wise — no per-row Python string join
        h = pd.util.hash_pandas_object(batch, index=False).to_numpy()
        batch["ingested_at"] = ingested_at
        batch["source_file"] = source_file
        hexchars = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
        nib = (h[:, None] >> (np.uint64(60) - np.uint64(4) * np.arange(16, dtype=np.uint64))) & np.uint64(0xF)
        hx = hexchars[nib.astype(np.int64)].tobytes()
        batch["row_hash"] = np.frombuffer(hx, dtype="S16").astype("U16")
        return batch

    return ds.map_batches(stamp, batch_format="pandas")


def ingest_file(path: str, ingested_at: str, sep: str | None = None):
    """read + normalize + stamp: the full reference ``ingest_file`` path."""
    import os

    return add_audit_columns(
        read_delimited(path, sep), os.path.basename(path), ingested_at
    )
