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


def _block_content_name(t: pa.Table) -> str:
    """Order-SENSITIVE content address of a block: each row hash is mixed
    with its position (odd multiplier, wrapping uint64) before the fold, so
    two blocks holding the same multiset of rows in different orders get
    different names — a plain sum was permutation-invariant and collided."""
    h = pd.util.hash_pandas_object(t.to_pandas(), index=False).to_numpy()
    mix = h * (np.uint64(2) * np.arange(len(h), dtype=np.uint64) + np.uint64(1))
    return f"{int(mix.sum()) & 0xFFFFFFFFFFFFFFFF:016x}"


def _resolve_twin_claims(manifest: pd.DataFrame) -> pd.DataFrame:
    """Content-addressed names collide when two DISTINCT blocks are
    byte-identical (constant or duplicated data split evenly): both map
    tasks write the same path and a directory read would silently drop the
    second block's rows. The driver sees the collision in the (path, rows)
    manifest — the same path claimed by m>1 blocks — and repairs it here by
    hard-linking ``-dupK`` aliases (no data copy, no data through the
    driver), so directory readers count every block's rows. Deterministic:
    a re-run over identical input reproduces the same claims and the same
    alias set (idempotent, no accumulation)."""
    import os

    if len(manifest) == 0 or manifest["path"].is_unique:
        return manifest
    paths = manifest["path"].tolist()
    seen: dict[str, int] = {}
    fixed = []
    for p in paths:
        k = seen.get(p, 0)
        seen[p] = k + 1
        if k == 0:
            fixed.append(p)
            continue
        root, ext = os.path.splitext(p)
        alias = f"{root}-dup{k}{ext}"
        if not os.path.exists(alias):
            os.link(p, alias)
        fixed.append(alias)
    out = manifest.copy()
    out["path"] = fixed
    return out


def write_orc(ds, out_dir: str, prefix: str = "part"):
    """Dataset -> sharded ORC directory (interchange with Hive/Spark
    estates, which still ship ORC heavily). One ORC file per input block,
    written inside the map task — the driver never sees data, only the
    returned (path, rows) manifest. File names are content-addressed
    (order-sensitive block row-hash) so a re-run over identical input is
    idempotent rather than accumulating duplicates; byte-identical twin
    blocks are disambiguated driver-side (``_resolve_twin_claims``)."""
    import os

    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import os

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        path = os.path.join(out_dir, f"{prefix}-{_block_content_name(t)}.orc")
        tmp = f"{path}.tmp.{os.getpid()}"
        orc.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: readers never see partial files
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    # batch_size=None -> one task per block; the manifest is tiny
    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    return _resolve_twin_claims(manifest)


def read_orc(paths, columns: list[str] | None = None):
    """ORC -> Dataset (Ray 2.49 has no ``read_orc``; this is the
    idiomatic substitute): expand the path list driver-side (names only),
    then ONE map task per file decodes its stripes with
    ``pyarrow.orc.read_table`` — column projection is pushed into the ORC
    reader so unrequested columns never leave storage. Column names get
    the same normalization as ``read_delimited`` (reference M5)."""
    import os

    import ray

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".orc")
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no .orc files under {paths}")

    def read_file(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tables = []
        for path in batch.column("path").to_pylist():
            f = orc.ORCFile(path)
            orig = f.schema.names
            if columns is not None:
                # projection is requested in NORMALIZED names; the file may
                # carry unnormalized ones — map back before the reader
                by_norm = {n.strip().lower(): n for n in orig}
                sel = [by_norm.get(c, c) for c in columns]
            else:
                sel = None
            t = f.read(columns=sel)
            norm = [n.strip().lower() for n in t.column_names]
            if norm != t.column_names:
                t = t.rename_columns(norm)
            tables.append(t)
        return pa.concat_tables(tables)

    src = ray.data.from_items([{"path": f} for f in files])
    # batch_size=1 -> per-file tasks (per-stripe splitting would need a
    # custom Datasource; files are the shard unit here)
    return src.map_batches(read_file, batch_format="pyarrow", batch_size=1)


def write_ipc(ds, out_dir: str, prefix: str = "part",
              compression: str = "zstd"):
    """Dataset -> sharded Arrow IPC (Feather V2) directory — the zero-parse
    interchange format for Arrow-native consumers (Polars, DuckDB, pandas,
    Arrow Flight estates). Same shape as ``write_orc``: one file per input
    block written inside the map task, order-sensitive content-addressed
    names so re-runs are idempotent, byte-identical twin blocks repaired
    driver-side, the driver only sees the (path, rows) manifest."""
    import os

    import pyarrow.feather as feather

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import os

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        path = os.path.join(
            out_dir, f"{prefix}-{_block_content_name(t)}.arrow"
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        feather.write_feather(t, tmp, compression=compression)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    return _resolve_twin_claims(manifest)


def read_ipc(paths, columns: list[str] | None = None):
    """Arrow IPC / Feather -> Dataset: one map task per file, column
    projection pushed into ``feather.read_table`` (IPC record batches are
    columnar — unrequested columns are never decompressed). Column names
    get the same normalization as ``read_delimited`` (reference M5)."""
    import os

    import ray

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith((".arrow", ".feather", ".ipc"))
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no .arrow/.feather files under {paths}")

    def read_file(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather
        import pyarrow.ipc as ipc

        tables = []
        for path in batch.column("path").to_pylist():
            if columns is not None:
                with open(path, "rb") as fh:
                    orig = ipc.open_file(fh).schema.names
                by_norm = {n.strip().lower(): n for n in orig}
                sel = [by_norm.get(c, c) for c in columns]
            else:
                sel = None
            t = feather.read_table(path, columns=sel)
            norm = [n.strip().lower() for n in t.column_names]
            if norm != t.column_names:
                t = t.rename_columns(norm)
            tables.append(t)
        return pa.concat_tables(tables)

    src = ray.data.from_items([{"path": f} for f in files])
    return src.map_batches(read_file, batch_format="pyarrow", batch_size=1)
