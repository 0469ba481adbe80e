"""Schema inspection and diff (reference `src/schema_inspector.py:49-95`:
``inspect_schema`` reads 1000 rows into pandas and counts nulls;
``compare_schemas`` reports common/missing/new columns, dtype changes and
the row delta).

Ray-native re-expression, scale-first: for Parquet inputs the inspection
is METADATA-ONLY — row counts, types and per-column null counts come from
the parquet footers' row-group statistics, so a 100-TB table inspects in
milliseconds without scanning a single data page. For in-flight Datasets
the same facts come from one streaming ``map_batches`` aggregate (a pair
of int64 per column per block — nothing else moves)."""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet"))
    return out


def inspect_parquet_schema(path: str) -> dict[str, Any]:
    """Metadata-only schema profile of a parquet file/directory: unified
    Arrow schema, exact row count, file bytes, and per-column null counts
    summed from row-group statistics (no data pages are read). A column
    whose writer omitted statistics reports ``null_count=None`` rather
    than a wrong zero."""
    files = _parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    schema = pq.read_schema(files[0])
    n_rows = 0
    size = 0
    nulls: dict[str, int | None] = {name: 0 for name in schema.names}
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_rows += md.num_rows
        size += os.path.getsize(f)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                # nested fields show as 'a.b' paths; top-level only
                name = col.path_in_schema.split(".")[0]
                if name not in nulls:
                    continue
                st = col.statistics
                if st is None or st.null_count is None:
                    nulls[name] = None
                elif nulls[name] is not None:
                    nulls[name] += st.null_count
    return {
        "file": path,
        "num_rows": n_rows,
        "num_columns": len(schema.names),
        "file_size_mb": round(size / (1024 * 1024), 3),
        "columns": {
            f.name: {
                "type": str(f.type),
                "index": i,
                "null_count": nulls[f.name],
                "nullable": (nulls[f.name] or 0) > 0 if nulls[f.name] is not None else None,
            }
            for i, f in enumerate(schema)
        },
    }


def inspect_dataset_schema(ds, name: str = "<dataset>") -> dict[str, Any]:
    """Schema profile of an in-flight Dataset: one streaming pass, each
    block contributing only (n_rows, per-column null counts)."""
    schema = ds.schema()  # ray.data Schema: .names / .types (Arrow types)
    names = list(schema.names)
    types = {n: t for n, t in zip(schema.names, schema.types)}

    def partial(t: pa.Table) -> pa.Table:
        cols = {"n_rows": pa.array([t.num_rows], type=pa.int64())}
        for n in names:
            cols[f"null__{n}"] = pa.array(
                [t.column(n).null_count], type=pa.int64()
            )
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_rows"] + [f"null__{n}" for n in names]
    )
    return {
        "file": name,
        "num_rows": int(agg["sum(n_rows)"]),
        "num_columns": len(names),
        "columns": {
            n: {
                "type": str(types[n]),
                "index": i,
                "null_count": int(agg[f"sum(null__{n})"]),
                "nullable": int(agg[f"sum(null__{n})"]) > 0,
            }
            for i, n in enumerate(names)
        },
    }


def compare_schemas(a: dict[str, Any], b: dict[str, Any]) -> dict[str, Any]:
    """Diff two inspection results (reference ``compare_schemas``
    semantics: common/missing/new columns, type changes, row delta)."""
    ca, cb = set(a.get("columns", {})), set(b.get("columns", {}))
    type_changes = {}
    for col in ca & cb:
        ta = a["columns"][col].get("type")
        tb = b["columns"][col].get("type")
        if ta != tb:
            type_changes[col] = {"from": ta, "to": tb}
    return {
        "source": a.get("file", "Unknown"),
        "target": b.get("file", "Unknown"),
        "common_columns": sorted(ca & cb),
        "missing_in_target": sorted(ca - cb),
        "new_in_target": sorted(cb - ca),
        "type_changes": type_changes,
        "row_difference": b.get("num_rows", 0) - a.get("num_rows", 0),
    }
