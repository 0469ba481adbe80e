"""Scalar normalization / casting transforms — the reference's transform
module (``src/etl/transform.py:11-126``: M1-M4 in SURVEY.md §2.2)
re-expressed as pyarrow.compute kernels inside ``map_batches``.

Each helper is Array -> Array; ``normalize_table`` composes them per a
column spec so a whole table normalizes in one vectorized pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NULL_SENTINELS = ["NA", "null", "NULL", ""]
TRUE_SET = ["true", "1", "yes"]


def normalize_string(arr, uppercase: bool = False) -> pa.Array:
    """Trim; map {NA, null, NULL, ""} -> null; optional uppercase
    (reference ``normalize_string_column``, ``transform.py:11-17``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.utf8_trim_whitespace(arr)
    is_sentinel = pc.is_in(out, value_set=pa.array(NULL_SENTINELS))
    out = pc.if_else(is_sentinel, pa.scalar(None, type=out.type), out)
    if uppercase:
        out = pc.utf8_upper(out)
    return out


def cast_numeric(arr, dtype: pa.DataType) -> pa.Array:
    """String -> numeric with invalid -> null (reference ``cast_numeric``'s
    ``errors='coerce'``, ``transform.py:20-22``). Arrow's cast raises on
    unparseable strings, so the parse runs through pandas' C ``to_numeric``
    coerce path."""
    import pandas as pd

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(arr)
    as_float = pa.array(
        pd.to_numeric(trimmed.to_pandas(), errors="coerce"), type=pa.float64()
    )
    if pa.types.is_integer(dtype):
        return pc.cast(pc.round(as_float), dtype, safe=False)
    return pc.cast(as_float, dtype, safe=False)


def cast_date(arr) -> pa.Array:
    """ISO-8601 string -> date32, invalid -> null (reference ``cast_date``,
    ``transform.py:25-27``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ts = pc.strptime(pc.utf8_trim_whitespace(arr), format="%Y-%m-%d", unit="s", error_is_null=True)
    return pc.cast(ts, pa.date32())


def cast_bool(arr) -> pa.Array:
    """lowercase in {true,1,yes} -> True, null stays null (reference bool
    normalization, ``transform.py:118-124``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    truthy = pc.is_in(low, value_set=pa.array(TRUE_SET))
    return pc.if_else(pc.is_valid(arr), truthy, pa.scalar(None, type=pa.bool_()))


_KINDS = {
    "string": lambda a, spec: normalize_string(a, uppercase=spec.get("upper", False)),
    "int64": lambda a, spec: cast_numeric(a, pa.int64()),
    "float64": lambda a, spec: cast_numeric(a, pa.float64()),
    "date": lambda a, spec: cast_date(a),
    "bool": lambda a, spec: cast_bool(a),
}


def normalize_table(batch: pa.Table, spec: dict[str, dict]) -> pa.Table:
    """Apply a per-column spec {col: {"kind": ..., "upper": bool}} —
    the composable form of the reference's transform_samples/runs/qc
    (``transform.py:30-126``)."""
    for name, s in spec.items():
        i = batch.column_names.index(name)
        batch = batch.set_column(
            i, name, _KINDS[s["kind"]](batch.column(name), s)
        )
    return batch


def normalize_dataset(ds, spec: dict[str, dict]):
    return ds.map_batches(
        lambda t: normalize_table(t, spec), batch_format="pyarrow"
    )


def extract_json_field(arr, key: str, kind: str = "int"):
    """Vectorized extraction of a scalar field from a flat-JSON string
    column (semi-structured payloads like ``events.props``) — one RE2
    ``extract_regex`` kernel, no per-row parsing. ``kind``: "int" (-> int64,
    null when absent/non-integer) or "string" (unescaped content between
    the quotes; escape sequences are NOT decoded — callers needing full
    JSON semantics should parse, this is the hot-path scalar probe).
    NULL input and missing keys both yield NULL."""
    import re as _re

    k = _re.escape(key)
    if kind == "int":
        pat = rf'"{k}"\s*:\s*(?P<v>-?\d+)'
    elif kind == "string":
        pat = rf'"{k}"\s*:\s*"(?P<v>(?:[^"\\]|\\.)*)"'
    else:
        raise ValueError(f"kind must be 'int' or 'string', got {kind!r}")
    ex = pc.extract_regex(arr, pattern=pat)
    vals = pc.struct_field(ex, 0)
    if kind == "int":
        return vals.cast(pa.int64())
    return vals
