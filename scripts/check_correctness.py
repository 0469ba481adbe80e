"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from ``__ray_entry__`` over an sf dir and,
where an ``oracle_sql()`` entry exists, the equivalent DuckDB SQL over the
same parquet tables registered as views.  Compares row count, schema
(column names sorted), and a value hash computed over rows sorted by all
columns — the same shape of check the driver records in CORRECTNESS_r{N}.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except Exception:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(f"unexpected result type {type(res)}")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    def _is_sortable(col):
        if not len(df):
            return True
        if col.dtype != object:
            return True
        return not col.map(
            lambda v: isinstance(v, (np.ndarray, list, dict, bytes))
        ).any()

    sortable = [c for c in df.columns if _is_sortable(df[c])]
    if len(df) and sortable:
        df = df.sort_values(sortable, kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, ignore_reinit_error=True)

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location("rayentry", os.path.join(repo, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q, o = m.queries(), m.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out: dict[str, dict] = {}
    fails = []
    for name, fn in q.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            mine = _canon(_to_pandas(fn(sf_dir)))
            rec["spark_rows"] = int(len(mine))
            if name in o:
                ora = _canon(con.execute(o[name]).fetchdf())
                rec["oracle_rows"] = int(len(ora))
                rec["rows_match"] = len(mine) == len(ora)
                rec["schema_match"] = list(mine.columns) == list(ora.columns)
                rec["hash_match"] = rec["rows_match"] and rec["schema_match"] and _hash(mine) == _hash(ora)
                if not rec["hash_match"]:
                    fails.append(name)
            else:
                rec["oracle"] = "none (rows-only)"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
            fails.append(name)
        out[name] = rec
        status = "ERR" if "err" in rec else ("ok" if rec.get("hash_match", True) else "MISMATCH")
        print(f"{name:40s} {status}")

    import datetime

    dest = os.environ.get("GRAFT_CORRECTNESS_OUT", "/tmp/correctness_local.json")
    artifact = {
        "recorded_at": datetime.datetime.now(datetime.UTC).isoformat(
            timespec="seconds"),
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_failures": len(fails),
        "results": out,
    }
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{len(out)} queries, {len(fails)} failures -> {dest}")
    if fails:
        print("FAILED:", fails)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
