"""Per-partition lineage manifest — the scalable analog of the reference's
SQLite audit log (``src/history.py:12-106``) and per-row audit columns
(``src/etl/ingest.py:53-58``).

Each finished bucket partition writes ``bucket-{b:05d}.json`` next to its
chunk file, atomically and *after* the data file, recording: input rows,
bytes in/out, per-chunk codec choices, per-column checksums, conversation /
turn ranges, and the engine version. Resume = set-difference of planned
bucket ids against completed records (SURVEY.md §4) — no central database,
no coordination, safe under task retries (last atomic rename wins with
identical content because encoding is deterministic per bucket).
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_PREFIX = "bucket-"


def bucket_data_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"{MANIFEST_PREFIX}{bucket:05d}.bin")


def bucket_manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"{MANIFEST_PREFIX}{bucket:05d}.json")


def write_bucket_record(out_dir: str, bucket: int, record: dict[str, Any]) -> str:
    path = bucket_manifest_path(out_dir, bucket)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(record, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def completed_buckets(out_dir: str) -> set[int]:
    """Buckets whose data file AND manifest record both exist (the record is
    written last, so its presence implies a complete data file)."""
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        if name.startswith(MANIFEST_PREFIX) and name.endswith(".json"):
            b = int(name[len(MANIFEST_PREFIX) : -len(".json")])
            if os.path.exists(bucket_data_path(out_dir, b)):
                done.add(b)
    return done


def load_manifest(out_dir: str) -> list[dict[str, Any]]:
    records = []
    for b in sorted(completed_buckets(out_dir)):
        with open(bucket_manifest_path(out_dir, b)) as f:
            rec = json.load(f)
        # resolve the data-file path against the directory's CURRENT
        # location: outputs must stay decodable after the directory is
        # moved/copied (rsync'd off a node, relocated between storage
        # tiers), so the absolute path stamped at encode time is only a
        # hint, never authoritative
        rec["path"] = os.path.join(out_dir, os.path.basename(rec["path"]))
        records.append(rec)
    return records


RUN_META = "_run.json"


def write_run_meta(out_dir: str, meta: dict[str, Any]) -> str:
    """Run-level partitioning metadata (num_buckets, salted hot convs, hash
    scheme) written once at job start. It is what makes conv_id lookups
    O(1 bucket): the bucket assignment is a deterministic hash, so a reader
    holding this record can compute a conversation's home bucket instead of
    zone-scanning every partition."""
    path = os.path.join(out_dir, RUN_META)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_run_meta(out_dir: str) -> dict[str, Any] | None:
    path = os.path.join(out_dir, RUN_META)
    if not os.path.exists(path):
        return None  # pre-meta output dirs stay readable (zone-map fallback)
    with open(path) as f:
        return json.load(f)


def manifest_stats(out_dir: str) -> dict[str, Any]:
    """Aggregate pipeline statistics (analog of ``history.py:142-173``)."""
    recs = load_manifest(out_dir)
    return {
        "buckets": len(recs),
        "rows": sum(r["rows"] for r in recs),
        "bytes_in": sum(r["bytes_in"] for r in recs),
        "bytes_out": sum(r["bytes_out"] for r in recs),
        "chunks": sum(len(r["chunks"]) for r in recs),
    }
