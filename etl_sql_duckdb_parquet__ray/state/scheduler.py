"""Scheduled / incremental pipeline execution — the Ray-native analog of
the reference's scheduler (``src/scheduler.py:17-195``: job registry with
intervals, JSON persistence, background thread) without the external
``schedule`` dependency.

Division of labor on a cluster: the scheduler is a DRIVER-side loop (one
tiny process, e.g. under ``ray job submit``); each tick launches ordinary
Ray Data pipelines that scale out on their own. Nothing here touches data.

The companion :func:`incremental_encode` is the "watch a landing directory"
job the reference's default ETL schedule approximates: each tick encodes
only parquet files not yet in the ledger, into a per-tick run directory —
so a tick is atomic, reruns are cheap, and the union of run directories is
the full corpus (``decode_all``).
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import threading
import time
from datetime import datetime, timezone
from typing import Any, Callable

_UNITS = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}


def _now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


def _func_path(func: Callable) -> str:
    return f"{func.__module__}:{func.__qualname__}"


def _load_func(path: str) -> Callable:
    mod, _, attr = path.partition(":")
    obj: Any = importlib.import_module(mod)
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


class PipelineScheduler:
    """Interval-job registry (reference ``PipelineScheduler``). Jobs are
    persisted as dotted ``module:qualname`` paths plus params, so a restart
    reloads the schedule (reference ``save_schedule``/``load_schedule``,
    ``src/scheduler.py:108-135``)."""

    def __init__(self, registry_path: str):
        self.registry_path = registry_path
        self.jobs: dict[str, dict] = {}
        self._funcs: dict[str, Callable] = {}
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self.load()

    # -- registry -----------------------------------------------------------

    def add_job(self, job_name: str, func: Callable, interval: int,
                unit: str = "hours", params: dict | None = None) -> None:
        if unit not in _UNITS:
            raise ValueError(f"unit must be one of {sorted(_UNITS)}")
        self.jobs[job_name] = {
            "func": _func_path(func),
            "interval": int(interval),
            "unit": unit,
            "params": params or {},
            "created_at": _now_iso(),
            "last_run": None,
        }
        self._funcs[job_name] = func
        self.save()

    def remove_job(self, job_name: str) -> None:
        self.jobs.pop(job_name, None)
        self._funcs.pop(job_name, None)
        self.save()

    def get_jobs(self) -> dict[str, dict]:
        return {k: {kk: vv for kk, vv in v.items()} for k, v in self.jobs.items()}

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.registry_path) or ".", exist_ok=True)
        tmp = self.registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.jobs, f, indent=2)
        os.replace(tmp, self.registry_path)

    def load(self) -> None:
        if not os.path.exists(self.registry_path):
            return
        with open(self.registry_path) as f:
            self.jobs = json.load(f)

    # -- execution ----------------------------------------------------------

    def _due(self, job: dict, now: float) -> bool:
        period = job["interval"] * _UNITS[job["unit"]]
        if job["last_run"] is None:
            return True
        last = datetime.fromisoformat(job["last_run"]).timestamp()
        return now - last >= period

    def run_pending(self, now: float | None = None) -> list[str]:
        """Run every due job once; returns the names that ran. Exceptions
        are recorded on the job (``last_error``) and do not kill the loop."""
        now = time.time() if now is None else now
        ran = []
        for name, job in list(self.jobs.items()):
            if not self._due(job, now):
                continue
            fn = self._funcs.get(name)
            if fn is None:
                fn = _load_func(job["func"])
                self._funcs[name] = fn
            try:
                fn(**job["params"])
                job["last_error"] = None
            except Exception as e:  # keep the scheduler alive
                job["last_error"] = repr(e)[:500]
            job["last_run"] = datetime.fromtimestamp(
                now, tz=timezone.utc
            ).isoformat()
            ran.append(name)
        if ran:
            self.save()
        return ran

    def start(self, poll_seconds: float = 1.0) -> None:
        """Background loop (reference ``start``, ``src/scheduler.py:71-87``)."""
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                self.run_pending()
                self._stop.wait(poll_seconds)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join(timeout=10)
        self._thread = None


# -- incremental watch-encode job --------------------------------------------

def _ledger_path(out_root: str) -> str:
    return os.path.join(out_root, "ingest_ledger.json")


def incremental_encode(input_dir: str, out_root: str, num_buckets: int = 8,
                       **encode_kwargs) -> dict:
    """One watch tick: encode parquet files that are NOT yet in the ledger
    into a fresh ``run-<k>`` directory (atomic unit of ingest — a failed
    tick leaves the ledger untouched and the next tick retries the same
    files). The union of run directories is the corpus; each run resumes
    independently via its own per-bucket manifest."""
    import ray

    from ..pipelines.encode import encode_transcripts

    ledger = {"files": [], "runs": 0}
    lp = _ledger_path(out_root)
    if os.path.exists(lp):
        with open(lp) as f:
            ledger = json.load(f)
    have = set(ledger["files"])
    new = sorted(
        p for p in glob.glob(os.path.join(input_dir, "*.parquet"))
        if p not in have
    )
    if not new:
        return {"encoded_files": 0, "run_dir": None}
    run_dir = os.path.join(out_root, f"run-{ledger['runs']:05d}")
    ds = ray.data.read_parquet(new)
    encode_transcripts(ds, run_dir, num_buckets=num_buckets, **encode_kwargs)
    ledger["files"].extend(new)
    ledger["runs"] += 1
    os.makedirs(out_root, exist_ok=True)
    tmp = lp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=2)
    os.replace(tmp, lp)
    return {"encoded_files": len(new), "run_dir": run_dir}


def decode_all(out_root: str):
    """Union of every run directory's decoded Dataset."""
    from ..pipelines.encode import decode_dataset

    runs = sorted(glob.glob(os.path.join(out_root, "run-*")))
    if not runs:
        raise FileNotFoundError(f"no run directories under {out_root}")
    ds = decode_dataset(runs[0])
    for r in runs[1:]:
        ds = ds.union(decode_dataset(r))
    return ds


def compact(encoded_dirs: list[str], out_dir: str, num_buckets: int = 32, **kw):
    """Maintenance op: merge many encoded directories (e.g. the per-tick
    run dirs the incremental watcher accumulates) into ONE freshly-bucketed
    directory. Incremental ticks fragment a conversation's turns across
    run dirs; compaction re-shuffles by conv_id so each conversation is
    contiguous again — point lookups go back to touching one chunk, and
    per-chunk FSST/dict tables retrain on the full corpus (better ratio
    than many small tick-sized tables). Stream-decode -> re-encode; the
    usual resume semantics apply to the output dir.

    Renamed columns (``rename_column``): the physical rewrite decodes
    STORED names (``_raw_names=True`` — dirs may disagree on renames; the
    stored schema is the common ground) and the BASE dir's rename mapping
    is carried onto the compacted output, so display names survive
    compaction without forcing this rewrite to materialize them."""
    from ..pipelines.encode import (
        carry_renames, decode_dataset, encode_transcripts,
    )

    ds = decode_dataset(encoded_dirs[0], _raw_names=True)
    for d in encoded_dirs[1:]:
        ds = ds.union(decode_dataset(d, _raw_names=True))
    stats = encode_transcripts(ds, out_dir, num_buckets=num_buckets, **kw)
    carry_renames(encoded_dirs[0], out_dir)
    return stats
