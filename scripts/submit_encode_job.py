#!/usr/bin/env python3
"""Launch the encode job on a fixed-size Ray cluster (north-rule launch mode).

Two control planes, one execution path — either way the job's tasks run on
the cluster's workers and the per-bucket manifest makes a re-launch resume:

1. **Ray Jobs API** (``ray job submit`` / ``JobSubmissionClient``) when the
   head serves it (requires the ``ray[default]`` extra on the head):

       python scripts/submit_encode_job.py --address http://head:8265 \
           --input /data/transcripts --out /data/encoded --buckets 4096

2. **Driver-process fallback** when the Jobs SDK is unavailable (this
   sandbox ships ``ray[data]`` only — ``JobSubmissionClient`` raises
   RuntimeError) or the address is a raw GCS ``host:port``: run the same
   CLI entrypoint as a driver connected to the cluster address. Identical
   scheduling; only the submission control plane differs.

The N / 4N two-cluster-size scaling criterion uses this launcher with two
cluster sizes (sandbox evidence: two fresh-process parallelism levels, see
``bench.py --scaling`` and BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_args(args: argparse.Namespace) -> list[str]:
    out = [
        "encode",
        "--input", args.input,
        "--out", args.out,
        "--buckets", str(args.buckets),
        "--chunk-rows", str(args.chunk_rows),
        "--mode", args.mode,
    ]
    if args.no_resume:
        out.append("--no-resume")
    return out


def submit_via_jobs_api(address: str, cli_args: list[str]) -> int:
    """Ray Jobs API path: ships the repo as working_dir, polls to terminal."""
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(address)
    entry = "python -m etl_sql_duckdb_parquet__ray.cli " + shlex.join(cli_args)
    job_id = client.submit_job(
        entrypoint=entry, runtime_env={"working_dir": REPO_ROOT}
    )
    print(f"submitted {job_id}: {entry}", file=sys.stderr)
    terminal = {JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED}
    while (status := client.get_job_status(job_id)) not in terminal:
        time.sleep(2)
    print(client.get_job_logs(job_id), end="")
    return 0 if status == JobStatus.SUCCEEDED else 1


def submit_via_driver(address: str, cli_args: list[str]) -> int:
    """Fallback: run the CLI as a driver process connected to the cluster."""
    pp = os.environ.get("PYTHONPATH")
    env = {
        **os.environ,
        "RAY_ADDRESS": address,
        # prepend, never replace: the user's own PYTHONPATH entries (custom
        # codecs, readers) must stay importable in the driver subprocess
        "PYTHONPATH": REPO_ROOT + ((os.pathsep + pp) if pp else ""),
    }
    proc = subprocess.run(
        [sys.executable, "-m", "etl_sql_duckdb_parquet__ray.cli", *cli_args],
        env=env,
        cwd=REPO_ROOT,
    )
    return proc.returncode


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--address",
        default=os.environ.get("RAY_ADDRESS", "auto"),
        help="Jobs API URL (http://head:8265) or GCS address (head:6379)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--chunk-rows", type=int, default=65536)
    p.add_argument("--mode", default="balanced")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    cli_args = _cli_args(args)
    if args.address.startswith("http"):
        try:
            return submit_via_jobs_api(args.address, cli_args)
        except (ImportError, RuntimeError) as e:
            print(f"jobs API unavailable ({e}); driver fallback", file=sys.stderr)
    return submit_via_driver(args.address, cli_args)


if __name__ == "__main__":
    sys.exit(main())
