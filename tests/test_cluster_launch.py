"""Fixed-size-cluster launch path (north rule: "run via ray job submit").

Starts a REAL external Ray head node (``ray start --head --block`` in its
own process group — separate GCS from the test session's local Ray), drives
the encode job onto it through ``scripts/submit_encode_job.py``, and checks
the manifest + decode. The sandbox ships ``ray[data]`` only, so the Jobs
API half of the launcher falls back to the driver-process path — the
cluster-side execution is identical either way (verified here: the job's
tasks run on the external cluster's workers, not in this process).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def external_cluster():
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("RAY_ADDRESS", None)  # must not hijack the session-local default
    head = subprocess.Popen(
        [
            "ray", "start", "--head", "--block",
            f"--port={port}", "--num-cpus=2",
            "--include-dashboard=false", "--disable-usage-stats",
        ],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: kill takes down raylet/gcs
    )
    deadline = time.time() + 60
    up = False
    while time.time() < deadline:
        if head.poll() is not None:
            break
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                up = True
                break
        except OSError:
            time.sleep(0.5)
    if not up:
        try:
            os.killpg(head.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
        pytest.skip("external ray head failed to start in this environment")
    try:
        yield f"127.0.0.1:{port}"
    finally:
        os.killpg(head.pid, signal.SIGTERM)
        try:
            head.wait(timeout=30)
        except subprocess.TimeoutExpired:
            os.killpg(head.pid, signal.SIGKILL)


def test_submit_encode_job_on_external_cluster(external_cluster, tmp_path):
    import pyarrow.parquet as pq

    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    src = tmp_path / "in"
    src.mkdir()
    table = generate_transcripts(12000, seed=41)
    pq.write_table(table, src / "part-0.parquet")
    out = tmp_path / "enc"

    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "submit_encode_job.py"),
            "--address", external_cluster,
            "--input", str(src), "--out", str(out),
            "--buckets", "4", "--no-resume",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["rows"] == table.num_rows

    records = load_manifest(str(out))
    assert len(records) == 4
    assert sum(r["rows"] for r in records) == table.num_rows

    # decode through a second driver process on the same cluster: the CLI
    # verify command replays the roundtrip bit-identity check cluster-side
    proc2 = subprocess.run(
        [
            sys.executable, "-m", "etl_sql_duckdb_parquet__ray.cli",
            "verify", "--input", str(src), "--encoded", str(out),
        ],
        env={**os.environ, "RAY_ADDRESS": external_cluster, "PYTHONPATH": REPO},
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]


@pytest.fixture(scope="module")
def external_two_node_cluster():
    """A REAL two-process topology on localhost: a head with ZERO worker
    CPUs plus one `ray start --address=<head>` worker process — two
    raylets, two object stores, genuine inter-node object transfer. Every
    task MUST execute on the worker node (the head has no CPU resources),
    so an encode/decode on this cluster proves the exchange and manifest
    paths survive a multi-node object topology, not just multi-core."""
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("RAY_ADDRESS", None)
    head = subprocess.Popen(
        [
            "ray", "start", "--head", "--block",
            f"--port={port}", "--num-cpus=0",
            "--include-dashboard=false", "--disable-usage-stats",
        ],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    deadline = time.time() + 60
    up = False
    while time.time() < deadline:
        if head.poll() is not None:
            break
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                up = True
                break
        except OSError:
            time.sleep(0.5)
    worker = None
    if up:
        worker = subprocess.Popen(
            [
                "ray", "start", "--block",
                f"--address=127.0.0.1:{port}", "--num-cpus=2",
                "--disable-usage-stats",
            ],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        # the worker registers with the GCS asynchronously; poll `ray
        # status` from a THIRD process (this pytest process holds the
        # session-local ray and must not ray.init against the cluster) —
        # the worker's 2 CPUs appearing in the resource report proves both
        # nodes joined (the head contributes zero)
        two = False
        deadline = time.time() + 90
        while time.time() < deadline:
            if worker.poll() is not None:
                break
            try:
                r = subprocess.run(
                    ["ray", "status", "--address", f"127.0.0.1:{port}"],
                    env=env, capture_output=True, text=True, timeout=20,
                )
            except subprocess.TimeoutExpired:
                continue
            if r.returncode == 0 and "/2.0 CPU" in r.stdout:
                two = True
                break
            time.sleep(1.0)
        up = two
    if not up:
        for p in (worker, head):
            if p is not None:
                try:
                    os.killpg(p.pid, signal.SIGTERM)
                except ProcessLookupError:
                    pass
        pytest.skip("two-node ray topology failed to start here")
    try:
        yield f"127.0.0.1:{port}"
    finally:
        for p in (worker, head):
            try:
                os.killpg(p.pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
        for p in (worker, head):
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                os.killpg(p.pid, signal.SIGKILL)


def test_encode_decode_across_two_object_stores(
    external_two_node_cluster, tmp_path
):
    """Encode + decode-verify on the head(0 cpu)+worker topology: every
    task runs in the worker's raylet while the driver sits on the head
    node, so blocks cross a real process/object-store boundary both ways."""
    import pyarrow.parquet as pq

    from etl_sql_duckdb_parquet__ray.sources.transcripts import (
        generate_transcripts,
    )
    from etl_sql_duckdb_parquet__ray.state.manifest import load_manifest

    src = tmp_path / "in"
    src.mkdir()
    table = generate_transcripts(8000, seed=43)
    pq.write_table(table, src / "part-0.parquet")
    out = tmp_path / "enc"

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "submit_encode_job.py"),
            "--address", external_two_node_cluster,
            "--input", str(src), "--out", str(out),
            "--buckets", "2", "--no-resume",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["rows"] == table.num_rows

    records = load_manifest(str(out))
    assert len(records) == 2
    assert sum(r["rows"] for r in records) == table.num_rows

    proc2 = subprocess.run(
        [
            sys.executable, "-m", "etl_sql_duckdb_parquet__ray.cli",
            "verify", "--input", str(src), "--encoded", str(out),
        ],
        env={
            **os.environ,
            "RAY_ADDRESS": external_two_node_cluster,
            "PYTHONPATH": REPO,
        },
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
