"""The lifecycle walkthrough script must stay green: it is the
documentation-as-code tour of every mutation the engine supports."""

import json
import os
import subprocess
import sys


def test_lifecycle_demo_runs_green(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "lifecycle_demo.py"),
         str(tmp_path / "demo")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    steps = {}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            steps[d.pop("step")] = d
    assert steps["verify_roundtrip"]["bit_identical"] is True
    assert steps["point_lookup_deleted_conv"]["rows"] == 0
    assert steps["compact"]["tombstones_left"] is False
    # conservation: union == compacted rows; purge additionally drops the
    # upserted conv's old version already hidden in base
    assert steps["union_read_rows"]["rows"] == steps["compact"]["rows"]
    assert steps["text_search"]["rows"] >= 1
