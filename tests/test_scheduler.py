"""Scheduler analog (reference src/scheduler.py) + incremental watch-encode."""

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_sql_duckdb_parquet__ray.state.scheduler import (
    PipelineScheduler,
    decode_all,
    incremental_encode,
)

CALLS = []


def _job(tag="x"):
    CALLS.append(tag)


def test_scheduler_registry_and_due_logic(tmp_path):
    reg = str(tmp_path / "sched.json")
    s = PipelineScheduler(reg)
    s.add_job("j1", _job, interval=10, unit="seconds", params={"tag": "a"})
    s.add_job("j2", _job, interval=1, unit="hours", params={"tag": "b"})
    CALLS.clear()
    t0 = time.time()
    assert sorted(s.run_pending(t0)) == ["j1", "j2"]  # never-run jobs are due
    assert CALLS == ["a", "b"] or CALLS == ["b", "a"]
    assert s.run_pending(t0 + 5) == []                # nothing due yet
    assert s.run_pending(t0 + 11) == ["j1"]           # only the 10s job
    # persisted registry reloads with dotted-path functions
    s2 = PipelineScheduler(reg)
    jobs = s2.get_jobs()
    assert set(jobs) == {"j1", "j2"}
    assert jobs["j1"]["func"].endswith(":_job")
    CALLS.clear()
    assert s2.run_pending(time.time() + 3600 * 2) != []  # reloads via dotted path
    assert CALLS  # the reloaded function actually ran
    s2.remove_job("j1")
    assert "j1" not in PipelineScheduler(reg).get_jobs()


def test_scheduler_survives_job_exception(tmp_path):
    s = PipelineScheduler(str(tmp_path / "s.json"))

    def boom():
        raise RuntimeError("nope")

    s.add_job("bad", boom, interval=1, unit="seconds")
    assert s.run_pending() == ["bad"]
    assert "RuntimeError" in s.jobs["bad"]["last_error"]


def test_scheduler_background_thread(tmp_path):
    s = PipelineScheduler(str(tmp_path / "s.json"))
    CALLS.clear()
    s.add_job("tick", _job, interval=1, unit="seconds", params={"tag": "t"})
    s.start(poll_seconds=0.05)
    time.sleep(0.3)
    s.stop()
    assert CALLS.count("t") >= 1


def test_incremental_encode_ledger(ray_session, tmp_path):
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "enc")
    t = generate_transcripts(4000, seed=2)
    pq.write_table(t.slice(0, 2000), str(land / "a.parquet"))
    r1 = incremental_encode(str(land), out, num_buckets=2)
    assert r1["encoded_files"] == 1
    # tick with nothing new is a no-op
    assert incremental_encode(str(land), out, num_buckets=2)["encoded_files"] == 0
    # a new landing file goes to a NEW run dir; old runs untouched
    pq.write_table(t.slice(2000, 2000), str(land / "b.parquet"))
    r2 = incremental_encode(str(land), out, num_buckets=2)
    assert r2["encoded_files"] == 1 and r2["run_dir"] != r1["run_dir"]
    ledger = json.load(open(os.path.join(out, "ingest_ledger.json")))
    assert ledger["runs"] == 2 and len(ledger["files"]) == 2
    # union of runs decodes to the full corpus, bit-identical
    dec = decode_all(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    orig = t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert dec.equals(orig)


def test_compact_merges_runs_and_restores_locality(ray_session, tmp_path):
    """Compacting two tick-fragmented encode dirs must (a) decode to the
    exact union of their contents, and (b) restore conversation locality:
    a conversation split across ticks is whole again, so its lookup plan
    touches one chunk."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        encode_transcripts,
        plan_chunks,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.scheduler import compact

    t = generate_transcripts(10000, seed=31)
    # split one conversation's turns across the two "ticks"
    conv = t.column("conv_id")[0].as_py()
    import pyarrow.compute as pc

    mine = pc.equal(t.column("conv_id"), conv)
    half_a = t.filter(pc.and_(mine, pc.equal(pc.bit_wise_and(t.column("turn_idx"), 1), 0)))
    half_b = t.filter(pc.and_(mine, pc.equal(pc.bit_wise_and(t.column("turn_idx"), 1), 1)))
    rest = t.filter(pc.invert(mine))
    tick1 = pa.concat_tables([rest.slice(0, rest.num_rows // 2), half_a])
    tick2 = pa.concat_tables([rest.slice(rest.num_rows // 2), half_b])

    d1, d2, dout = str(tmp_path / "r1"), str(tmp_path / "r2"), str(tmp_path / "c")
    encode_transcripts(ray.data.from_arrow(tick1), d1, num_buckets=4, chunk_rows=100000)
    encode_transcripts(ray.data.from_arrow(tick2), d2, num_buckets=4, chunk_rows=100000)
    compact([d1, d2], dout, num_buckets=4, chunk_rows=100000, resume=False)

    merged = (
        decode_dataset(dout).to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    orig = t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert merged.equals(orig)

    # before compaction the conversation needs both dirs; after, one chunk
    pre = sum(len(p["idx"]) for d in (d1, d2) for p in plan_chunks(d, conv_id=conv))
    post = sum(len(p["idx"]) for p in plan_chunks(dout, conv_id=conv))
    assert pre >= 2 and post == 1
