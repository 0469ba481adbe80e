"""Incremental materialized-view maintenance (pipelines/ivm.py): folding
append ticks one at a time must equal the one-shot aggregate; re-applying
a tick label is a no-op; the applied set travels atomically with the rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.ivm import (
    applied_ticks,
    read_view,
    refresh_view,
)


def _mk(rows, seed):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], size=rows)),
        "v": pa.array(rng.integers(0, 1000, size=rows).astype(np.int64)),
    })


def test_incremental_equals_one_shot(ray_session, tmp_path):
    import ray

    ticks = [_mk(500, s) for s in (1, 2, 3)]
    view = str(tmp_path / "view")
    for i, t in enumerate(ticks):
        info = refresh_view(
            view, ray.data.from_arrow(t), f"tick-{i}",
            group_cols=["g"], sum_cols=["v"], minmax_cols=["v"],
        )
        assert info["applied"]
    got = read_view(view).to_pandas().set_index("g")

    full = pa.concat_tables(ticks).to_pandas()
    ref = full.groupby("g")["v"].agg(["sum", "min", "max", "count"])
    assert (got["sum_v"] == ref["sum"]).all()
    assert (got["min_v"] == ref["min"]).all()
    assert (got["max_v"] == ref["max"]).all()
    assert (got["n_rows"] == ref["count"]).all()
    assert applied_ticks(view) == ["tick-0", "tick-1", "tick-2"]


def test_refresh_is_idempotent_per_label(ray_session, tmp_path):
    import ray

    view = str(tmp_path / "view")
    t = _mk(300, 9)
    refresh_view(view, ray.data.from_arrow(t), "t0",
                 group_cols=["g"], sum_cols=["v"])
    before = read_view(view).to_pandas()
    # the retry case: same label again must not double count
    info = refresh_view(view, ray.data.from_arrow(t), "t0",
                        group_cols=["g"], sum_cols=["v"])
    assert not info["applied"]
    pd.testing.assert_frame_equal(read_view(view).to_pandas(), before)
    # the labels live INSIDE the view parquet (atomic with the rows)
    meta = pq.read_schema(f"{view}/view.parquet").metadata
    assert b"ivm.applied_ticks" in meta


def test_empty_delta_tick_is_recorded(ray_session, tmp_path):
    import ray

    view = str(tmp_path / "view")
    refresh_view(view, ray.data.from_arrow(_mk(100, 4)), "t0",
                 group_cols=["g"], sum_cols=["v"])
    empty = ray.data.from_arrow(_mk(100, 4)).filter(lambda r: False)
    info = refresh_view(view, empty, "t1", group_cols=["g"], sum_cols=["v"])
    assert info["applied"]
    assert applied_ticks(view) == ["t0", "t1"]


def test_first_refresh_with_empty_delta_does_not_brick_view(
    ray_session, tmp_path
):
    """Regression (review finding): an all-empty FIRST tick used to write
    a placeholder view without the value columns, and every later refresh
    crashed on old.select(). The placeholder now only carries labels."""
    import ray

    view = str(tmp_path / "view")
    empty = ray.data.from_arrow(_mk(50, 1)).filter(lambda r: False)
    info = refresh_view(view, empty, "t0", group_cols=["g"], sum_cols=["v"])
    assert info["applied"] and applied_ticks(view) == ["t0"]

    # the first REAL delta defines the value schema and succeeds
    t = _mk(200, 2)
    refresh_view(view, ray.data.from_arrow(t), "t1",
                 group_cols=["g"], sum_cols=["v"])
    got = read_view(view).to_pandas().set_index("g")
    ref = t.to_pandas().groupby("g")["v"].agg(["sum", "count"])
    assert (got["sum_v"] == ref["sum"]).all()
    assert (got["n_rows"] == ref["count"]).all()
    assert applied_ticks(view) == ["t0", "t1"]


def test_refresh_with_mismatched_spec_raises(ray_session, tmp_path):
    """Regression (review finding): refreshing an accumulated view with a
    DIFFERENT aggregate spec used to silently discard the old rows while
    the labels claimed every tick applied. It must raise instead."""
    import ray

    view = str(tmp_path / "view")
    refresh_view(view, ray.data.from_arrow(_mk(100, 4)), "t0",
                 group_cols=["g"], sum_cols=["v"])
    t = _mk(100, 5).append_column(
        "w", pa.array(np.ones(100, dtype=np.int64))
    )
    with pytest.raises(ValueError, match="same aggregate spec"):
        refresh_view(view, ray.data.from_arrow(t), "t1",
                     group_cols=["g"], sum_cols=["v", "w"])
    # the view is untouched and NOT marked as having applied t1
    assert applied_ticks(view) == ["t0"]
