"""Incremental materialized-view maintenance (IVM) for distributive
aggregates — keep a persisted GROUP BY view current under append ticks
WITHOUT re-scanning history.

The reference recomputes every report query from scratch on each ETL run
(``sql/queries.sql`` re-executed over the full store, ``src/etl/load.py``);
at 100 TB a nightly append must cost O(|delta| + |view|), not O(|corpus|):
aggregate the delta distributively (one small shuffle keyed by the view's
group columns), then fold it into the persisted view — the view is
groups-sized, orders of magnitude smaller than the data.

Exactly-once refresh: every tick carries a caller-chosen label, and the
applied-label set lives in the view parquet's OWN key-value metadata — the
view rows and the label set land in one atomic ``os.replace``, so there is
no crash window where the aggregate moved but the label did not (the
classic double-count hole of a sidecar ledger). A re-run of an applied
tick is a no-op. MIN/MAX stay correct because ticks are APPENDS (no
retraction); deletions need a rebuild, or a SUM/COUNT-only view fed
negative deltas.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import pyarrow as pa
import pyarrow.parquet as pq

VIEW_FILE = "view.parquet"
_META_KEY = b"ivm.applied_ticks"


def _view_path(view_dir: str) -> str:
    return os.path.join(view_dir, VIEW_FILE)


def read_view(view_dir: str) -> pa.Table | None:
    p = _view_path(view_dir)
    return pq.read_table(p) if os.path.exists(p) else None


def applied_ticks(view_dir: str) -> list[str]:
    """Labels already folded into the view (from the parquet's key-value
    metadata — the same atomic unit as the rows themselves)."""
    p = _view_path(view_dir)
    if not os.path.exists(p):
        return []
    meta = pq.read_schema(p).metadata or {}
    raw = meta.get(_META_KEY)
    return list(json.loads(raw.decode())) if raw else []


def refresh_view(
    view_dir: str,
    delta_ds,
    tick_label: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
    lock_timeout: float = 10.0,
) -> dict:
    """Fold one append tick into the persisted view. Idempotent per
    ``tick_label``: an already-applied label returns without running the
    delta aggregate (the exactly-once contract a retrying scheduler
    needs); concurrent refreshes serialize on an O_EXCL lock.

    The merge itself is driver-side over two GROUPS-SIZED tables (the old
    view and the delta aggregate) — bounded by the view's cardinality,
    never the data. A view too large for one table would shard by
    group-hash; at that point the view IS a dataset and compaction-style
    maintenance applies."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ._lockfile import excl_lock

    os.makedirs(view_dir, exist_ok=True)
    vp = _view_path(view_dir)
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    minmax_cols = list(minmax_cols)
    value_cols = (
        [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in minmax_cols]
        + [f"max_{c}" for c in minmax_cols]
        + ["n_rows"]
    )

    with excl_lock(f"{vp}.lock", lock_timeout, what="view refresh"):
        done = applied_ticks(view_dir)
        old = read_view(view_dir)
        if tick_label in done:
            return {"applied": False, "tick": tick_label,
                    "n_groups": old.num_rows if old is not None else 0}
        # a view created by an all-empty history is a label carrier with a
        # placeholder schema (group columns only, zero rows) — treat its
        # ROWS as absent so the first real delta defines the value schema.
        # Anything ELSE that lacks the expected value columns is a caller
        # refreshing with a DIFFERENT aggregate spec: raise loudly —
        # silently dropping the accumulated view would be undetectable
        # data loss (the labels would still claim every tick applied).
        if old is not None and not set(value_cols) <= set(old.column_names):
            if old.num_rows == 0 and set(old.column_names) == set(group_cols):
                old = None
            else:
                raise ValueError(
                    f"view at {view_dir} carries columns "
                    f"{old.column_names}, refresh expects "
                    f"{group_cols + value_cols} — a view must be refreshed "
                    "with the same aggregate spec it was built with"
                )
        aggs = [Sum(c, alias_name=f"sum_{c}") for c in sum_cols]
        aggs += [Min(c, alias_name=f"min_{c}") for c in minmax_cols]
        aggs += [Max(c, alias_name=f"max_{c}") for c in minmax_cols]
        aggs.append(Count(alias_name="n_rows"))
        rows = delta_ds.groupby(group_cols).aggregate(*aggs).take_all()
        delta_t = (
            pa.Table.from_pylist(rows).select(group_cols + value_cols)
            if rows else None
        )
        if old is not None and delta_t is not None:
            both = pa.concat_tables(
                [old.select(group_cols + value_cols), delta_t],
                promote_options="default",
            )
            gb = pa.TableGroupBy(both, group_cols)
            specs = [(f"sum_{c}", "sum") for c in sum_cols]
            specs += [(f"min_{c}", "min") for c in minmax_cols]
            specs += [(f"max_{c}", "max") for c in minmax_cols]
            specs += [("n_rows", "sum")]
            merged = gb.aggregate(specs).rename_columns(
                group_cols + value_cols
            )
        else:
            merged = delta_t if delta_t is not None else old
        if merged is None:
            merged = pa.table({c: pa.array([], pa.string()) for c in group_cols})
        merged = merged.sort_by([(c, "ascending") for c in group_cols])
        merged = merged.replace_schema_metadata(
            {**(merged.schema.metadata or {}),
             _META_KEY: json.dumps(done + [tick_label]).encode()}
        )
        tmp = f"{vp}.tmp.{os.getpid()}"
        pq.write_table(merged, tmp, compression="zstd")
        os.replace(tmp, vp)  # rows + applied set move atomically together
    return {"applied": True, "tick": tick_label, "n_groups": merged.num_rows}
