"""Reusable relational building blocks, Ray-Data-first.

Re-expresses the reference's join/aggregate machinery (SURVEY.md §2.5-2.9)
as composable Dataset ops: broadcast hash joins for small sides (the
scalable form of the driver-built FK set, ``src/etl/validate.py:243`` and
the pandas merges in ``src/etl/load.py:112-116``), two-level shuffles for
COUNT(DISTINCT), ``map_groups`` windows for RANK / percent-of-total.

All joins here broadcast the small side via one ``ray.put`` and probe it
inside ``map_batches`` with Arrow's C++ hash join — no all-to-all shuffle.
For large-by-large joins use ``Dataset.join`` (hash-partitioned) instead.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def read_table(sf_dir: str, name: str, columns: Sequence[str] | None = None,
               row_filter=None):
    """Column-pruned parquet read (prune at the read — only requested
    columns leave storage). ``row_filter`` (a ``pyarrow.dataset``
    expression, e.g. ``pc.field("d") >= lo``) is pushed into the scan:
    row groups whose statistics exclude the predicate are skipped
    entirely, survivors get the exact row-level filter inside the read
    task — rows the pipeline will drop never enter the object store."""
    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet",
        columns=list(columns) if columns else None,
        filter=row_filter,
    )


def read_arrow(sf_dir: str, name: str, columns: Sequence[str] | None = None) -> pa.Table:
    """Driver-side read of a *small* table destined for broadcast."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=list(columns) if columns else None)


def broadcast_join(ds, right: pa.Table, keys, join_type: str = "inner", right_keys=None):
    """Join each batch against a broadcast small table (ray.put once, Arrow
    C++ hash join per batch). ``join_type``: 'inner' | 'left outer'."""
    import ray

    ref = ray.put(right)
    keys = [keys] if isinstance(keys, str) else list(keys)
    rkeys = right_keys if right_keys else keys
    rkeys = [rkeys] if isinstance(rkeys, str) else list(rkeys)

    def _probe(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        return batch.join(r, keys=keys, right_keys=rkeys, join_type=join_type)

    return ds.map_batches(_probe, batch_format="pyarrow")


def broadcast_semi(ds, keys_arr: pa.Array, column: str, anti: bool = False):
    """Semi / anti membership filter against a broadcast key set (rule V8 /
    Q8 in the reference, ``src/etl/validate.py:239-255``, ``sql/queries.sql:94-99``)."""
    import ray

    ref = ray.put(keys_arr)

    def _filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        m = pc.is_in(batch.column(column), value_set=ks)
        if anti:
            m = pc.invert(m)
        return batch.filter(pc.fill_null(m, not anti if anti else False))

    return ds.map_batches(_filter, batch_format="pyarrow")


def count_distinct(ds, group_key: str, distinct_key: str, alias: str):
    """COUNT(DISTINCT x) GROUP BY k as a two-level shuffle:
    groupby([k, x]).count() -> groupby(k).count() (SURVEY.md A6)."""
    level1 = ds.groupby([group_key, distinct_key]).count()
    out = level1.groupby(group_key).count()
    return out.map_batches(
        lambda t: t.rename_columns([group_key, alias]), batch_format="pyarrow"
    )


def grouped_rank(
    ds,
    partition_key: str,
    order_key: str,
    descending: bool = True,
    tiebreak: str | None = None,
    top_n: int | None = None,
    rank_col: str = "rnk",
):
    """ROW_NUMBER() OVER (PARTITION BY p ORDER BY o [DESC], tiebreak) via
    per-group pandas sort (groups must fit in a worker — bounded partitions
    only, cf. reference Q6 ``sql/queries.sql:67-76``)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        by = [order_key] + ([tiebreak] if tiebreak else [])
        asc = [not descending] + ([True] if tiebreak else [])
        g = g.sort_values(by, ascending=asc, kind="mergesort").reset_index(drop=True)
        g[rank_col] = np.arange(1, len(g) + 1, dtype=np.int64)
        if top_n is not None:
            g = g.head(top_n)
        return g

    return ds.groupby(partition_key).map_groups(fn, batch_format="pandas")


def pct_of_group_total(ds, partition_key: str, value_col: str, pct_col: str, ndigits: int = 2):
    """100 * value / SUM(value) OVER (PARTITION BY p) via map_groups
    (reference Q9, ``sql/queries.sql:101-110``)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[pct_col] = (100.0 * g[value_col] / g[value_col].sum()).round(ndigits)
        return g

    return ds.groupby(partition_key).map_groups(fn, batch_format="pandas")


def dedup_keep_last(ds, keys: Sequence[str], order_col: str):
    """Exact dedup keep-LAST on key, ordered by an explicit ordinal column —
    the scalable re-expression of ``drop_duplicates(keep='last')``
    (``src/etl/transform.py:52-57``), which silently relied on pandas row
    order; Ray Data guarantees none, so the ordinal is required."""
    keys = list(keys)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[order_col].idxmax()]]

    return ds.groupby(keys).map_groups(fn, batch_format="pandas")


def _plan_schema(ds, given=None):
    """Schema for plan-building WITHOUT executing the upstream pipeline when
    avoidable: an explicit schema wins; else Ray's cached/metadata schema
    (``fetch_if_missing=False`` — free for pure parquet reads); else the
    executing ``ds.schema()`` as a last resort (callers of derived datasets
    should pass schemas explicitly)."""
    if given is not None:
        return given
    try:
        s = ds.schema(fetch_if_missing=False)
        if s is not None:
            return s
    except TypeError:
        pass
    return ds.schema()


def asof_join(
    left,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    right_tiebreak: str | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Distributed AS-OF (backward) join — for every left row, the right row
    with the greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (ANSI ``ASOF LEFT JOIN``; an operator Ray Data lacks natively).

    Shape: ONE exchange. Both sides are mapped to a shared schema (typed
    null padding for the other side's columns), unioned, and hash-shuffled
    once by the key; each group then splits by side, sorts by time, and
    matches left rows to right rows with a vectorized ``np.searchsorted``
    (no pandas dtype coercion — int64 keys survive > 2^53). Exact-equal
    timestamps match (``allow_exact_matches`` semantics, same as DuckDB).

    Partitioning assumption (documented per the custom-operator contract):
    one key's rows must fit in a worker — at web scale, pre-split hot keys
    by coarse time range (the same salting trick the encode shuffle uses)
    and merge boundaries. Ties on (key, right_ts) pick the row with the
    greatest ``right_tiebreak`` when given (the backward search lands on the
    LAST row in sort order — no pre-dedup pass needed); with no tiebreak
    they are arbitrary.
    """
    import ray  # noqa: F401  (Dataset.union ships with ray.data)

    right_payload = list(right_payload)
    lschema = _plan_schema(left, left_schema)
    ltypes = dict(zip(lschema.names, lschema.types))
    rschema = _plan_schema(right, right_schema)
    rtypes = dict(zip(rschema.names, rschema.types))
    left_cols = [c for c in lschema.names]  # includes `on` and left_ts
    out_order = left_cols + right_payload

    def pad_left(t: pa.Table) -> pa.Table:
        arrays = [t.column(c) for c in left_cols]
        names = list(left_cols)
        for c in right_payload:
            arrays.append(pa.nulls(t.num_rows, type=rtypes[c]))
            names.append(c)
        arrays.append(pa.nulls(t.num_rows, type=pa.int64()))  # __rts
        names.append("__rts")
        arrays.append(pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    def pad_right(t: pa.Table) -> pa.Table:
        # SQL equality/inequality never matches on NULL: right rows with a
        # null key or null timestamp can never join — drop them here so the
        # null-key group (if any) sees an empty right side downstream
        valid = pc.and_(
            t.column(on).is_valid(), t.column(right_ts).is_valid()
        )
        t = t.filter(valid)
        arrays, names = [], []
        for c in left_cols:
            if c == on:
                arrays.append(t.column(on))
            else:
                arrays.append(pa.nulls(t.num_rows, type=ltypes[c]))
            names.append(c)
        for c in right_payload:
            arrays.append(t.column(c))
            names.append(c)
        arrays.append(t.column(right_ts).cast(pa.int64()))
        names.append("__rts")
        arrays.append(pa.array(np.ones(t.num_rows, dtype=np.int8)))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    lu = left.map_batches(pad_left, batch_format="pyarrow")
    ru = right.map_batches(pad_right, batch_format="pyarrow")
    both = lu.union(ru)

    def per_key(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        l = g.filter(pa.array(side == 0))
        r = g.filter(pa.array(side == 1))
        l = l.take(pc.sort_indices(l, sort_keys=[(left_ts, "ascending")]))
        out_cols = {c: l.column(c) for c in left_cols}
        if r.num_rows == 0:
            for c in right_payload:
                out_cols[c] = pa.nulls(l.num_rows, type=rtypes[c])
            return pa.table({c: out_cols[c] for c in out_order})
        r_keys = [("__rts", "ascending")]
        if right_tiebreak is not None:
            r_keys.append((right_tiebreak, "ascending"))
        r = r.take(pc.sort_indices(r, sort_keys=r_keys))
        # A null left timestamp compares false to everything in SQL -> null
        # payload. It must ALSO never reach np.asarray: an int64 column with
        # nulls converts to float64, which both matches NaN rows to the last
        # right row and rounds keys above 2^53.
        lt_arr = l.column(left_ts).cast(pa.int64()).combine_chunks()
        null_lt = (
            np.asarray(lt_arr.is_null()) if lt_arr.null_count else None
        )
        lt = np.asarray(
            lt_arr.fill_null(0) if lt_arr.null_count else lt_arr
        )
        rt = np.asarray(r.column("__rts"))
        idx = np.searchsorted(rt, lt, side="right") - 1
        no_match = idx < 0
        if null_lt is not None:
            no_match = no_match | null_lt
        ind = pa.array(
            np.where(~no_match, idx, 0).astype(np.int64), mask=no_match
        )
        for c in right_payload:
            out_cols[c] = r.column(c).take(ind)
        return pa.table({c: out_cols[c] for c in out_order})

    return both.groupby(on).map_groups(per_key, batch_format="pyarrow")


def rolling_window_count(
    ds,
    key: str,
    ts_col: str,
    window_us: int,
    mark_col: str,
    out_col: str,
):
    """Sliding-window aggregate (an operator Ray Data lacks natively): for
    every row, the count of rows in the same ``key`` group with
    ``mark_col`` true and timestamp in ``(row.ts - window_us, row.ts]`` —
    the SQL ``COUNT(*) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    window PRECEDING AND CURRENT ROW)`` shape, or equivalently a
    self-range-join + group-count.

    ONE hash exchange on the key; within a group everything is two
    ``np.searchsorted`` calls over the sorted marked timestamps — O(n log n)
    per group, no per-row Python, no row explosion (a naive range join
    replicates each row per match; this never materializes matches).

    Partitioning assumption: one key's rows fit a worker (salt hot keys by
    coarse time range and merge boundary windows if not)."""

    def per_key(g: pa.Table) -> pa.Table:
        # SQL semantics on NULLs: a null key never equi-joins (the whole
        # null-key group counts 0) and a null timestamp compares false on
        # both window bounds (that row counts 0 and is never counted).
        if g.column(key).null_count:
            return g.append_column(
                out_col, pa.array(np.zeros(g.num_rows, dtype=np.int64))
            )
        g = g.take(pc.sort_indices(g, sort_keys=[(ts_col, "ascending")]))
        ts_arr = g.column(ts_col).combine_chunks()
        if pa.types.is_timestamp(ts_arr.type):
            # normalize to MICROSECONDS regardless of source unit (a
            # pandas-born timestamp[ns] column would otherwise compare
            # against a µs window 1000x too small)
            ts_arr = ts_arr.cast(pa.timestamp("us", ts_arr.type.tz))
        ts_arr = ts_arr.cast(pa.int64())
        null_ts = np.asarray(ts_arr.is_null()) if ts_arr.null_count else None
        ts = np.asarray(ts_arr.fill_null(0) if ts_arr.null_count else ts_arr)
        marked = np.asarray(
            pc.fill_null(g.column(mark_col), False)
        ).astype(bool)
        if null_ts is not None:
            marked = marked & ~null_ts
        mts = np.sort(ts[marked])
        cnt = np.searchsorted(mts, ts, side="right") - np.searchsorted(
            mts, ts - window_us, side="right"
        )
        if null_ts is not None:
            cnt = np.where(null_ts, 0, cnt)
        return g.append_column(out_col, pa.array(cnt.astype(np.int64)))

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def grouped_string_agg(
    ds,
    key: str,
    val: str,
    order_by: Sequence[str],
    sep: str = ",",
    out_col: str = "agg",
):
    """Ordered string aggregation — SQL ``STRING_AGG(val, sep ORDER BY
    ...)`` per group (the "user journey" / sequence-reconstruction shape a
    behavioural corpus needs). ONE hash exchange on the key; inside each
    group a vectorized Arrow sort + ``binary_join`` (no per-row Python).
    SQL NULL semantics: NULL ``val`` elements are skipped; a group whose
    every value is NULL aggregates to NULL. The deterministic ``order_by``
    must break all ties or cross-engine output is underdefined."""

    def per_key(g: pa.Table) -> pa.Table:
        g = g.take(
            pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_by])
        )
        v = g.column(val).combine_chunks()
        if v.null_count:
            v = v.filter(v.is_valid())
        joined = (
            pc.binary_join(
                pa.ListArray.from_arrays([0, len(v)], v.cast(pa.string())),
                pa.scalar(sep),
            )[0].as_py()
            if len(v)
            else None
        )
        return pa.table(
            {
                key: g.column(key).slice(0, 1),
                out_col: pa.array([joined], pa.string()),
                "n_vals": pa.array([len(v)], pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def rolling_window_sum(
    ds,
    key: str,
    ts_col: str,
    window_us: int,
    val_col: str,
    out_col: str,
):
    """Trailing time-range windowed SUM — the SQL ``SUM(val) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)`` shape, with SQL RANGE-frame semantics exactly:

    - the frame is INCLUSIVE on both ends: rows with ``ts`` in
      ``[row.ts - window_us, row.ts]`` (peers — equal timestamps — are
      always in each other's frames, regardless of physical order);
    - NULL ``val`` rows contribute nothing but still get an output row;
    - NULL ``ts`` rows form their own peer group (DuckDB NULLS LAST): each
      sums all null-ts values in its key; a frame with no non-null
      contributions yields NULL (SUM over an empty/all-null set).

    Same scale shape as :func:`rolling_window_count`: ONE hash exchange on
    the key, then two ``np.searchsorted`` probes over a per-group prefix-sum
    array — O(n log n) per group, no row explosion, no per-row Python.
    Integer ``val`` sums exactly in int64 (the oracle-parity path: scale
    money/doubles to integer units upstream); floats sum in float64.

    Partitioning assumption: one key's rows fit a worker (salt hot keys by
    coarse time range and merge boundary windows if not)."""

    def per_key(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(ts_col, "ascending")]))
        ts_arr = g.column(ts_col).combine_chunks()
        if pa.types.is_timestamp(ts_arr.type):
            # normalize to MICROSECONDS regardless of source unit —
            # pandas-born columns arrive as timestamp[ns] and would
            # otherwise compare against a µs window 1000x too small
            ts_arr = ts_arr.cast(pa.timestamp("us", ts_arr.type.tz))
        ts_arr = ts_arr.cast(pa.int64())
        null_ts = (
            np.asarray(ts_arr.is_null())
            if ts_arr.null_count
            else np.zeros(g.num_rows, dtype=bool)
        )
        ts = np.asarray(ts_arr.fill_null(0) if ts_arr.null_count else ts_arr)
        v_arr = g.column(val_col).combine_chunks()
        null_v = (
            np.asarray(v_arr.is_null())
            if v_arr.null_count
            else np.zeros(g.num_rows, dtype=bool)
        )
        is_int = pa.types.is_integer(v_arr.type)
        acc = np.int64 if is_int else np.float64
        vals = np.asarray(v_arr.fill_null(0) if v_arr.null_count else v_arr).astype(acc)
        contrib = ~null_ts & ~null_v  # rows whose value lands in a frame
        live = ~null_ts  # frame membership ignores val-nullness
        lts = ts[live]
        # prefix over live rows, null-val contributions zeroed
        ps = np.concatenate(([acc(0)], np.cumsum(vals[live] * contrib[live])))
        # count of non-null contributions per prefix — needed to emit SQL
        # NULL when a frame holds no non-null values
        pn = np.concatenate(([0], np.cumsum(contrib[live].astype(np.int64))))
        hi = np.searchsorted(lts, ts, side="right")
        lo = np.searchsorted(lts, ts - np.int64(window_us), side="left")
        out = ps[hi] - ps[lo]
        n_in = pn[hi] - pn[lo]
        if null_ts.any():
            # the null-ts peer group: every such row sums ALL null-ts
            # contributions in the key
            nv = vals[null_ts & ~null_v]
            out = np.where(null_ts, nv.sum() if len(nv) else acc(0), out)
            n_in = np.where(null_ts, len(nv), n_in)
        result = pa.array(out.astype(acc), type=pa.int64() if is_int else pa.float64())
        if (n_in == 0).any():
            result = pc.if_else(
                pa.array(n_in > 0), result,
                pa.scalar(None, pa.int64() if is_int else pa.float64()),
            )
        return g.append_column(out_col, result)

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def range_join(
    left,
    right,
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    right_payload: Sequence[str],
    closed: str = "left",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Distributed RANGE (interval) join — every (left point, right interval)
    pair with equal ``on`` key and ``left_ts`` inside
    ``[right_start, right_end)`` (``closed="left"``, the default) or
    ``[right_start, right_end]`` (``closed="both"``). The inner-join
    companion to :func:`asof_join`; Ray Data has no native inequality join.

    Shape: ONE exchange, same as asof_join — both sides padded to a shared
    schema, unioned, hash-shuffled once by the key. Inside a group the pair
    expansion is fully vectorized: points sorted once, each interval's match
    range found with two ``np.searchsorted`` calls, and the pairs emitted
    with a repeat/cumsum index build — no per-row Python even when intervals
    overlap arbitrarily. Output size is the true join cardinality (a range
    join DOES replicate points across overlapping intervals — when only a
    count is needed use :func:`rolling_window_count`, which never
    materializes pairs).

    SQL NULL semantics: right rows with a null key/start/end can never
    match and are dropped at the pad; left rows with a null key or null
    timestamp never match (inner join — dropped inside the group).

    Partitioning assumption (custom-operator contract): one key's rows fit
    in a worker; salt hot keys by coarse time range (splitting INTERVALS
    needs the point side replicated into every salted slot the interval's
    [start, end) span overlaps — the same boundary-merge trick the encode
    shuffle documents)."""
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    right_payload = list(right_payload)
    lschema = _plan_schema(left, left_schema)
    rschema = _plan_schema(right, right_schema)
    rtypes = dict(zip(rschema.names, rschema.types))
    left_cols = list(lschema.names)
    out_order = left_cols + right_payload
    end_side = "left" if closed == "left" else "right"

    def pad_left(t: pa.Table) -> pa.Table:
        valid = pc.and_(
            t.column(on).is_valid(), t.column(left_ts).is_valid()
        )
        t = t.filter(valid)
        arrays = [t.column(c) for c in left_cols]
        names = list(left_cols)
        for c in right_payload:
            arrays.append(pa.nulls(t.num_rows, type=rtypes[c]))
            names.append(c)
        arrays.append(pa.nulls(t.num_rows, type=pa.int64()))
        names.append("__rs")
        arrays.append(pa.nulls(t.num_rows, type=pa.int64()))
        names.append("__re")
        arrays.append(pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    ltypes = dict(zip(lschema.names, lschema.types))

    def pad_right(t: pa.Table) -> pa.Table:
        valid = pc.and_(
            pc.and_(
                t.column(on).is_valid(), t.column(right_start).is_valid()
            ),
            t.column(right_end).is_valid(),
        )
        t = t.filter(valid)
        arrays, names = [], []
        for c in left_cols:
            arrays.append(
                t.column(on) if c == on
                else pa.nulls(t.num_rows, type=ltypes[c])
            )
            names.append(c)
        for c in right_payload:
            arrays.append(t.column(c))
            names.append(c)
        arrays.append(t.column(right_start).cast(pa.int64()))
        names.append("__rs")
        arrays.append(t.column(right_end).cast(pa.int64()))
        names.append("__re")
        arrays.append(pa.array(np.ones(t.num_rows, dtype=np.int8)))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    lu = left.map_batches(pad_left, batch_format="pyarrow")
    ru = right.map_batches(pad_right, batch_format="pyarrow")
    both = lu.union(ru)

    def per_key(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        l = g.filter(pa.array(side == 0))
        empty = pa.table(
            {c: pa.chunked_array([], type=(ltypes | rtypes)[c])
             for c in out_order}
        )
        if l.num_rows == 0:
            return empty
        r = g.filter(pa.array(side == 1))
        if r.num_rows == 0:
            return empty
        l = l.take(pc.sort_indices(l, sort_keys=[(left_ts, "ascending")]))
        # pad_left dropped null timestamps, so the int64 view is exact
        pts = np.asarray(l.column(left_ts).cast(pa.int64()).combine_chunks())
        rs = np.asarray(r.column("__rs"))
        re_ = np.asarray(r.column("__re"))
        lo = np.searchsorted(pts, rs, side="left")
        hi = np.searchsorted(pts, re_, side=end_side)
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        int_idx = np.repeat(np.arange(len(counts)), counts)
        starts = np.cumsum(counts) - counts
        pt_idx = (
            np.arange(total)
            - np.repeat(starts, counts)
            + np.repeat(lo, counts)
        )
        pt_ind = pa.array(pt_idx.astype(np.int64))
        int_ind = pa.array(int_idx.astype(np.int64))
        out_cols = {c: l.column(c).take(pt_ind) for c in left_cols}
        for c in right_payload:
            out_cols[c] = r.column(c).take(int_ind)
        return pa.table({c: out_cols[c] for c in out_order})

    return both.groupby(on).map_groups(per_key, batch_format="pyarrow")


def unpivot(
    ds,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
):
    """UNPIVOT / ``pandas.melt`` — wide metric columns to long
    (id..., metric, value) rows. Embarrassingly parallel: one
    ``map_batches`` that concatenates a per-metric projection of the batch
    (id columns zero-copy repeated per metric, values cast to a common
    type); no shuffle, no driver work, output rows = n x len(value_cols).
    Reference analog: the pandas ETL's wide-to-long reshapes (melt)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    vt = value_type or pa.float64()

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            cols[var_name] = pa.array(
                np.full(t.num_rows, vc, dtype=object), type=pa.string()
            )
            cols[value_name] = t.column(vc).cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def case_when(batch: pa.Table, column: str, cases: list[tuple], default, out_col: str) -> pa.Table:
    """Nested CASE WHEN over one column: cases = [(op, threshold, label)]
    evaluated in order (reference Q3 qc_status, ``sql/queries.sql:33-38``)."""
    col = batch.column(column)
    result = pa.array([default] * len(batch), type=pa.string())
    for op, value, label in reversed(cases):
        cond = getattr(pc, op)(col, value)
        result = pc.if_else(cond, pa.scalar(label, type=pa.string()), result)
    return batch.append_column(out_col, result)


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None):
    """Large-by-large hash-partitioned join (``Dataset.join``) — the
    shuffle-both-sides complement to ``broadcast_join`` (reference J3/J4
    when neither side is a small dim). Requires the HASH_SHUFFLE strategy
    context; both sides are exchanged on the key, so prefer broadcast when
    one side fits in memory.

    ``num_partitions`` defaults to ``min(16, cluster CPUs)``: each
    JoinOperator reserves a CPU budget proportional to its partition count
    for its aggregator actors, and oversizing it on a small cluster (or two
    live joins in one plan) starves the map stages into a deadlock. Callers
    chaining joins should ``materialize()`` between them so only one
    JoinOperator's aggregator pool is alive at a time."""
    import ray
    import ray.data

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(16, cpus))

    ctx = ray.data.DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ray.data.context.ShuffleStrategy.HASH_SHUFFLE
    try:
        on = (on,) if isinstance(on, str) else tuple(on)
        r_on = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
        return left.join(
            right, join_type=join_type, num_partitions=num_partitions,
            on=on, right_on=r_on,
        )
    finally:
        ctx.shuffle_strategy = prev


def skew_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    hot_frac: float = 0.01,
    sample_rows: int = 65536,
    num_partitions: int | None = None,
    hot_keys: list | None = None,
):
    """Skew-aware large-by-large inner join: hot keys bypass the hash
    exchange.

    A plain hash-partitioned join sends every row of a hot key to ONE
    aggregator — at 100 TB a single celebrity key can hold a whole
    partition hostage. Here a block-spread sample of ``left`` estimates
    key frequencies; keys above ``hot_frac`` of the sample are joined via
    broadcast (the right side's matching rows — dim-like by assumption,
    it is the LEFT side that is skewed — ship once via ``ray.put``), and
    only the cold remainder goes through the hash exchange. Result =
    union, column-aligned (both Ray ``Dataset.join`` and Arrow's join
    emit left columns + right-minus-key).

    ``hot_keys`` overrides detection when the caller already knows the
    skew (e.g. from a profile pass). With no hot keys detected this is
    exactly :func:`hash_join`."""
    rk = right_on or on

    if hot_keys is None:
        per_block = max(64, sample_rows // 32)
        sample = (
            left.select_columns([on])
            .map_batches(lambda df: df.head(per_block), batch_format="pandas")
            .limit(sample_rows)
            .to_pandas()
        )
        counts = sample[on].value_counts()
        hot_keys = counts[counts > max(1, int(hot_frac * len(sample)))].index.tolist()

    if not hot_keys:
        return hash_join(left, right, on=on, right_on=rk, num_partitions=num_partitions)

    hot_arr = pa.array(hot_keys)

    def _in(col_name, invert=False):
        def f(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column(col_name), value_set=hot_arr)
            if invert:
                m = pc.invert(m)
            return t.filter(pc.fill_null(m, False))

        return f

    # hot path: right's matching rows collected once (bounded: |hot_keys| ×
    # right-rows-per-key; the skew premise is a hot LEFT, dim-like right)
    right_hot = pa.concat_tables(
        list(
            right.map_batches(_in(rk), batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ),
        promote_options="default",
    )
    left_hot = left.map_batches(_in(on), batch_format="pyarrow")
    hot_joined = broadcast_join(left_hot, right_hot, keys=on, right_keys=rk)

    left_cold = left.map_batches(_in(on, invert=True), batch_format="pyarrow")
    right_cold = right.map_batches(_in(rk, invert=True), batch_format="pyarrow")

    # Ray's hash-shuffle join crashes on a fully-EMPTY side (the aggregator
    # sees a schema-less partition) — and with heavy skew the cold side can
    # legitimately be empty. Union an all-NULL sentinel row into each side:
    # null join keys never match (SQL semantics, verified for Dataset.join),
    # so the sentinels keep every partition schema-ful and add zero result
    # rows to the inner join.
    import ray.data

    def _sentinel(ds_side):
        sch = _plan_schema(ds_side)
        return ray.data.from_arrow(
            pa.table({n: pa.nulls(1, type=t) for n, t in zip(sch.names, sch.types)})
        )

    cold_joined = hash_join(
        left_cold.union(_sentinel(left)),
        right_cold.union(_sentinel(right)),
        on=on,
        right_on=rk,
        num_partitions=num_partitions,
    )

    cols = list(_plan_schema(left).names) + [
        c for c in _plan_schema(right).names if c != rk
    ]
    return hot_joined.select_columns(cols).union(cold_joined.select_columns(cols))


# ---------------------------------------------------------------------------
# Bloom-filter semi join — pre-filter the probe side before the exchange
# ---------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 multiplier


def _bloom_hashes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams for a key column (ints or
    strings), fully vectorized. ``pd.util.hash_array`` (SipHash in C) gives
    the first; the second is its murmur3-finalizer mix — ``hash_key`` only
    perturbs OBJECT arrays in pandas, so deriving h2 from h1 is the only
    form that stays consistent across int64 and string keys."""
    if isinstance(col, pa.Array):
        col = pa.chunked_array([col])
    if pa.types.is_integer(col.type):
        # cast BEFORE to_numpy: a nullable int column converts to float64
        # + NaN otherwise (hash mismatch vs the null-free side), and int32
        # keys must hash identically to int64 keys on the other side.
        # Callers strip nulls first, so the cast column is dense int64.
        vals = col.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    elif pa.types.is_floating(col.type):
        vals = col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        vals = np.asarray(col, dtype=object)
    h1 = pd.util.hash_array(vals).astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h1 ^ (h1 >> np.uint64(33))) * _BLOOM_MIX
        h2 ^= h2 >> np.uint64(29)
    return h1, h2


def build_key_bloom(ds, column: str, bits: int = 1 << 23) -> bytes:
    """Distributed Bloom filter (k=2) over ``ds[column]``.

    Each input block folds its keys into one ``bits/8``-byte bitmap inside
    ``map_batches`` (rows never leave their block), then the per-block
    bitmaps are OR-merged by a fan-in-8 TREE of Ray tasks — log-depth, the
    driver receives exactly one final bitmap and never a partial, so the
    reduction works unchanged when the build side is 10^5 blocks on a real
    cluster. ``bits`` must be a power of two; size it at ~8-10 bits per
    expected distinct key (the default 2^23 = 1 MiB bitmap holds ~1M keys
    at ~5% FPR — and an undersized filter only loses pruning, never
    correctness). NULL keys are skipped (SQL ``IN`` semantics)."""
    import ray

    if bits & (bits - 1):
        raise ValueError(f"bits must be a power of two, got {bits}")
    mask = np.uint64(bits - 1)
    nbytes = bits >> 3

    def _block_bloom(t: pa.Table) -> pa.Table:
        buf = np.zeros(nbytes, dtype=np.uint8)
        col = t.column(column)
        col = col.filter(pc.is_valid(col)) if col.null_count else col
        if len(col):
            for h in _bloom_hashes(col):
                p = h & mask
                np.bitwise_or.at(
                    buf,
                    (p >> np.uint64(3)).astype(np.int64),
                    np.uint8(1) << (p & np.uint64(7)).astype(np.uint8),
                )
        return pa.table({"bloom": pa.array([buf.tobytes()], pa.large_binary())})

    refs = (
        ds.select_columns([column])
        .map_batches(_block_bloom, batch_format="pyarrow")
        .to_arrow_refs()
    )
    if not refs:
        return b"\x00" * nbytes

    @ray.remote
    def _or_merge(*tables: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for tb in tables:
            # zero-row input blocks pass through map_batches with their
            # ORIGINAL schema — skip anything that isn't a bitmap row
            if "bloom" not in tb.schema.names:
                continue
            for blob in tb.column("bloom").to_pylist():
                np.bitwise_or(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.large_binary())})

    while len(refs) > 1:
        refs = [_or_merge.remote(*refs[i:i + 8]) for i in range(0, len(refs), 8)]
    final = ray.get(refs[0])
    if "bloom" not in final.schema.names or not final.num_rows:
        return b"\x00" * nbytes  # empty build side: nothing can match
    return final.column("bloom").to_pylist()[0]


def bloom_prefilter(ds, column: str, bloom: bytes, bits: int):
    """Keep only rows whose key MIGHT be in the Bloom filter (false
    positives pass — pair with an exact verify; false negatives are
    impossible). One ``ray.put`` of the bitmap, probed per batch."""
    import ray

    ref = ray.put(np.frombuffer(bloom, dtype=np.uint8))
    mask = np.uint64(bits - 1)

    def _probe(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if col.null_count:  # NULL keys never match (SQL IN semantics) —
            # drop FIRST so nullable ints don't hash through float64
            t = t.filter(pc.is_valid(col))
            col = t.column(column)
        if not t.num_rows:
            return t
        bm = ray.get(ref)
        h1, h2 = _bloom_hashes(col)
        keep = np.ones(t.num_rows, dtype=bool)
        for h in (h1, h2):
            p = h & mask
            keep &= (
                bm[(p >> np.uint64(3)).astype(np.int64)]
                >> (p & np.uint64(7)).astype(np.uint8)
            ) & 1 > 0
        return t.filter(pa.array(keep))

    return ds.map_batches(_probe, batch_format="pyarrow")


def bloom_semi_join(left, right, on: str, right_on: str | None = None,
                    bits: int = 1 << 23, num_partitions: int | None = None):
    """Large-by-large SEMI join (``left WHERE on IN (SELECT rk FROM
    right)``) for the regime where the build side's distinct key set is
    too big to broadcast exactly but its Bloom fits in every worker.

    At 100 TB the expensive thing is the exchange: a plain hash semi-join
    ships EVERY probe-side row. Here (1) a 1-MiB-scale Bloom over the
    build keys is tree-reduced and broadcast once, (2) the probe side is
    pre-filtered in place — with a selective predicate on the build side
    almost all non-matching rows die before any shuffle, (3) the
    survivors go through one exact hash-partitioned inner join against
    the build side's DISTINCT keys (distinct ⇒ inner emits each
    surviving left row at most once ⇒ true semi semantics, and Bloom
    false positives are eliminated). Result is exact for ANY filter
    load — the Bloom only sizes the exchange, never the answer."""
    import ray.data

    rk = right_on or on
    right_keys = right.select_columns([rk])
    bloom = build_key_bloom(right_keys, rk, bits)
    survivors = bloom_prefilter(left, on, bloom, bits)
    distinct = right_keys.groupby(rk).count().select_columns([rk])

    # all-NULL sentinel rows keep every hash-join partition schema-ful
    # when a side is legitimately empty (cf. skew_join); NULL keys never
    # match, so they add zero result rows.
    def _sentinel(sch):
        return ray.data.from_arrow(
            pa.table({n: pa.nulls(1, type=t) for n, t in zip(sch.names, sch.types)})
        )

    lsch = _plan_schema(left)
    # the distinct side's schema comes from the INPUT projection (an
    # aggregate's plan schema isn't resolvable without executing it)
    rsch = _plan_schema(right_keys)
    ksch = pa.schema([(rk, rsch.types[list(rsch.names).index(rk)])])
    joined = hash_join(
        survivors.union(_sentinel(lsch)),
        distinct.union(_sentinel(ksch)),
        on=on,
        right_on=rk,
        num_partitions=num_partitions,
    )
    return joined.select_columns(list(lsch.names))
