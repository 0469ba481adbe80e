"""Dataset profiling as streaming partial aggregates — the scalable form of
the reference's profiling module (``src/profiling.py:12-134``: per-column
stats, duplicate counts, quality score). One ``map_batches`` pass emits
per-batch partial stats; the driver combines tiny partials. These are the
SAME statistics (cardinality, null rate, run structure) that drive the
per-chunk codec auto-selector (``codecs/selector.py``), computed here at
dataset granularity for user-facing profiling.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# -- HyperLogLog (Flajolet et al. '07) --------------------------------------

_HLL_P = 12                      # 4096 uint8 registers = 4 KB per sketch
_HLL_M = 1 << _HLL_P


def _hll_registers(values: np.ndarray, hash_fn: str = "default") -> np.ndarray:
    """Vectorized HLL update: hash -> top-p bits pick the register, rank =
    leading-zero count of the remaining bits + 1. frexp gives the exact bit
    length for < 2^53, which the low 52 bits always are.

    ``hash_fn="md5"``: hash ``str(v)`` with MD5 and take the lower 8
    digest bytes little-endian — bit-identical to DuckDB's
    ``md5_number_lower(CAST(v AS VARCHAR))``, which makes the whole sketch
    SQL-oracle-checkable (the hashlib loop runs over DISTINCT values only,
    all a sketch can see). Production keeps the C-vectorized default."""
    import pandas as pd

    reg = np.zeros(_HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return reg
    if hash_fn == "md5":
        import hashlib

        uniq = np.unique(values.astype(str))
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[8:16], "little"
                )
                for s in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
    else:
        h = pd.util.hash_array(values)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    low = (h & np.uint64((1 << 52) - 1)).astype(np.float64)
    bitlen = np.frexp(low)[1]            # 0 for low==0
    rank = (53 - bitlen).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _hll_estimate(reg: np.ndarray) -> int:
    """Register -> cardinality estimate. The harmonic sum is computed as an
    EXACT integer (Σ 2^(53-rank), every term a power of two ≤ 2^53) so the
    result is independent of summation order — the one float division and
    the linear-counting log then mirror 1:1 into SQL (the oracle for the
    md5-mode grouped sketch reproduces this formula verbatim)."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    # Σ over 4096 registers can exceed 2^64 — fold the rank histogram with
    # Python ints (54 terms), never a uint64 accumulator
    counts = np.bincount(reg, minlength=54)
    s_int = sum(int(c) << (53 - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m * 9007199254740992.0 / float(s_int)  # 2^53 / S
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)      # linear counting for small ranges
    return int(round(est))


def _column_sketch(col: pa.ChunkedArray | pa.Array) -> bytes:
    """HLL registers for one column chunk, or b'' for unhashable types
    (nested lists/tensors — nunique is not meaningful there)."""
    try:
        v = col.drop_null()
        if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
            vals = np.asarray(v, dtype=object)
        else:
            vals = np.asarray(v)
        return _hll_registers(vals).tobytes()
    except (TypeError, ValueError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return b""


def approx_nunique(ds, columns: list[str]) -> dict[str, int]:
    """Distributed distinct-count estimate: one streaming pass emitting a
    4 KB HLL sketch per column per block; sketches merge by elementwise max
    on the driver. ~1-2% relative error at p=12 — the scale path where an
    exact two-level groupby shuffle isn't worth it (reference
    ``src/profiling.py:12-42`` computes per-column nunique exactly)."""
    def part(t: pa.Table) -> pa.Table:
        return pa.table({
            name: pa.array([_column_sketch(t.column(name))], type=pa.binary())
            for name in columns
        })

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    out = {}
    for name in columns:
        merged = np.zeros(_HLL_M, dtype=np.uint8)
        ok = False
        for p in parts:
            if p[name]:
                merged = np.maximum(merged, np.frombuffer(p[name], dtype=np.uint8))
                ok = True
        out[name] = _hll_estimate(merged) if ok else None
    return out


def exact_nunique(ds, column: str, hash_wide: bool = False) -> int:
    """Exact distinct count via the groupby shuffle (distinct keys, then
    count rows) — the companion to :func:`approx_nunique` when exactness
    matters more than the all-to-all exchange.

    ``hash_wide=True`` replaces the value with a 128-bit composite hash
    before the exchange (two independent SipHash-64 passes, same trick as
    the exact-dedup operator) so a distinct count over a WIDE column (e.g.
    document text) ships 16 bytes/row instead of the column — exact up to
    128-bit birthday collisions (~1e-15 expected at 10^12 rows)."""
    if hash_wide:
        def key_hash(t: pa.Table) -> pa.Table:
            vals = np.asarray(t.column(column).cast(pa.string()), dtype=object)
            h1 = pd.util.hash_array(vals, hash_key="nuniquewidekey_1")
            h2 = pd.util.hash_array(vals, hash_key="nuniquewidekey_2")
            return pa.table(
                {"h1": pa.array(h1.view(np.int64)), "h2": pa.array(h2.view(np.int64))}
            )

        keyed = ds.select_columns([column]).map_batches(
            key_hash, batch_format="pyarrow"
        )
        return keyed.groupby(["h1", "h2"]).count().count()
    return ds.select_columns([column]).groupby(column).count().count()


def _batch_partial(batch: pa.Table, columns: list[str]) -> pa.Table:
    out: dict[str, Any] = {"_rows": [batch.num_rows]}
    for name in columns:
        col = batch.column(name)
        out[f"{name}__nulls"] = [col.null_count]
        out[f"{name}__hll"] = [_column_sketch(col)]
        typ = col.type
        if pa.types.is_integer(typ) or pa.types.is_floating(typ) or pa.types.is_timestamp(typ):
            valid = col.drop_null()
            has = len(valid) > 0
            out[f"{name}__min"] = [pc.min(valid).as_py() if has else None]
            out[f"{name}__max"] = [pc.max(valid).as_py() if has else None]
            if pa.types.is_timestamp(typ):
                out[f"{name}__sum"] = [None]
            else:
                out[f"{name}__sum"] = [pc.sum(valid).as_py() if has else 0]
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
            lens = pc.utf8_length(col.drop_null())
            has = len(lens) > 0
            out[f"{name}__strlen_min"] = [pc.min(lens).as_py() if has else None]
            out[f"{name}__strlen_max"] = [pc.max(lens).as_py() if has else None]
            out[f"{name}__strlen_sum"] = [pc.sum(lens).as_py() if has else 0]
    return pa.table(out)


def profile_dataset(ds, columns: list[str] | None = None) -> dict[str, Any]:
    """Per-column profile: rows, null counts/rates, min/max/mean (numeric),
    string-length stats. Single streaming pass; partials combined on the
    driver (reference A1/A2, ``profiling.py:12-66``)."""
    schema = ds.schema()
    columns = columns or schema.names
    parts = ds.map_batches(
        lambda t: _batch_partial(t, columns), batch_format="pyarrow"
    ).take_all()  # one tiny row per input block
    rows = sum(p["_rows"] for p in parts)
    prof: dict[str, Any] = {"rows": rows, "columns": {}}
    for name in columns:
        c: dict[str, Any] = {"nulls": sum(p[f"{name}__nulls"] for p in parts)}
        c["null_rate"] = c["nulls"] / rows if rows else 0.0
        merged = np.zeros(_HLL_M, dtype=np.uint8)
        any_hll = False
        for p in parts:
            sk = p.get(f"{name}__hll")
            if sk:
                merged = np.maximum(merged, np.frombuffer(sk, dtype=np.uint8))
                any_hll = True
        c["nunique_approx"] = _hll_estimate(merged) if any_hll else None
        def _agg(key, fn):
            vals = [p[key] for p in parts if p.get(key) is not None]
            return fn(vals) if vals else None
        if f"{name}__min" in (parts[0] if parts else {}):
            c["min"] = _agg(f"{name}__min", min)
            c["max"] = _agg(f"{name}__max", max)
            s = _agg(f"{name}__sum", sum)
            n_valid = rows - c["nulls"]
            if s is not None and n_valid:
                c["mean"] = s / n_valid
        if parts and f"{name}__strlen_min" in parts[0]:
            c["strlen_min"] = _agg(f"{name}__strlen_min", min)
            c["strlen_max"] = _agg(f"{name}__strlen_max", max)
            s = _agg(f"{name}__strlen_sum", sum)
            n_valid = rows - c["nulls"]
            if s is not None and n_valid:
                c["strlen_mean"] = s / n_valid
        prof["columns"][name] = c
    return prof


def duplicate_row_count(ds, key_columns: list[str]) -> int:
    """Whole-row (or key-subset) duplicate count via groupby shuffle
    (reference A2/D2 ``df.duplicated().sum()``, ``profiling.py:54``)."""
    counts = ds.groupby(list(key_columns)).count()

    def excess(t: pa.Table) -> pa.Table:
        c = t.column("count()")
        extra = pc.subtract(c, 1)
        return pa.table({"extra": pa.array([pc.sum(extra).as_py() or 0], type=pa.int64())})

    parts = counts.map_batches(excess, batch_format="pyarrow").take_all()
    return int(sum(p["extra"] for p in parts))


def quality_score(profile: dict[str, Any], dup_count: int = 0) -> float:
    """0-100 data-quality score from missing% and duplicate% — the
    reference's formula shape (``profiling.py:84-109``)."""
    rows = profile["rows"] or 1
    n_cols = len(profile["columns"]) or 1
    missing_rate = sum(c["nulls"] for c in profile["columns"].values()) / (rows * n_cols)
    dup_rate = dup_count / rows
    score = 100.0 * (1.0 - 0.6 * min(missing_rate * 2, 1.0) - 0.4 * min(dup_rate * 2, 1.0))
    return float(np.clip(score, 0.0, 100.0))


def flag_outliers_zscore(ds, column: str, threshold: float = 3.0):
    """Two-pass z-score outlier flagging (reference V11,
    ``src/profiling.py:69-81``): exact integer-scaled sums -> broadcast mean
    and population std -> vectorized filter. The cents-scaling keeps the
    moments exact regardless of Ray's block summation order."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column(column), 100.0)).cast(pa.int64())
        sq = pc.multiply(cents, cents)
        return pa.table(
            {
                "n": pa.array([len(t) - t.column(column).null_count], type=pa.int64()),
                "s": pa.array([pc.sum(cents).as_py() or 0], type=pa.int64()),
                "sq": pa.array([pc.sum(sq).as_py() or 0], type=pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["n", "s", "sq"])
    n = int(agg["sum(n)"])
    mean = agg["sum(s)"] / 100.0 / n
    var = agg["sum(sq)"] / 10000.0 / n - mean * mean
    std = var**0.5

    def flag(t: pa.Table) -> pa.Table:
        z = pc.divide(pc.subtract(t.column(column), mean), std)
        keep = pc.greater(pc.abs(z), threshold)
        return t.filter(pc.fill_null(keep, False))

    return ds.map_batches(flag, batch_format="pyarrow")


def approx_quantiles(ds, column: str, qs: list[float], bins: int = 8192) -> list[float]:
    """Distributed quantile sketch: per-batch min/max partials, then a
    per-batch fixed-width histogram summed across the cluster (both passes
    are column-pruned map_batches + a tiny aggregate — the column never
    collects on the driver). Quantiles interpolate inside the hit bin, so
    the error is bounded by (max-min)/bins."""
    import numpy as np
    import pyarrow.compute as pc

    def mm(t: pa.Table) -> pa.Table:
        c = t.column(column).drop_null()
        if len(c) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "mn": pa.array([pc.min(c).as_py()], pa.float64()),
            "mx": pa.array([pc.max(c).as_py()], pa.float64()),
        })

    from ray.data.aggregate import Max, Min

    col = ds.select_columns([column])
    agg = col.map_batches(mm, batch_format="pyarrow").aggregate(
        Min("mn"), Max("mx")
    )
    lo_v, hi_v = float(agg["min(mn)"]), float(agg["max(mx)"])
    if not np.isfinite(lo_v) or hi_v <= lo_v:
        return [lo_v for _ in qs]
    edges = np.linspace(lo_v, hi_v, bins + 1)

    def hist(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(column).drop_null(), dtype=np.float64)
        h, _ = np.histogram(v, bins=edges)
        return pa.table({"bin": np.arange(bins, dtype=np.int64), "cnt": h})

    hdf = (
        col.map_batches(hist, batch_format="pyarrow")
        .groupby("bin").sum("cnt").to_pandas()
        .sort_values("bin")
    )
    counts = np.zeros(bins, dtype=np.int64)
    counts[hdf["bin"].to_numpy()] = hdf["sum(cnt)"].to_numpy()
    cum = np.cumsum(counts)
    total = cum[-1]
    out = []
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        inbin = counts[b] or 1
        frac = (target - prev) / inbin
        out.append(float(edges[b] + frac * (edges[b + 1] - edges[b])))
    return out


def exact_quantiles(
    ds,
    column: str,
    qs: list[float],
    bins: int = 8192,
    collect_cap: int = 5_000_000,
    ranks_for_n=None,
) -> list[float]:
    """EXACT discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    element at 0-based rank ``max(ceil(q*n)-1, 0)``) without ever sorting
    or collecting the column.

    With ``ranks_for_n`` (a callable ``n -> list[int]`` of 0-based ranks)
    the function instead resolves arbitrary order statistics and returns
    ``{"kind": "ok", "n": n, "values": [...]}`` (or ``{"kind": "empty"}`` /
    ``{"kind": "const", "value": v}`` for degenerate columns) — the
    building block :func:`quantile_cont` interpolates on.

    Shape: the :func:`approx_quantiles` histogram locates the bin holding
    each target rank; a final pruned pass collects ONLY the values inside
    the hit bins (a ``1/bins`` fraction of the data in expectation) and
    selects the exact order statistic locally with ``np.partition``. A
    pathological bin holding more than ``collect_cap`` values (extreme
    skew — most mass on one value range) is refined with a sub-histogram
    before collecting, so the driver transfer stays bounded at any scale.
    Cost: 2 column-pruned scans + 1 filtered scan per refinement level
    (almost always zero levels)."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    def _mm(t: pa.Table) -> pa.Table:
        c = t.column(column).drop_null()
        if len(c) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "mn": pa.array([pc.min(c).as_py()], pa.float64()),
            "mx": pa.array([pc.max(c).as_py()], pa.float64()),
        })

    def _hist_counts(col_ds, edges: np.ndarray) -> np.ndarray:
        nb = len(edges) - 1

        def hist(t: pa.Table) -> pa.Table:
            v = np.asarray(t.column(column).drop_null(), dtype=np.float64)
            h, _ = np.histogram(v, bins=edges)
            return pa.table({"bin": np.arange(nb, dtype=np.int64), "cnt": h})

        hdf = (
            col_ds.map_batches(hist, batch_format="pyarrow")
            .groupby("bin").sum("cnt").to_pandas()
        )
        counts = np.zeros(nb, dtype=np.int64)
        counts[hdf["bin"].to_numpy()] = hdf["sum(cnt)"].to_numpy()
        return counts

    col = ds.select_columns([column])
    agg = col.map_batches(_mm, batch_format="pyarrow").aggregate(Min("mn"), Max("mx"))
    # an all-null / empty column aggregates to None (no _mm rows at all)
    mn_raw, mx_raw = agg["min(mn)"], agg["max(mx)"]
    lo_v = float(mn_raw) if mn_raw is not None else float("nan")
    hi_v = float(mx_raw) if mx_raw is not None else float("nan")
    if not np.isfinite(lo_v):
        return (
            [float("nan") for _ in qs] if ranks_for_n is None
            else {"kind": "empty"}
        )
    if hi_v <= lo_v:
        return (
            [lo_v for _ in qs] if ranks_for_n is None
            else {"kind": "const", "value": lo_v}
        )

    edges = np.linspace(lo_v, hi_v, bins + 1)
    counts = _hist_counts(col, edges)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    if ranks_for_n is not None:
        # generalized mode: caller supplies the 0-based order-statistic
        # ranks as a function of n (quantile_cont needs floor/ceil pairs)
        ranks = ranks_for_n(n)
    else:
        # 0-based target ranks, quantile_disc semantics (same float product
        # C++ computes, so the rank agrees with the oracle bit-for-bit)
        ranks = [max(math.ceil(q * n) - 1, 0) for q in qs]

    out: list[float] = [float("nan")] * len(ranks)
    # group targets by hit bin; np.histogram's last bin is closed on the
    # right, matching searchsorted on cum with side='right' over rank
    by_bin: dict[int, list[int]] = {}
    for i, r in enumerate(ranks):
        b = int(np.searchsorted(cum, r, side="right"))
        b = min(b, bins - 1)
        by_bin.setdefault(b, []).append(i)

    for b, idxs in by_bin.items():
        blo, bhi = float(edges[b]), float(edges[b + 1])
        last = b == bins - 1  # last histogram bin includes its right edge
        prev = int(cum[b - 1]) if b > 0 else 0
        if counts[b] > collect_cap:
            # refine: sub-histogram inside the bin, then collect the sub-bin
            sub_edges = np.linspace(blo, bhi, bins + 1)
            sub_counts = _hist_counts(
                col.map_batches(
                    _range_filter(column, blo, bhi, last), batch_format="pyarrow"
                ),
                sub_edges,
            )
            sub_cum = np.cumsum(sub_counts)
            for i in idxs:
                within = ranks[i] - prev
                sb = int(np.searchsorted(sub_cum, within, side="right"))
                sb = min(sb, bins - 1)
                vals = _collect_range(
                    col, column, float(sub_edges[sb]), float(sub_edges[sb + 1]),
                    last and sb == bins - 1,
                )
                sprev = int(sub_cum[sb - 1]) if sb > 0 else 0
                out[i] = float(np.partition(vals, within - sprev)[within - sprev])
            continue
        vals = _collect_range(col, column, blo, bhi, last)
        for i in idxs:
            within = ranks[i] - prev
            out[i] = float(np.partition(vals, within)[within])
    if ranks_for_n is not None:
        return {"kind": "ok", "n": n, "values": out}
    return out


def quantile_cont(
    ds,
    column: str,
    qs: list[float],
    bins: int = 8192,
    collect_cap: int = 5_000_000,
) -> list[float]:
    """EXACT interpolated quantiles (DuckDB ``quantile_cont`` semantics):
    for each q, with ``h = (n-1)*q``, linearly interpolate between the
    order statistics at ``floor(h)`` and ``ceil(h)`` using DuckDB's own
    weighted form ``(ceil(h)-h)*lo + (h-floor(h))*hi`` so doubles agree
    bit-for-bit with the oracle. Same distributed shape as
    :func:`exact_quantiles` — the histogram resolves BOTH bracketing ranks
    in one pruned pass (they almost always share a bin)."""
    import math

    def ranks_for_n(n: int) -> list[int]:
        rr = []
        for q in qs:
            h = (n - 1) * q
            rr.append(int(math.floor(h)))
            rr.append(int(math.ceil(h)))
        return rr

    res = exact_quantiles(
        ds, column, qs, bins=bins, collect_cap=collect_cap,
        ranks_for_n=ranks_for_n,
    )
    if res["kind"] == "empty":
        return [float("nan") for _ in qs]
    if res["kind"] == "const":
        return [res["value"] for _ in qs]
    n, vals = res["n"], res["values"]
    out = []
    for i, q in enumerate(qs):
        h = (n - 1) * q
        lo_r, hi_r = math.floor(h), math.ceil(h)
        lo_v, hi_v = vals[2 * i], vals[2 * i + 1]
        if lo_r == hi_r:
            out.append(lo_v)
        else:
            out.append((hi_r - h) * lo_v + (h - lo_r) * hi_v)
    return out


def _range_filter(column: str, lo: float, hi: float, include_hi: bool):
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        c = t.column(column)
        upper = pc.less_equal(c, hi) if include_hi else pc.less(c, hi)
        keep = pc.and_(pc.greater_equal(c, lo), upper)
        return t.filter(pc.fill_null(keep, False))

    return f


def _collect_range(
    col_ds, column: str, lo: float, hi: float, include_hi: bool
) -> "np.ndarray":
    """Gather the values of one histogram bin to the driver — the pruned,
    bounded transfer at the end of :func:`exact_quantiles`."""
    import numpy as np

    parts = [
        np.asarray(t.column(column).drop_null(), dtype=np.float64)
        for t in col_ds.map_batches(
            _range_filter(column, lo, hi, include_hi), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.float64)


def flag_outliers_iqr(ds, column: str, k: float = 1.5, bins: int = 8192):
    """IQR outlier flagging (reference ``qc_metrics.py:125-142``): Q1/Q3
    from the distributed histogram sketch (:func:`approx_quantiles` — the
    column never materializes on the driver), then a vectorized filter
    pass. Fence error is bounded by ``(1+k) * (max-min)/bins``."""
    import pyarrow.compute as pc

    q1, q3 = approx_quantiles(ds, column, [0.25, 0.75], bins=bins)
    lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)

    def flag(t: pa.Table) -> pa.Table:
        c = t.column(column)
        keep = pc.or_(pc.less(c, lo), pc.greater(c, hi))
        return t.filter(pc.fill_null(keep, False))

    return ds.map_batches(flag, batch_format="pyarrow")


def numeric_correlation(ds, columns: list[str]) -> dict[tuple[str, str], float]:
    """Pearson correlation matrix via streaming co-moment partials
    (reference A2 ``df.corr()``, ``src/profiling.py:45-66``): per-batch
    integer-scaled sums of x, x^2 and x*y (exact, order-independent),
    combined on the driver. Null rows are dropped pairwise-complete per the
    full-row mask (rows with ANY null among ``columns`` are excluded, which
    matches numpy's behavior on a dropna'd frame)."""
    import itertools

    import math

    cols = list(columns)
    moments = (
        [f"s_{c}" for c in cols]
        + [f"ss_{c}" for c in cols]
        + [f"sp_{a}_{b}" for a, b in itertools.combinations(cols, 2)]
    )

    # Exactness at scale: second moments reach ~1e14 per row, so a plain
    # int64 sum overflows around 1e5 rows per block and again at the
    # cross-block combine (DuckDB's SUM(BIGINT) silently widens to HUGEINT;
    # int64 does not). Each partial is computed as an exact Python int
    # (bound-adaptive chunked int64 reductions, object-int fallback for
    # per-element overflow), then shipped as FIVE base-2^31 int64 limbs —
    # the top limb carries the sign (arithmetic shift), each limb column
    # sums without overflow for < 2^31 blocks, and the driver recombines
    # the exact ~155-bit total. Five limbs cover |total| < 2^155 ~ 4.5e46:
    # second moments of |values| up to ~2e19 over 10^12 rows.
    _MASK = (1 << 31) - 1
    _LIMBS = 5

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        mask = np.ones(t.num_rows, dtype=bool)
        vals = {}
        for c in cols:
            v = np.asarray(t.column(c).to_pandas(), dtype=np.float64)
            mask &= ~np.isnan(v)
            vals[c] = v
        cents = {c: np.round(vals[c][mask] * 100.0).astype(np.int64) for c in cols}
        amax = {
            c: int(np.abs(cents[c]).max()) if len(cents[c]) else 0 for c in cols
        }

        def exact_prod_sum(a: "np.ndarray", b: "np.ndarray" | None, bound: int) -> int:
            # bound = max possible element magnitude after the (optional)
            # product. Chunk the int64 reduction so no chunk sum can
            # overflow; if even the element-wise product can overflow
            # int64, fall back to exact Python ints (rare: needs |values|
            # > ~3e7 after the x100 scaling).
            if bound >= (1 << 62):
                ao = a.astype(object)
                return int((ao if b is None else ao * b.astype(object)).sum())
            prod = a if b is None else a * b
            step = max(1, (1 << 62) // (bound + 1))
            return sum(
                int(prod[i : i + step].sum()) for i in range(0, len(prod), step)
            )

        exact = {f"s_{c}": exact_prod_sum(cents[c], None, amax[c]) for c in cols}
        exact |= {
            f"ss_{c}": exact_prod_sum(cents[c], cents[c], amax[c] * amax[c])
            for c in cols
        }
        exact |= {
            f"sp_{a}_{b}": exact_prod_sum(cents[a], cents[b], amax[a] * amax[b])
            for a, b in itertools.combinations(cols, 2)
        }
        out = {"n": pa.array([int(mask.sum())], type=pa.int64())}
        for k, v in exact.items():
            for j in range(_LIMBS):
                limb = v >> (31 * j)
                if j < _LIMBS - 1:
                    limb &= _MASK
                out[f"{k}_l{j}"] = pa.array([limb], type=pa.int64())
        return pa.table(out)

    keys = ["n"] + [f"{m}_l{j}" for m in moments for j in range(_LIMBS)]
    agg = ds.map_batches(partial, batch_format="pyarrow").sum(keys)
    n = float(int(agg["sum(n)"]))
    tot = {
        m: sum(
            int(agg[f"sum({m}_l{j})"]) << (31 * j) for j in range(_LIMBS)
        )
        for m in moments
    }
    # Downstream arithmetic mirrors ANSI-SQL integer division (DuckDB casts
    # both HUGEINT operands to DOUBLE before dividing — measured; see the
    # lineitem_correlation oracle), NOT Python's correctly-rounded int/int:
    # for moments above 2^53 the two differ in the last ulp, and the oracle
    # hash compares raw double bits.
    mean = {c: float(tot[f"s_{c}"]) / n for c in cols}
    var = {c: float(tot[f"ss_{c}"]) / n - mean[c] * mean[c] for c in cols}
    out: dict[tuple[str, str], float] = {}
    for a, b in itertools.combinations(cols, 2):
        cov = float(tot[f"sp_{a}_{b}"]) / n - mean[a] * mean[b]
        denom = math.sqrt(var[a] * var[b]) if var[a] * var[b] > 0 else 0.0
        out[(a, b)] = cov / denom if denom else float("nan")
    return out


def quantiles_by_group(ds, group_col: str, value_col: str, qs: list[float]):
    """Exact per-group discrete quantiles (same ``quantile_disc`` rank
    semantics as :func:`exact_quantiles`) via hash-partition by group +
    one vectorized sort per group. Contract: a GROUP's values must fit in
    a worker (the ``grouped_rank`` partitioning assumption) — for a
    single giant group use :func:`exact_quantiles` on its filtered slice,
    which never materializes the column anywhere."""
    import math

    import numpy as np
    import pandas as pd

    qs = list(qs)

    def f(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy(dtype=np.float64))
        v = v[~np.isnan(v)]
        n = len(v)
        if n == 0:
            return pd.DataFrame(
                {group_col: [], "q": [], "value": []}
            )
        ranks = [max(math.ceil(q * n) - 1, 0) for q in qs]
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]] * len(qs),
                "q": qs,
                "value": v[ranks],
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .groupby(group_col)
        .map_groups(f, batch_format="pandas")
    )


def mad_by_group(ds, group_col: str, value_col: str):
    """Median absolute deviation per group, deterministic ``quantile_disc``
    semantics for BOTH medians (SQL's mad() interpolates; the explicit
    two-median SQL mirror matches this exactly). Two streaming passes:
    per-group median via :func:`quantiles_by_group` (a group-count-sized
    table broadcast with ``ray.put``), then a vectorized abs-deviation map
    and a second per-group median. The raw column shuffles twice and never
    materializes anywhere."""
    import ray

    med = {}
    for b in quantiles_by_group(ds, group_col, value_col, [0.5]).iter_batches(
        batch_format="pandas"
    ):
        for g, v in zip(b[group_col], b["value"]):
            med[g] = float(v)
    ref = ray.put(med)

    def dev(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = pd.DataFrame(
            {
                group_col: g[group_col],
                "dev": (g[value_col] - g[group_col].map(m)).abs(),
            }
        )
        return out

    devs = ds.select_columns([group_col, value_col]).map_batches(
        dev, batch_format="pandas"
    )
    out = quantiles_by_group(devs, group_col, "dev", [0.5])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({group_col: t.column(group_col), "mad": t.column("value")})

    return out.map_batches(shape, batch_format="pyarrow")


def sampled_quantiles(
    ds,
    column: str,
    key_col: str,
    qs: list[float],
    rate_bp: int = 1000,
    seed: int = 42,
    hash_fn: str = "siphash",
):
    """APPROXIMATE quantiles over a DETERMINISTIC hash sample — the scale
    path when even :func:`exact_quantiles`' 2-3 column-pruned scans are too
    expensive (a 100-TB nightly profile wants one pass over ~0.1-10% of the
    rows, not three over all of them).

    The sample is seeded-hash membership, not an RNG: a row joins when
    ``md5_number_lower(seed || '|' || key) < floor(2^64 * rate_bp/10000)``
    (``corpus.det_keys`` md5 mode) — restart-stable, topology-independent,
    and exactly reproducible in SQL, so the whole approximate pipeline is
    value-hash-oracled, unlike sketch-based quantiles whose answers depend
    on merge order. Expected sample error for quantile q is
    O(sqrt(q(1-q)/m)) in rank with m = sampled rows — pinned by test
    against the exact quantiles.

    ``key_col`` must be a distinct-ish int64 row key (a primary key or a
    composed one like orderkey*8+linenumber); the quantile machinery then
    runs :func:`exact_quantiles` over the sampled subset."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.corpus import det_keys

    # rate_bp >= 10000 means "keep everything" — the unclamped threshold
    # would be 2^64, which overflows uint64
    full = int(rate_bp) >= 10000
    threshold = np.uint64(
        min(((1 << 64) * int(rate_bp)) // 10000, (1 << 64) - 1)
    )

    def sample(t: pa.Table) -> pa.Table:
        if full:
            return t
        ids = t.column(key_col).to_numpy(zero_copy_only=False)
        keep = det_keys(ids, seed, hash_fn=hash_fn) < threshold
        return t.filter(pa.array(keep))

    # materialize the sample ONCE: the quantile machinery makes 2-3 passes,
    # and a lazy chain would re-run the full read+hash per pass — the whole
    # point of sampling is that only rate_bp/10000 of the data is touched
    # again. The materialized set is rate-bounded (object-store-resident,
    # spillable), e.g. 0.1% of 100 TB = 100 GB across the cluster.
    sampled = ds.map_batches(
        sample, batch_format="pyarrow"
    ).select_columns([column]).materialize()
    return exact_quantiles(sampled, column, qs)


def grouped_approx_nunique(ds, group_col: str, value_col: str,
                           hash_fn: str = "default"):
    """Per-group distinct-count estimate via mergeable HLL sketches — the
    scale path for ``COUNT(DISTINCT v) GROUP BY g`` when the exact
    two-level shuffle is too expensive (many groups × high-cardinality
    values): the exchange carries ONE 4 KB sketch per (group, batch) —
    never the distinct values — and sketches merge by elementwise max,
    which is order-independent, so the estimate is DETERMINISTIC for a
    given input set regardless of partitioning (unlike merge-order-
    dependent quantile sketches). Standard error ~1.04/sqrt(4096) ≈ 1.6%.

    Returns (group, approx_nunique). Exact counterparts for comparison:
    ``distinct_customers_by_priority`` (two-level shuffle) and
    ``exact_nunique`` (128-bit key hashes)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            vals = sub[value_col].dropna().to_numpy()
            if vals.dtype == object or vals.dtype.kind in "OUS":
                vals = vals.astype(object)
            rows.append((g, _hll_registers(vals, hash_fn).tobytes()))
        return pd.DataFrame(rows, columns=[group_col, "sketch"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce([
            np.frombuffer(b, dtype=np.uint8) for b in g["sketch"]
        ])
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "approx_nunique": [np.int64(_hll_estimate(regs))],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )
