"""Per-chunk codec auto-selector.

Re-expresses the reference's per-column profiling statistics
(``src/profiling.py:12-42``: count, nulls, nunique, min/max, string lengths)
as *sampled* per-chunk stats that drive codec choice: cardinality ratio,
mean run length, integer range / delta range. Stats shortlist candidates;
the final pick is a measured-bytes tie-break — each candidate encodes a
bounded sample and the smallest wins (cf. PAPERS.md, delta vs FOR is
data-dependent), then the winner encodes the full chunk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, StringBlob
from .dictionary import DictCodec
from .floats import ByteStreamSplitCodec
from .fsst import FsstCodec, FsstZstdCodec
from .integer import DeltaCodec, DeltaDeltaCodec, ForBitpackCodec
from .rle import RleCodec, run_boundaries
from .zstd_plain import PlainCodec, ZstdCodec

REGISTRY: dict[str, Codec] = {
    c.name: c
    for c in [
        PlainCodec(),
        ZstdCodec(),
        ForBitpackCodec(),
        DeltaCodec(),
        DeltaDeltaCodec(),
        RleCodec(),
        DictCodec(),
        FsstCodec(),
        FsstZstdCodec(),
        ByteStreamSplitCodec(),
    ]
}

_SAMPLE_ROWS = 1024
_SAMPLE_STR_BYTES = 1 << 18


def register_codec(codec: Codec) -> None:
    """User-extension hook (analog of the reference's injectable pipeline
    callables, ``src/scheduler.py:138-177``)."""
    REGISTRY[codec.name] = codec


def sample_values(values, max_rows: int = _SAMPLE_ROWS):
    """CONTIGUOUS sample slice (middle of the chunk). Contiguity matters:
    a strided sample destroys exactly the structure the delta / RLE codecs
    exploit (adjacent-row deltas, run lengths), which mis-prices them in the
    measured-bytes tie-break."""
    n = len(values)
    if n <= max_rows:
        return values
    lo = (n - max_rows) // 2
    if isinstance(values, StringBlob):
        offsets = np.concatenate(([0], np.cumsum(values.lengths)))
        # shrink the window if the strings are huge
        hi = lo + max_rows
        while hi > lo + 1 and offsets[hi] - offsets[lo] > _SAMPLE_STR_BYTES:
            hi = lo + (hi - lo) // 2
        lens = values.lengths[lo:hi]
        return StringBlob(
            np.asarray(lens, dtype=np.int64),
            values.data[offsets[lo] : offsets[hi]],
        )
    return values[lo : lo + max_rows]


def sample_windows(values, max_rows: int = _SAMPLE_ROWS) -> list:
    """Up to three CONTIGUOUS windows (head / middle / tail) instead of one
    middle slice: a chunk whose structure drifts (sorted head, random tail)
    mis-prices codecs when judged on the middle alone. Each window keeps
    internal contiguity, and callers measure each window separately — no
    artificial splice boundary ever reaches a codec."""
    n = len(values)
    if n <= max_rows:
        return [values]
    w = max(max_rows // 3, 1)
    # one cumsum for all windows (was recomputed per slice — measured at
    # ~11% of selection cost on string columns)
    offsets = (
        np.concatenate(([0], np.cumsum(values.lengths)))
        if isinstance(values, StringBlob)
        else None
    )

    def slice_at(lo: int):
        if isinstance(values, StringBlob):
            hi = lo + w
            while hi > lo + 1 and offsets[hi] - offsets[lo] > _SAMPLE_STR_BYTES // 3:
                hi = lo + (hi - lo) // 2
            return StringBlob(
                np.asarray(values.lengths[lo:hi], dtype=np.int64),
                values.data[offsets[lo] : offsets[hi]],
            )
        return values[lo : lo + w]

    los = sorted({0, (n - w) // 2, n - w})
    return [slice_at(lo) for lo in los]


def chunk_stats(values) -> dict:
    """Sampled cardinality / run-length / range statistics for one chunk."""
    n = len(values)
    if n == 0:
        return {"n": 0, "card_ratio": 0.0, "mean_run": 0.0}
    sample = sample_values(values)
    sn = len(sample)
    runs = len(run_boundaries(sample)) or 1
    if isinstance(sample, StringBlob):
        # vectorized distinct count (was a Python set over byte slices)
        from .base import blob_to_string_array

        card = pc.count_distinct(blob_to_string_array(sample, pa.binary())).as_py()
        extra = {"mean_len": float(sample.lengths.mean()) if sn else 0.0}
    else:
        card = len(np.unique(sample))
        extra = {}
        if np.issubdtype(sample.dtype, np.integer) and sn > 1:
            extra["range"] = int(sample.max()) - int(sample.min())
            d = np.diff(sample)
            extra["delta_range"] = (int(d.max()) - int(d.min())) if len(d) else 0
    return {"n": n, "card_ratio": card / max(sn, 1), "mean_run": sn / runs, **extra}


# Relative CPU cost of each codec's encode+decode path (measured on this
# container; FSST pays a Python regex scan per byte-ish). In "balanced" mode
# a candidate must beat the cheapest codec's size by more than its penalty
# to win; "max" mode is pure measured size; "fast" drops FSST entirely.
_SPEED_PENALTY = {"fsst": 1.15, "fsst_zstd": 1.10}
DEFAULT_MODE = "balanced"


def candidates_for(
    values, arrow_type: pa.DataType, stats: dict, mode: str = DEFAULT_MODE
) -> list[str]:
    if stats["n"] == 0:
        return ["plain"]
    if isinstance(values, StringBlob):
        cands = ["zstd"]
        if stats["card_ratio"] <= 0.5:
            cands += ["dict"]
        if stats["mean_run"] >= 1.5:
            cands += ["rle"]
        # FSST candidacy is stats-gated: training a symbol table per chunk
        # is the priciest candidate probe, so only strings long enough to
        # amortize symbol matching (and high-entropy enough that dict/rle
        # won't win anyway) get it
        if stats["card_ratio"] > 0.3 and stats.get("mean_len", 0.0) >= 12 and mode != "fast":
            cands += ["fsst_zstd", "fsst"]
        return cands
    if np.issubdtype(values.dtype, np.floating):
        # bss: byte-plane transpose + zstd — wins when values share
        # exponent/high-mantissa bytes (scores, prices, sensor floats)
        cands = ["zstd", "bss"]
        if stats["card_ratio"] <= 0.5:
            cands += ["dict"]
        if stats["mean_run"] >= 1.5:
            cands += ["rle"]
        return cands
    # integers / timestamps
    cands = ["for_bitpack", "delta", "delta_delta", "zstd"]
    if stats["card_ratio"] <= 0.1:
        cands += ["dict"]
    if stats["mean_run"] >= 1.5:
        cands += ["rle"]
    return cands


def _stats_compatible(a: dict, b: dict, tol: float = 1.3) -> bool:
    """True when two chunks' sampled stats are close enough that the
    measured-bytes tie-break would rank candidates the same way. Ratio
    stats must agree within ``tol``×; integer range stats must land in the
    same bit-width bucket (bit width is what the FOR/delta codecs actually
    pay for)."""
    from .bitpack import required_width

    if (a.get("n", 0) == 0) != (b.get("n", 0) == 0):
        return False
    for k in ("card_ratio", "mean_run", "mean_len"):
        if (k in a) != (k in b):
            return False
        if k not in a:
            continue
        av, bv = float(a[k]), float(b[k])
        if av == bv:
            continue
        lo, hi = min(av, bv), max(av, bv)
        if lo <= 0 or hi > tol * lo:
            return False
    for k in ("range", "delta_range"):
        if (k in a) != (k in b):
            return False
        if k in a:
            wa, wb = required_width(int(a[k])), required_width(int(b[k]))
            # one bit-width bucket of slack: a width step moves a packed
            # stream by ~1/width (<12%), which only flips near-tie rankings
            if abs(wa - wb) > 1:
                return False
    return True


_CACHE_PROBES = 8  # probed stat points remembered per column


def select_codec_cached(
    values,
    arrow_type: pa.DataType,
    cache: dict,
    key: str,
    mode: str = DEFAULT_MODE,
) -> str:
    """Per-chunk selection with cross-chunk probe reuse.

    Every chunk still gets its OWN sampled stats and its own decision (the
    per-chunk adaptivity the north rule names); only the expensive half —
    the measured-bytes candidate probes — is skipped when this chunk's
    stats land near a PAST probe that picked the cached winner. The cache
    holds up to ``_CACHE_PROBES`` probed stat points (chunk stats oscillate
    around a column's regime — e.g. per-chunk conversation length — so a
    single point would re-probe forever); a chunk matching ANY of them
    reuses the winner. A probe that elects a DIFFERENT codec resets the
    region — the column's regime changed, old points no longer vouch for
    the new winner. Measured: probes are ~2-3 ms/column/chunk on this
    host; steady-state buckets pay them a handful of times total."""
    stats = chunk_stats(values)
    cands = candidates_for(values, arrow_type, stats, mode)
    hit = cache.get(key)
    if hit is not None:
        points, name = hit
        if any(
            pc_ == cands and _stats_compatible(ps, stats)
            for ps, pc_ in points
        ):
            return name
    name = select_codec(values, arrow_type, stats=stats, mode=mode)
    if hit is not None and hit[1] == name:
        points = hit[0]
        points.append((stats, cands))
        if len(points) > _CACHE_PROBES:
            points.pop(0)
    else:
        cache[key] = ([(stats, cands)], name)
    return name


def select_codec(
    values,
    arrow_type: pa.DataType,
    stats: dict | None = None,
    mode: str = DEFAULT_MODE,
) -> str:
    """Measured-bytes tie-break over the stat-shortlisted candidates.

    In ``balanced`` mode an expensive codec's measured size is inflated by
    its speed penalty, so e.g. FSST only wins when it is decisively smaller
    than zstd — not on a within-noise margin that would cost 100x CPU.
    """
    stats = stats or chunk_stats(values)
    cands = candidates_for(values, arrow_type, stats, mode)
    if len(cands) == 1:
        return cands[0]
    windows = sample_windows(values)
    # FSST candidates: train ONE symbol table on the union of the sample
    # windows and share it across windows AND across fsst/fsst_zstd —
    # otherwise every (candidate, window) probe pays a full train_fsst,
    # which dominates selection cost (measured ~70% of standalone
    # encode_chunk time before this)
    probes: dict[str, Codec] = {}
    if any(c in ("fsst", "fsst_zstd") for c in cands):
        from .fsst import train_fsst

        table = train_fsst(b"".join(w.data for w in windows))
        probes["fsst"] = FsstCodec(table)
        probes["fsst_zstd"] = FsstZstdCodec(table)
    best_name, best_score = None, None
    for name in cands:
        codec = probes.get(name, REGISTRY[name])
        sizer = getattr(codec, "probe_size", None)
        try:
            # sum of per-window measured bytes: each window is contiguous,
            # so drift between head and tail is priced in without feeding
            # any spliced boundary to the codec. Codecs with a closed-form
            # exact size (``probe_size``, property-tested == len(encode()))
            # are priced without materializing the stream — same ranking,
            # cheaper probe.
            if sizer is not None:
                score = sum(sizer(w) for w in windows)
            else:
                score = sum(len(codec.encode(w)[0]) for w in windows)
        except Exception:
            continue
        if mode == "balanced":
            score *= _SPEED_PENALTY.get(name, 1.0)
        if best_score is None or score < best_score:
            best_name, best_score = name, score
    return best_name or "zstd"
