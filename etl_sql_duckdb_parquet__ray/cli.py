"""Thin CLI — the Ray-Data analog of the reference's Typer commands
(``src/cli.py:31-233``: etl / query / benchmark): encode, decode, verify,
stats. Owns its Ray session (guarded init), so it is also the entrypoint a
cluster run would ship via ``ray job submit``:

    ray job submit --working-dir . -- \
        python -m etl_sql_duckdb_parquet__ray.cli encode \
            --input /data/transcripts --out /data/encoded --buckets 4096

On a real cluster only ``--buckets`` (partition count ~ 2-4x total cores)
and ``--concurrency`` change; the pipeline itself is size-agnostic —
streaming blocks, actor-pool encode, per-bucket manifest for resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray():
    import os

    import ray

    if not ray.is_initialized():
        # honor RAY_ADDRESS so the same entrypoint serves both a laptop run
        # (RAY_ADDRESS unset/local -> private local session) and a cluster
        # run (scripts/submit_encode_job.py exports the head address and
        # this driver schedules onto the cluster's workers)
        addr = os.environ.get("RAY_ADDRESS") or "local"
        ray.init(address=addr, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_encode(args) -> int:
    ray = _ray()
    from .pipelines.encode import encode_transcripts, read_for_encode
    from .state.manifest import manifest_stats

    ds = read_for_encode(args.input)
    encode_transcripts(
        ds,
        args.out,
        num_buckets=args.buckets,
        chunk_rows=args.chunk_rows,
        mode=args.mode,
        resume=not args.no_resume,
        use_actors=args.use_actors,
        encoder_concurrency=(1, args.concurrency),
        chunk_order=args.chunk_order,
        text_filters=args.text_filters,
        codec_overrides=_parse_pins(args.pin_codecs),
    )
    print(json.dumps(manifest_stats(args.out)))
    return 0


# built-in codec applicability by value kind (ADVICE r3: a type-incompatible
# pin like ts=fsst must fail AT PARSE TIME, not later inside a Ray worker
# after the shuffle). User-registered codecs are unknown here and pass —
# the registry check still guards against typos.
_STR_CODECS = {"plain", "zstd", "rle", "dict", "fsst", "fsst_zstd"}
_INT_CODECS = {"plain", "zstd", "rle", "dict", "for_bitpack", "delta", "delta_delta"}
_BUILTIN_CODECS = _STR_CODECS | _INT_CODECS | {"bss"}
_COL_CODECS = {
    "conv_id": _STR_CODECS,
    "role": _STR_CODECS,
    "text": _STR_CODECS,
    "tool": _STR_CODECS,
    "turn_idx": _INT_CODECS,
    "ts": _INT_CODECS,
}


def _parse_pins(spec: str | None) -> dict | None:
    """"col=codec,col=codec" -> {col: codec} (None when unset). Validates
    codec names against the registry, column names against the transcript
    schema, and codec/column-TYPE compatibility AT PARSE TIME — a typo or
    a string-only codec pinned on a timestamp must fail here with a usable
    message, not as a bare exception inside a Ray worker after the shuffle."""
    if not spec:
        return None
    from .codecs.selector import REGISTRY

    out = {}
    for part in spec.split(","):
        col, _, codec = part.partition("=")
        col, codec = col.strip(), codec.strip()
        if not col or not codec:
            raise SystemExit(f"bad --pin-codecs entry: {part!r} (want col=codec)")
        if codec not in REGISTRY:
            raise SystemExit(
                f"unknown codec {codec!r} in --pin-codecs "
                f"(known: {', '.join(sorted(REGISTRY))})"
            )
        if col not in _COL_CODECS:
            raise SystemExit(
                f"unknown column {col!r} in --pin-codecs "
                f"(transcript columns: {', '.join(sorted(_COL_CODECS))})"
            )
        if codec in _BUILTIN_CODECS and codec not in _COL_CODECS[col]:
            raise SystemExit(
                f"codec {codec!r} cannot encode column {col!r} "
                f"(valid for {col}: {', '.join(sorted(_COL_CODECS[col]))})"
            )
        out[col] = codec
    return out


def _parse_col_ranges(specs) -> dict | None:
    """COL:LO:HI specs -> {col: (lo, hi)}. Accepts ints, floats and
    scientific notation; an empty side is unbounded; a missing HI field
    means unbounded. Malformed specs exit with a usable message instead
    of a traceback."""
    if not specs:
        return None

    def num(s: str):
        if s == "":
            return None
        try:
            f = float(s)
        except ValueError:
            raise SystemExit(
                f"--col-range: {s!r} is not a number (spec format COL:LO:HI)"
            )
        return int(f) if f.is_integer() and "e" not in s.lower() and "." not in s else f

    out = {}
    for spec in specs:
        parts = spec.split(":", 2)
        if len(parts) < 2:
            raise SystemExit(
                f"--col-range: {spec!r} must be COL:LO:HI (empty side = unbounded)"
            )
        name, lo = parts[0], parts[1]
        hi = parts[2] if len(parts) == 3 else ""
        out[name] = (num(lo), num(hi))
    return out


def _refuse_nonempty_out(out_dir: str):
    """None if ``out_dir`` has no parquet files, else an error payload:
    row counts come from the written files' footers, so pre-existing
    files from an earlier run would silently inflate the reported total."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    leftover = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    if leftover:
        return {
            "error": "output dir already contains parquet files",
            "out": out_dir,
            "existing_files": len(leftover),
        }
    return None


def _count_written_rows(out_dir: str) -> int:
    """Row total from the freshly-written parquet footers (no re-read)."""
    import os

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def cmd_decode(args) -> int:
    _ray()
    from .pipelines.encode import decode_dataset

    ds = decode_dataset(
        args.input,
        columns=args.columns.split(",") if args.columns else None,
        conv_id=args.conv_id,
        turn_lo=args.turn_lo,
        turn_hi=args.turn_hi,
        ts_lo=args.ts_lo,
        ts_hi=args.ts_hi,
        text_contains=args.text_contains,
        role_eq=args.role_eq,
        tool_eq=args.tool_eq,
        conv_ids=args.conv_ids.split(",") if args.conv_ids else None,
        col_ranges=_parse_col_ranges(args.col_range),
        as_of_epoch=args.as_of_epoch,
    )
    # STREAM the write (a decode must not pin everything in the object
    # store) and report rows from the written files' footers; a
    # pre-populated output dir is refused — stale files would silently
    # inflate the count. A no-match pushdown lookup still produces the
    # (empty) output dir so downstream readers see an empty dataset,
    # not FileNotFound.
    err = _refuse_nonempty_out(args.out)
    if err:
        print(json.dumps(err))
        return 2
    ds.write_parquet(args.out)
    print(json.dumps({"rows": _count_written_rows(args.out)}))
    return 0


def cmd_compact(args) -> int:
    _ray()
    from .state.manifest import manifest_stats
    from .state.scheduler import compact

    compact(args.inputs.split(","), args.out, num_buckets=args.buckets)
    print(json.dumps(manifest_stats(args.out)))
    return 0


def cmd_delete(args) -> int:
    """Tombstone conversations (metadata-only; reads hide them immediately,
    `purge` rewrites without them)."""
    from .pipelines.deletes import delete_convs

    convs = (
        [c.strip() for c in args.conv_ids.split(",") if c.strip()]
        if args.conv_ids
        else [line.strip() for line in open(args.conv_file) if line.strip()]
    )
    print(json.dumps(delete_convs(args.encoded, convs)))
    return 0


def cmd_purge(args) -> int:
    """Physically rewrite the corpus without tombstoned conversations."""
    _ray()
    from .pipelines.deletes import purge_deleted
    from .state.manifest import manifest_stats

    purge_deleted(args.encoded, args.out, num_buckets=args.buckets)
    print(json.dumps(manifest_stats(args.out)))
    return 0


def cmd_derive(args) -> int:
    """Built-in derived-column kinds over an encoded corpus (sidecar
    files; arbitrary kernels are available via the Python API)."""
    _ray()
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pipelines.encode import derive_column

    def token_count(chunk):
        from .functions.text import token_count_kernel

        return token_count_kernel(chunk.column("text"))

    def char_count(chunk):
        return pc.coalesce(
            pc.utf8_length(chunk.column("text")), pa.scalar(0, pa.int32())
        ).cast(pa.int32())

    kinds = {
        "token_count": (token_count, ["text"]),
        "char_count": (char_count, ["text"]),
    }
    fn, cols = kinds[args.kind]
    df = derive_column(args.input, args.name, fn, cols)
    print(json.dumps({
        "column": args.name, "kind": args.kind,
        "rows": int(df["rows"].sum()), "bytes_out": int(df["bytes_out"].sum()),
        "buckets": len(df),
    }))
    return 0


def cmd_add_column(args) -> int:
    """ADD COLUMN with a constant default — metadata-only (every decode
    synthesizes it; the next purge/compaction materializes it)."""
    from .pipelines.encode import add_column_default

    value = args.value
    if value is not None:
        value = {
            "int64": int, "double": float, "string": str,
            "bool": lambda s: s.lower() in ("1", "true", "t", "yes"),
        }[args.type](value)
    info = add_column_default(args.input, args.name, value, args.type)
    print(json.dumps({"column": args.name, **info}))
    return 0


def cmd_drop_column(args) -> int:
    """DROP COLUMN over an encoded corpus: sidecar columns are deleted
    physically, base columns are hidden via the metadata-only schema file
    (every decode excludes them; compaction/purge removes them for real)."""
    from .pipelines.encode import drop_column

    info = drop_column(args.input, args.name)
    print(json.dumps({"column": args.name, **info}))
    return 0


def cmd_rename_column(args) -> int:
    """RENAME COLUMN over an encoded corpus: metadata-only (one schema-
    file write, no data rewrite); every decode presents the new name and
    the old name stops resolving."""
    from .pipelines.encode import rename_column

    info = rename_column(args.input, args.old, args.new)
    print(json.dumps(info))
    return 0


def cmd_ann_build(args) -> int:
    _ray()
    import ray

    from .functions.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        build_pq_index,
    )

    ds = ray.data.read_parquet(args.input)
    if args.kind == "ivf":
        meta = build_ivf_index(
            ds, args.out, n_lists=args.lists, n_assign=args.assign
        )
    elif args.kind == "ivfpq":
        meta = build_ivfpq_index(
            ds, args.out, n_lists=args.lists, m=args.m, ks=args.ks
        )
    else:
        meta = build_pq_index(ds, args.out, m=args.m, ks=args.ks)
    print(json.dumps(meta))
    return 0


def cmd_ann_query(args) -> int:
    _ray()
    import json as _json
    import os

    import numpy as np

    from .functions.similarity import (
        ivf_query_index,
        ivfpq_query_index,
        pq_query_index,
    )

    with open(os.path.join(args.index, "meta.json")) as f:
        meta = _json.load(f)
    qvec = np.array(_json.loads(args.query), dtype=np.float64)
    if meta["kind"] == "ivf":
        out = ivf_query_index(args.index, qvec, k=args.k, n_probe=args.probe)
    elif meta["kind"] == "ivfpq":
        out = ivfpq_query_index(
            args.index, qvec, k=args.k, n_probe=args.probe,
            rerank=args.rerank,
        )
    else:
        out = pq_query_index(args.index, qvec, k=args.k)
    print(json.dumps(out.to_pylist()))
    return 0


def cmd_verify(args) -> int:
    ray = _ray()
    from .pipelines.encode import roundtrip_ok

    ds = ray.data.read_parquet(args.input)
    ok = roundtrip_ok(ds, args.encoded)
    print(json.dumps({"roundtrip_ok": ok}))
    return 0 if ok else 1


def cmd_fsck(args) -> int:
    """Source-free integrity check: stream-decode every bucket chunk file
    and validate its per-column checksums (bit-rot / partial-write
    detection without the original data — `verify` needs the source,
    fsck does not). One task per file; corrupt files are reported, not
    fatal, so one bad disk sector doesn't hide the rest of the report."""
    import glob as _glob

    ray = _ray()
    from .state.manifest import load_manifest

    recs = load_manifest(args.encoded)
    if not recs:
        print(json.dumps({"error": "no completed buckets"}))
        return 1
    # derived sidecar columns use the same chunk framing — check them too
    paths = [r["path"] for r in recs] + sorted(
        _glob.glob(os.path.join(args.encoded, "column-*.bin"))
    )

    def check(batch):
        import pyarrow as pa

        from .chunk import read_chunk_file

        out = []
        for row in batch.to_pylist():
            is_bucket = os.path.basename(row["path"]).startswith("bucket-")
            try:
                t = read_chunk_file(row["path"])
                out.append({"path": row["path"], "ok": True,
                            "is_bucket": is_bucket,
                            "rows": t.num_rows, "error": ""})
            except Exception as e:  # checksum mismatch, bad magic, truncation
                out.append({"path": row["path"], "ok": False,
                            "is_bucket": is_bucket, "rows": 0,
                            "error": str(e)[:200]})
        return pa.Table.from_pylist(out)

    res = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(check, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    bad = [r for r in res if not r["ok"]]
    n_side = len(paths) - len(recs)
    print(json.dumps({
        "buckets": len(recs),
        "sidecar_files": n_side,
        "rows_decoded": int(
            sum(r["rows"] for r in res if r["is_bucket"])
        ),
        "corrupt": [{"path": r["path"], "error": r["error"]} for r in bad],
    }))
    return 0 if not bad else 1


def cmd_report(args) -> int:
    ray = _ray()
    from .stages.report import build_report, write_html_report, write_markdown_report

    ds = ray.data.read_parquet(args.input)
    rep = build_report(ds, key_columns=args.keys.split(",") if args.keys else None)
    written = []
    if args.md:
        written.append(write_markdown_report(rep, args.md))
    if args.html:
        written.append(write_html_report(rep, args.html))
    print(json.dumps({"quality_score": rep["quality_score"],
                      "rows": rep["total_rows"], "written": written}))
    return 0


def _tri_fpr_summary(chunks: list[dict]) -> dict | None:
    """{mean, max, clamped_pct} of per-chunk expected Bloom FPR, or None
    when no chunk carries a filter with a recorded trigram count."""
    from .filters import MAX_BITS, expected_fpr

    fprs, clamped = [], 0
    for c in chunks:
        filt = c.get("tri_filter")
        if not filt or "n" not in filt:
            continue
        fprs.append(expected_fpr(filt))
        if int(filt["m"]) >= MAX_BITS and 8 * int(filt["n"]) > MAX_BITS:
            clamped += 1
    if not fprs:
        return None
    return {
        "mean": round(sum(fprs) / len(fprs), 4),
        "max": round(max(fprs), 4),
        "clamped_pct": round(100.0 * clamped / len(fprs), 1),
    }


def cmd_describe(args) -> int:
    """Catalog view of an encoded corpus from METADATA ONLY (manifest +
    one chunk header + sidecar records — no payload decode): schema,
    zone-map/filter coverage, derived sidecar columns, partitioning."""
    import glob as _glob

    from .chunk import chunk_spans
    from .state.manifest import load_manifest, load_run_meta

    recs = load_manifest(args.encoded)
    if not recs:
        print(json.dumps({"error": "no completed buckets"}))
        return 1
    import struct as _struct

    with open(recs[0]["path"], "rb") as f:
        spans = chunk_spans(recs[0]["path"])
        f.seek(spans[0][0])
        (hlen,) = _struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen))
    chunks = [c for r in recs for c in r["chunks"]]
    n_chunks = max(len(chunks), 1)  # pct denominators; 0-chunk manifests
    # still describe (counts all zero) instead of dividing by zero
    side = {}
    for p in _glob.glob(os.path.join(args.encoded, "column-*.json")):
        base = os.path.basename(p)[len("column-"):-len(".json")]
        cname = base.rsplit("-", 1)[0]
        side.setdefault(cname, 0)
        side[cname] += 1
    meta = load_run_meta(args.encoded) or {}
    from .pipelines.deletes import load_deleted_convs
    from .pipelines.encode import load_added_columns as _added
    from .pipelines.encode import load_dropped_columns as _dropped
    from .pipelines.encode import load_renames as _renames

    from .pipelines.deletes import mutation_clock as _max_epoch

    out = {
        "buckets": len(recs),
        "rows": sum(r["rows"] for r in recs),
        "bytes_out": sum(r["bytes_out"] for r in recs),
        "chunks": len(chunks),
        # manifest "rows" counts encoded rows; tombstoned conversations are
        # hidden at read time until a purge physically drops them
        "tombstoned_convs": len(load_deleted_convs(args.encoded)),
        "columns": [c["name"] for c in header["columns"]],
        # base columns hidden by metadata-only DROP (drop_column); still
        # physically present until a purge/compaction rewrite
        "dropped_columns": _dropped(args.encoded),
        # stored -> visible display renames (rename_column, metadata-only)
        "renamed_columns": _renames(args.encoded),
        # constant-default columns (add_column_default, metadata-only;
        # materialized by the next purge/compaction)
        "added_columns": _added(args.encoded),
        # highest tombstone epoch = the corpus's current mutation clock
        # (time-travel reads address epochs 0..this)
        "max_tombstone_epoch": _max_epoch(args.encoded),
        "codecs_first_chunk": {
            c["name"]: c["meta"]["codec"] for c in header["columns"]
        },
        "derived_sidecar_columns": {
            k: {"buckets": v} for k, v in sorted(side.items())
        },
        "zone_maps": {
            "conv_range": all("conv_range" in c for c in chunks),
            "turn_range_true_minmax": all(
                r.get("zone_v", 1) >= 2 for r in recs
            ),
            "ts_range_pct": round(
                100.0 * sum("ts_range" in c for c in chunks) / n_chunks, 1
            ),
            "tri_filter_pct": round(
                100.0 * sum("tri_filter" in c for c in chunks) / n_chunks, 1
            ),
            # realized Bloom quality: worst/mean expected FPR across chunk
            # filters — a mean drifting far above the 0.05 design point
            # means the MAX_BITS clamp is binding and pruning is degrading
            # toward a no-op (ADVICE r3 observability fix)
            "tri_filter_fpr": _tri_fpr_summary(chunks),
            "val_sets_pct": round(
                100.0 * sum("val_sets" in c for c in chunks) / n_chunks, 1
            ),
        },
        "partitioning": {
            "num_buckets": meta.get("num_buckets"),
            "hash": meta.get("hash"),
            "hot_convs": len(meta.get("hot_convs") or {}),
        },
    }
    print(json.dumps(out))
    return 0


def cmd_stats(args) -> int:
    from .state.manifest import load_manifest, manifest_stats

    stats = manifest_stats(args.encoded)
    if args.per_bucket:
        stats["buckets_detail"] = [
            {k: r[k] for k in ("bucket", "rows", "bytes_in", "bytes_out")}
            for r in load_manifest(args.encoded)
        ]
    print(json.dumps(stats))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="etl_sql_duckdb_parquet__ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="encode a transcript parquet dir")
    enc.add_argument("--input", required=True)
    enc.add_argument("--out", required=True)
    enc.add_argument("--buckets", type=int, default=64)
    enc.add_argument("--chunk-rows", type=int, default=65536)
    enc.add_argument(
        "--chunk-order", default="conv", choices=["conv", "time"],
        help="physical conversation order within a bucket: 'time' tightens "
             "ts zone maps for time-range reads (see BASELINE.md)",
    )
    enc.add_argument("--mode", default="balanced", choices=["fast", "balanced"])
    enc.add_argument(
        "--concurrency", type=int, default=8,
        help="max encoder actors (applies with --use-actors; the default "
             "task path scales with the cluster's CPUs automatically)",
    )
    enc.add_argument(
        "--use-actors", action="store_true",
        help="explicit actor-pool encoder (long-lived cluster jobs)",
    )
    enc.add_argument("--no-resume", action="store_true")
    enc.add_argument(
        "--text-filters", action="store_true",
        help="store per-chunk trigram Bloom filters in the manifest for "
             "substring data skipping (decode --text-contains)",
    )
    enc.add_argument(
        "--pin-codecs", dest="pin_codecs", default=None,
        help="skip per-chunk selection for these columns, e.g. "
             "'role=dict,ts=delta' (measured ~13%% encode wall at equal "
             "size when the pins match what the selector would pick)",
    )
    enc.set_defaults(fn=cmd_encode)

    dec = sub.add_parser("decode", help="decode chunks back to parquet")
    dec.add_argument("--input", required=True, help="encoded dir (chunks+manifest)")
    dec.add_argument("--out", required=True)
    dec.add_argument(
        "--columns", default=None,
        help="comma-separated projection: decode only these columns",
    )
    dec.add_argument(
        "--conv-id", default=None,
        help="point lookup: manifest zone-map pruning + exact row filter",
    )
    dec.add_argument("--turn-lo", type=int, default=None)
    dec.add_argument("--turn-hi", type=int, default=None)
    dec.add_argument(
        "--ts-lo", default=None,
        help="time-range read: ISO timestamp or int epoch-us (inclusive)",
    )
    dec.add_argument("--ts-hi", default=None)
    dec.add_argument(
        "--text-contains", default=None,
        help="substring predicate on text; prunes chunks via manifest "
             "trigram filters when the corpus was encoded with "
             "--text-filters",
    )
    dec.add_argument(
        "--col-range", action="append", default=None, metavar="COL:LO:HI",
        help="inclusive numeric range on a column (empty side = unbounded; "
             "repeatable); derived sidecar columns prune whole chunks via "
             "their zone maps",
    )
    dec.add_argument(
        "--conv-ids", default=None,
        help="comma-separated batch of conversation point lookups "
             "(one manifest read per distinct home bucket)",
    )
    dec.add_argument(
        "--role-eq", default=None,
        help="equality predicate on role; prunes via per-chunk value sets",
    )
    dec.add_argument(
        "--tool-eq", default=None,
        help="equality predicate on tool; prunes via per-chunk value sets",
    )
    dec.add_argument(
        "--as-of-epoch", type=int, default=None, dest="as_of_epoch",
        help="time travel: apply only tombstones laid at or before this "
             "mutation epoch (this dir's layer of the as-of view)",
    )
    dec.set_defaults(fn=cmd_decode)

    cp = sub.add_parser(
        "compact", help="merge encoded dirs into one freshly-bucketed dir"
    )
    cp.add_argument("--inputs", required=True, help="comma-separated encoded dirs")
    cp.add_argument("--out", required=True)
    cp.add_argument("--buckets", type=int, default=32)
    cp.set_defaults(fn=cmd_compact)

    dl = sub.add_parser(
        "delete", help="tombstone conversations (metadata-only delete)"
    )
    dl.add_argument("--encoded", required=True)
    g = dl.add_mutually_exclusive_group(required=True)
    g.add_argument("--conv-ids", dest="conv_ids", help="comma-separated conv_ids")
    g.add_argument("--conv-file", dest="conv_file", help="file, one conv_id/line")
    dl.set_defaults(fn=cmd_delete, conv_ids=None, conv_file=None)

    pg = sub.add_parser(
        "purge", help="rewrite the corpus without tombstoned conversations"
    )
    pg.add_argument("--encoded", required=True)
    pg.add_argument("--out", required=True)
    pg.add_argument("--buckets", type=int, default=32)
    pg.set_defaults(fn=cmd_purge)

    dv = sub.add_parser(
        "derive",
        help="add a derived sidecar column to an encoded corpus "
             "(schema evolution — main files untouched)",
    )
    dv.add_argument("--input", required=True, help="encoded dir")
    dv.add_argument("--name", required=True, help="new column name")
    dv.add_argument(
        "--kind", default="token_count",
        choices=["token_count", "char_count"],
    )
    dv.set_defaults(fn=cmd_derive)

    fs = sub.add_parser(
        "fsck",
        help="source-free integrity check: stream-decode every chunk file "
             "and validate checksums; reports corrupt files",
    )
    fs.add_argument("--encoded", required=True)
    fs.set_defaults(fn=cmd_fsck)

    ac = sub.add_parser(
        "add-column",
        help="add a constant-default column to an encoded corpus "
             "(metadata-only; materialized by the next purge/compaction)",
    )
    ac.add_argument("--input", required=True, help="encoded dir")
    ac.add_argument("--name", required=True, help="new column name")
    ac.add_argument("--value", default=None,
                    help="default value (omit for all-NULL)")
    ac.add_argument("--type", required=True,
                    choices=["int64", "double", "string", "bool"])
    ac.set_defaults(fn=cmd_add_column)

    dc = sub.add_parser(
        "drop-column",
        help="drop a column from an encoded corpus (sidecars: physical; "
             "base columns: metadata-only until compaction)",
    )
    dc.add_argument("--input", required=True, help="encoded dir")
    dc.add_argument("--name", required=True, help="column to drop")
    dc.set_defaults(fn=cmd_drop_column)

    rn = sub.add_parser(
        "rename-column",
        help="rename a base column of an encoded corpus (metadata-only; "
             "survives purge/compaction)",
    )
    rn.add_argument("--input", required=True, help="encoded dir")
    rn.add_argument("--old", required=True, help="current (visible) name")
    rn.add_argument("--new", required=True, help="new name")
    rn.set_defaults(fn=cmd_rename_column)

    ab = sub.add_parser(
        "ann-build", help="build a persisted ANN index over an embeddings dir"
    )
    ab.add_argument("--input", required=True, help="parquet dir: (vec_id, embedding)")
    ab.add_argument("--out", required=True, help="index dir")
    ab.add_argument("--kind", default="ivf", choices=["ivf", "pq", "ivfpq"])
    ab.add_argument("--lists", type=int, default=64, help="IVF list count")
    ab.add_argument("--assign", type=int, default=2, help="IVF redundant assignment")
    ab.add_argument("--m", type=int, default=16, help="PQ subquantizers")
    ab.add_argument("--ks", type=int, default=32, help="PQ codebook size")
    ab.set_defaults(fn=cmd_ann_build)

    aq = sub.add_parser(
        "ann-query", help="query a persisted ANN index (reads only probed lists)"
    )
    aq.add_argument("--index", required=True)
    aq.add_argument("--query", required=True, help="JSON float array")
    aq.add_argument("--k", type=int, default=10)
    aq.add_argument("--probe", type=int, default=8, help="IVF lists probed")
    aq.add_argument(
        "--rerank", type=int, default=4,
        help="IVF-PQ exact-rescore shortlist multiplier (0 = codes only)",
    )
    aq.set_defaults(fn=cmd_ann_query)

    ver = sub.add_parser("verify", help="bit-identity roundtrip check")
    ver.add_argument("--input", required=True, help="original parquet dir")
    ver.add_argument("--encoded", required=True)
    ver.set_defaults(fn=cmd_verify)

    rp = sub.add_parser("report", help="quality report (markdown/html)")
    rp.add_argument("--input", required=True, help="parquet dir to profile")
    rp.add_argument("--md", default=None, help="markdown output path")
    rp.add_argument("--html", default=None, help="html output path")
    rp.add_argument("--keys", default=None, help="comma-separated dup-key columns")
    rp.set_defaults(fn=cmd_report)

    dsc = sub.add_parser(
        "describe",
        help="catalog view of an encoded corpus (metadata only: schema, "
             "codecs, zone-map/filter coverage, sidecar columns)",
    )
    dsc.add_argument("--encoded", required=True)
    dsc.set_defaults(fn=cmd_describe)

    st = sub.add_parser("stats", help="manifest statistics")
    st.add_argument("--encoded", required=True)
    st.add_argument("--per-bucket", action="store_true")
    st.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
