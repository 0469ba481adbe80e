"""End-to-end corpus lifecycle walkthrough — documentation as code.

Runs every mutation the engine supports against one small synthetic
corpus and prints a JSON line per step:

    encode -> verify roundtrip -> derive sidecar column -> tombstone
    delete -> point lookup (hidden) -> upsert a new conversation version
    -> union read -> compact ticks back in -> purge -> text search

Usage: python scripts/lifecycle_demo.py [workdir]
Owns its Ray session (standalone script; the library never calls
ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(name: str, **kv) -> None:
    print(json.dumps({"step": name, **kv}))


def main() -> int:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    from etl_sql_duckdb_parquet__ray.pipelines.deletes import (
        delete_convs,
        purge_deleted,
        read_upserted,
        upsert_convs,
    )
    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        decode_dataset,
        derive_column,
        encode_transcripts,
        roundtrip_ok,
    )
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.state.manifest import manifest_stats
    from etl_sql_duckdb_parquet__ray.state.scheduler import compact

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lifecycle_demo"
    if os.path.exists(root) and os.listdir(root):
        # never rm -rf a user-supplied path: refuse anything non-empty
        print(json.dumps({"error": "workdir exists and is not empty",
                          "workdir": root}))
        return 2
    shutil.rmtree(root, ignore_errors=True)
    base = os.path.join(root, "corpus")

    table = generate_transcripts(20000, seed=42)
    ds = ray.data.from_arrow(table)

    encode_transcripts(ds, base, num_buckets=4, chunk_rows=4096,
                       text_filters=True)
    st = manifest_stats(base)
    step("encode", rows=st["rows"], bytes_out=st["bytes_out"],
         chunks=st["chunks"])

    step("verify_roundtrip", bit_identical=roundtrip_ok(ds, base))

    derive_column(
        base, "n_chars",
        lambda cols: pc.utf8_length(cols["text"]).cast(pa.int64()),
        ["text"],
    )
    long_rows = decode_dataset(
        base, columns=["n_chars"], col_ranges={"n_chars": (100, None)}
    ).count()
    step("derive_sidecar", column="n_chars", rows_over_100_chars=long_rows)

    convs = sorted(set(table.column("conv_id").to_pylist()))
    dead = convs[:2]
    info = delete_convs(base, dead)
    step("tombstone_delete", **info)
    step("point_lookup_deleted_conv",
         rows=decode_dataset(base, conv_id=dead[0]).count())

    upd = table.filter(pc.equal(table.column("conv_id"), convs[2]))
    upd = upd.set_column(
        upd.schema.get_field_index("text"), "text",
        pc.binary_join_element_wise(
            pa.array(["v2"] * upd.num_rows), upd.column("text"), " "
        ),
    )
    tick = os.path.join(root, "tick-1")
    up = upsert_convs(base, ray.data.from_arrow(upd), tick,
                      num_buckets=2, chunk_rows=4096)
    step("upsert", n_upserted_convs=up["n_upserted_convs"],
         epoch=up["epoch"])
    step("union_read_rows", rows=read_upserted(base, [tick]).count())

    merged = os.path.join(root, "merged")
    compact([base, tick], merged, num_buckets=4, chunk_rows=4096)
    step("compact", rows=manifest_stats(merged)["rows"],
         tombstones_left=os.path.exists(os.path.join(merged, "_deletes.parquet")))

    purged = os.path.join(root, "purged")
    purge_deleted(base, purged, num_buckets=4, chunk_rows=4096)
    step("purge", rows=manifest_stats(purged)["rows"])

    hits = decode_dataset(merged, text_contains="v2 ").count()
    step("text_search", term="v2 ", rows=hits)

    # TIME TRAVEL: the delete above took epoch 1, so the upsert landed at
    # epoch 2 (the mutation clock advances past every stamped epoch) —
    # reading as of the epoch BEFORE the upsert shows the original text,
    # as of the upsert's own epoch the v2 version; no snapshot copies exist
    from etl_sql_duckdb_parquet__ray.pipelines.deletes import read_as_of

    def _first_text(ds_):
        import pandas as pd  # noqa: F401

        df = ds_.to_pandas()
        df = df[df["conv_id"] == convs[2]].sort_values("turn_idx")
        return df["text"].iloc[0][:2] if len(df) else ""

    ue = up["epoch"]
    step("time_travel", upsert_epoch=ue,
         before_prefix=_first_text(read_as_of(base, [tick], ue - 1)),
         after_prefix=_first_text(read_as_of(base, [tick], ue)))

    # ADD COLUMN: metadata-only constant, visible on every read
    from etl_sql_duckdb_parquet__ray.pipelines.encode import (
        add_column_default,
    )

    add_column_default(purged, "corpus_tag", "demo", "string")
    tagged = decode_dataset(purged, columns=["corpus_tag"]).take(1)
    step("add_column_default", column="corpus_tag",
         value=tagged[0]["corpus_tag"] if tagged else None)

    # IVM: a persisted per-role turn-count view maintained per tick —
    # refreshing the same label twice is a no-op (exactly-once)
    from etl_sql_duckdb_parquet__ray.pipelines.ivm import (
        read_view, refresh_view,
    )

    view = os.path.join(root, "view")
    refresh_view(view, decode_dataset(base, columns=["role", "turn_idx"]),
                 "base", group_cols=["role"], sum_cols=["turn_idx"])
    refresh_view(view, decode_dataset(tick, columns=["role", "turn_idx"]),
                 "tick-1", group_cols=["role"], sum_cols=["turn_idx"])
    again = refresh_view(view, decode_dataset(tick,
                         columns=["role", "turn_idx"]),
                         "tick-1", group_cols=["role"], sum_cols=["turn_idx"])
    step("ivm_view", n_groups=read_view(view).num_rows,
         reapply_was_noop=not again["applied"])

    # fsck: source-free checksum validation of every chunk file (capture
    # the CLI's own JSON line and fold it into one step record)
    import contextlib
    import io

    from etl_sql_duckdb_parquet__ray.cli import main as _cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        code = _cli(["fsck", "--encoded", merged])
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    step("fsck", code=code, buckets=rep["buckets"],
         rows_decoded=rep["rows_decoded"], corrupt=rep["corrupt"])

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
