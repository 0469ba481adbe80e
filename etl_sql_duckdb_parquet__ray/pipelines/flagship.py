"""Flagship end-to-end pipeline over driver test data.

The driver's smoke check (``entry()``) has no transcript table, so we derive
one deterministically from the ``events`` table — the exact ``input_hint``
schema ``(conv_id, turn_idx, role, text, tool, ts)`` — then run the full
engine: shuffle by conversation → per-group stable turn order → actor-pool
encode to chunks+manifest → streaming decode back. This exercises every
stage of the encode path (SURVEY.md §3.1) on driver-provided input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.relational import read_table
from .encode import decode_dataset, encode_transcripts

_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)


def events_to_transcripts(sf_dir: str):
    """events(event_id, ts, user_id, event_type, value, props) → transcript
    schema: conv per user, turn order = (ts, event_id), role cycled, text =
    props payload, tool = event_type."""
    ds = read_table(sf_dir, "events")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        return pd.DataFrame(
            {
                "conv_id": np.repeat(f"conv-{int(g['user_id'].iloc[0]):08d}", n),
                "turn_idx": np.arange(n, dtype=np.int32),
                "role": _ROLES[np.arange(n) % 4],
                "text": g["props"].fillna("").to_numpy(dtype=object),
                "tool": np.where(np.arange(n) % 4 == 3, g["event_type"], None),
                "ts": g["ts"].to_numpy(),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def flagship_roundtrip(sf_dir: str, out_dir: str, num_buckets: int = 8):
    """Derive transcripts → encode → decode; returns the decoded Dataset."""
    ds = events_to_transcripts(sf_dir)
    encode_transcripts(
        ds, out_dir, num_buckets=num_buckets, resume=False,
        encoder_concurrency=(1, 4),
    )
    return decode_dataset(out_dir)


def conv_stats(encoded_dir: str):
    """Per-conversation stats computed FROM THE ENCODED FORM: decode only
    (conv_id, turn_idx, role) — projection pushdown skips text/tool payload
    bytes — then one combiner groupby per conversation. The pattern a
    100 TB corpus uses for catalog-style stats without touching text."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Sum

    ds = decode_dataset(encoded_dir, columns=["conv_id", "turn_idx", "role"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pc.cast(t.column("turn_idx"), pa.int64()),
                "is_tool": pc.cast(pc.equal(t.column("role"), "tool"), pa.int64()),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Count(), Max("turn_idx"), Sum("is_tool"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["conv_id", "n_turns", "max_turn_idx", "n_tool_turns"])

    return out.map_batches(rename, batch_format="pyarrow")


def text_search(encoded_dir: str, term: str):
    """Substring search over the encoded corpus: chunk-level trigram Bloom
    filters in the manifest prune chunks that provably lack the term
    (when the corpus was encoded with ``text_filters=True``; survivors and
    filter-less chunks get the exact vectorized ``match_substring`` row
    filter inside the selective decode), then per-role match counts — only
    (role) rows of matching turns leave the decode stage."""
    from ray.data.aggregate import Count

    ds = decode_dataset(encoded_dir, columns=["role"], text_contains=term)
    out = ds.groupby("role").aggregate(Count())
    # the aggregate is tiny (<= #roles rows) — collect it. A no-match search
    # yields ZERO blocks, and Ray drops empty blocks' schema entirely, so a
    # lazy Dataset cannot carry the (role, n_hits) schema; pandas can.
    df = out.to_pandas()
    if df.shape[1] == 2:
        df.columns = ["role", "n_hits"]
        return df
    return pd.DataFrame(
        {"role": pd.Series(dtype=object), "n_hits": pd.Series(dtype="int64")}
    )


def role_transitions(encoded_dir: str):
    """Role-transition matrix FROM THE ENCODED FORM: decode only
    (conv_id, turn_idx, role), hash-shuffle by conversation, LAG within
    each conversation's (turn_idx) order, then count (prev_role -> role)
    pairs. Conversation-flow analytics without touching text payloads —
    the windowed analog of ``conv_stats``. Per-conversation groups are
    bounded (a conversation fits in memory); the pair-count table is at
    most |roles|^2 rows."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = decode_dataset(encoded_dir, columns=["conv_id", "turn_idx", "role"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        roles = g["role"].to_numpy()
        if len(roles) < 2:
            return pd.DataFrame({"prev_role": [], "role": [], "n": []})
        prev, cur = roles[:-1], roles[1:]
        out = (
            pd.DataFrame({"prev_role": prev, "role": cur, "n": np.int64(1)})
            .groupby(["prev_role", "role"], as_index=False)["n"]
            .sum()
        )
        return out

    agg = (
        ds.groupby("conv_id")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["prev_role", "role"])
        .aggregate(Sum("n"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["prev_role", "role", "n_transitions"])

    return agg.map_batches(rename, batch_format="pyarrow")


def segment_engagement(encoded_dir: str, sf_dir: str):
    """Encoded-corpus × relational-dimension integration: per-market-
    segment engagement stats joining the ENCODED transcript corpus back
    to the customer dimension. Decode only ``conv_id`` (projection
    pushdown — no text bytes leave the chunk files), combiner-count turns
    per conversation, derive the customer key from the conv_id
    (``conv-%08d`` — vectorized slice+cast, no per-row Python), then ONE
    broadcast join against the (c_custkey, c_mktsegment) dimension and a
    tiny per-segment combiner groupby. The 100-TB shape: corpus side
    streams, dimension side ships once via ``ray.put``."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from ..stages.relational import broadcast_join, read_arrow

    ds = decode_dataset(encoded_dir, columns=["conv_id"])

    def conv_partial(t: pa.Table) -> pa.Table:
        # map-side partial count per conv (combiner before the exchange)
        c = t.column("conv_id")
        vc = c.value_counts()
        return pa.table(
            {
                "conv_id": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    per_conv = (
        ds.map_batches(conv_partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n"))
    )

    def to_key(t: pa.Table) -> pa.Table:
        # conv-00000042 -> 42 (slice is codeunit-safe: ASCII ids)
        key = pc.cast(
            pc.utf8_slice_codeunits(t.column("conv_id"), 5, 13), pa.int64()
        )
        return pa.table(
            {"c_custkey": key, "n_turns": t.column("sum(n)")}
        )

    dim = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(
        per_conv.map_batches(to_key, batch_format="pyarrow"), dim, ["c_custkey"]
    )
    out = joined.groupby("c_mktsegment").aggregate(Count(), Sum("n_turns"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["c_mktsegment", "n_convs", "n_turns"])

    return out.map_batches(rename, batch_format="pyarrow")
