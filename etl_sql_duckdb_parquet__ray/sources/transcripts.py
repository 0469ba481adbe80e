"""Deterministic synthetic transcript-table generator.

Produces the ``BASELINE.json`` ``input_hint`` schema —
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — with the FIXTURES.md §1 generator properties:
Zipf-skewed turn counts (hot conversations for the skew-splitting path),
cycled roles, seeded token-sampled text (empty strings, unicode, repeated
substrings), ~80%-null sparse ``tool``, and near-monotone per-conversation
timestamps with jitter. Fully seeded; no wall-clock, no external data.

Sharded generation is per-shard deterministic (seed = base_seed + shard), so
a parquet directory of any scale can be rebuilt bit-identically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_VOCAB = (
    "the of and to in a is that for it as was with be by on not he this are at from his they "
    "an which or have had one you were all her she there would their we him been has when who "
    "will no more if out so up said what its about than into them can only other time new some "
    "could these two may first then do any like my now over such our man me even most made after "
    "also did many off before must well back through years much where your way down should because "
    "each just those people how too little state good very make world still see own men work long "
    "here get both between life being under never day same another know while last might us great "
    "old year come since against go came right used take three".split()
)
_UNICODE_TOKENS = ["日本語", "héllo", "→", "naïve", "Ω", "文字"]
_PHRASES = [
    "let me check the logs for that error",
    "running the test suite now",
    "the function returns a dataset of arrow batches",
    "I will summarize the findings below",
]
_TOOLS = [
    "bash", "read_file", "write_file", "search", "browser", "python",
    "grep", "edit", "sql", "fetch_url", "calculator", "scheduler",
]
_ROLES = ["user", "assistant", "system", "tool"]


def _conversation_sizes(n_turns: int, rng: np.random.Generator) -> np.ndarray:
    """Zipf-ish turn counts: mostly short conversations, a heavy tail."""
    sizes = []
    total = 0
    while total < n_turns:
        batch = np.minimum(rng.zipf(1.6, size=1024) + 1, 5000)
        sizes.append(batch)
        total += int(batch.sum())
    sizes = np.concatenate(sizes)
    cum = np.cumsum(sizes)
    k = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:k]
    sizes[-1] -= int(cum[k - 1] - n_turns)
    return sizes[sizes > 0].astype(np.int64)


def generate_transcripts(
    n_turns: int, seed: int = 42, conv_offset: int = 0
) -> pa.Table:
    rng = np.random.default_rng(seed)
    sizes = _conversation_sizes(n_turns, rng)
    n = int(sizes.sum())
    n_conv = len(sizes)
    conv_ordinal = np.repeat(np.arange(n_conv) + conv_offset, sizes)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(conv_offset, conv_offset + n_conv)])
    starts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    # roles: system at turn 0 for ~30% of conversations, then user/assistant
    # alternation with tool turns where a tool call happens
    role_codes = (turn_idx % 2).astype(np.int64)  # 0=user 1=assistant
    sys0 = rng.random(n_conv) < 0.3
    role_codes[np.repeat(sys0, sizes) & (turn_idx == 0)] = 2
    tool_mask = rng.random(n) < 0.2
    role_codes[tool_mask & (turn_idx > 1)] = 3
    roles = np.array(_ROLES, dtype=object)[np.minimum(role_codes, 3)]

    tools = np.full(n, None, dtype=object)
    tool_rows = np.flatnonzero(tool_mask)
    tools[tool_rows] = np.array(_TOOLS, dtype=object)[
        rng.integers(0, len(_TOOLS), len(tool_rows))
    ]

    # text: token-sampled with phrase repeats, unicode, and empty strings
    tok_counts = rng.integers(0, 90, n)
    tok_counts[rng.random(n) < 0.02] = 0
    vocab = np.array(_VOCAB + _UNICODE_TOKENS + _PHRASES, dtype=object)
    flat = vocab[rng.integers(0, len(vocab), int(tok_counts.sum()))]
    bounds = np.concatenate(([0], np.cumsum(tok_counts)))
    texts = np.empty(n, dtype=object)
    join = " ".join
    for i in range(n):
        texts[i] = join(flat[bounds[i] : bounds[i + 1]])

    # near-monotone per-conversation timestamps (constant-ish delta + jitter)
    base = np.int64(1_735_689_600_000_000)  # 2025-01-01T00:00:00Z in us
    conv_start = base + rng.integers(0, 90 * 24 * 3600 * 1_000_000, n_conv, dtype=np.int64)
    deltas = rng.integers(5_000_000, 45_000_000, n, dtype=np.int64)
    cs = np.cumsum(deltas)
    group_base = np.repeat(cs[starts] - deltas[starts], sizes)
    ts = np.repeat(conv_start, sizes) + (cs - group_base)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_ordinal - conv_offset], type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )


def transcripts_parquet_dir(
    n_turns: int,
    base_dir: str = "/tmp/transcripts",
    seed: int = 42,
    shard_rows: int = 62_500,
) -> str:
    """Materialize (once, cached) a sharded parquet directory of transcripts.

    Shard i is generated with seed ``seed + i`` and conversation ids offset
    so shards are disjoint — the deterministic stand-in for the 10^12-turn
    production table.
    """
    n_shards = max(1, (n_turns + shard_rows - 1) // shard_rows)
    out = os.path.join(base_dir, f"n{n_turns}-s{seed}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    # conversation-id offsets no longer depend on the previous shard's
    # actual conversation count (which would serialize generation): each
    # shard gets a disjoint id block big enough for any draw
    id_block = shard_rows  # a shard can never have more convs than rows
    specs = []
    remaining = n_turns
    for i in range(n_shards):
        rows = min(shard_rows, remaining)
        specs.append((i, rows, seed + i, i * id_block))
        remaining -= rows

    def _write(i: int, rows: int, sd: int, off: int) -> str:
        t = generate_transcripts(rows, seed=sd, conv_offset=off)
        path = os.path.join(out, f"shard-{i:05d}.parquet")
        pq.write_table(t, path)
        return path

    ray = None
    try:
        import ray as _ray

        ray = _ray if _ray.is_initialized() else None
    except Exception:
        ray = None
    if ray is not None and len(specs) > 1:
        # parallel generation on the existing session (still deterministic:
        # each shard is a pure function of its spec)
        task = ray.remote(num_cpus=1)(_write)
        ray.get([task.remote(*s) for s in specs])
    else:
        for s in specs:
            _write(*s)
    with open(done, "w") as f:
        f.write("ok")
    return out
