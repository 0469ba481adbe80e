"""Relational analytics pipelines over the driver test tables — the Ray-Data
re-expression of the reference's DuckDB query layer (``sql/queries.sql:1-149``)
and validation rules (``src/etl/validate.py:44-255``; SURVEY.md §2.3, §2.5-2.9).

Every function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column NAMES and VALUES match the paired ``oracle_sql()`` string in
``__ray_entry__.py`` exactly. Determinism rules used throughout:

- money sums are integer-scaled (``CAST(ROUND(x*100) AS BIGINT)``) before
  aggregation so Ray's block-order-dependent float summation and DuckDB's
  sequential summation produce the *same exact integers*;
- percentages are floored basis points (``FLOOR(10000*n/total)``), never
  round-half (DuckDB rounds half-away, numpy half-even);
- timestamps are compared as ``epoch_us`` int64.

Nothing here calls ``ray.init``; the caller owns the session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages.relational import (
    broadcast_join,
    broadcast_semi,
    case_when,
    count_distinct,
    grouped_rank,
    read_arrow,
    read_table,
)

US_PER_DAY = 86_400_000_000


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """x -> CAST(ROUND(x*100) AS BIGINT), matching DuckDB exactly: the true
    value is a 2-decimal decimal, so *100 is within ulps of an integer and
    round-to-nearest can never sit on a .5 boundary."""
    return pc.round(pc.multiply(col, pa.scalar(100.0))).cast(pa.int64())


def _ts_us(col) -> pa.Array:
    return col.combine_chunks().cast(pa.int64()) if isinstance(col, pa.ChunkedArray) else col.cast(pa.int64())


def _rename(ds, names: list[str]):
    return ds.map_batches(lambda t: t.rename_columns(names), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped aggregates (reference A6/A8; sql/queries.sql Q1, Q4, Q5)
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str):
    """Q1-style pricing summary: per (returnflag, linestatus) integer-scaled
    sums + row count (reference grouped SUM/AVG at ``sql/queries.sql:43-55``)."""
    ds = read_table(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_x100": _cents(t.column("l_quantity")),
                "price_x100": _cents(t.column("l_extendedprice")),
                "disc_x100": _cents(t.column("l_discount")),
            }
        )

    out = (
        ds.map_batches(scale, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_x100"),
            Sum("price_x100"),
            Sum("disc_x100"),
            Count(),
        )
    )
    return _rename(
        out,
        ["l_returnflag", "l_linestatus", "sum_qty_x100", "sum_price_x100", "sum_disc_x100", "count_order"],
    )


def revenue_by_nation(sf_dir: str):
    """3-way join chain via one broadcast lookup (reference J4 join+group,
    ``sql/queries.sql:101-110``): lineitem ⋈ supplier ⋈ nation, revenue =
    SUM(ROUND(extprice*(1-disc)*10000)) — per-row product is identical IEEE
    math on both sides, then exact integer sums."""
    sup = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    lookup = sup.join(nat, keys=["s_nationkey"], right_keys=["n_nationkey"]).select(
        ["s_suppkey", "n_name"]
    )
    ds = read_table(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
            pa.scalar(10000.0),
        )
        return pa.table(
            {"l_suppkey": t.column("l_suppkey"), "rev_x10000": pc.round(r).cast(pa.int64())}
        )

    joined = broadcast_join(
        ds.map_batches(rev, batch_format="pyarrow"), lookup,
        keys="l_suppkey", right_keys="s_suppkey",
    )
    out = joined.groupby("n_name").aggregate(
        Sum("rev_x10000"),
        Count(),
    )
    return _rename(out, ["n_name", "revenue_x10000", "n_items"])


def revenue_by_mktsegment(sf_dir: str):
    """Broadcast dim join + grouped integer sum (reference J1 enrichment join
    ``src/etl/load.py:112-116`` + A6)."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t.column("o_custkey"), "total_x100": _cents(t.column("o_totalprice"))}
        )

    joined = broadcast_join(
        ds.map_batches(scale, batch_format="pyarrow"), cust,
        keys="o_custkey", right_keys="c_custkey",
    )
    out = joined.groupby("c_mktsegment").aggregate(
        Sum("total_x100"),
        Count(),
    )
    return _rename(out, ["c_mktsegment", "revenue_x100", "n_orders"])


def distinct_customers_by_priority(sf_dir: str):
    """COUNT(DISTINCT) as a two-level shuffle (SURVEY.md A6)."""
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    return count_distinct(ds, "o_orderpriority", "o_custkey", "n_custs")


def orders_per_day(sf_dir: str):
    """Date-bucketed counts (reference Q5-style by-date aggregate,
    ``sql/queries.sql:57-65``); day number = epoch_us // us_per_day."""
    ds = read_table(sf_dir, "orders", ["o_orderdate"])

    def day(t: pa.Table) -> pa.Table:
        # numpy // is FLOOR division, matching DuckDB's // for pre-1970
        # (negative-epoch) dates; pc.divide truncates toward zero
        us = _ts_us(t.column("o_orderdate")).to_numpy(zero_copy_only=False)
        return pa.table({"day_num": pa.array(us // US_PER_DAY, type=pa.int64())})

    out = ds.map_batches(day, batch_format="pyarrow").groupby("day_num").count()
    return _rename(out, ["day_num", "n_orders"])


# ---------------------------------------------------------------------------
# sorts / top-k / CASE (reference O1-O3, M12)
# ---------------------------------------------------------------------------

def top_orders(sf_dir: str, k: int = 10):
    """ORDER BY total DESC LIMIT k with an explicit tiebreak (reference O2,
    ``src/benchmarks.py:86-88``)."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "total_x100": _cents(t.column("o_totalprice"))}
        )

    return (
        ds.map_batches(scale, batch_format="pyarrow")
        .sort(["total_x100", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def top_orders_page(sf_dir: str, k: int = 10, offset: int = 10):
    """LIMIT k OFFSET off pagination: fetch the top ``offset + k`` rows
    (Dataset has no offset primitive — and doesn't need one: the
    bounded-k sorted head is the distributed part) and drop the first
    ``offset`` driver-side. O(offset + k) driver rows, never a full
    collect; deep pagination (offset ~ N) should keyset-paginate on the
    (total_x100, o_orderkey) cursor instead — same sort, WHERE < cursor."""
    import pandas as pd

    head = top_orders(sf_dir, k=offset + k).to_pandas()
    return head.iloc[offset:offset + k].reset_index(drop=True)


def order_price_bands(sf_dir: str):
    """CASE WHEN price bands → grouped counts (reference Q3 qc_status CASE,
    ``sql/queries.sql:26-41``)."""
    ds = read_table(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    banded = ds.map_batches(
        lambda t: case_when(
            t, "o_totalprice",
            [("greater_equal", 150000.0, "high"), ("greater_equal", 50000.0, "mid")],
            "low", "price_band",
        ).drop_columns(["o_totalprice"]),
        batch_format="pyarrow",
    )
    out = banded.groupby(["o_orderstatus", "price_band"]).count()
    return _rename(out, ["o_orderstatus", "price_band", "n"])


# ---------------------------------------------------------------------------
# windows (reference W1/W2: sql/queries.sql:67-76, 101-110)
# ---------------------------------------------------------------------------

def top3_orders_per_segment(sf_dir: str):
    """ROW_NUMBER() OVER (PARTITION BY segment ORDER BY price DESC, key) ≤ 3
    via per-group rank (reference W1)."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_x100": _cents(t.column("o_totalprice")),
            }
        )

    joined = broadcast_join(
        ds.map_batches(scale, batch_format="pyarrow"), cust,
        keys="o_custkey", right_keys="c_custkey",
    )
    ranked = grouped_rank(
        joined, "c_mktsegment", "total_x100",
        descending=True, tiebreak="o_orderkey", top_n=3, rank_col="rnk",
    )
    return ranked.select_columns(["c_mktsegment", "o_orderkey", "rnk"])


def event_type_share(sf_dir: str):
    """Percent-of-total within partition as floored basis points (reference
    W2 percent-of-total, ``sql/queries.sql:101-110``)."""
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).count()
    counts = _rename(counts, ["user_id", "event_type", "n"])

    def share(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["pct_bp"] = np.floor(10000.0 * g["n"] / g["n"].sum()).astype(np.int64)
        return g

    return counts.groupby("user_id").map_groups(share, batch_format="pandas")


# ---------------------------------------------------------------------------
def last_purchase_before_event(sf_dir: str):
    """AS-OF join (backward): attach to every event the same user's most
    recent purchase at-or-before its timestamp — the temporal-join operator
    Ray Data lacks natively (`stages/relational.py:asof_join`: one
    union+hash exchange, per-key vectorized searchsorted). Ties per
    (user, ts) resolve to the max event_id via the operator's
    ``right_tiebreak`` sort (no pre-dedup pass), matching the DuckDB
    ``ASOF LEFT JOIN`` oracle's deduped right side row for row."""
    from ..stages.relational import asof_join

    left = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    right = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "p_event_id": t.column("event_id"),
                "p_ts": t.column("ts"),
                "p_value": t.column("value"),
            }
        )

    right = right.map_batches(purchases, batch_format="pyarrow")
    # schemas passed explicitly (from parquet METADATA, driver-side, free):
    # asof_join builds typed null padding at plan time, and deriving the
    # right side's schema from the Dataset would execute the upstream
    # map_batches pipeline just to fetch one block
    import pyarrow.parquet as pq

    ev = pq.read_schema(f"{sf_dir}/events.parquet")
    left_schema = pa.schema(
        [(c, ev.field(c).type) for c in ["event_id", "user_id", "ts", "event_type"]]
    )
    right_schema = pa.schema(
        [
            ("user_id", ev.field("user_id").type),
            ("p_event_id", ev.field("event_id").type),
            ("p_ts", ev.field("ts").type),
            ("p_value", ev.field("value").type),
        ]
    )
    return asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="p_ts",
        right_payload=["p_event_id", "p_ts", "p_value"],
        right_tiebreak="p_event_id",
        left_schema=left_schema, right_schema=right_schema,
    )


def clicks_after_purchase(sf_dir: str):
    """RANGE (interval) join: every (click, purchase) pair where the same
    user's click lands inside the 6-hour window after the purchase —
    `stages/relational.py:range_join` (one union+hash exchange, vectorized
    searchsorted pair expansion; the inequality-join operator Ray Data
    lacks). The oracle is the literal inequality join in DuckDB."""
    from ..stages.relational import range_join

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return pa.table(
            {
                "click_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "click_ts": t.column("ts"),
            }
        )

    WINDOW_US = 6 * 3_600_000_000

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        start = t.column("ts").cast(pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "purchase_id": t.column("event_id"),
                "purchase_ts": t.column("ts"),
                "w_start": start,
                "w_end": pc.add(start, WINDOW_US),
            }
        )

    left = ev.map_batches(clicks, batch_format="pyarrow")
    right = ev.map_batches(purchases, batch_format="pyarrow")
    import pyarrow.parquet as pq

    evs = pq.read_schema(f"{sf_dir}/events.parquet")
    left_schema = pa.schema(
        [
            ("click_id", evs.field("event_id").type),
            ("user_id", evs.field("user_id").type),
            ("click_ts", evs.field("ts").type),
        ]
    )
    right_schema = pa.schema(
        [
            ("user_id", evs.field("user_id").type),
            ("purchase_id", evs.field("event_id").type),
            ("purchase_ts", evs.field("ts").type),
            ("w_start", pa.int64()),
            ("w_end", pa.int64()),
        ]
    )
    return range_join(
        left, right, on="user_id", left_ts="click_ts",
        right_start="w_start", right_end="w_end",
        right_payload=["purchase_id", "purchase_ts"],
        left_schema=left_schema, right_schema=right_schema,
    )


def purchases_last_hour(sf_dir: str):
    """Sliding-window aggregate: per event, how many of the same user's
    purchases happened in the preceding hour (inclusive of the event's own
    instant). `stages/relational.py:rolling_window_count` — one hash
    exchange, two searchsorted calls per group; the oracle expresses the
    same thing as a self-range-join + GROUP BY."""
    from ..stages.relational import rolling_window_count

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_purchase", pc.equal(t.column("event_type"), "purchase")
        )

    out = rolling_window_count(
        ds.map_batches(mark, batch_format="pyarrow"),
        key="user_id", ts_col="ts", window_us=3_600_000_000,
        mark_col="is_purchase", out_col="purchases_1h",
    )
    return out.select_columns(["event_id", "user_id", "ts", "purchases_1h"])


# ---------------------------------------------------------------------------
# dedup / anti-join / unions (reference D1, D3, J5)
# ---------------------------------------------------------------------------

def latest_event_per_user(sf_dir: str):
    """Keep-last dedup on an explicit order column (reference D1
    ``drop_duplicates(keep='last')``, ``src/etl/transform.py:52-57`` — but
    with the ordering explicit, as Ray Data guarantees no row order)."""
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": _ts_us(t.column("ts")),
            }
        )

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["ts_us", "event_id"], ascending=False, kind="mergesort")
            .head(1)
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(keep_last, batch_format="pandas")
    )


def orphan_orders(sf_dir: str):
    """Anti-join referential-integrity probe (reference J5/V8,
    ``sql/queries.sql:94-99``, ``src/etl/validate.py:239-255``): orders whose
    customer key is missing from the dim — broadcast anti-membership, then a
    count (so the result keeps a schema even when no orphans exist)."""
    cust_keys = read_arrow(sf_dir, "customer", ["c_custkey"]).column("c_custkey").combine_chunks()
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n = broadcast_semi(ds, cust_keys, "o_custkey", anti=True).count()
    return pa.table({"n_orphans": pa.array([n], type=pa.int64())})


def table_counts_union(sf_dir: str):
    """UNION ALL of scalar aggregates (reference D3/Q7 shape,
    ``sql/queries.sql:79-92``)."""
    rows = [
        {"tbl": name, "n": read_table(sf_dir, name).count()}
        for name in ["orders", "lineitem", "customer"]
    ]
    return ray.data.from_items(rows)


def null_rates_events(sf_dir: str):
    """Per-field null counts stacked UNION-ALL style (reference A7/Q7 null
    rate, ``sql/queries.sql:79-92``) — partial counts per batch, exact int
    sums on the driver."""
    ds = read_table(sf_dir, "events", ["value", "props", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], type=pa.int64()),
                "null_value": pa.array([t.column("value").null_count], type=pa.int64()),
                "null_props": pa.array([t.column("props").null_count], type=pa.int64()),
                "null_event_type": pa.array([t.column("event_type").null_count], type=pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_rows", "null_value", "null_props", "null_event_type"]
    )
    rows = [
        {"field": f, "n_null": int(agg[f"sum({f})"]), "n_total": int(agg["sum(n_rows)"])}
        for f in ["null_value", "null_props", "null_event_type"]
    ]
    return ray.data.from_items(rows)


# ---------------------------------------------------------------------------
# validation rules as aggregates (reference V1-V7, src/etl/validate.py)
# ---------------------------------------------------------------------------

def validation_summary(sf_dir: str):
    """The reference's row-addressed validation rules (NOT_NULL / RANGE /
    FUTURE_DATE, ``src/etl/validate.py:44-234``) re-expressed as one
    vectorized counting pass: per-batch partial counts, exact integer sums."""
    ds = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount", "l_tax", "l_shipdate"]
    )
    future = pa.scalar(np.int64(1_893_456_000_000_000), type=pa.int64())  # 2030-01-01 us

    def partial(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity")
        disc = t.column("l_discount")
        bad_disc = pc.or_(pc.less(disc, 0.0), pc.greater(disc, 1.0))
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], type=pa.int64()),
                "n_null_key": pa.array([t.column("l_orderkey").null_count], type=pa.int64()),
                "n_bad_qty": pa.array(
                    [pc.sum(pc.less_equal(qty, 0.0).cast(pa.int64())).as_py() or 0],
                    type=pa.int64(),
                ),
                "n_bad_disc": pa.array(
                    [pc.sum(bad_disc.cast(pa.int64())).as_py() or 0], type=pa.int64()
                ),
                "n_future_ship": pa.array(
                    [
                        pc.sum(
                            pc.greater(_ts_us(t.column("l_shipdate")), future).cast(pa.int64())
                        ).as_py()
                        or 0
                    ],
                    type=pa.int64(),
                ),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_rows", "n_null_key", "n_bad_qty", "n_bad_disc", "n_future_ship"]
    )
    return pa.table(
        {
            k: pa.array([int(agg[f"sum({k})"])], type=pa.int64())
            for k in ["n_rows", "n_null_key", "n_bad_qty", "n_bad_disc", "n_future_ship"]
        }
    )


def dedup_exact_docs(sf_dir: str):
    """Exact text dedup, keep the smallest doc_id per distinct text (the
    scalable form of ``drop_duplicates(subset=['text'])``).

    Shuffle-volume design: grouping by the raw ``text`` would ship every
    byte of the corpus through the exchange. Instead a map-side 128-bit
    composite hash (two independent SipHash-64 passes — vectorized C via
    ``pd.util.hash_array``) replaces the key, so the exchange moves 24
    bytes/row regardless of document size. At 10^12 docs the expected
    number of 128-bit birthday collisions is ~1e-15 — far below any
    hardware error rate — which is why the output matches the full-text
    ``GROUP BY`` oracle exactly."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def key_hash(t: pa.Table) -> pa.Table:
        txt = np.asarray(t.column("text"), dtype=object)
        # hash_key must be exactly 16 bytes; two independent keys -> 128 bits
        h1 = pd.util.hash_array(txt, hash_key="dedupexactkey__1")
        h2 = pd.util.hash_array(txt, hash_key="dedupexactkey__2")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
            }
        )

    keyed = ds.map_batches(key_hash, batch_format="pyarrow")
    out = keyed.groupby(["h1", "h2"]).aggregate(Min("doc_id"))
    return _rename(out, ["h1", "h2", "doc_id"]).select_columns(["doc_id"])


def doc_token_stats(sf_dir: str):
    """Whitespace token counts per document (text-analysis layer; matches
    DuckDB ``len(string_split(text,' '))`` exactly: n_spaces+1)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(t.column("text"), " "), 1).cast(pa.int64())
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_chars": t.column("n_chars"), "n_tokens": n_tok}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def lang_token_totals(sf_dir: str):
    """Grouped text aggregates per language tag."""
    ds = doc_token_stats_with_lang(sf_dir)
    out = ds.groupby("lang").aggregate(
        Count(),
        Sum("n_chars"),
        Sum("n_tokens"),
    )
    return _rename(out, ["lang", "n_docs", "total_chars", "total_tokens"])


def doc_token_stats_with_lang(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["lang", "n_chars", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(t.column("text"), " "), 1).cast(pa.int64())
        return pa.table(
            {"lang": t.column("lang"), "n_chars": t.column("n_chars"), "n_tokens": n_tok}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def column_profile_lineitem(sf_dir: str):
    """Single-row column profile (reference A1 per-column stats,
    ``src/profiling.py:12-42``) with exact-comparable integer scaling."""
    ds = read_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    agg = ds.aggregate(
        Count(),
        Min("l_quantity"), Max("l_quantity"),
        Min("l_extendedprice"), Max("l_extendedprice"),
    )
    def cents(v):
        return int(np.round(v * 100.0))
    return pa.table(
        {
            "n_rows": pa.array([int(agg["count()"])], type=pa.int64()),
            "qty_min_x100": pa.array([cents(agg["min(l_quantity)"])], type=pa.int64()),
            "qty_max_x100": pa.array([cents(agg["max(l_quantity)"])], type=pa.int64()),
            "price_min_x100": pa.array([cents(agg["min(l_extendedprice)"])], type=pa.int64()),
            "price_max_x100": pa.array([cents(agg["max(l_extendedprice)"])], type=pa.int64()),
        }
    )


def orders_nunique(sf_dir: str):
    """Exact per-column distinct counts (reference per-column nunique,
    ``src/profiling.py:12-42``) via the groupby shuffle; the HLL-sketch
    companion is ``stages.profile.approx_nunique`` (one streaming pass,
    ~1% error) for when the exchange isn't worth it."""
    from ..stages.profile import exact_nunique

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    return pa.table({
        "n_custkey": pa.array([exact_nunique(orders, "o_custkey")], type=pa.int64()),
        "n_priority": pa.array([exact_nunique(orders, "o_orderpriority")], type=pa.int64()),
    })


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization (windowed/stateful op beyond the reference's
    surface): per user, order events by (ts, event_id); a gap > ``gap_minutes``
    starts a new session. Emits per-session aggregates. Hash-partition by
    user, per-group vectorized cumsum — the standard scalable shape."""
    gap_us = gap_minutes * 60 * 1_000_000
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": _ts_us(t.column("ts")),
            }
        )

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort").reset_index(drop=True)
        ts = g["ts_us"].to_numpy()
        new = np.concatenate(([True], np.diff(ts) > gap_us))
        sid = np.cumsum(new)  # 1-based session index per user
        g["session_id"] = sid
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                n_events=("event_id", "size"),
                start_us=("ts_us", "min"),
                end_us=("ts_us", "max"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
    )


def value_outliers(sf_dir: str, threshold: float = 3.0):
    """Z-score outliers on events.value (reference V11 outlier flagging,
    ``src/profiling.py:69-81``) — exact integer-scaled moments so both Ray
    and the SQL oracle derive identical mean/std, then a vectorized filter."""
    from ..stages.profile import flag_outliers_zscore

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    return flag_outliers_zscore(ds, "value", threshold).select_columns(["event_id"])


def revenue_by_priority_hashjoin(sf_dir: str):
    """Large-by-large join parity (reference J3/J4 via ``Dataset.join``
    hash-partitioned exchange, not a broadcast): lineitem ⋈ orders on
    orderkey, revenue per order priority."""
    from ..stages.relational import hash_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
            pa.scalar(10000.0),
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_x10000": pc.round(r).cast(pa.int64())}
        )

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = hash_join(
        li.map_batches(rev, batch_format="pyarrow"), orders,
        on="l_orderkey", right_on="o_orderkey", num_partitions=8,
    )
    out = joined.groupby("o_orderpriority").aggregate(Sum("rev_x10000"), Count())
    return _rename(out, ["o_orderpriority", "revenue_x10000", "n_items"])


def lineitem_correlation(sf_dir: str):
    """Pearson correlations from exact integer-scaled co-moments (reference
    A2 correlation matrix, ``src/profiling.py:45-66``) — the SQL oracle
    derives the same moments from the same integer sums, so the doubles
    match bit-for-bit."""
    from ..stages.profile import numeric_correlation

    ds = read_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])
    corr = numeric_correlation(ds, ["l_quantity", "l_extendedprice", "l_discount"])
    return pa.table(
        {
            "corr_qty_price": pa.array([corr[("l_quantity", "l_extendedprice")]], type=pa.float64()),
            "corr_price_disc": pa.array([corr[("l_extendedprice", "l_discount")]], type=pa.float64()),
        }
    )


def customer_running_total(sf_dir: str):
    """Per-customer running order spend (cumulative window aggregate, the
    W-family sibling of RANK/percent-of-total — SURVEY.md §2.8): orders
    per customer ordered by (date, orderkey), cumulative total in integer
    cents so Ray and SQL agree bit-for-bit. Hash-partition by customer,
    vectorized cumsum per group — identical scale shape to
    :func:`user_sessions`."""
    ds = read_table(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column("o_totalprice"), 100.0)).cast(pa.int64())
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "date_us": _ts_us(t.column("o_orderdate")),
                "price_x100": cents,
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["date_us", "o_orderkey"], kind="mergesort").reset_index(
            drop=True
        )
        g["running_x100"] = g["price_x100"].cumsum()
        return g[["o_custkey", "o_orderkey", "price_x100", "running_x100"]]

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(scan, batch_format="pandas")
    )


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(c_mktsegment, o_orderpriority) — multi-level
    aggregate (SURVEY.md A6 family; the reference's grouped reports stop at
    one level). One shuffle computes the FINEST level; the super-aggregate
    levels are derived from that tiny (|segments|x|priorities|) result, the
    standard rollup optimization — at 100 TB the raw data is aggregated
    exactly once. NULL markers follow the SQL convention, mapped to 'ALL'."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "total_x100": _cents(t.column("o_totalprice")),
            }
        )

    finest = _rename(
        broadcast_join(
            ds.map_batches(to_cents, batch_format="pyarrow"), cust,
            keys="o_custkey", right_keys="c_custkey",
        )
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("total_x100"), Count()),
        ["c_mktsegment", "o_orderpriority", "revenue_x100", "n_orders"],
    ).to_pandas()  # |segments| x |priorities| rows — super-agg input is tiny

    lvl1 = (
        finest.groupby("c_mktsegment", as_index=False)[["revenue_x100", "n_orders"]]
        .sum()
        .assign(o_orderpriority="ALL")
    )
    lvl0 = pd.DataFrame(
        {
            "c_mktsegment": ["ALL"],
            "o_orderpriority": ["ALL"],
            "revenue_x100": [finest["revenue_x100"].sum()],
            "n_orders": [finest["n_orders"].sum()],
        }
    )
    cols = ["c_mktsegment", "o_orderpriority", "revenue_x100", "n_orders"]
    out = pd.concat([finest[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
    out["revenue_x100"] = out["revenue_x100"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def revenue_by_region(sf_dir: str):
    """4-way join chain (lineitem ⋈ supplier ⋈ nation ⋈ region) folded
    into ONE broadcast lookup: the three dimension tables pre-join
    driver-side (they're tiny by star-schema construction) into a
    (s_suppkey -> r_name) map shipped once; the fact table then pays a
    single probe per batch — with this, every one of the 10 testdata
    tables appears in an oracled registry query."""
    sup = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    lookup = (
        sup.join(nat, keys=["s_nationkey"], right_keys=["n_nationkey"])
        .join(reg, keys=["n_regionkey"], right_keys=["r_regionkey"])
        .select(["s_suppkey", "r_name"])
    )
    ds = read_table(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
            pa.scalar(10000.0),
        )
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "rev_x10000": pc.round(r).cast(pa.int64()),
            }
        )

    joined = broadcast_join(
        ds.map_batches(rev, batch_format="pyarrow"), lookup,
        keys="l_suppkey", right_keys="s_suppkey",
    )
    return _rename(
        joined.groupby("r_name").aggregate(Sum("rev_x10000"), Count()),
        ["r_name", "revenue_x10000", "n_items"],
    )


def customer_order_history(sf_dir: str):
    """Ordered ARRAY_AGG / STRING_AGG per group: each customer's order
    keys concatenated in (o_orderdate, o_orderkey) order — one hash
    exchange on the customer, vectorized sort + join inside the group
    (the SQL `STRING_AGG(x, ',' ORDER BY ...)` surface; a list-typed
    array_agg is the same code with the join dropped)."""
    ds = read_table(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        return pd.DataFrame(
            {
                "o_custkey": [g["o_custkey"].iloc[0]],
                "order_keys": [",".join(map(str, g["o_orderkey"]))],
                "n_orders": [len(g)],
            }
        )

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


def top_supplier_per_brand(sf_dir: str):
    """Grouped argmax across a 3-table join: for every part brand, the
    supplier with the highest lineitem revenue (exact integer cents;
    ties -> smallest s_suppkey). part and supplier broadcast (small
    dims), ONE combiner groupby on (brand, supplier), per-brand argmax in
    the group worker — the TPC-H-Q2-ish 'best supplier per part family'
    shape, covering the two dimension tables the rest of the registry
    doesn't touch."""
    part = read_arrow(sf_dir, "part", ["p_partkey", "p_brand"])
    sup = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_name"])
    ds = read_table(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev_x100": _cents(t.column("l_extendedprice")),
            }
        )

    joined = broadcast_join(
        ds.map_batches(to_cents, batch_format="pyarrow"), part,
        keys="l_partkey", right_keys="p_partkey",
    )
    per = _rename(
        joined.groupby(["p_brand", "l_suppkey"]).aggregate(Sum("rev_x100")),
        ["p_brand", "l_suppkey", "revenue_x100"],
    )

    def argmax(g: pa.Table) -> pa.Table:
        rev = np.asarray(g.column("revenue_x100"))
        sk = np.asarray(g.column("l_suppkey"))
        order = np.lexsort((sk, -rev))  # max revenue, then min suppkey
        i = int(order[0])
        return pa.table(
            {
                "p_brand": g.column("p_brand").slice(i, 1),
                "s_suppkey": g.column("l_suppkey").slice(i, 1),
                "revenue_x100": g.column("revenue_x100").slice(i, 1),
            }
        )

    best = per.groupby("p_brand").map_groups(argmax, batch_format="pyarrow")
    return broadcast_join(best, sup, keys="s_suppkey", right_keys="s_suppkey")


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(o_orderstatus, o_orderpriority): all four grouping
    sets derived from ONE finest-level shuffle (same optimization as
    revenue_rollup, plus the column-marginal set ROLLUP lacks). NULL
    markers mapped to 'ALL'."""
    ds = read_table(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
                "total_x100": _cents(t.column("o_totalprice")),
            }
        )

    finest = _rename(
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("total_x100"), Count()),
        ["o_orderstatus", "o_orderpriority", "revenue_x100", "n_orders"],
    ).to_pandas()  # |statuses| x |priorities| rows

    vals = ["revenue_x100", "n_orders"]
    by_status = (
        finest.groupby("o_orderstatus", as_index=False)[vals].sum()
        .assign(o_orderpriority="ALL")
    )
    by_prio = (
        finest.groupby("o_orderpriority", as_index=False)[vals].sum()
        .assign(o_orderstatus="ALL")
    )
    grand = pd.DataFrame(
        {
            "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
            "revenue_x100": [finest["revenue_x100"].sum()],
            "n_orders": [finest["n_orders"].sum()],
        }
    )
    cols = ["o_orderstatus", "o_orderpriority", "revenue_x100", "n_orders"]
    out = pd.concat(
        [finest[cols], by_status[cols], by_prio[cols], grand[cols]],
        ignore_index=True,
    )
    out["revenue_x100"] = out["revenue_x100"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((status), (priority), ()) — the general
    form CUBE/ROLLUP specialize: the ONE finest-level shuffle computes the
    (status, priority) partials, each requested set is a tiny driver-side
    re-aggregation of that result, and (unlike CUBE) the finest pair
    itself is NOT in the output. SUM/COUNT re-aggregate losslessly from
    the partials, so the raw data is aggregated exactly once at 100 TB."""
    ds = read_table(sf_dir, "orders",
                    ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
                "total_x100": _cents(t.column("o_totalprice")),
            }
        )

    finest = _rename(
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("total_x100"), Count()),
        ["o_orderstatus", "o_orderpriority", "revenue_x100", "n_orders"],
    ).to_pandas()  # |statuses| x |priorities| rows

    vals = ["revenue_x100", "n_orders"]
    cols = ["o_orderstatus", "o_orderpriority", *vals]
    frames = []
    for keys in (["o_orderstatus"], ["o_orderpriority"], []):
        if keys:
            g = finest.groupby(keys, as_index=False)[vals].sum()
        else:
            g = pd.DataFrame({v: [finest[v].sum()] for v in vals})
        for c in ("o_orderstatus", "o_orderpriority"):
            if c not in keys:
                g[c] = "ALL"
        frames.append(g[cols])
    out = pd.concat(frames, ignore_index=True)
    for v in vals:
        out[v] = out[v].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def customer_order_moving_avg(sf_dir: str):
    """Rows-frame window: per customer, the moving average of the last 3
    orders' prices ordered by (o_orderdate, o_orderkey) — one hash
    exchange on the customer, vectorized cumsum-difference inside the
    group (AVG OVER ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)."""
    ds = read_table(
        sf_dir, "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"],
                          kind="mergesort").reset_index(drop=True)
        v = g["o_totalprice"].to_numpy(dtype=np.float64)
        cs = np.concatenate(([0.0], np.cumsum(v)))
        n = len(v)
        lo = np.maximum(np.arange(n) - 2, 0)
        avg = (cs[np.arange(n) + 1] - cs[lo]) / (np.arange(n) - lo + 1)
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"],
                "o_orderkey": g["o_orderkey"],
                "avg_last3": avg,
            }
        )

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


def customer_order_moving_median(sf_dir: str):
    """Rows-frame moving MEDIAN (robust sibling of the moving average —
    one outlier order no longer drags the trend line): per customer, the
    median of the last 3 orders' integer-cent prices ordered by
    (o_orderdate, o_orderkey). The 3-row frame is evaluated branch-free:
    median-of-3 = sum - min - max over the frame's cents, vectorized with
    shifted views — no per-row Python, and integer-exact so the DuckDB
    MEDIAN() OVER mirror hash-matches (odd frames median an element;
    DuckDB averages even frames, so the 1- and 2-row warmup rows use the
    same x2 integer trick: median_x200 = 2*element or sum of the pair)."""
    ds = read_table(
        sf_dir, "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "total_x100": _cents(t.column("o_totalprice")),
        })

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"],
                          kind="mergesort").reset_index(drop=True)
        v = g["total_x100"].to_numpy(dtype=np.int64)
        n = len(v)
        # median*200 keeps everything integer: 1-row frame -> 200*v,
        # 2-row frame -> 100*(a+b) (DuckDB averages the even frame),
        # 3-row frame -> 200*(sum-min-max)
        med200 = np.empty(n, dtype=np.int64)
        med200[0] = 200 * v[0]
        if n >= 2:
            med200[1] = 100 * (v[0] + v[1])
        if n >= 3:
            a, b, c = v[:-2], v[1:-1], v[2:]
            s = a + b + c
            mn = np.minimum(np.minimum(a, b), c)
            mx = np.maximum(np.maximum(a, b), c)
            med200[2:] = 200 * (s - mn - mx)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"],
            "o_orderkey": g["o_orderkey"],
            "median3_x200": med200,
        })

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(per_cust, batch_format="pandas")
    )


def user_value_trailing_sum(sf_dir: str):
    """Time-RANGE window: per user, the trailing 1-hour sum of event value
    — SUM(v) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL
    1 HOUR PRECEDING AND CURRENT ROW), the time-based sibling of the
    rows-frame moving average. Values are floored to integer micro-units
    BEFORE the window so the cross-engine sums are exact (the established
    integer-scaled-money pattern); the window itself is
    ``stages.relational.rolling_window_sum`` (one hash exchange, prefix
    sums + two searchsorted probes per group, SQL RANGE-peer semantics)."""
    from ..stages.relational import rolling_window_sum

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def scale(t: pa.Table) -> pa.Table:
        micro = pc.cast(pc.floor(pc.multiply(
            t.column("value").cast(pa.float64()), pa.scalar(1_000_000.0)
        )), pa.int64())
        return t.drop_columns(["value"]).append_column("v_micro", micro)

    out = rolling_window_sum(
        ds.map_batches(scale, batch_format="pyarrow"),
        "user_id", "ts", 3_600_000_000, "v_micro", "trailing_micro",
    )
    return out.select_columns(["event_id", "user_id", "trailing_micro"])


def user_event_path(sf_dir: str):
    """Ordered STRING_AGG: each user's full event-type journey as one
    '>'-joined string in (ts, event_id) order — sequence reconstruction
    over the behavioural table (one hash exchange, vectorized sort+join
    per group; `stages.relational.grouped_string_agg`)."""
    from ..stages.relational import grouped_string_agg

    ds = read_table(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    out = grouped_string_agg(
        ds, "user_id", "event_type", ["ts", "event_id"], sep=">",
        out_col="path",
    )
    return out.select_columns(["user_id", "path", "n_vals"])


_PRIORITY_PIVOT = [
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"),
    ("5-LOW", "n_low"),
]


def orders_pivot_priority(sf_dir: str):
    """PIVOT o_orderpriority into one count column per priority, rows keyed
    by o_orderstatus (reference report matrices; SQL mirror is the
    SUM(CASE ...) idiom). Vectorized indicator columns per batch, then ONE
    combiner-backed groupby — the wide shape never shuffles raw rows."""
    ds = read_table(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def indicators(t: pa.Table) -> pa.Table:
        cols = {"o_orderstatus": t.column("o_orderstatus")}
        pri = t.column("o_orderpriority")
        for value, name in _PRIORITY_PIVOT:
            cols[name] = pc.cast(pc.equal(pri, value), pa.int64())
        cols["one"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table(cols)

    out = (
        ds.map_batches(indicators, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(*[Sum(name) for _, name in _PRIORITY_PIVOT], Sum("one"))
    )
    return _rename(out, ["o_orderstatus"] + [n for _, n in _PRIORITY_PIVOT] + ["n_total"])


def orders_above_customer_avg(sf_dir: str):
    """Decorrelated subquery (WHERE o_totalprice > AVG over that customer):
    per-customer (sum, count) via one combiner groupby, hash-joined back to
    orders (large-by-large — at 100 TB the per-customer table is itself huge,
    so no broadcast), compared in EXACT integer math
    (price_x100 * n_cust > sum_x100 avoids float-average boundary ties),
    then a tiny grouped count."""
    from ..stages.relational import hash_join

    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "price_x100": _cents(t.column("o_totalprice")),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    per_cust = _rename(
        cents.groupby("o_custkey").aggregate(Sum("price_x100"), Count()),
        ["cust", "sum_x100", "n_cust"],
    )
    joined = hash_join(cents, per_cust, on="o_custkey", right_on="cust", num_partitions=8)

    def above(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t.column("price_x100"), t.column("n_cust")),
            t.column("sum_x100"),
        )
        return t.filter(keep).select(["o_orderpriority"])

    out = (
        joined.map_batches(above, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count())
    )
    return _rename(out, ["o_orderpriority", "n_above_avg"])


def user_event_gaps(sf_dir: str):
    """LAG-window inter-event gaps (W-family; reference has no window layer):
    per user, events ordered by (ts, event_id); emit count/max/sum of the
    microsecond gaps as exact integers. Hash-partition by user + vectorized
    np.diff per group — same scale shape as :func:`user_sessions`."""
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": _ts_us(t.column("ts")),
            }
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_gaps": pd.Series([], dtype="int64"),
                 "max_gap_us": pd.Series([], dtype="int64"),
                 "sum_gap_us": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        d = np.diff(g["ts_us"].to_numpy())
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_gaps": [len(d)],
                "max_gap_us": [int(d.max())],
                "sum_gap_us": [int(d.sum())],
            }
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(gaps, batch_format="pandas")
    )


def quantity_mode_by_flag(sf_dir: str):
    """MODE() per group (most frequent l_quantity per returnflag, ties to the
    smallest value — made deterministic, unlike SQL's unspecified mode()):
    combiner groupby on (flag, qty) shrinks 100 TB to |flags|x|qtys| rows,
    then a per-flag argmax over that tiny table."""
    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty_x100": _cents(t.column("l_quantity")),
            }
        )

    counts = _rename(
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty_x100"])
        .aggregate(Count()),
        ["l_returnflag", "qty_x100", "n"],
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "qty_x100"], ascending=[False, True], kind="mergesort")
        top = g.iloc[[0]][["l_returnflag", "qty_x100", "n"]].copy()
        return top.rename(columns={"qty_x100": "mode_qty_x100"})

    return counts.groupby("l_returnflag").map_groups(argmax, batch_format="pandas")


def _ntile(n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) bucket per 1-based rank for a group of n rows: the first
    n%k buckets hold ceil(n/k) rows, the rest floor(n/k)."""
    q, r = divmod(n, k)
    sizes = np.full(min(k, n), q, dtype=np.int64)
    sizes[:r] += 1
    return np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64), sizes)


def customer_balance_quartiles(sf_dir: str):
    """NTILE(4) OVER (PARTITION BY nation ORDER BY acctbal, custkey), then
    per-(nation, quartile) count + exact integer balance sum. One
    hash-partition by nation; rank->bucket->aggregate all inside the group
    worker so only the tiny summary leaves it."""
    ds = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def quartiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], kind="mergesort").reset_index(drop=True)
        bal = np.round(g["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        g["quartile"] = _ntile(len(g), 4)
        g["bal_x100"] = bal
        out = (
            g.groupby("quartile", sort=True)
            .agg(n_custs=("c_custkey", "size"), sum_bal_x100=("bal_x100", "sum"))
            .reset_index()
        )
        out.insert(0, "c_nationkey", g["c_nationkey"].iloc[0])
        return out

    return ds.groupby("c_nationkey").map_groups(quartiles, batch_format="pandas")


def _tagged_keys(ds, key_col: str, tag: str):
    def f(t: pa.Table) -> pa.Table:
        keys = pc.unique(t.column(key_col))  # per-batch dedup: combiner
        return pa.table(
            {
                "ckey": keys,
                "in_a": pa.array(np.full(len(keys), 1 if tag == "a" else 0, dtype=np.int64)),
                "in_b": pa.array(np.full(len(keys), 1 if tag == "b" else 0, dtype=np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _set_op(sf_dir: str, keep):
    """Distributed INTERSECT/EXCEPT (SURVEY.md D4/D5 as first-class
    pipelines): tag each side, per-batch dedup, union, ONE groupby on the
    key with Max flags, filter by presence. Only (key, 2 ints) rows enter
    the exchange."""
    ev = read_table(sf_dir, "events", ["user_id"])
    od = read_table(sf_dir, "orders", ["o_custkey"])
    both = _tagged_keys(ev, "user_id", "a").union(_tagged_keys(od, "o_custkey", "b"))
    flags = _rename(
        both.groupby("ckey").aggregate(Max("in_a"), Max("in_b")),
        ["ckey", "in_a", "in_b"],
    )

    def f(t: pa.Table) -> pa.Table:
        return t.filter(keep(t)).select(["ckey"])

    return flags.map_batches(f, batch_format="pyarrow")


def event_order_users_intersect(sf_dir: str):
    """user_ids present in BOTH events and orders (INTERSECT)."""
    return _set_op(
        sf_dir,
        lambda t: pc.and_(pc.equal(t.column("in_a"), 1), pc.equal(t.column("in_b"), 1)),
    )


def order_only_customers_except(sf_dir: str):
    """custkeys with orders but NO events (EXCEPT)."""
    return _set_op(
        sf_dir,
        lambda t: pc.and_(pc.equal(t.column("in_b"), 1), pc.equal(t.column("in_a"), 0)),
    )


def events_prop_k_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of the
    JSON ``props`` column with one vectorized RE2 kernel
    (`stages/normalize.py:extract_json_field`), then aggregate per
    event_type. The oracle uses DuckDB's real JSON parser — agreement
    proves the hot-path regex probe is exact on this corpus."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.normalize import extract_json_field

    ds = read_table(sf_dir, "events", ["event_type", "props"])

    def ext(t: pa.Table) -> pa.Table:
        k = extract_json_field(t.column("props"), "k", kind="int")
        return pa.table({"event_type": t.column("event_type"), "k": k})

    out = (
        ds.map_batches(ext, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count("k"), Sum("k"), Min("k"), Max("k"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["event_type", "n_k", "sum_k", "min_k", "max_k"]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def lineitem_metrics_unpivot(sf_dir: str):
    """UNPIVOT (melt): lineitem's four numeric metric columns to long
    (l_orderkey, l_linenumber, metric, value) rows —
    `stages/relational.py:unpivot`, a shuffle-free map. Oracle: the
    literal 4-way UNION ALL."""
    from ..stages.relational import unpivot

    ds = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"],
    )
    return unpivot(
        ds, id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def value_histogram(sf_dir: str, nbins: int = 16):
    """Fixed-width histogram of events.value (profiling A-family; the
    reference's profiler summarizes but never bins). Two streaming passes:
    a Min/Max aggregate, then vectorized binning + ONE combiner groupby on
    the bin id — only (bin, count) partials enter the exchange. The bin
    expression ``min(floor((v-lo)/width), nbins-1)`` is the identical IEEE
    double computation the SQL mirror performs, so edges match exactly."""
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Min as AMin

    ds = read_table(sf_dir, "events", ["value"])

    def mm(t: pa.Table) -> pa.Table:
        c = t.column("value").drop_null()
        if len(c) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"mn": pa.array([pc.min(c).as_py()], pa.float64()),
                         "mx": pa.array([pc.max(c).as_py()], pa.float64())})

    agg = ds.map_batches(mm, batch_format="pyarrow").aggregate(AMin("mn"), AMax("mx"))
    if agg is None or agg.get("min(mn)") is None:  # all-NULL column: the
        return pa.table({"bin": pa.array([], pa.int64()),  # mirror's WHERE
                         "n": pa.array([], pa.int64())})   # drops every row
    lo, hi = float(agg["min(mn)"]), float(agg["max(mx)"])
    width = (hi - lo) / float(nbins)

    def binit(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("value").drop_null(), dtype=np.float64)
        if width == 0.0:  # constant column: everything in bin 0 (the SQL
            b = np.zeros(len(v), dtype=np.int64)  # mirror assumes a range)
        else:
            b = np.minimum(np.floor((v - lo) / width), nbins - 1).astype(np.int64)
        return pa.table({"bin": b})

    out = ds.map_batches(binit, batch_format="pyarrow").groupby("bin").aggregate(Count())
    return _rename(out, ["bin", "n"])


def funnel_click_purchase(sf_dir: str):
    """Two-stage event funnel (sequence analytics, beyond the reference):
    stage 1 = users with a click; stage 2 = users with a purchase STRICTLY
    after their first click. One hash-partition by user; per-group flags
    are two vectorized comparisons; only two counters leave each group."""
    ds = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g.loc[g["event_type"] == "click", "ts"]
        if clicks.empty:
            return pd.DataFrame({"s1": [0], "s2": [0]})
        first = clicks.min()
        conv = int(
            ((g["event_type"] == "purchase") & (g["ts"] > first)).any()
        )
        return pd.DataFrame({"s1": [1], "s2": [conv]})

    agg = (
        ds.groupby("user_id")
        .map_groups(flags, batch_format="pandas")
        .aggregate(Sum("s1"), Sum("s2"))
    )
    s1, s2 = int(agg["sum(s1)"]), int(agg["sum(s2)"])
    return pa.table(
        {
            "stage": pa.array(["click", "click>purchase"]),
            "n_users": pa.array([s1, s2], type=pa.int64()),
        }
    )


def cohort_retention(sf_dir: str):
    """Cohort/retention matrix (beyond the reference): cohort_day = day of
    a user's FIRST event; offset_day = activity day - cohort day;
    n_users = distinct active users per (cohort, offset). Shuffle 1
    partitions by user and emits each user's DISTINCT (cohort, offset)
    pairs (deduped inside the group worker, so shuffle 2 counts unique
    users by construction — no COUNT(DISTINCT) exchange)."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(_ts_us(t.column("ts")), US_PER_DAY),
            }
        )

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        days = g["day"].to_numpy()
        cohort = int(days.min())
        offs = np.unique(days - cohort)
        return pd.DataFrame(
            {
                "cohort_day": np.full(len(offs), cohort, dtype=np.int64),
                "offset_day": offs.astype(np.int64),
            }
        )

    out = (
        ds.map_batches(to_day, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(offsets, batch_format="pandas")
        .groupby(["cohort_day", "offset_day"])
        .aggregate(Count())
    )
    return _rename(out, ["cohort_day", "offset_day", "n_users"])


def price_qty_regression(sf_dir: str):
    """Per-group least-squares fit (SQL ``regr_slope``/``regr_intercept``
    family — A6 grouped aggregates one step past the reference's report
    queries, ``sql/queries.sql:1-149``): extendedprice-on-quantity per
    returnflag. Sufficient statistics (n, Sx, Sy, Sxx, Sxy) are exact
    integer cents summed per batch and shipped as base-2^31 limbs (the
    :func:`~..stages.profile.numeric_correlation` trick), so one combiner
    ``groupby().sum()`` over |flags| rows replaces any wide exchange and
    the result is block-order independent. The closing doubles mirror
    DuckDB's HUGEINT-to-DOUBLE arithmetic expression-for-expression, so
    the oracle hash matches bit-for-bit."""
    _MASK = (1 << 31) - 1
    _LIMBS = 5
    moments = ["sx", "sy", "sxx", "sxy"]

    ds = read_table(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        flags = t.column("l_returnflag").to_pandas()
        x = np.asarray(_cents(t.column("l_quantity")))
        y = np.asarray(_cents(t.column("l_extendedprice")))
        rows: dict[str, list] = {"l_returnflag": [], "n": []}
        for m in moments:
            for j in range(_LIMBS):
                rows[f"{m}_l{j}"] = []
        for flag, idx in flags.groupby(flags).groups.items():
            ii = np.asarray(idx)
            xs, ys = x[ii], y[ii]
            # per-batch exact sums: elementwise products fit int64
            # (|x|<=2^13 cents, |y|<=2^31 cents), so chunked int64
            # reductions keep every partial exact.
            exact = {
                "sx": int(xs.sum()),
                "sy": int(ys.sum()),
                "sxx": sum(int(v) for v in np.add.reduceat(xs * xs, range(0, len(ii), 1 << 20))),
                "sxy": sum(int(v) for v in np.add.reduceat(xs * ys, range(0, len(ii), 1 << 20))),
            }
            rows["l_returnflag"].append(flag)
            rows["n"].append(len(ii))
            for m in moments:
                v = exact[m]
                for j in range(_LIMBS):
                    limb = v >> (31 * j)
                    if j < _LIMBS - 1:
                        limb &= _MASK
                    rows[f"{m}_l{j}"].append(limb)
        return pa.table(rows)

    limb_cols = ["n"] + [f"{m}_l{j}" for m in moments for j in range(_LIMBS)]
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .sum(limb_cols)
    ).take_all()  # |distinct flags| rows — a combiner result, never the data

    out = {"l_returnflag": [], "n": [], "slope": [], "intercept": []}
    for r in sorted(agg, key=lambda r: r["l_returnflag"]):
        n = int(r["sum(n)"])
        tot = {
            m: sum(int(r[f"sum({m}_l{j})"]) << (31 * j) for j in range(_LIMBS))
            for m in moments
        }
        # DuckDB evaluation order: HUGEINT sub-expressions stay exact,
        # each division casts both sides to DOUBLE (measured — see the
        # lineitem_correlation oracle note in stages/profile.py).
        num = n * tot["sxy"] - tot["sx"] * tot["sy"]
        den = n * tot["sxx"] - tot["sx"] * tot["sx"]
        # den == 0 (constant x) mirrors SQL double division: 0/0 → nan, k/0 → inf
        slope = float(num) / float(den) if den else float(num) * float("inf") if num else float("nan")
        intercept = (float(tot["sy"]) - slope * float(tot["sx"])) / float(n)
        out["l_returnflag"].append(r["l_returnflag"])
        out["n"].append(n)
        out["slope"].append(slope)
        out["intercept"].append(intercept)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "slope": pa.array(out["slope"], type=pa.float64()),
            "intercept": pa.array(out["intercept"], type=pa.float64()),
        }
    )


def event_type_entropy(sf_dir: str):
    """Shannon entropy of a low-cardinality column's value distribution
    (information-theoretic profiling — the A1/A3 family's sibling for
    class balance / skew monitoring). One combiner ``groupby().count()``
    shrinks the table to |distinct| exact integer counts; the closing
    ``H = log2(N) - Σ c·log2(c) / N`` runs over that tiny result.
    Determinism: counts are exact ints on both sides; the float entropy is
    FLOORED to integer micro-bits (the event_type_share basis-point rule)
    so last-ulp summation-order differences cannot flip the hash."""
    import math

    ds = read_table(sf_dir, "events", ["event_type"])
    counts = ds.groupby("event_type").aggregate(Count()).take_all()
    if not counts:  # empty input: 0 rows (the SQL mirror's cross join of
        # an empty counts CTE)
        return pa.table(
            {"n_types": pa.array([], type=pa.int64()),
             "n_events": pa.array([], type=pa.int64()),
             "entropy_ubits": pa.array([], type=pa.int64())}
        )
    n_total = sum(int(r["count()"]) for r in counts)
    # sorted by value so the Python sum order is fixed; DuckDB's SUM order
    # is not, but at |distinct| terms the slack is ~1 ulp and the floor
    # granularity is 1e-6 bits
    acc = sum(
        int(r["count()"]) * math.log2(int(r["count()"]))
        for r in sorted(counts, key=lambda r: r["event_type"])
    )
    h = math.log2(n_total) - acc / n_total
    return pa.table(
        {
            "n_types": pa.array([len(counts)], type=pa.int64()),
            "n_events": pa.array([n_total], type=pa.int64()),
            "entropy_ubits": pa.array([math.floor(h * 1_000_000)], type=pa.int64()),
        }
    )


def supplier_balance_pctrank(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY nation ORDER BY balance) — the
    W-family's relative-rank member (RANK/percent-of-total siblings are
    already covered). Hash-partition by nation, one vectorized sort per
    group; ties share a rank (searchsorted-left), single-row partitions
    rank 0.0, both pinned by the DuckDB window semantics. Integer-cents
    ordering keys and an int/int double division keep the hash bit-exact."""
    ds = read_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "s_nationkey": t.column("s_nationkey"),
                "bal_x100": _cents(t.column("s_acctbal")),
            }
        )

    def pctrank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bal_x100", "s_suppkey"], kind="mergesort").reset_index(
            drop=True
        )
        v = g["bal_x100"].to_numpy()
        n = len(v)
        rank = np.searchsorted(v, v, side="left") + 1  # ties share (RANK)
        g["pct_rank"] = (
            (rank - 1) / np.float64(n - 1) if n > 1 else np.zeros(n)
        )
        return g[["s_suppkey", "s_nationkey", "bal_x100", "pct_rank"]]

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("s_nationkey")
        .map_groups(pctrank, batch_format="pandas")
    )


def customer_balance_window(sf_dir: str):
    """DENSE_RANK + CUME_DIST + NTH_VALUE(3) in one partitioned window
    (PARTITION BY mktsegment ORDER BY balance) — the remaining W-family
    members. One hash exchange, one vectorized sort per group:
    dense rank via searchsorted into the group's unique values, CUME_DIST
    as rows-at-or-below / n (ties share the last peer's value — pinned by
    the int/int double division, bit-exact vs DuckDB), NTH_VALUE(3) with
    the default RANGE frame (peers included): the group's 3rd-smallest
    value where the current frame already holds >= 3 rows, NULL before
    that. Integer-cents keys keep every hash comparable."""
    ds = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "bal_x100": _cents(t.column("c_acctbal")),
            }
        )

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bal_x100", "c_custkey"], kind="mergesort").reset_index(
            drop=True
        )
        v = g["bal_x100"].to_numpy()
        n = len(v)
        uniq = np.unique(v)
        g["dense_rnk"] = (np.searchsorted(uniq, v) + 1).astype(np.int64)
        hi = np.searchsorted(v, v, side="right")  # rows <= current (peers in)
        g["cume_dist"] = hi / np.float64(n)
        # NULL before the frame holds 3 rows — carried as float64 NaN, the
        # same representation DuckDB's nullable BIGINT lands in via .df()
        nth = np.full(n, np.nan)
        if n >= 3:
            nth[hi >= 3] = v[2]
        g["nth3_bal_x100"] = nth
        return g[
            ["c_custkey", "c_mktsegment", "bal_x100", "dense_rnk",
             "cume_dist", "nth3_bal_x100"]
        ]

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(win, batch_format="pandas")
    )


def orders_1997_revenue(sf_dir: str):
    """Read-predicate pushdown demo query: revenue by priority over one
    order year, with the date predicate pushed INTO the parquet scan
    (``read_table(row_filter=...)``) — at 100 TB a time-partitioned or
    date-sorted table skips whole row groups on footer statistics, and
    the surviving rows are filtered inside the read task before anything
    enters the object store. One combiner groupby follows."""
    import datetime

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    ds = read_table(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice", "o_orderdate"],
        row_filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "total_x100": _cents(t.column("o_totalprice")),
            }
        )

    out = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("total_x100"), Count())
    )
    return _rename(out, ["o_orderpriority", "revenue_x100", "n_orders"])


def customer_order_coverage(sf_dir: str):
    """FULL OUTER join coverage summary (closes the join-type matrix:
    inner/left/anti/semi/asof/range are covered elsewhere) — one
    hash-partitioned full_outer join of customers×orders, then per-batch
    null-side counts summed globally: matched rows, customers with no
    orders, orphan orders. The join is the only exchange; the result is
    three scalars."""
    from ..stages.relational import hash_join

    cust = read_table(sf_dir, "customer", ["c_custkey"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey",
        join_type="full_outer",
    )

    def counts(t: pa.Table) -> pa.Table:
        c_ok = pc.is_valid(t.column("c_custkey"))
        o_ok = pc.is_valid(t.column("o_orderkey"))
        return pa.table(
            {
                "n_matched": pa.array(
                    [pc.sum(pc.and_(c_ok, o_ok)).as_py() or 0], type=pa.int64()
                ),
                "n_customers_no_orders": pa.array(
                    [pc.sum(pc.invert(o_ok)).as_py() or 0], type=pa.int64()
                ),
                "n_orphan_orders": pa.array(
                    [pc.sum(pc.invert(c_ok)).as_py() or 0], type=pa.int64()
                ),
            }
        )

    agg = j.map_batches(counts, batch_format="pyarrow").sum(
        ["n_matched", "n_customers_no_orders", "n_orphan_orders"]
    )
    return pa.table(
        {
            "n_matched": pa.array([int(agg["sum(n_matched)"])], type=pa.int64()),
            "n_customers_no_orders": pa.array(
                [int(agg["sum(n_customers_no_orders)"])], type=pa.int64()
            ),
            "n_orphan_orders": pa.array(
                [int(agg["sum(n_orphan_orders)"])], type=pa.int64()
            ),
        }
    )


def event_segment_chi2(sf_dir: str):
    """Pearson chi-square independence test of event_type × customer
    market segment (the statistical-testing capability class: drift /
    A-B checks over categorical columns). One broadcast enrichment join +
    one combiner groupby shrink 100 TB to a |types|×|segments| integer
    contingency table; the statistic is computed from those exact counts
    with DuckDB-mirrored double arithmetic and FLOORED to micro-units
    (the basis-point determinism rule — cell-sum order slack is ~1 ulp)."""
    import math

    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    joined = broadcast_join(ds, cust, keys="user_id", right_keys="c_custkey")
    cells = (
        joined.groupby(["event_type", "c_mktsegment"]).aggregate(Count())
    ).take_all()  # |types| x |segments| rows — a combiner result

    rows: dict[str, int] = {}
    colsum: dict[str, int] = {}
    n = 0
    for r in cells:
        o = int(r["count()"])
        rows[r["event_type"]] = rows.get(r["event_type"], 0) + o
        colsum[r["c_mktsegment"]] = colsum.get(r["c_mktsegment"], 0) + o
        n += o
    chi2 = 0.0
    for r in sorted(cells, key=lambda r: (r["event_type"], r["c_mktsegment"])):
        o = int(r["count()"])
        # DuckDB parity: HUGEINT product, both division operands cast to
        # double (the lineitem_correlation rule)
        e = float(rows[r["event_type"]] * colsum[r["c_mktsegment"]]) / float(n)
        chi2 += (float(o) - e) * (float(o) - e) / e
    dof = (len(rows) - 1) * (len(colsum) - 1)
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "dof": pa.array([dof], type=pa.int64()),
            "chi2_micro": pa.array([math.floor(chi2 * 1_000_000)], type=pa.int64()),
        }
    )


def orders_daily_gapfilled(sf_dir: str):
    """Time-series resample with gap fill (generate_series + LEFT JOIN in
    SQL): daily order counts with zero rows for days that had no orders.
    One per-day combiner groupby shrinks the corpus to |days| rows; the
    day spine is generated from the observed [min, max] and the zero
    fill happens on that tiny result (driver-side finish, like every
    other combiner-sized closing step)."""
    ds = read_table(sf_dir, "orders", ["o_orderdate"])

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(_ts_us(t.column("o_orderdate")), US_PER_DAY)})

    counts = (
        ds.map_batches(to_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count())
    ).take_all()  # |days| rows
    have = {int(r["day"]): int(r["count()"]) for r in counts}
    if not have:  # empty input: empty spine (the SQL mirror's 0 rows)
        return pa.table(
            {"day": pa.array([], type=pa.int64()),
             "n_orders": pa.array([], type=pa.int64())}
        )
    lo, hi = min(have), max(have)
    spine = list(range(lo, hi + 1))
    return pa.table(
        {
            "day": pa.array(spine, type=pa.int64()),
            "n_orders": pa.array([have.get(d, 0) for d in spine], type=pa.int64()),
        }
    )


def embedding_dim_stats(sf_dir: str, n_dims: int = 8):
    """List-column analytics: per-dimension statistics over a
    ``list<float>`` column (feature-drift monitoring for an embedding
    corpus). Each batch contributes ``n_dims`` partial rows (dim, n,
    sum of FLOORED micro-units — floor, not round: DuckDB rounds
    half-away, numpy half-even, floor agrees bit-for-bit on the
    identical f64 products); one tiny groupby-sum combines. int64 sums
    hold to ~10^12 rows at unit-scale values; the 5-limb pattern
    (numeric_correlation) is the overflow path beyond that."""
    ds = read_table(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        V = np.stack(t.column("embedding").to_pandas().to_numpy())[:, :n_dims]
        scaled = np.floor(V.astype(np.float64) * 1_000_000.0).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(range(1, n_dims + 1), type=pa.int64()),
                "n": pa.array([len(V)] * n_dims, type=pa.int64()),
                "sum_x1e6": pa.array(
                    [int(scaled[:, j].sum()) for j in range(n_dims)],
                    type=pa.int64(),
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .sum(["n", "sum_x1e6"])
    )
    return _rename(out, ["dim", "n", "sum_x1e6"])


def urgent_lineitem_stats(sf_dir: str):
    """Per-returnflag item counts over the lineitems of URGENT orders —
    the large-by-large SEMI join regime (both sides are fact tables, the
    build side's distinct keys don't fit a broadcast at 100 TB).

    Uses :func:`~..stages.relational.bloom_semi_join`: a tree-reduced
    Bloom over the urgent order keys is broadcast once and pre-filters
    lineitem IN PLACE, so ~4/5 of the probe rows (the non-urgent share)
    never enter the hash exchange; one exact inner join against the
    distinct keys removes Bloom false positives. Result is identical to
    the plain ``IN (SELECT …)`` oracle."""
    from ..stages.relational import bloom_semi_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
    urgent = read_table(
        sf_dir, "orders", ["o_orderkey"],
        row_filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )
    semi = bloom_semi_join(li, urgent, on="l_orderkey", right_on="o_orderkey",
                           bits=1 << 20)

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty_x100": _cents(t.column("l_quantity")),
            }
        )

    out = (
        semi.map_batches(scale, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(), Sum("qty_x100"))
    )
    return _rename(out, ["l_returnflag", "n_items", "sum_qty_x100"])


def user_scd2_history(sf_dir: str):
    """SCD Type-2 history build from a change log (the classic warehouse
    ETL shape the reference's star-schema loader implies but never does,
    ``src/etl/load.py``): per user, collapse consecutive runs of the same
    ``event_type`` in (ts, event_id) order into one versioned row with
    ``valid_from_us`` / ``valid_to_us`` (open interval = the warehouse
    "high date" sentinel ``INT64_MAX``) and the run length. ONE hash
    exchange on the natural key; run detection is a vectorized
    shift-compare per group — no per-row Python, no second shuffle (the
    LEAD that closes each interval is a roll within the already-collocated
    group)."""
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "ts_us": _ts_us(t.column("ts")),
            }
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_scd2_collapse, batch_format="pandas")
    )


SCD2_HIGH_US = np.iinfo(np.int64).max  # warehouse "high date" open interval


def _scd2_collapse(g: pd.DataFrame) -> pd.DataFrame:
    """Per-user SCD2 run collapse (already collocated by the exchange):
    sort by (ts_us, event_id), find run starts with a vectorized
    shift-compare, and close each version with the next run's start."""
    g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
    v = g["event_type"]
    prev = v.shift()
    # IS DISTINCT FROM: NULL vs NULL is NOT a new run; first row always is
    new_run = (v.ne(prev) & ~(v.isna() & prev.isna())).to_numpy()
    new_run[0] = True
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(g))
    ts = g["ts_us"].to_numpy()
    valid_from = ts[starts]
    # LEAD(valid_from): next run's start closes this version; the
    # last (current) version stays open at the high-date sentinel
    valid_to = np.append(valid_from[1:], SCD2_HIGH_US)
    return pd.DataFrame(
        {
            "user_id": np.full(len(starts), g["user_id"].iloc[0], dtype=np.int64),
            "event_type": v.to_numpy()[starts],
            "valid_from_us": valid_from,
            "valid_to_us": valid_to,
            "n_rows": (ends - starts).astype(np.int64),
        }
    )


def orders_snapshot_diff(sf_dir: str):
    """Table diff / data reconciliation between two snapshots of the same
    table by primary key — the ETL audit op behind every incremental-load
    validation (the reference diffs only *schemas*, ``src/etl/schema.py``;
    this diffs DATA). The two snapshots are derived deterministically from
    ``orders`` (old = keys not divisible by 97; new = keys ≢ 3 mod 101,
    with a 1.00 price bump on keys divisible by 89) so the SQL oracle can
    build the identical sides. One hash-partitioned FULL OUTER join on the
    key, then a fully vectorized per-batch classifier emits ONLY the
    differing rows: added / removed / changed (+ per-column change flags).
    Scale shape: the join is the only exchange; same-row filtering happens
    before anything reaches the driver."""
    from ..stages.relational import hash_join

    base_cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]

    def old_side(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey")
        keep = pc.not_equal(_pc_mod(k, 97), 0)
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "old_status": t.column("o_orderstatus"),
                "old_price_x100": _cents(t.column("o_totalprice")),
                # explicit presence marker: Ray's outer join coalesces the
                # key columns, so side presence must ride a data column
                "old_present": pa.nulls(len(t), pa.int8()).fill_null(1),
            }
        )

    def new_side(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey")
        keep = pc.not_equal(_pc_mod(k, 101), 3)
        t = t.filter(keep)
        k = t.column("o_orderkey")
        bump = pc.multiply(
            pc.equal(_pc_mod(k, 89), 0).cast(pa.int64()), pa.scalar(100, pa.int64())
        )
        return pa.table(
            {
                "n_orderkey": k,
                "new_status": t.column("o_orderstatus"),
                "new_price_x100": pc.add(_cents(t.column("o_totalprice")), bump),
                "new_present": pa.nulls(len(t), pa.int8()).fill_null(1),
            }
        )

    old = read_table(sf_dir, "orders", base_cols).map_batches(
        old_side, batch_format="pyarrow"
    )
    new = read_table(sf_dir, "orders", base_cols).map_batches(
        new_side, batch_format="pyarrow"
    )
    j = hash_join(old, new, on="o_orderkey", right_on="n_orderkey",
                  join_type="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        o_ok = pc.is_valid(t.column("old_present"))
        n_ok = pc.is_valid(t.column("new_present"))
        both = pc.and_(o_ok, n_ok)
        # IS DISTINCT FROM on non-null data: not_equal then fill the
        # null-side rows (added/removed) to False
        st_chg = pc.and_(
            both,
            pc.fill_null(
                pc.not_equal(t.column("old_status"), t.column("new_status")), False
            ),
        )
        pr_chg = pc.and_(
            both,
            pc.fill_null(
                pc.not_equal(
                    t.column("old_price_x100"), t.column("new_price_x100")
                ),
                False,
            ),
        )
        keep = pc.or_(pc.invert(both), pc.or_(st_chg, pr_chg))
        t2 = pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "diff_status": pc.if_else(
                    pc.invert(o_ok),
                    pa.scalar("added"),
                    pc.if_else(
                        pc.invert(n_ok), pa.scalar("removed"), pa.scalar("changed")
                    ),
                ),
                "status_changed": st_chg.cast(pa.int64()),
                "price_changed": pr_chg.cast(pa.int64()),
            }
        )
        return t2.filter(keep)

    return j.map_batches(classify, batch_format="pyarrow")


def _pc_mod(arr, m: int):
    """Arrow has no modulo kernel; n mod m for non-negative int64 via
    n - (n/m)*m (integer division truncates toward zero)."""
    q = pc.divide(arr, pa.scalar(m, pa.int64()))
    return pc.subtract(arr, pc.multiply(q, pa.scalar(m, pa.int64())))


def user_activity_islands(sf_dir: str):
    """Variable-length interval merge (gaps-and-islands over true
    intervals — distinct from fixed-gap sessionization in
    :func:`user_sessions`): each event opens an activity interval
    ``[ts, ts + value minutes]``; overlapping or touching intervals per
    user coalesce into one island. ONE hash exchange on the user; island
    detection is a vectorized running-max inside each collocated group.
    Duration scaling is exact integer math (``round(value*100) * 600000``
    us) so the SQL mirror agrees bit-for-bit."""
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def to_iv(t: pa.Table) -> pa.Table:
        s = _ts_us(t.column("ts"))
        dur = pc.multiply(
            pc.round(pc.multiply(t.column("value"), pa.scalar(100.0)))
            .cast(pa.int64()),
            pa.scalar(600_000, pa.int64()),
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "s": s,
                "e": pc.add(s, dur),
            }
        )

    return (
        ds.map_batches(to_iv, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_interval_merge, batch_format="pandas")
    )


def _interval_merge(g: pd.DataFrame) -> pd.DataFrame:
    """Coalesce one user's sorted intervals: a new island starts when the
    interval opens strictly after the running max end of everything
    before it (touching intervals merge)."""
    g = g.sort_values(["s", "event_id"], kind="mergesort")
    s = g["s"].to_numpy()
    e = g["e"].to_numpy()
    cummax = np.maximum.accumulate(e)
    new_island = np.empty(len(g), dtype=bool)
    new_island[0] = True
    new_island[1:] = s[1:] > cummax[:-1]
    starts = np.flatnonzero(new_island)
    ends = np.append(starts[1:], len(g))
    return pd.DataFrame(
        {
            "user_id": np.full(len(starts), g["user_id"].iloc[0], dtype=np.int64),
            "island_start_us": s[starts],
            "island_end_us": cummax[ends - 1],
            "n_events": (ends - starts).astype(np.int64),
        }
    )


def customer_first_last_order(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE window surface: each customer's earliest
    and latest order price (total (o_orderdate, o_orderkey) order), the
    day span between them, and the order count. One hash exchange on the
    customer; first/last are O(1) picks off the per-group vectorized
    sort."""
    ds = read_table(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "date_us": _ts_us(t.column("o_orderdate")),
                "p": _cents(t.column("o_totalprice")),
            }
        )

    def first_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["date_us", "o_orderkey"], kind="mergesort")
        d = g["date_us"].to_numpy()
        return pd.DataFrame(
            {
                "o_custkey": [g["o_custkey"].iloc[0]],
                "first_price_x100": [int(g["p"].iloc[0])],
                "last_price_x100": [int(g["p"].iloc[-1])],
                "span_days": [int((d[-1] - d[0]) // US_PER_DAY)],
                "n_orders": [len(g)],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(first_last, batch_format="pandas")
    )


def price_equidepth_hist(sf_dir: str, nbins: int = 8):
    """EQUI-DEPTH histogram (the optimizer-statistics complement of the
    fixed-width :func:`value_histogram`): bin edges are the exact
    distributed ``quantile_disc`` order statistics at k/nbins, then one
    vectorized searchsorted pass counts rows per depth bin — only
    (bin, count) partials enter the combiner exchange. Bins are equal-
    population up to duplicate mass at the edges (ties stay with the
    lower bin on both engines: ``v > edge`` opens the next bin)."""
    from ..stages.profile import exact_quantiles

    ds = read_table(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [k / nbins for k in range(1, nbins)]
    edges = np.asarray(exact_quantiles(ds, "l_extendedprice", qs), dtype=np.float64)

    def binit(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("l_extendedprice").drop_null(), dtype=np.float64)
        # bin = #edges strictly below v (ties -> lower bin, mirrors v > e)
        return pa.table(
            {"bin": np.searchsorted(edges, v, side="left").astype(np.int64)}
        )

    out = ds.map_batches(binit, batch_format="pyarrow").groupby("bin").aggregate(Count())
    return _rename(out, ["bin", "n"])


def price_winsorized_stats(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """Winsorized aggregate (robust-statistics V-family: trim tail
    influence before the mean — the standard pre-step for noisy metric
    columns): clip l_extendedprice at the exact P01/P99 order statistics
    (distributed ``quantile_disc``, no sort), then one vectorized
    clip+sum pass — only scalar partials cross the exchange. Money is
    integer cents on both engines, so the winsorized sum matches the SQL
    mirror exactly."""
    from ..stages.profile import exact_quantiles

    ds = read_table(sf_dir, "lineitem", ["l_extendedprice"])
    lo, hi = exact_quantiles(ds, "l_extendedprice", [lo_q, hi_q])

    def clip(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("l_extendedprice").drop_null(), dtype=np.float64)
        w = np.clip(v, lo, hi)
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "win_sum_x100": pa.array(
                    [int(np.rint(w * 100).astype(np.int64).sum())], pa.int64()
                ),
                "n_clip_lo": pa.array([int((v < lo).sum())], pa.int64()),
                "n_clip_hi": pa.array([int((v > hi).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(clip, batch_format="pyarrow").sum(
        ["n", "win_sum_x100", "n_clip_lo", "n_clip_hi"]
    )
    return pa.table(
        {
            "n": pa.array([int(agg["sum(n)"])], pa.int64()),
            "win_sum_x100": pa.array([int(agg["sum(win_sum_x100)"])], pa.int64()),
            "n_clip_lo": pa.array([int(agg["sum(n_clip_lo)"])], pa.int64()),
            "n_clip_hi": pa.array([int(agg["sum(n_clip_hi)"])], pa.int64()),
        }
    )
