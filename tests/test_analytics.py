"""Driver-gate rehearsal: every oracled query in ``__ray_entry__`` must
match its DuckDB oracle on the same parquet tables (row count + sorted-column
values), exactly the comparison the driver performs at sf0.01.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


ORACLED = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, ray_session, sf_dir, oracle_con):
    ray_df = _canon(_to_df(E.queries()[name](sf_dir)))
    oracle_df = _canon(oracle_con.sql(E.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(oracle_df.columns)
    assert len(ray_df) == len(oracle_df)
    pd.testing.assert_frame_equal(ray_df, oracle_df, check_dtype=False)


def test_all_queries_have_callables():
    qs = E.queries()
    for name in ORACLED:
        assert name in qs, f"oracle {name} has no queries() entry"


def test_entry_smoke(ray_session):
    res = E.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_asof_join_edge_semantics(ray_session):
    """Pinned AS-OF semantics: exact-equal ts matches; earlier left rows get
    null; keys absent from the right side get all-null payload; int64 keys
    above 2^53 survive (no pandas float coercion inside the operator)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import asof_join

    big = 2**60 + 7  # would corrupt silently if coerced through float64
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, big], type=pa.int64()),
            "t": pa.array([5, 10, 20, 7, 9], type=pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, big], type=pa.int64()),
            "rt": pa.array([10, 15, 9], type=pa.int64()),
            "rv": pa.array([100, 150, 900], type=pa.int64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_ts="t", right_ts="rt", right_payload=["rv"],
    ).to_pandas().sort_values(["k", "t"], ignore_index=True)
    # k=1: t=5 -> null, t=10 -> exact match 100, t=20 -> 150
    k1 = out[out["k"] == 1]["rv"].tolist()
    assert np.isnan(k1[0]) and k1[1] == 100 and k1[2] == 150
    # k=2: no right rows at all -> null
    assert np.isnan(out[out["k"] == 2]["rv"].iloc[0])
    # huge key matches exactly (exact-equal ts)
    assert out[out["k"] == big]["rv"].iloc[0] == 900
    assert out[out["k"] == big]["k"].iloc[0] == big


def test_asof_join_null_semantics(ray_session):
    """NULL keys and NULL timestamps never match (SQL semantics), and a
    null left timestamp must not float-coerce the group's int64 math."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import asof_join

    big = 2**60 + 7
    left = pa.table(
        {
            "k": pa.array([1, 1, None, big], type=pa.int64()),
            "t": pa.array([5, None, 9, 9], type=pa.int64()),
            "lv": pa.array(["a", "b", "c", "d"]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, None, big, big], type=pa.int64()),
            "rt": pa.array([4, 9, None, 9], type=pa.int64()),
            "rv": pa.array([40, 90, 900, 909], type=pa.int64()),
        }
    )
    res = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_ts="t", right_ts="rt", right_payload=["rv"],
    )
    import pyarrow as _pa

    out = _pa.concat_tables(
        [_pa.table(b) for b in res.iter_batches(batch_format="pyarrow")]
    )
    assert out.num_rows == 4  # LEFT join keeps every left row, null keys too
    # inspect as Arrow: pandas would coerce the nullable int64 key/payload
    # to float64 and corrupt the 2^60 key
    by = {
        (out.column("k")[i].as_py(), out.column("lv")[i].as_py()):
        out.column("rv")[i].as_py()
        for i in range(out.num_rows)
    }
    assert by[(1, "a")] == 40        # normal match
    assert by[(1, "b")] is None      # null left ts -> no match
    assert by[(None, "c")] is None   # null key never matches (right k=None dropped)
    assert by[(big, "d")] == 909     # null rt dropped; exact-ts row matches; key exact int64


def test_rolling_window_count_null_semantics(ray_session):
    """Null keys count 0 everywhere; null timestamps neither count nor get
    counted."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import rolling_window_count

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, None, None], type=pa.int64()),
            "t": pa.array([10, 15, None, 10, 12], type=pa.int64()),
            "m": pa.array([True, False, True, True, False]),
        }
    )
    out = rolling_window_count(
        ray.data.from_arrow(t), key="k", ts_col="t", window_us=10,
        mark_col="m", out_col="c",
    ).to_pandas()
    assert len(out) == 5
    k1 = out[out["k"] == 1].sort_values("t")
    # t=10: marked self in (0,10] -> 1; t=15: marked t=10 in (5,15] -> 1;
    # the null-ts marked row never counts anywhere and itself counts 0
    assert list(k1["c"])[:2] == [1, 1]
    assert k1[k1["t"].isna()]["c"].iloc[0] == 0
    assert (out[out["k"].isna()]["c"] == 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_bruteforce(ray_session, seed):
    """Randomized as-of join vs an O(n^2) reference: duplicate timestamps,
    several keys, exact-match edges — the full backward-join contract."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import asof_join

    rng = np.random.default_rng(seed)
    nl, nr = 120, 60
    lk = rng.integers(0, 6, nl)
    lt = rng.integers(0, 40, nl)
    rk = rng.integers(0, 6, nr)
    rt = rng.integers(0, 40, nr)
    rv = np.arange(nr) * 10
    # deterministic ties: keep ONE right row per (key, ts) — the max rv
    best = {}
    for i in range(nr):
        kk = (int(rk[i]), int(rt[i]))
        if kk not in best or rv[i] > best[kk]:
            best[kk] = rv[i]
    rk2 = np.array([k for k, _ in best], dtype=np.int64)
    rt2 = np.array([t for _, t in best], dtype=np.int64)
    rv2 = np.array(list(best.values()), dtype=np.int64)

    left = pa.table({"k": lk.astype(np.int64), "t": lt.astype(np.int64),
                     "lid": np.arange(nl, dtype=np.int64)})
    right = pa.table({"k": rk2, "rt": rt2, "rv": rv2})
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_ts="t", right_ts="rt", right_payload=["rv"],
    ).to_pandas().set_index("lid")

    for i in range(nl):
        cand = [(int(rt2[j]), int(rv2[j])) for j in range(len(rk2))
                if rk2[j] == lk[i] and rt2[j] <= lt[i]]
        exp = max(cand)[1] if cand else None
        got = out.loc[i, "rv"]
        if exp is None:
            assert np.isnan(got), (i, got)
        else:
            assert got == exp, (i, got, exp)


def test_range_join_overlap_and_closed_semantics(ray_session):
    """Pinned RANGE-join semantics: overlapping intervals replicate the
    point once per matching interval; closed='left' excludes the end bound
    while closed='both' includes it; null keys/bounds never match."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import range_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, None], type=pa.int64()),
            "t": pa.array([5, 10, 20, 5, 5], type=pa.int64()),
            "lid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        }
    )
    # k=1: [0,10) and [5,25) overlap on t in [5,10)
    right = pa.table(
        {
            "k": pa.array([1, 1, 2, None], type=pa.int64()),
            "s": pa.array([0, 5, 0, 0], type=pa.int64()),
            "e": pa.array([10, 25, None, 9], type=pa.int64()),
            "iv": pa.array([100, 200, 300, 400], type=pa.int64()),
        }
    )

    def run(closed):
        return range_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", left_ts="t", right_start="s", right_end="e",
            right_payload=["iv"], closed=closed,
        ).to_pandas().sort_values(["lid", "iv"], ignore_index=True)

    out = run("left")
    # t=5 matches both intervals; t=10 only [5,25) (end-exclusive);
    # t=20 only [5,25); k=2's interval has a null end -> dropped;
    # null left key never matches
    assert list(zip(out["lid"], out["iv"])) == [
        (0, 100), (0, 200), (1, 200), (2, 200)
    ]
    both = run("both")
    # closed='both': t=10 now also matches [0,10]
    assert list(zip(both["lid"], both["iv"])) == [
        (0, 100), (0, 200), (1, 100), (1, 200), (2, 200)
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_range_join_matches_bruteforce(ray_session, seed):
    """Randomized range join vs an O(n*m) reference, with arbitrary
    interval overlap, empty intervals, and duplicate points."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import range_join

    rng = np.random.default_rng(seed)
    nl, nr = 150, 70
    lk = rng.integers(0, 5, nl).astype(np.int64)
    lt = rng.integers(0, 60, nl).astype(np.int64)
    rk = rng.integers(0, 5, nr).astype(np.int64)
    rs = rng.integers(0, 60, nr).astype(np.int64)
    re_ = rs + rng.integers(0, 20, nr)  # some empty ([s, s))
    left = pa.table({"k": lk, "t": lt, "lid": np.arange(nl, dtype=np.int64)})
    right = pa.table({"k": rk, "s": rs, "e": re_,
                      "rid": np.arange(nr, dtype=np.int64)})
    out = range_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_ts="t", right_start="s", right_end="e",
        right_payload=["rid"],
    ).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    exp = sorted(
        (int(i), int(j))
        for i in range(nl) for j in range(nr)
        if lk[i] == rk[j] and rs[j] <= lt[i] < re_[j]
    )
    assert got == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_rolling_window_count_matches_bruteforce(ray_session, seed):
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import rolling_window_count

    rng = np.random.default_rng(seed)
    n, w = 200, 7
    k = rng.integers(0, 5, n).astype(np.int64)
    t = rng.integers(0, 50, n).astype(np.int64)
    m = rng.random(n) < 0.4
    ds = ray.data.from_arrow(
        pa.table({"k": k, "t": t, "m": m, "rid": np.arange(n, dtype=np.int64)})
    )
    out = rolling_window_count(
        ds, key="k", ts_col="t", window_us=w, mark_col="m", out_col="c"
    ).to_pandas().set_index("rid")
    for i in range(n):
        exp = int(((k == k[i]) & m & (t > t[i] - w) & (t <= t[i])).sum())
        assert out.loc[i, "c"] == exp, (i, out.loc[i, "c"], exp)


def test_skew_join_matches_hash_join(ray_session):
    """Planted 60%-hot key: the hot/cold split (broadcast + hash exchange)
    must be invisible in the result; explicit hot_keys and the no-hot path
    must agree too."""
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import hash_join, skew_join

    n = 20000
    keys = np.where(np.arange(n) % 10 < 6, 7, np.arange(n) % 997)
    left = ray.data.from_pandas(pd.DataFrame({"k": keys, "a": np.arange(n)}))
    right = ray.data.from_pandas(
        pd.DataFrame({"rk": np.arange(997), "b": np.arange(997) * 2.0})
    )

    def canon(ds):
        df = ds.to_pandas()
        return df[sorted(df.columns)].sort_values(["k", "a"]).reset_index(drop=True)

    ref = canon(hash_join(left, right, on="k", right_on="rk"))
    got = canon(skew_join(left, right, on="k", right_on="rk", hot_frac=0.05))
    pd.testing.assert_frame_equal(got, ref)
    got_explicit = canon(skew_join(left, right, on="k", right_on="rk", hot_keys=[7]))
    pd.testing.assert_frame_equal(got_explicit, ref)


def test_skew_join_survives_empty_cold_side(ray_session):
    """When EVERY key is hot the cold side is empty — the null-keyed
    sentinel must keep the hash join alive and add no rows."""
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import skew_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1] * 50 + [2] * 50, "a": range(100)})
    )
    right = ray.data.from_pandas(pd.DataFrame({"rk": [1, 2], "b": [10.0, 20.0]}))
    out = skew_join(left, right, on="k", right_on="rk", hot_keys=[1, 2]).to_pandas()
    assert len(out) == 100
    assert not out["b"].isna().any()


def test_ntile_remainder_semantics():
    # SQL NTILE: first n%k buckets get ceil(n/k) rows
    from etl_sql_duckdb_parquet__ray.pipelines.analytics import _ntile

    assert _ntile(10, 4).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert _ntile(4, 4).tolist() == [1, 2, 3, 4]
    assert _ntile(2, 4).tolist() == [1, 2]  # fewer rows than buckets
    assert _ntile(0, 4).tolist() == []


def test_user_event_gaps_drops_single_event_users(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pa.array([1_000_000, 3_000_000, 2_000_000, 9_000_000], type=pa.timestamp("us")),
            "user_id": [7, 7, 7, 8],  # user 8 has one event -> no gap row
            "event_type": ["a"] * 4,
            "value": [0.0] * 4,
            "props": [""] * 4,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from etl_sql_duckdb_parquet__ray.pipelines.analytics import user_event_gaps

    df = user_event_gaps(str(tmp_path)).to_pandas()
    assert len(df) == 1 and df["user_id"].iloc[0] == 7
    # user 7's events sort to 1s, 2s, 3s -> two 1 s gaps
    assert df["n_gaps"].iloc[0] == 2
    assert df["max_gap_us"].iloc[0] == 1_000_000
    assert df["sum_gap_us"].iloc[0] == 2_000_000


def test_rolling_window_sum_matches_duckdb(ray_session):
    """Pin rolling_window_sum to DuckDB's RANGE-frame semantics directly:
    random data with timestamp ties, null values, null timestamps and
    multiple keys — the engine output must match SUM(val) OVER (PARTITION
    BY key ORDER BY ts RANGE BETWEEN .. PRECEDING AND CURRENT ROW)
    row-for-row."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import rolling_window_sum

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 5, n),
            # coarse grid -> plenty of exact ts ties (peer groups)
            "ts": pd.to_datetime(rng.integers(0, 40, n) * 1_000_000, unit="us"),
            "v": rng.integers(-100, 100, n),
        }
    )
    df.loc[rng.choice(n, 25, replace=False), "v"] = pd.NA
    df["v"] = df["v"].astype("Int64")
    null_ts_rows = rng.choice(n, 15, replace=False)
    df.loc[null_ts_rows, "ts"] = pd.NaT

    win_us = 7_000_000
    got = (
        rolling_window_sum(
            ray.data.from_pandas(df), "k", "ts", win_us, "v", "rsum"
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """
        SELECT rid,
               SUM(v) OVER (
                   PARTITION BY k ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 SECOND PRECEDING AND CURRENT ROW
               ) AS rsum
        FROM t ORDER BY rid
        """
    ).fetchdf()
    g = got["rsum"].astype("Float64")
    w = want["rsum"].astype("Float64")
    mismatch = (g.isna() != w.isna()) | ((g != w) & g.notna())
    assert not mismatch.any(), got.loc[mismatch.values].head(10).to_dict()


def test_rolling_window_sum_float_and_exact_window_edge(ray_session):
    """Inclusive lower bound: a row exactly window_us older IS in the
    frame (SQL RANGE x PRECEDING is inclusive); float values sum in
    float64."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import rolling_window_sum

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a"],
            "ts": pd.to_datetime([0, 5_000_000, 10_000_000], unit="us"),
            "v": [1.5, 2.25, 4.0],
        }
    )
    got = (
        rolling_window_sum(ray.data.from_pandas(df), "k", "ts", 5_000_000, "v", "s")
        .to_pandas()
        .sort_values("ts")["s"]
        .tolist()
    )
    assert got == [1.5, 3.75, 6.25]  # each frame includes the row 5s older


def test_grouped_string_agg_null_semantics(ray_session):
    """STRING_AGG skips NULL elements; an all-NULL group aggregates to
    NULL (not '')."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import grouped_string_agg

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": ["x", None, "y", None, None],
            "o": [2, 1, 3, 1, 2],
        }
    )
    got = {
        r["k"]: (r["agg"], r["n_vals"])
        for r in grouped_string_agg(
            ray.data.from_pandas(df), "k", "v", ["o"], sep=","
        ).take_all()
    }
    assert got["a"] == ("x,y", 2)  # ordered by o, NULL skipped
    assert got["b"] == (None, 0)


def test_bloom_semi_join_exact_vs_pandas(ray_session):
    """Bloom pre-filter + distinct-key verify must equal a plain semi
    join — including with a deliberately SATURATED filter (tiny bits →
    ~every probe passes → the exact join alone carries correctness),
    string keys, duplicate build keys, and NULLs on both sides."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import bloom_semi_join

    rng = np.random.default_rng(7)
    n = 30000
    lk = rng.integers(0, 5000, n)
    lk_obj = lk.astype(object)
    lk_obj[::97] = None  # NULL probe keys never match
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk_obj, type=pa.int64()), "v": np.arange(n)})
    )
    # build side: only even keys < 2000, each duplicated 3x, plus NULLs
    rk = np.repeat(np.arange(0, 2000, 2), 3).astype(object)
    rk[::50] = None
    right = ray.data.from_arrow(pa.table({"rk": pa.array(rk, type=pa.int64())}))

    expect = pd.DataFrame({"k": lk, "v": np.arange(n)})
    expect = expect[pd.Series(lk_obj).notna().to_numpy()]
    keep = set(range(0, 2000, 2))
    expect = expect[expect["k"].isin(keep)].sort_values(["k", "v"]).reset_index(drop=True)

    for bits in (1 << 20, 1 << 10):  # healthy and saturated filters
        got = (
            bloom_semi_join(left, right, on="k", right_on="rk", bits=bits)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"k": "int64"}), expect.astype({"k": "int64"})
        )


def test_bloom_semi_join_string_keys_and_empty_build(ray_session):
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import bloom_semi_join

    left = ray.data.from_arrow(
        pa.table({"k": ["a", "b", "c", "d"] * 25, "v": list(range(100))})
    )
    right = ray.data.from_arrow(pa.table({"k": ["b", "d", "d", "zz"]}))
    got = bloom_semi_join(left, right, on="k").to_pandas()
    assert sorted(got["k"].unique()) == ["b", "d"] and len(got) == 50

    # empty build side -> empty result (the all-zero bitmap prunes
    # everything before the exchange; sentinels keep the join alive)
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.string())}))
    got2 = bloom_semi_join(left, empty, on="k").to_pandas()
    assert len(got2) == 0


def test_bloom_prefilter_no_false_negatives(ray_session):
    """Every true member must survive the Bloom pre-filter (false
    negatives impossible by construction); selectivity should bite on a
    healthy filter."""
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.relational import (
        bloom_prefilter, build_key_bloom,
    )

    members = np.arange(0, 100000, 7)
    right = ray.data.from_arrow(pa.table({"k": members}))
    bits = 1 << 21
    bloom = build_key_bloom(right, "k", bits=bits)

    probe = ray.data.from_arrow(pa.table({"k": np.arange(100000)}))
    out = bloom_prefilter(probe, "k", bloom, bits).to_pandas()["k"].to_numpy()
    assert np.isin(members, out).all()  # zero false negatives
    # FPR sanity: non-members passing should be well under 10%
    non_members = np.setdiff1d(np.arange(100000), members)
    fpr = np.isin(non_members, out).mean()
    assert fpr < 0.10, fpr


def test_user_scd2_history_collapses_runs(ray_session):
    """SCD2 collapse: consecutive equal types merge into one versioned
    row; valid_to = next run's valid_from; the open (current) version
    carries the INT64_MAX high-date sentinel; NULL-vs-NULL is NOT a new
    run (IS DISTINCT FROM semantics)."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.analytics import (
        SCD2_HIGH_US, _scd2_collapse,
    )

    df = pd.DataFrame(
        {
            "user_id": [1] * 6 + [2] * 2,
            "event_id": [10, 11, 12, 13, 14, 15, 20, 21],
            "event_type": ["a", "a", None, None, "b", "b", "x", "y"],
            "ts_us": [100, 200, 300, 400, 500, 600, 50, 60],
        }
    )
    out = (
        ray.data.from_pandas(df)
        .groupby("user_id")
        .map_groups(_scd2_collapse, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert list(u1.event_type) == ["a", None, "b"]
    assert list(u1.n_rows) == [2, 2, 2]
    assert list(u1.valid_from_us) == [100, 300, 500]
    assert list(u1.valid_to_us) == [300, 500, SCD2_HIGH_US]
    u2 = out[out.user_id == 2]
    assert list(u2.event_type) == ["x", "y"]
    assert list(u2.valid_to_us) == [60, SCD2_HIGH_US]


def test_orders_snapshot_diff_classification(ray_session):
    """Snapshot diff emits ONLY differing rows with the right class:
    right-only -> added, left-only -> removed, value drift -> changed
    with per-column flags; identical matched rows are dropped."""
    from etl_sql_duckdb_parquet__ray.pipelines.analytics import (
        orders_snapshot_diff,
    )

    out = orders_snapshot_diff("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {
        "o_orderkey", "diff_status", "status_changed", "price_changed",
    }
    assert set(out.diff_status) <= {"added", "removed", "changed"}
    # snapshots are modulus-derived: every removed key is ≡0 mod 97 of the
    # new filter domain; every added key is ≡3 mod 101; changed = 89|key
    added = out[out.diff_status == "added"]
    removed = out[out.diff_status == "removed"]
    changed = out[out.diff_status == "changed"]
    assert (removed.o_orderkey % 101 == 3).all()
    assert (added.o_orderkey % 97 == 0).all()
    assert (changed.o_orderkey % 89 == 0).all()
    assert (changed.price_changed == 1).all()
    assert (changed.status_changed == 0).all()
    assert len(added) and len(removed) and len(changed)


def test_interval_merge_touching_and_contained(ray_session):
    """Interval coalescing edges: touching intervals merge (end == next
    start), contained intervals don't extend the island, and a strictly
    later start opens a new island even when an EARLIER interval's end
    was the running max (cummax, not last-end, is the comparison
    basis)."""
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.analytics import _interval_merge

    df = pd.DataFrame(
        {
            "user_id": [7] * 5,
            "event_id": [1, 2, 3, 4, 5],
            #        long first interval; contained; touching; gap; new
            "s":     [0,   10,  100, 101, 500],
            "e":     [100, 20,  101, 300, 600],
        }
    )
    out = (
        ray.data.from_pandas(df)
        .groupby("user_id")
        .map_groups(_interval_merge, batch_format="pandas")
        .to_pandas()
        .sort_values("island_start_us")
        .reset_index(drop=True)
    )
    assert list(out.island_start_us) == [0, 500]
    assert list(out.island_end_us) == [300, 600]
    assert list(out.n_events) == [4, 1]


def test_equidepth_bins_are_balanced(ray_session):
    """Equi-depth bins hold ~n/nbins rows each on a continuous column
    (exact up to duplicate mass at the edges)."""
    from etl_sql_duckdb_parquet__ray.pipelines.analytics import (
        price_equidepth_hist,
    )

    out = price_equidepth_hist("/root/testdata/sf0.001").to_pandas()
    n = out["n"].sum()
    assert len(out) == 8
    # each depth bin within 2% of the ideal population (duplicate ties
    # can shift a handful of rows across an edge)
    assert (abs(out["n"] - n / 8) <= max(2, 0.02 * n)).all(), out
