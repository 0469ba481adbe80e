"""Validation-with-quarantine and profiling stages (reference V1-V9, A1-A4)
plus the CLI entrypoints."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_sql_duckdb_parquet__ray.stages.profile import (
    approx_nunique,
    approx_quantiles,
    duplicate_row_count,
    exact_nunique,
    profile_dataset,
    quality_score,
)
from etl_sql_duckdb_parquet__ray.stages.validate import (
    Rule,
    duplicate_keys,
    fk_orphans,
    split_quarantine,
    validate,
    violation_counts,
)

RULES = [
    Rule("id_not_null", "id", "not_null"),
    Rule("platform_enum", "platform", "enum", {"values": ["A", "B"]}),
    Rule("score_range", "score", "range", {"lo": 0.0, "hi": 1.0}),
]


def _dirty_table() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": [1, 2, None, 4, 5],
            "platform": ["A", "B", "A", "C", None],
            "score": [0.5, 1.5, 0.2, 0.9, -0.1],
        }
    )


def test_violation_counts(ray_session):
    import ray

    ds = ray.data.from_pandas(_dirty_table())
    counts = violation_counts(ds, RULES)
    assert counts == {"id_not_null": 1, "platform_enum": 2, "score_range": 2}


def test_split_quarantine(ray_session):
    import ray

    ds = ray.data.from_pandas(_dirty_table())
    good, bad = split_quarantine(ds, RULES)
    gdf, bdf = good.to_pandas(), bad.to_pandas()
    assert len(gdf) == 1 and gdf["id"].iloc[0] == 1
    assert len(bdf) == 4
    assert "_violations" in bdf.columns
    row5 = bdf[bdf["score"] == -0.1].iloc[0]
    assert "platform_enum" in row5["_violations"] and "score_range" in row5["_violations"]


def test_validate_strict_raises(ray_session):
    import ray

    ds = ray.data.from_pandas(_dirty_table())
    with pytest.raises(ValueError, match="validation failed"):
        validate(ds, RULES, mode="strict")
    clean = ray.data.from_pandas(
        pd.DataFrame({"id": [1, 2], "platform": ["A", "B"], "score": [0.1, 0.9]})
    )
    _, counts = validate(clean, RULES, mode="strict")
    assert sum(counts.values()) == 0


def test_validate_quarantine_writes(ray_session, tmp_path):
    import ray

    ds = ray.data.from_pandas(_dirty_table())
    qdir = str(tmp_path / "quarantine")
    good, counts = validate(ds, RULES, mode="quarantine", quarantine_path=qdir)
    assert good.count() == 1
    back = ray.data.read_parquet(qdir).to_pandas()
    assert len(back) == 4 and "_violations" in back.columns


def test_duplicate_keys_and_fk(ray_session):
    import ray

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": range(6)})
    )
    dups = sorted(duplicate_keys(ds, "k").to_pandas()["k"])
    assert dups == [1, 3]
    orphans = fk_orphans(ds, "k", pa.array([1, 2])).to_pandas()
    assert sorted(orphans["k"].unique()) == [3]


def test_profile_dataset_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    prof = profile_dataset(ds, ["value", "event_type"])
    con = duckdb.connect()
    exp = con.sql(
        f"SELECT COUNT(*) n, MIN(value) mn, MAX(value) mx, SUM(value) s, "
        f"COUNT(*)-COUNT(value) AS n_nulls FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert prof["rows"] == exp[0]
    v = prof["columns"]["value"]
    assert v["min"] == exp[1] and v["max"] == exp[2]
    assert v["nulls"] == exp[4]
    et = prof["columns"]["event_type"]
    assert et["strlen_min"] >= 1 and et["strlen_max"] >= et["strlen_min"]


def test_correlation_bit_identical_to_duckdb(ray_session, sf_dir):
    """Pearson from integer co-moments must match the SQL-mirror DuckDB
    expression to the BIT (the driver's oracle hash compares raw double
    bytes). Pins the DuckDB-division mirror: HUGEINT/BIGINT divides as
    double(s)/double(n), which differs from Python's correctly-rounded
    int/int in the last ulp once a moment exceeds 2^53."""
    import duckdb
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import numeric_correlation

    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(path, columns=["l_quantity", "l_extendedprice"])
    corr = numeric_correlation(ds, ["l_quantity", "l_extendedprice"])
    got = corr[("l_quantity", "l_extendedprice")]
    exp = duckdb.connect().execute(
        f"""
        WITH c AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sq,
                   SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sp,
                   SUM(CAST(ROUND(l_quantity*100) AS BIGINT)*CAST(ROUND(l_quantity*100) AS BIGINT)) AS sqq,
                   SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)*CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS spp,
                   SUM(CAST(ROUND(l_quantity*100) AS BIGINT)*CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sqp
            FROM read_parquet('{path}'))
        SELECT (sqp/n - (sq/n)*(sp/n)) /
               SQRT((sqq/n - (sq/n)*(sq/n)) * (spp/n - (sp/n)*(sp/n)))
        FROM c
        """
    ).fetchone()[0]
    assert got.hex() == exp.hex(), (got.hex(), exp.hex())


def test_correlation_exact_beyond_int64(ray_session):
    """Co-moment sums that overflow int64 (DuckDB widens to HUGEINT; numpy
    would wrap silently) must still be exact via the limb-split distributed
    sum + chunked per-batch reduction."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import numeric_correlation

    rng = np.random.default_rng(5)
    # values ~2e7 -> cents ~2e9, squares ~4e18; 40k rows pushes the ss sum
    # to ~1.6e23, far beyond int64
    x = rng.uniform(1.5e7, 2.1e7, 40_000)
    y = 3.0 * x + rng.normal(0, 1e6, 40_000)
    t = pa.table({"x": x, "y": y})
    corr = numeric_correlation(ray.data.from_arrow(t), ["x", "y"])[("x", "y")]
    cx = [int(v) for v in np.round(x * 100).astype(np.int64)]
    cy = [int(v) for v in np.round(y * 100).astype(np.int64)]
    n = float(len(cx))
    sx, sy = float(sum(cx)) / n, float(sum(cy)) / n
    cov = float(sum(a * b for a, b in zip(cx, cy))) / n - sx * sy
    vx = float(sum(a * a for a in cx)) / n - sx * sx
    vy = float(sum(b * b for b in cy)) / n - sy * sy
    import math

    exp = cov / math.sqrt(vx * vy)
    assert corr.hex() == exp.hex(), (corr, exp)


def test_nunique_exact_and_hll_vs_duckdb(ray_session, sf_dir):
    import duckdb
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    exp_user, exp_type = con.sql(
        f"SELECT COUNT(DISTINCT user_id), COUNT(DISTINCT event_type) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert exact_nunique(ds, "user_id") == exp_user
    # hash-reduce variant (wide-column scale path): same exact answer
    assert exact_nunique(ds, "event_type", hash_wide=True) == exp_type
    est = approx_nunique(ds, ["user_id", "event_type"])
    # p=12 HLL: ~1.6% stddev; allow 5%
    assert abs(est["user_id"] - exp_user) <= max(0.05 * exp_user, 2)
    assert abs(est["event_type"] - exp_type) <= max(0.05 * exp_type, 2)
    prof = profile_dataset(ds, ["user_id"])
    nu = prof["columns"]["user_id"]["nunique_approx"]
    assert abs(nu - exp_user) <= max(0.05 * exp_user, 2)


def test_approx_quantiles_close_to_exact(ray_session):
    import ray

    rng = np.random.default_rng(3)
    vals = rng.normal(100.0, 15.0, 50_000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    q1, q2, q3 = approx_quantiles(ds, "v", [0.25, 0.5, 0.75])
    e1, e2, e3 = np.percentile(vals, [25, 50, 75])
    span = vals.max() - vals.min()
    for a, e in [(q1, e1), (q2, e2), (q3, e3)]:
        assert abs(a - e) < span / 1000  # well under one bin of slack


def test_duplicate_row_count_and_quality(ray_session):
    import ray

    ds = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 1, 2, 2, 2, 3], "b": ["x", "x", "y", "y", "y", "z"]})
    )
    assert duplicate_row_count(ds, ["a", "b"]) == 3  # 1 extra of (1,x) + 2 of (2,y)
    prof = profile_dataset(ds)
    s = quality_score(prof, dup_count=3)
    assert 0.0 <= s < 100.0
    s_clean = quality_score(prof, dup_count=0)
    assert s_clean == 100.0


def test_report_writers(ray_session, tmp_path):
    import ray

    from etl_sql_duckdb_parquet__ray.stages.report import (
        build_report,
        write_html_report,
        write_markdown_report,
    )

    ds = ray.data.from_pandas(pd.DataFrame({
        "id": [1, 2, 2, 4, None],
        "name": ["a", "b", "b", "d", "e"],
    }))
    rep = build_report(ds, pipeline_results={"stage": "unit-test"})
    assert rep["total_rows"] == 5 and rep["total_columns"] == 2
    assert rep["missing_cells"] == 1
    assert rep["duplicate_rows"] == 1          # (2, b) appears twice
    assert rep["columns"]["name"]["unique"] == 4
    md = write_markdown_report(rep, str(tmp_path / "r.md"))
    html = write_html_report(rep, str(tmp_path / "r.html"))
    md_text = open(md).read()
    html_text = open(html).read()
    assert "| name |" in md_text and "unit-test" in md_text
    assert "<table>" in html_text and "Quality score" in html_text
    assert f"{rep['quality_score']:.1f}" in html_text


def test_export_history(ray_session, tmp_path):
    import json as _json

    import ray

    from etl_sql_duckdb_parquet__ray.pipelines.encode import encode_transcripts
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts
    from etl_sql_duckdb_parquet__ray.stages.report import export_history

    t = generate_transcripts(2000, seed=5)
    out = str(tmp_path / "enc")
    encode_transcripts(ray.data.from_arrow(t), out, num_buckets=4)
    path = export_history(out, str(tmp_path / "hist.json"))
    payload = _json.load(open(path))
    assert payload["statistics"]["rows"] == 2000
    assert len(payload["runs"]) == 4


def test_cli_encode_decode_verify_stats(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq

    from etl_sql_duckdb_parquet__ray.cli import main
    from etl_sql_duckdb_parquet__ray.sources.transcripts import generate_transcripts

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(generate_transcripts(5000), f"{src}/part-0.parquet")
    enc = str(tmp_path / "enc")
    out = str(tmp_path / "decoded")

    assert main(["encode", "--input", src, "--out", enc, "--buckets", "4",
                 "--concurrency", "2"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 5000 and stats["buckets"] == 4

    assert main(["verify", "--input", src, "--encoded", enc]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["roundtrip_ok"]

    assert main(["decode", "--input", enc, "--out", out]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 5000

    assert main(["stats", "--encoded", enc, "--per-bucket"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(st["buckets_detail"]) == 4


def test_correlation_first_moment_beyond_2_62(ray_session):
    """Column magnitudes whose cents exceed 2^62 exercise the object-dtype
    fallback in the FIRST-moment path (b=None) — regression for a crash
    where the fallback assumed two arrays."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import numeric_correlation

    rng = np.random.default_rng(11)
    x = rng.uniform(4.7e16, 9.0e16, 500)  # cents ~ [2^62, 2^63)
    y = 2.0 * x + rng.uniform(0, 1e14, 500)
    corr = numeric_correlation(
        ray.data.from_arrow(pa.table({"x": x, "y": y})), ["x", "y"]
    )[("x", "y")]
    # the contract is bit-agreement with the SQL double-division formula
    # over the EXACT integer moments (at this magnitude the formula itself
    # cancels catastrophically in doubles — the oracle would too — so we
    # assert agreement, not correlation quality)
    import math

    cx = [int(v) for v in np.round(x * 100).astype(np.int64)]
    cy = [int(v) for v in np.round(y * 100).astype(np.int64)]
    n = float(len(cx))
    sx, sy = float(sum(cx)) / n, float(sum(cy)) / n
    cov = float(sum(a * b for a, b in zip(cx, cy))) / n - sx * sy
    vx = float(sum(a * a for a in cx)) / n - sx * sx
    vy = float(sum(b * b for b in cy)) / n - sy * sy
    p = vx * vy
    exp = cov / math.sqrt(p) if p > 0 else float("nan")
    assert (math.isnan(corr) and math.isnan(exp)) or corr.hex() == exp.hex()


def test_cli_ann_build_and_query(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_sql_duckdb_parquet__ray.cli import main

    rng = np.random.default_rng(6)
    V = rng.standard_normal((200, 16))
    src = str(tmp_path / "emb")
    os.makedirs(src)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"vec_id": np.arange(200), "embedding": list(V)}),
            preserve_index=False,
        ),
        f"{src}/part-0.parquet",
    )
    idx = str(tmp_path / "idx")
    assert main(["ann-build", "--input", src, "--out", idx,
                 "--kind", "ivf", "--lists", "8"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["kind"] == "ivf" and meta["dim"] == 16

    q = json.dumps(V[7].tolist())
    assert main(["ann-query", "--index", idx, "--query", q,
                 "--k", "5", "--probe", "8"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 5 and rows[0]["vec_id"] == 7  # full probe: exact

    # ivfpq kind: build + query round-trip through the same CLI; the
    # rerank stage exact-rescores, so the query vector ranks itself first
    idx2 = str(tmp_path / "idx_ivfpq")
    assert main(["ann-build", "--input", src, "--out", idx2,
                 "--kind", "ivfpq", "--lists", "8", "--m", "8"]) == 0
    meta2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta2["kind"] == "ivfpq" and meta2["m"] == 8
    assert main(["ann-query", "--index", idx2, "--query", q,
                 "--k", "5", "--probe", "8", "--rerank", "4"]) == 0
    rows2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows2) == 5 and rows2[0]["vec_id"] == 7


def test_schema_inspect_and_diff(ray_session, sf_dir, tmp_path):
    """Parquet inspection is metadata-only yet exact; the Dataset-side
    streaming inspection agrees with it; the diff reports adds/drops/type
    changes and the row delta (reference src/schema_inspector.py:49-95)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from etl_sql_duckdb_parquet__ray.stages.schema import (
        compare_schemas,
        inspect_dataset_schema,
        inspect_parquet_schema,
    )

    src = f"{sf_dir}/documents.parquet"
    meta = inspect_parquet_schema(src)
    ds = ray.data.read_parquet(src)
    live = inspect_dataset_schema(ds, name=src)
    assert meta["num_rows"] == live["num_rows"] == ds.count()
    assert set(meta["columns"]) == set(live["columns"])
    for c in meta["columns"]:
        assert meta["columns"][c]["type"] == live["columns"][c]["type"]
        if meta["columns"][c]["null_count"] is not None:
            assert meta["columns"][c]["null_count"] == live["columns"][c]["null_count"]

    # evolve the schema: drop a column, add one, change a type, drop rows
    t = pq.read_table(src)
    t2 = (
        t.drop_columns(["source"])
        .append_column("extra", pa.array([1.5] * t.num_rows))
        .set_column(
            t.schema.get_field_index("n_chars") - (1 if t.schema.get_field_index("source") < t.schema.get_field_index("n_chars") else 0),
            "n_chars",
            t.column("n_chars").cast(pa.float64()),
        )
        .slice(0, t.num_rows - 7)
    )
    dst = str(tmp_path / "evolved.parquet")
    pq.write_table(t2, dst)
    diff = compare_schemas(meta, inspect_parquet_schema(dst))
    assert diff["missing_in_target"] == ["source"]
    assert diff["new_in_target"] == ["extra"]
    assert "n_chars" in diff["type_changes"]
    assert diff["type_changes"]["n_chars"]["to"] == "double"
    assert diff["row_difference"] == -7


def test_exact_quantiles_matches_numpy_and_refines(ray_session):
    """exact_quantiles must select the true order statistic (quantile_disc
    rank), including through the skew-refinement path (collect_cap=1 forces
    a sub-histogram for every hit bin)."""
    import math

    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import exact_quantiles

    rng = np.random.default_rng(42)
    # heavy skew: 95% of mass in a narrow band + outliers, with exact ties
    vals = np.concatenate(
        [rng.normal(100.0, 0.5, 1900), rng.uniform(0, 1e6, 100), [100.0] * 50]
    )
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    srt = np.sort(vals)
    want = [srt[max(math.ceil(q * len(vals)) - 1, 0)] for q in qs]
    got = exact_quantiles(ds, "v", qs, bins=64)
    assert got == want
    # force the refinement path: every bin "overflows"
    got_refined = exact_quantiles(ds, "v", qs, bins=64, collect_cap=1)
    assert got_refined == want
    # constant column
    const = ray.data.from_arrow(pa.table({"v": [7.0] * 100}))
    assert exact_quantiles(const, "v", [0.1, 0.9]) == [7.0, 7.0]


def test_quantile_cont_matches_duckdb(ray_session):
    """quantile_cont must reproduce DuckDB's interpolated quantiles
    bit-for-bit (same weighted interpolation form), including through the
    refinement path and on constant / single-value columns."""
    import duckdb
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import quantile_cont

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.normal(50.0, 2.0, 1500), rng.uniform(0, 1e5, 80), [50.0] * 40]
    )
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    want = [
        con.execute(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
        for q in qs
    ]
    got = quantile_cont(ds, "v", qs, bins=64)
    assert got == want
    got_refined = quantile_cont(ds, "v", qs, bins=64, collect_cap=1)
    assert got_refined == want
    # constant and single-row columns
    const = ray.data.from_arrow(pa.table({"v": [3.5] * 10}))
    assert quantile_cont(const, "v", [0.2, 0.8]) == [3.5, 3.5]
    one = ray.data.from_arrow(pa.table({"v": [9.0]}))
    assert quantile_cont(one, "v", [0.5]) == [9.0]
    # all-null column -> NaN per q
    import math as _m

    nulls = ray.data.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())}))
    assert all(_m.isnan(x) for x in quantile_cont(nulls, "v", [0.5]))


def test_sampled_quantiles_accuracy_and_determinism(ray_session):
    """The deterministic-hash-sample quantile path: reproducible across
    runs (same seed -> same sample -> same values), close to the exact
    quantiles (rank error O(sqrt(q(1-q)/m))), and sample-rate-sensitive
    (a different seed changes the sample but not the accuracy class)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import (
        exact_quantiles,
        sampled_quantiles,
    )

    rng = np.random.default_rng(5)
    n = 40_000
    vals = rng.lognormal(mean=3.0, sigma=1.0, size=n)
    t = pa.table({
        "rk": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(vals),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    qs = [0.25, 0.5, 0.75, 0.95]

    exact = np.array(exact_quantiles(ds, "v", qs))
    s1 = np.array(sampled_quantiles(ds, "v", "rk", qs, rate_bp=1000, seed=42))
    s2 = np.array(sampled_quantiles(ds, "v", "rk", qs, rate_bp=1000, seed=42))
    np.testing.assert_array_equal(s1, s2)  # deterministic

    # rank-error bound: the sampled quantile must sit within ±3 sigma of
    # the target rank in the FULL data (m ~ n/10 sampled rows)
    sv = np.sort(vals)
    m = n // 10
    for q, got in zip(qs, s1):
        rank = np.searchsorted(sv, got, side="right") / n
        tol = 3.0 * np.sqrt(q * (1 - q) / m)
        assert abs(rank - q) <= tol, (q, rank, tol)

    # every sampled value is a real data value (quantile_disc semantics)
    assert all(v in vals for v in s1)


def test_grouped_approx_nunique_error_and_determinism(ray_session):
    """Grouped HLL distinct estimate: within ~5% of exact per group
    (4096 registers, sigma ~1.6%), and partitioning-independent (max-merge
    is order-free, so the estimate is a pure function of the input SET)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import (
        grouped_approx_nunique,
    )

    rng = np.random.default_rng(3)
    sizes = {"a": 5000, "b": 900, "c": 60}
    g_col, v_col = [], []
    for g, n_distinct in sizes.items():
        vals = rng.choice(n_distinct, size=n_distinct * 3)  # repeats too
        g_col.extend([g] * len(vals))
        v_col.extend(int(v) + hash(g) % 1000000 * 10 for v in vals)
    t = pa.table({"g": pa.array(g_col), "v": pa.array(v_col, pa.int64())})

    est4 = grouped_approx_nunique(
        ray.data.from_arrow(t).repartition(4), "g", "v"
    ).to_pandas().set_index("g")["approx_nunique"]
    est9 = grouped_approx_nunique(
        ray.data.from_arrow(t).repartition(9), "g", "v"
    ).to_pandas().set_index("g")["approx_nunique"]

    import pandas as pd

    exact = pd.DataFrame({"g": g_col, "v": v_col}).groupby("g")["v"].nunique()
    for g in sizes:
        assert abs(est4[g] - exact[g]) <= max(0.05 * exact[g], 3), (
            g, est4[g], exact[g]
        )
    # partitioning-independence: identical estimates across block layouts
    assert (est4.sort_index() == est9.sort_index()).all()


def test_hll_md5_mode_matches_sql_mirror_both_branches(ray_session):
    """md5-mode HLL must equal the DuckDB mirror bit-for-bit on BOTH
    estimate branches: linear counting (few distincts) and the alpha
    harmonic path (~100k distincts). The harmonic sum folds as an exact
    integer on both sides, so this is an equality test, not a tolerance."""
    import duckdb
    import numpy as np
    import pandas as pd

    from etl_sql_duckdb_parquet__ray.stages.profile import (
        _hll_estimate,
        _hll_registers,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["lo", "hi"], 200_000),
        "v": rng.integers(0, 90_000, 200_000),
    })
    # force the linear-counting branch for group "lo"
    df.loc[df["g"] == "lo", "v"] = df.loc[df["g"] == "lo", "v"] % 500
    py = {
        g: _hll_estimate(_hll_registers(s["v"].to_numpy(), "md5"))
        for g, s in df.groupby("g")
    }
    con = duckdb.connect()
    con.register("t", df)
    sql = """
        WITH h AS (
          SELECT g, md5_number_lower(CAST(v AS VARCHAR)) AS hv
          FROM t WHERE v IS NOT NULL
        ), r AS (
          SELECT DISTINCT g, CAST(hv >> 52 AS BIGINT) AS reg,
                 CAST(hv & ((1::UBIGINT << 52) - 1) AS BIGINT) AS low
          FROM h
        ), ranks AS (
          SELECT g, reg, MAX(CASE WHEN low = 0 THEN 53
                             ELSE 53 - length(printf('%b', low)) END) AS rnk
          FROM r GROUP BY g, reg
        ), agg AS (
          SELECT g, SUM(CAST(1 AS HUGEINT) << (53 - rnk)) AS s_present,
                 COUNT(*) AS n_present
          FROM ranks GROUP BY g
        ), est AS (
          SELECT g, CAST(s_present + (4096 - n_present)
                         * (CAST(1 AS HUGEINT) << 53) AS DOUBLE) AS s_dbl,
                 4096 - n_present AS zeros
          FROM agg
        )
        SELECT g, CAST(ROUND(
            CASE WHEN (0.7213/(1+1.079/4096.0))*4096*4096
                      *9007199254740992.0 / s_dbl <= 2.5*4096 AND zeros > 0
            THEN 4096 * LN(4096.0 / zeros)
            ELSE (0.7213/(1+1.079/4096.0))*4096*4096
                 *9007199254740992.0 / s_dbl END) AS BIGINT) AS n
        FROM est
    """
    got = dict(con.execute(sql).fetchall())
    assert got == py
    # both branches really exercised, and estimates are sane
    exact = df.groupby("g")["v"].nunique().to_dict()
    assert exact["lo"] <= 2.5 * 4096 < py["hi"]
    for g in exact:
        assert abs(py[g] - exact[g]) / exact[g] < 0.05
