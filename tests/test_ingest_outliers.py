"""CSV ingest with sniffing + audit stamping (reference S1/S2/M6/M7) and
outlier flagging (V11)."""

import numpy as np
import pandas as pd
import pytest

from etl_sql_duckdb_parquet__ray.sources.ingest import (
    add_audit_columns,
    detect_separator,
    ingest_file,
)
from etl_sql_duckdb_parquet__ray.stages.profile import (
    flag_outliers_iqr,
    flag_outliers_zscore,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "samples.csv"
    p.write_text("Sample_ID ,platform\n s1 ,ILLUMINA\ns2,NANOPORE\n")
    return str(p)


@pytest.fixture()
def tsv_file(tmp_path):
    p = tmp_path / "runs.tsv"
    p.write_text("run_id\tsample_id\nr1\ts1\nr2\ts2\n")
    return str(p)


def test_detect_separator(csv_file, tsv_file):
    assert detect_separator(csv_file) == ","
    assert detect_separator(tsv_file) == "\t"


def test_ingest_file_stamps_and_normalizes(ray_session, csv_file):
    df = ingest_file(csv_file, ingested_at="2026-08-17T00:00:00").to_pandas()
    assert list(df.columns) == [
        "sample_id ", "platform", "ingested_at", "source_file", "row_hash",
    ] or "sample_id" in df.columns[0]
    assert (df["source_file"] == "samples.csv").all()
    assert (df["ingested_at"] == "2026-08-17T00:00:00").all()
    assert df["row_hash"].str.len().eq(16).all()
    # deterministic: same file, same hashes (compare as sorted sets — Ray
    # guarantees no block/row ORDER across runs, only content)
    df2 = ingest_file(csv_file, ingested_at="2026-08-17T00:00:00").to_pandas()
    assert sorted(df["row_hash"]) == sorted(df2["row_hash"])


def test_ingest_tsv_all_string(ray_session, tsv_file):
    df = ingest_file(tsv_file, ingested_at="t").to_pandas()
    assert sorted(df["run_id"]) == ["r1", "r2"]
    assert df["sample_id"].dtype == object


def test_outlier_flagging(ray_session):
    import ray

    rng = np.random.default_rng(0)
    vals = np.round(rng.normal(50, 5, 2000), 2)
    vals[:3] = [200.0, -100.0, 199.99]  # planted outliers
    ds = ray.data.from_pandas(pd.DataFrame({"id": np.arange(2000), "value": vals}))
    z = flag_outliers_zscore(ds, "value", threshold=3.0).to_pandas()
    assert {0, 1, 2} <= set(z["id"])
    assert len(z) < 50
    iqr = flag_outliers_iqr(ds, "value", k=1.5).to_pandas()
    assert {0, 1, 2} <= set(iqr["id"])


def test_normalize_transforms(ray_session):
    import pyarrow as pa
    import ray

    from etl_sql_duckdb_parquet__ray.stages.normalize import normalize_dataset

    t = pa.table(
        {
            "name": [" alice ", "NA", "null", "Bob", ""],
            "reads": [" 42 ", "x", "7", None, "3.9"],
            "rate": ["0.5", "bad", " 1.25", "2", None],
            "day": ["2024-01-02", "junk", " 2023-12-31", None, "2024-6-1"],
            "flag": ["TRUE", "0", " yes ", "no", None],
        }
    )
    spec = {
        "name": {"kind": "string", "upper": True},
        "reads": {"kind": "int64"},
        "rate": {"kind": "float64"},
        "day": {"kind": "date"},
        "flag": {"kind": "bool"},
    }
    out = normalize_dataset(ray.data.from_arrow(t), spec).to_pandas()
    assert list(out["name"]) == ["ALICE", None, None, "BOB", None]
    assert out["reads"].tolist()[0] == 42 and out["reads"].tolist()[2] == 7
    assert out["reads"].isna().tolist() == [False, True, False, True, False]
    assert out["rate"].tolist()[2] == 1.25
    assert str(out["day"].tolist()[0]) == "2024-01-02"
    assert out["day"].isna().tolist()[1]
    assert out["flag"].tolist()[:4] == [True, False, True, False]
    assert out["flag"].isna().tolist()[4]


def test_numeric_correlation_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.stages.profile import numeric_correlation

    rng = np.random.default_rng(5)
    x = np.round(rng.normal(10, 2, 3000), 2)
    y = np.round(0.5 * x + rng.normal(0, 1, 3000), 2)
    z = np.round(rng.normal(0, 1, 3000), 2)
    df = pd.DataFrame({"x": x, "y": y, "z": z})
    got = numeric_correlation(ray.data.from_pandas(df), ["x", "y", "z"])
    exp = np.corrcoef(np.stack([np.round(x*100), np.round(y*100), np.round(z*100)]))
    assert abs(got[("x", "y")] - exp[0, 1]) < 1e-9
    assert abs(got[("x", "z")] - exp[0, 2]) < 1e-9
    assert got[("x", "y")] > 0.5 and abs(got[("x", "z")]) < 0.1


def test_read_jsonl_normalizes_and_roundtrips(ray_session, tmp_path):
    """JSONL source: sharded NDJSON reads back value-identical (unicode,
    embedded newlines escaped by JSON, nulls), with column names
    lowercased/stripped like the CSV path."""
    import json as _json

    import pandas as pd
    import ray

    from etl_sql_duckdb_parquet__ray.sources.ingest import read_jsonl

    rows = [
        {"Doc_ID ": 1, "Text": "line1\nline2", "N": 3},
        {"Doc_ID ": 2, "Text": "日本語 ご飯", "N": None},
        {"Doc_ID ": 3, "Text": "", "N": 0},
    ]
    p1 = tmp_path / "a.jsonl"
    p2 = tmp_path / "b.jsonl"
    p1.write_text("\n".join(_json.dumps(r) for r in rows[:2]) + "\n")
    p2.write_text(_json.dumps(rows[2]) + "\n")
    ds = read_jsonl([str(p1), str(p2)])
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text", "n"]
    assert got["text"].tolist() == ["line1\nline2", "日本語 ご飯", ""]
    assert pd.isna(got["n"].iloc[1]) and got["n"].iloc[2] == 0

    # projection arm
    sel = read_jsonl([str(p1)], columns=["doc_id"]).to_pandas()
    assert list(sel.columns) == ["doc_id"]
