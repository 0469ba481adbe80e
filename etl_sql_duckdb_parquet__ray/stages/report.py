"""Report writers — the Ray-Data-native analog of the reference's reporting
module (``src/reporting.py:12-343``: HTML + Markdown pipeline/quality
reports) and history export (``src/history.py:209-227``).

Division of labor: everything DISTRIBUTED happens upstream
(:func:`build_report` drives ``profile_dataset`` / ``duplicate_row_count`` /
``quality_score`` — streaming partial aggregates, never a driver collect);
the writers here only format the resulting small dict. Reports are
driver-side artifacts by definition (a few KB of summary), so string
templating on the driver is the right shape even at 100 TB.
"""

from __future__ import annotations

import html as _html
import json
import os
from datetime import datetime, timezone
from typing import Any

from .profile import duplicate_row_count, profile_dataset, quality_score


def build_report(
    ds,
    key_columns: list[str] | None = None,
    columns: list[str] | None = None,
    pipeline_results: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Compute the report payload with distributed passes: per-column
    profile (nulls, min/max/mean, HLL nunique), duplicate count over
    ``key_columns`` (default: all columns), 0-100 quality score. The
    returned dict is tiny (one entry per column) and feeds the writers."""
    prof = profile_dataset(ds, columns)
    dup = duplicate_row_count(ds, key_columns or list(prof["columns"]))
    score = quality_score(prof, dup_count=dup)
    rows = prof["rows"]
    cols = prof["columns"]
    total_cells = rows * max(len(cols), 1)
    missing = sum(c["nulls"] for c in cols.values())
    return {
        "pipeline": dict(pipeline_results or {}),
        "quality_score": score,
        "total_rows": rows,
        "total_columns": len(cols),
        "missing_cells": missing,
        "total_cells": total_cells,
        "completeness_pct": 100.0 * (1 - missing / total_cells) if total_cells else 100.0,
        "duplicate_rows": dup,
        "columns": {
            name: {
                "missing": c["nulls"],
                "completeness_pct": 100.0 * (1 - c["null_rate"]),
                "unique": c.get("nunique_approx"),
                "min": c.get("min"),
                "max": c.get("max"),
                "mean": c.get("mean"),
            }
            for name, c in cols.items()
        },
    }


def _ts() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC")


def _fmt(v: Any) -> str:
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def write_markdown_report(report: dict[str, Any], output_path: str) -> str:
    """Markdown report (reference ``src/reporting.py:273-343``): executive
    summary, per-column quality table, recommendations."""
    lines = [
        "# Data Pipeline Report",
        "",
        f"**Generated**: {_ts()}",
        "",
        "## Executive summary",
        "",
    ]
    for k, v in report.get("pipeline", {}).items():
        lines.append(f"- **{k}**: {_fmt(v)}")
    lines += [
        f"- **Quality score**: {report['quality_score']:.1f}%",
        f"- **Rows**: {report['total_rows']}",
        f"- **Columns**: {report['total_columns']}",
        f"- **Missing cells**: {report['missing_cells']} "
        f"({100 - report['completeness_pct']:.2f}%)",
        f"- **Duplicate rows**: {report['duplicate_rows']}",
        "",
        "## Column quality",
        "",
        "| Column | Completeness | Missing | Unique (approx) | Min | Max | Mean |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, c in report["columns"].items():
        lines.append(
            f"| {name} | {c['completeness_pct']:.1f}% | {c['missing']} "
            f"| {_fmt(c['unique'])} | {_fmt(c['min'])} | {_fmt(c['max'])} "
            f"| {_fmt(c['mean'])} |"
        )
    lines += [
        "",
        "## Recommendations",
        "",
        "1. Monitor columns with <95% completeness",
        "2. Review and handle duplicate rows",
        "3. Investigate outliers in numeric columns (see `flag_outliers_*`)",
        "4. Validate schema constraints with `stages.validate` rules",
        "",
    ]
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        f.write("\n".join(lines))
    return output_path


def write_html_report(report: dict[str, Any], output_path: str) -> str:
    """Self-contained HTML report (reference ``src/reporting.py:12-270``):
    same content as the Markdown writer, no external assets."""
    e = _html.escape
    rows_html = "".join(
        f"<tr><td>{e(name)}</td><td>{c['completeness_pct']:.1f}%</td>"
        f"<td>{c['missing']}</td><td>{e(_fmt(c['unique']))}</td>"
        f"<td>{e(_fmt(c['min']))}</td><td>{e(_fmt(c['max']))}</td>"
        f"<td>{e(_fmt(c['mean']))}</td></tr>"
        for name, c in report["columns"].items()
    )
    pipe_html = "".join(
        f"<li><b>{e(str(k))}</b>: {e(_fmt(v))}</li>"
        for k, v in report.get("pipeline", {}).items()
    )
    doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Data Pipeline Report</title>
<style>
body {{ font-family: sans-serif; max-width: 960px; margin: 2em auto; color: #222; }}
table {{ border-collapse: collapse; width: 100%; }}
th, td {{ border: 1px solid #ccc; padding: 6px 10px; text-align: left; }}
th {{ background: #f0f0f5; }}
.score {{ font-size: 2em; font-weight: bold; }}
</style></head><body>
<h1>Data Pipeline Report</h1>
<p>Generated: {e(_ts())}</p>
<h2>Executive summary</h2>
<p class="score">Quality score: {report['quality_score']:.1f}%</p>
<ul>{pipe_html}
<li><b>Rows</b>: {report['total_rows']}</li>
<li><b>Columns</b>: {report['total_columns']}</li>
<li><b>Missing cells</b>: {report['missing_cells']}
 ({100 - report['completeness_pct']:.2f}%)</li>
<li><b>Duplicate rows</b>: {report['duplicate_rows']}</li>
</ul>
<h2>Column quality</h2>
<table><tr><th>Column</th><th>Completeness</th><th>Missing</th>
<th>Unique (approx)</th><th>Min</th><th>Max</th><th>Mean</th></tr>
{rows_html}</table>
</body></html>"""
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        f.write(doc)
    return output_path


def export_history(out_dir: str, output_path: str) -> str:
    """Export an encode run's lineage to JSON (reference
    ``src/history.py:209-227``): per-bucket manifest records plus the
    aggregate stats the manifest module computes."""
    from ..state.manifest import load_manifest, manifest_stats

    payload = {
        "exported_at": datetime.now(timezone.utc).isoformat(),
        "statistics": manifest_stats(out_dir),
        "runs": load_manifest(out_dir),
    }
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    return output_path
