"""Validation rules with quarantine routing — the scalable form of the
reference's ``validate_all`` (``src/etl/validate.py:258-304``) whose
QUARANTINE branch was a TODO (``src/cli.py:75-76``). Here it is real:

- each rule is vectorized Arrow compute inside one ``map_batches`` pass
  that annotates rows with a ``_violations`` CSV string;
- STRICT mode raises on first violation count > 0; QUARANTINE mode splits
  the Dataset into (good, bad) and the caller sinks the bad rows;
- global rules (UNIQUE, FK) use the scalable shapes: groupby-count shuffle
  and broadcast key membership (reference V2 ``duplicated()`` and V8
  driver-built key set, ``validate.py:54-62``, ``239-255``).

Rules are data (name, column, kind, params) — the reference's closed list
(``settings.py:13-45``) becomes a user-extensible registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    kind: str  # not_null | enum | range | not_future | regex-free bool fn
    params: dict[str, Any] = field(default_factory=dict)


def _violation_mask(batch: pa.Table, rule: Rule) -> pa.Array:
    col = batch.column(rule.column)
    if rule.kind == "not_null":
        return pc.is_null(col)
    if rule.kind == "enum":
        ok = pc.is_in(col, value_set=pa.array(rule.params["values"]))
        return pc.fill_null(pc.invert(ok), True)
    if rule.kind == "range":
        lo, hi = rule.params.get("lo"), rule.params.get("hi")
        bad = pa.array([False] * len(batch))
        if lo is not None:
            bad = pc.or_(bad, pc.fill_null(pc.less(col, lo), True))
        if hi is not None:
            bad = pc.or_(bad, pc.fill_null(pc.greater(col, hi), True))
        return bad
    if rule.kind == "not_future":
        limit = rule.params["limit"]  # pa.scalar timestamp or int64 us
        return pc.fill_null(pc.greater(col, limit), False)
    raise ValueError(f"unknown rule kind: {rule.kind}")


def annotate_violations(ds, rules: list[Rule]):
    """One vectorized pass appending a ``_violations`` column (comma-joined
    rule names; empty string = clean row)."""

    def check(batch: pa.Table) -> pa.Table:
        # vectorized accumulate: tags ++ ("," if joining) ++ rule name
        tags = pa.array([""] * batch.num_rows, type=pa.string())
        for rule in rules:
            mask = _violation_mask(batch, rule)
            sep = pc.if_else(
                pc.and_(mask, pc.not_equal(tags, "")), ",", ""
            )
            add = pc.if_else(mask, rule.name, "")
            tags = pc.binary_join_element_wise(tags, sep, add, "")
        return batch.append_column("_violations", tags)

    return ds.map_batches(check, batch_format="pyarrow")


def split_quarantine(ds, rules: list[Rule]):
    """(good, bad) Datasets; bad rows keep the ``_violations`` tag."""
    tagged = annotate_violations(ds, rules)
    good = tagged.map_batches(
        lambda t: t.filter(pc.equal(t.column("_violations"), ""))
        .drop_columns(["_violations"]),
        batch_format="pyarrow",
    )
    bad = tagged.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("_violations"), "")),
        batch_format="pyarrow",
    )
    return good, bad


def violation_counts(ds, rules: list[Rule]) -> dict[str, int]:
    """Per-rule violation totals: per-batch partial counts, exact int sums
    (the aggregate form of the reference's row-addressed error list)."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = {}
        for rule in rules:
            m = _violation_mask(batch, rule)
            cols[rule.name] = pa.array(
                [int(pc.sum(m.cast(pa.int64())).as_py() or 0)], type=pa.int64()
            )
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow").sum([r.name for r in rules])
    if agg is None:  # empty dataset
        return {r.name: 0 for r in rules}
    return {r.name: int(agg[f"sum({r.name})"]) for r in rules}


def duplicate_keys(ds, key: str):
    """UNIQUE rule at scale: keys appearing more than once (groupby-count
    shuffle, reference V2)."""
    counts = ds.groupby(key).count()
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1)).select([key]),
        batch_format="pyarrow",
    )


def fk_orphans(ds, column: str, valid_keys: pa.Array):
    """FK rule: rows whose key is missing from the broadcast dim key set
    (reference V8); returns the violating rows."""
    from .relational import broadcast_semi

    return broadcast_semi(ds, valid_keys, column, anti=True)


def validate(ds, rules: list[Rule], mode: str = "strict", quarantine_path: str | None = None):
    """Orchestration (reference ``validate_all``): STRICT raises with the
    count summary; QUARANTINE writes bad rows to a parquet sink and returns
    the clean Dataset plus the summary."""
    counts = violation_counts(ds, rules)
    total = sum(counts.values())
    if mode == "strict":
        if total:
            raise ValueError(f"validation failed: {counts}")
        return ds, counts
    good, bad = split_quarantine(ds, rules)
    if total and quarantine_path:
        bad.write_parquet(quarantine_path)
    return good, counts
