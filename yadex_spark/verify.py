"""Offline diff verifier (SURVEY.md V1/V2/V3).

The Spark re-expression of /root/reference/cmd/compare-dbs.go: instead
of a two-pointer sorted-merge over two Mongo cursors (:268-325), a
full-outer join on doc_id classifies every key as added / removed /
changed / equal; field-level diff (:327-380) specializes to the target
payload's invariant — exact token-array equality (BASELINE.json
input_hint) — so no float tolerance is needed.  Parallelism (V3's
NumCPU worker pool) is free: the join is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff(expected: DataFrame, actual: DataFrame, key: str = "doc_id") -> DataFrame:
    """Row-level diff: one row per key present on either side, with a
    ``status`` ∈ {equal, changed, added, removed} (added = only in
    ``actual``, removed = missing from ``actual``)."""
    payload = [c for c in expected.columns if c != key]
    missing = [c for c in payload if c not in actual.columns]
    if missing:
        raise ValueError(f"actual is missing columns {missing}")
    l = expected.select(key, F.struct(*payload).alias("_l"))
    r = actual.select(key, F.struct(*payload).alias("_r"))
    j = l.join(r, key, "full_outer")
    status = (
        F.when(F.col("_l").isNull(), F.lit("added"))
        .when(F.col("_r").isNull(), F.lit("removed"))
        .when(F.col("_l").eqNullSafe(F.col("_r")), F.lit("equal"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key, status.alias("status"), "_l", "_r")


def diff_counts(expected: DataFrame, actual: DataFrame, key: str = "doc_id") -> dict:
    """{'equal': n, 'changed': n, 'added': n, 'removed': n} — the
    verifier's summary line (compare-dbs' Added/Removed/Changed totals)."""
    rows = diff(expected, actual, key).groupBy("status").count().collect()
    out = {"equal": 0, "changed": 0, "added": 0, "removed": 0}
    for r in rows:
        out[r["status"]] = r["count"]
    return out


def assert_equal_state(expected: DataFrame, actual: DataFrame, key: str = "doc_id") -> None:
    counts = diff_counts(expected, actual, key)
    bad = {k: v for k, v in counts.items() if k != "equal" and v}
    assert not bad, f"state mismatch: {counts}"
