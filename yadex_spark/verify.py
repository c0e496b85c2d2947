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


def field_diff(expected: DataFrame, actual: DataFrame, key: str = "doc_id",
               float_tolerance: float | None = None) -> DataFrame:
    """V2: per-field change report for 'changed' keys — one row per
    (key, field) whose value differs, the operational "WHAT changed"
    view of /root/reference/cmd/compare-dbs.go:327-380 (which reports
    per-field diffs, arrays element-wise).

    ``float_tolerance``: floating-point fields compare within ±tol
    (compare-dbs' float tolerance); everything else — including the
    token arrays of the target payload — compares exactly.  Values are
    stringified in the report (arrays comma-joined) so one frame carries
    heterogeneous field types.
    """
    payload = [c for c in expected.columns if c != key]
    d = diff(expected, actual, key).where(F.col("status") == "changed")

    def as_str(side: str, c: str):
        col = F.col(f"{side}.{c}")
        dt = dict(zip(expected.columns, [f.dataType for f in expected.schema.fields]))[c]
        if dt.typeName() == "array":
            return F.array_join(col.cast("array<string>"), ",")
        return col.cast("string")

    def changed(c: str):
        l, r = F.col(f"_l.{c}"), F.col(f"_r.{c}")
        dt = dict(zip(expected.columns, [f.dataType for f in expected.schema.fields]))[c]
        if float_tolerance is not None and dt.typeName() in ("float", "double"):
            # the tolerance test only applies when BOTH sides are
            # non-null: (l - r) with a null side is NULL, and
            # ~(false | NULL) is NULL — a null<->non-null change would
            # silently vanish from the report.  The eqNullSafe term
            # stays inside the both-non-null branch too: NaN<=>NaN is
            # TRUE under Spark's null-safe equality but NaN - NaN is
            # NaN (between() false), so without it equal NaNs (and an
            # exactly-reproduced Inf) would be reported as diffs
            return F.when(
                l.isNotNull() & r.isNotNull(),
                ~(l.eqNullSafe(r) | (l - r).between(-float_tolerance, float_tolerance)),
            ).otherwise(~l.eqNullSafe(r))
        return ~l.eqNullSafe(r)

    per_field = F.array(
        *[
            F.when(
                changed(c),
                F.struct(
                    F.lit(c).alias("field"),
                    as_str("_l", c).alias("expected"),
                    as_str("_r", c).alias("actual"),
                ),
            )
            for c in payload
        ]
    )
    return (
        d.select(key, F.explode(F.filter(per_field, lambda x: x.isNotNull())).alias("f"))
        .select(key, "f.field", "f.expected", "f.actual")
    )


def incremental_diff(expected: DataFrame, tbl, v_from: int,
                     key: str = "doc_id") -> DataFrame:
    """V1 at O(changed keys): re-verify only the keys the lake changed
    since version ``v_from`` (via :meth:`LakeTable.table_changes`),
    against their CURRENT expected values.  The sustained-verify loop
    this enables — full :func:`diff` once, then incremental per epoch —
    is the piece the reference's compare-dbs lacks: it re-reads both
    full tables every run (/root/reference/cmd/compare-dbs.go:268-325).

    Semantics: assumes a clean verify at ``v_from``; source-side-only
    changes (a key the target never applied) are invisible here by
    construction — run the full diff at maintenance cadence to catch
    those.  Returns the same (key, status, _l, _r) frame as
    :func:`diff`, restricted to changed keys; a clean run is all-equal
    rows for upserts and NO row for correctly-applied deletes (the key
    is absent from both sides)."""
    changed = tbl.table_changes(v_from).select(key)
    return diff(
        expected.join(changed, key, "left_semi"),
        tbl.read().join(changed, key, "left_semi"),
        key,
    )


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
