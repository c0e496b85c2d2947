"""As-of (nearest-timestamp) join — the classic trade/quote operator.

Spark has no ASOF JOIN (DuckDB, Pandas and kdb do); the naive rewrite
is a key-equal inequality join (``l.key = r.key AND l.ts >= r.ts``)
plus an argmax, which Catalyst executes as a per-key cartesian — at
web scale (every event joined against every prior order of the same
key) that is O(|L| x |R|) per key and unusable.

This implementation is the scalable union-merge form:

1. tag left rows side=1, right rows side=0, project both onto a
   shared (key, ts, side, right-payload STRUCT) frame;
2. ONE shuffle+sort per key, ordering (ts, side, tiebreak) —
   rows_between(unbounded preceding, current) with
   ``last(payload, ignorenulls)`` carries the most recent right
   struct forward into each left row (right sorts before left at
   equal ts, so the match is INCLUSIVE, matching DuckDB ASOF ``>=``);
3. keep side=1 rows and unpack the struct.

Cost: one exchange + sort of |L| + |R| rows total — the same plan
shape as a sort-merge join, and it spills like one.  The payload is
carried as a single STRUCT, not per-column ``last()``s, so a right
row whose payload contains legitimate NULLs can never tear (column-
wise carry would skip the NULL back to an older row's value).

Scale notes (100 TB): partitioning is by join key only, so one
pathological hot key serializes onto one task; if that is the data
shape, pre-bucket the key by coarse time range and run the join per
bucket with the previous bucket's last-known payload unioned in as a
seed row (the streaming pipeline's carry-in pattern).  Window sorts
spill to disk, so per-key group size is bounded by local disk, not
executor memory.

Reference parity: the reference engine (okharch/yadex) has no as-of
join; this is part of the beyond-reference training-data/analytics
suite (events-to-dimension-state attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_KEY = "_asof_key"
_TS = "_asof_ts"
_PAY = "_asof_pay"
_TIE = "_asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance=None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: each left row gets the payload of the right row
    with the same key and the greatest ``right_ts`` <= ``left_ts``
    (``direction="backward"``; ``"forward"`` = least right_ts >=
    left_ts).  Unmatched left rows keep NULL payload (left-outer).

    ``payload``: right columns to attach.  ``tolerance``: optional max
    age as a Column/interval expression in the ts column's arithmetic
    domain (seconds for timestamps); matches older than it are nulled.
    ``tiebreak``: right column ordering equal-(key, ts) right rows —
    the LAST one in that order wins; without it, equal-(key, ts) right
    rows make the match nondeterministic (same contract as DuckDB
    ASOF).  Left input columns pass through unchanged; payload columns
    must not collide with them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    dup = set(payload) & set(left.columns)
    if dup:
        raise ValueError(f"payload collides with left columns: {sorted(dup)}")

    # Right frame: payload + its own ts ride in ONE struct (atomic carry).
    pay_struct = F.struct(
        F.col(right_ts).alias(_TS), *[F.col(c) for c in payload]
    )
    rf = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        pay_struct.alias(_PAY),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TIE),
    )
    pay_type = rf.schema[_PAY].dataType
    lf = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(pay_type).alias(_PAY),
        F.lit(0).alias(_TIE),
        *[F.col(c) for c in left.columns],
    )
    u = lf.unionByName(rf, allowMissingColumns=True)

    # Right (side=0) sorts before left at equal ts in BOTH directions,
    # so the boundary match is inclusive either way.
    if direction == "backward":
        order = [F.asc(_TS), F.asc(_SIDE), F.asc(_TIE)]
    else:
        order = [F.desc(_TS), F.asc(_SIDE), F.asc(_TIE)]
    w = (
        Window.partitionBy(_KEY)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))

    if tolerance is not None:
        age = (
            F.col(_TS).cast("double") - F.col(_PAY)[_TS].cast("double")
            if direction == "backward"
            else F.col(_PAY)[_TS].cast("double") - F.col(_TS).cast("double")
        )
        u = u.withColumn(
            _PAY, F.when(age <= tolerance, F.col(_PAY))
        )

    out = u.where(F.col(_SIDE) == 1).select(
        *left.columns, *[F.col(_PAY)[c].alias(c) for c in payload]
    )
    return out
