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
pathological hot key serializes onto one task; for that data shape
pass ``bucket_width`` — the join then partitions by (key, coarse time
bucket) and each bucket is seeded with the key's latest right row from
all EARLIER buckets (the streaming pipeline's carry-in pattern), so a
hot key parallelizes across its time range while every match stays
identical (equality with the unbucketed form is property-tested).
Window sorts spill to disk, so per-key group size is bounded by local
disk, not executor memory.

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
_BKT = "_asof_bkt"


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
    bucket_width: float | None = None,
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
    ASOF).  ``bucket_width``: optional hot-key mitigation — partition
    the merge by (key, floor(ts / bucket_width)) and seed each bucket
    with the key's nearest right row from across the boundary; results
    are identical, a hot key's sort parallelizes across its time range.
    Left input columns pass through unchanged; payload columns must not
    collide with them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    dup = set(payload) & set(left.columns)
    if dup:
        raise ValueError(f"payload collides with left columns: {sorted(dup)}")
    backward = direction == "backward"

    # Right frame: payload + its own ts + tiebreak ride in ONE struct
    # (atomic carry; the tiebreak rides along so a carried-in seed row
    # keeps losing to an equal-ts in-bucket winner exactly as the
    # original row would).
    pay_struct = F.struct(
        F.col(right_ts).alias(_TS),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(_TIE),
        *[F.col(c) for c in payload],
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

    # Right (side=0) sorts before left at equal ts in BOTH directions,
    # so the boundary match is inclusive either way.
    ts_ord = F.asc if backward else F.desc
    order = [ts_ord(_TS), F.asc(_SIDE), F.asc(_TIE)]
    part = [_KEY]

    if bucket_width is not None:
        bkt = F.floor(F.col(_TS).cast("double") / F.lit(float(bucket_width))).cast(
            "long"
        )
        lf = lf.withColumn(_BKT, bkt)
        rf = rf.withColumn(_BKT, bkt)
        part = [_KEY, _BKT]

        # Cross-boundary seed per (key, left-bucket): the key's nearest
        # right row from strictly-earlier buckets (later, for forward).
        # Stage 1 — per (key, bucket) winner among right rows: the row
        # the carry would pick at the bucket's boundary.
        w_in = (
            Window.partitionBy(_KEY, _BKT)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        bucket_last = (
            rf.withColumn(_PAY, F.last(_PAY).over(w_in))
            .groupBy(_KEY, _BKT)
            .agg(F.last(_PAY).alias(_PAY))  # all rows now carry the winner
        )
        # Stage 2 — bucket-level carry: for every bucket where LEFT rows
        # exist, the winner from strictly-earlier buckets.  Same union-
        # merge trick one level up, over (key, bucket) aggregates only.
        lb = lf.select(_KEY, _BKT).distinct().withColumn(_SIDE, F.lit(1)).withColumn(
            _PAY, F.lit(None).cast(pay_type)
        )
        rb = bucket_last.withColumn(_SIDE, F.lit(0))
        bkt_ord = F.asc(_BKT) if backward else F.desc(_BKT)
        # left marker sorts BEFORE same-bucket rights -> the carried
        # value comes from STRICTLY earlier buckets only.
        w_bkt = (
            Window.partitionBy(_KEY)
            .orderBy(bkt_ord, F.desc(_SIDE))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        seeds = (
            lb.unionByName(rb)
            .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w_bkt))
            .where((F.col(_SIDE) == 1) & F.col(_PAY).isNotNull())
            .select(
                _KEY,
                F.col(_PAY)[_TS].alias(_TS),
                F.lit(0).alias(_SIDE),
                _PAY,
                F.col(_PAY)[_TIE].alias(_TIE),
                _BKT,
            )
        )
        rf = rf.unionByName(seeds)

    u = lf.unionByName(rf, allowMissingColumns=True)
    w = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))

    if tolerance is not None:
        age = (
            F.col(_TS).cast("double") - F.col(_PAY)[_TS].cast("double")
            if backward
            else F.col(_PAY)[_TS].cast("double") - F.col(_TS).cast("double")
        )
        u = u.withColumn(
            _PAY, F.when(age <= tolerance, F.col(_PAY))
        )

    out = u.where(F.col(_SIDE) == 1).select(
        *left.columns, *[F.col(_PAY)[c].alias(c) for c in payload]
    )
    return out
