"""Ordered conversion funnel over an event stream.

The product-analytics staple: of the users who did stage 1, how many
went on to stage 2 AFTER it, then stage 3 after that.  The strict-
order rule (stage i counts only strictly after the key's stage-(i-1)
completion) is what makes it a sequence query rather than a set
intersection — and what tempts row-by-row implementations.

Declarative form: stage i's completion time per key is
``min(ts of a stage-i event with ts > t_{i-1})`` — one filtered scan,
one key-co-partitioned join against the (key, t_{i-1}) relation, one
partial min-aggregate, per stage.  All joins share the key, so at
scale they run over one partitioning; the per-stage relations are
#keys rows (AQE broadcasts them when small).  No window over a key's
full event list, no array collection, no per-row state.

A key that never completed stage i has NULL t_i, and the strict filter
``ts > NULL`` is false, so later stages are automatically NULL too —
the funnel's monotone-dropoff invariant holds by construction
(test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """One row per distinct key: ``t_<stage>`` = the key's earliest
    completion of each stage strictly after its previous-stage
    completion (NULL once any stage is missed).  Stage names must be
    distinct and column-name-safe."""
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct")
    out = events.select(F.col(key_col).alias("_k")).distinct()
    prev = None
    for st in stages:
        ev = events.where(F.col(type_col) == st).select(
            F.col(key_col).alias("_k"), F.col(ts_col).alias("_t")
        )
        if prev is not None:
            ev = (
                ev.join(out.select("_k", prev), "_k")
                .where(F.col("_t") > F.col(prev))
                .select("_k", "_t")
            )
        stage_ts = ev.groupBy("_k").agg(F.min("_t").alias(f"t_{st}"))
        out = out.join(stage_ts, "_k", "left")
        prev = f"t_{st}"
    return out.withColumnRenamed("_k", key_col)


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period, counted distinct in every later period they return.

    Output: one row per (cohort, offset_p) with ``n_users`` — offset 0
    is the cohort size, so rates are a trivial self-join away.  Periods
    are exact integer day-buckets from the 1970-01-01 epoch
    (``datediff DIV period_days`` — no timezone/float hazards, and the
    DuckDB oracle replays the same arithmetic with ``//``).

    Scale shape (100 TB of events):

    - the raw stream reduces IMMEDIATELY to distinct (user, period) —
      a partial-agg'd distinct whose output is bounded by
      users x periods, orders of magnitude below the event count;
    - per-user first period is a second partial agg over that reduced
      relation, and the join-back shares the user key (SMJ/AQE picks);
    - the final (cohort, offset) count-distinct runs over the same
      reduced relation.  No window ever sees a user's full event list,
      so a hot user costs exactly its distinct periods.
    """
    period = (
        F.expr(
            f"CAST(datediff(to_date({ts_col}), DATE '1970-01-01') "
            f"DIV {int(period_days)} AS BIGINT)"
        )
    ).alias("p")
    act = events.select(F.col(user_col).alias("_u"), period).distinct()
    first = act.groupBy("_u").agg(F.min("p").alias("p0"))
    return (
        act.join(first, "_u")
        .groupBy(
            F.col("p0").alias("cohort"),
            (F.col("p") - F.col("p0")).alias("offset_p"),
        )
        .agg(F.count_distinct("_u").alias("n_users"))
    )
