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
