"""Binned range join: points joined into intervals that contain them.

Spark executes ``p.val BETWEEN i.lo AND i.hi`` (no equi-key) as
BroadcastNestedLoopJoin — O(|P| x |I|) compares — because Catalyst has
no native interval-overlap strategy (Databricks' range-join hint does
exactly what this module does).  The standard fix is binning: quantize
the value domain into width-W bins, explode each interval over the
bins it touches, map each point to its one bin, equi-join on the bin
id, then re-check the exact predicate.  Cost: one shuffle of
|P| + |I| * (avg_span/W + 1) rows — linear, AQE-skew-splittable —
instead of the nested-loop cartesian.

Bin safety: floor(x / W) is monotone non-decreasing in x under IEEE
round-to-nearest (division by a positive constant is monotone, floor
is monotone), so lo <= p <= hi implies bin(lo) <= bin(p) <= bin(hi) —
a contained point can never land outside its interval's exploded bin
range; the exact predicate then removes same-bin non-matches.

Choosing W: ~ the typical interval span.  Too small explodes the
interval side (rows = span/W per interval); too large packs many
intervals per bin (join amplification before the exact filter).  Both
failure modes are load-linear, never O(n^2); a pathological > max_bins
span fails loudly instead of silently exploding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_range_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins: int = 4096,
) -> DataFrame:
    """Inner join of each point row onto every interval row with
    ``lo_col <= point_col <= hi_col``.  Output columns = points' then
    intervals'; the two column sets must be disjoint.  ``bin_width``
    is the quantization W (see module docstring); an interval spanning
    more than ``max_bins`` bins raises at execution time (pick a larger
    W) rather than exploding the job.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"point/interval columns collide: {sorted(dup)}")

    pb = points.withColumn(
        _BIN, F.floor(F.col(point_col) / F.lit(float(bin_width))).cast("long")
    )
    lo_bin = F.floor(F.col(lo_col) / F.lit(float(bin_width))).cast("long")
    hi_bin = F.floor(F.col(hi_col) / F.lit(float(bin_width))).cast("long")
    guarded_hi = F.when(
        hi_bin - lo_bin < max_bins, hi_bin
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"range_join: interval spans >= {max_bins} bins at W={bin_width}: ["),
                F.col(lo_col).cast("string"), F.lit(", "),
                F.col(hi_col).cast("string"), F.lit("]"),
            )
        ).cast("long")
    )
    ib = (
        intervals.where(F.col(lo_col) <= F.col(hi_col))
        .withColumn(_BIN, F.explode(F.sequence(lo_bin, guarded_hi)))
    )
    return (
        pb.join(ib, _BIN)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop(_BIN)
    )
