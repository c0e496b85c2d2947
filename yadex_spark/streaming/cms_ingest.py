"""Streaming frequency-sketch-on-ingest: a corpus-wide count-min
sketch maintained AS THE LAKE FILLS, exactly-once under crash replay.

The ninth ingest-family member, completing the sketch pair: KMV ingest
(``kmv_ingest.py``) answers "how many distinct values so far", this
answers "how often has value X occurred so far" in O(depth*width)
state no matter how much data has streamed past — the bounded-memory
token/url/id frequency view every corpus dashboard wants next to its
cardinality panel.

CMS is LINEAR in the data (``operators/sketch.py:cms_merge``), so each
epoch commits its batch's (r, cell, cnt) cell rows as a delta and the
read folds partials with one partial hash agg — the same additive
composition rule as ``stats_ingest``, applied to a sketch instead of
named counters.  The exactly-once story is the INVERSE of KMV's and is
test-pinned as such: a KMV sketch is multiplicity-blind (double-ingest
cannot inflate it even in principle), while CMS counts multiplicity —
so here the scoped batch id is LOAD-BEARING, not merely an
optimization: a crash-replayed epoch MUST no-op at the commit layer or
every replay would double the affected cells (m30 pins both the no-op
and, by forced double-commit, the inflation it prevents).

Per epoch:

1. ``cms_sketch`` over the BATCH only — one explode (x depth), ONE
   partial hash agg, <= depth*width result rows;
2. commit the per-(epoch, r, cell) rows under the epoch's scoped batch
   id (replays no-op).

``sketch()`` folds #epochs x depth*width partial rows (model-sized,
never the corpus) into the current sketch; ``estimate(probes)`` reads
it with ``cms_estimate``.  ``maintain()`` compacts the partials under
the shared lease.  Deletes are non-retractable here too — retraction
would need signed counts, which plain cell adds support in principle
(commit negative cnt rows); the lake's delete events carry no payload
to hash, so a delete-heavy corpus re-bootstraps like KMV does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadex_spark.streaming.dedup_ingest import DedupIngest
from yadex_spark.streaming.stats_ingest import STATS_FEED_SCHEMA

#: sketch() output schema (identical to operators.sketch.cms_sketch)
CMS_SCHEMA = "r string, cell long, cnt long"


@dataclass
class CmsIngest(DedupIngest):
    REGISTRY_DIR = "_cms_partials"
    FEED_SCHEMA = STATS_FEED_SCHEMA

    depth: int = 3
    width: int = 2048

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from yadex_spark.operators.sketch import cms_sketch

        scope = self._scope()
        batch_id = f"{scope}/cms-e{epoch_id}"
        if batch_id in self.seen.committed_batch_ids():
            return  # crash-replayed epoch: LOAD-BEARING for CMS (see module doc)
        words = batch.select(
            F.explode(F.split(F.col("text"), " ")).alias("w")
        ).where(F.col("w") != "")
        sk = cms_sketch(words, "w", depth=self.depth, width=self.width)
        delta = sk.select(
            F.concat(
                F.lit(f"e{epoch_id}|"), F.col("r"), F.lit("|"),
                F.col("cell").cast("string"),
            ).alias("doc_id"),
            F.lit("insert").alias("op"),
            F.lit(epoch_id).cast("long").alias("op_seq"),
            F.struct("r", "cell", "cnt").alias("after"),
        )
        self.seen.commit_delta(delta, batch_id=batch_id)

    def sketch(self) -> DataFrame:
        """The corpus sketch so far: fold the per-epoch partial cells
        with one partial hash agg (additivity law; equals the batch
        ``cms_sketch`` over everything ingested — test-pinned).
        Typed-empty before any epoch."""
        if not self.seen.snapshots():
            return self.spark.createDataFrame([], CMS_SCHEMA)
        partials = self.seen.read_keys("r", "cell", "cnt")
        return partials.groupBy("r", "cell").agg(F.sum("cnt").alias("cnt"))

    def estimate(self, probes: DataFrame, value_col: str = "w") -> DataFrame:
        """Estimated occurrence count so far for each probe value."""
        from yadex_spark.operators.sketch import cms_estimate

        return cms_estimate(
            self.sketch(), probes, value_col, self.depth, self.width
        )

    def maintain(self, minor: bool = False) -> dict:
        """Compact + vacuum the partials table under the shared
        nonce-confirmed maintenance lease (partials grow by <=
        depth*width rows per epoch; the folded answer is unchanged)."""
        from yadex_spark.lake.lease import maintenance_lease

        with maintenance_lease(self.lake_dir):
            v = self.seen.compact_minor() if minor else self.seen.compact()
            removed = self.seen.vacuum() if (not minor or v is not None) else []
        return {"cms": {("minicompacted_version" if minor
                        else "compacted_version"): v,
                        "data_dirs_removed": len(removed)}}
