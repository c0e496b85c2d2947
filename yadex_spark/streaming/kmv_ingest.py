"""Streaming distinct-count-on-ingest: per-source distinct-word
cardinality AS THE LAKE FILLS, exactly-once under crash replay.

The eighth ingest-family member, pairing ``stats_ingest`` (additive
composition counters) with the NON-additive statistic every corpus
dashboard also wants: how many distinct values (words, urls, ids) per
source.  A sum survives crash replay with per-epoch partials; a
distinct count cannot be stored as a number at all (distinct is not
additive across epochs) — but its KMV SKETCH is: the k minimum hashes
of a union are the re-top-k of the per-part minima
(``operators/sketch.py``), so each epoch commits its batch's per-source
sketch STATE and the read folds states, never data.

KMV gives this member a property the counters had to earn with scoped
batch ids: the sketch is a SET of hashes, so double-ingest of the same
data cannot inflate it even in principle (min-k of a multiset ignores
multiplicity).  The batch-id skip is still kept — it makes replay free,
not merely harmless.

Per epoch:

1. one partial agg + k-bounded shard windows over the BATCH only
   (``kmv_state``: O(batch) work, #sources result rows, each an
   <= k-element bigint array);
2. commit the per-(epoch, source) state rows under the epoch's scoped
   batch id (replays no-op; the LWW key makes concurrent replays
   idempotent).

``distinct()`` explodes the #epochs x #sources x k partial hashes
(model-sized, never the corpus), distincts, re-top-ks per source, and
reads the estimate with ``kmv_estimate`` — by the union law the answer
equals the batch ``distinct_kmv`` over everything ingested so far
(test-pinned).  ``maintain()`` compacts the partials under the shared
lease.  Deletes are non-retractable from any KMV sketch (standard
limitation, documented at ``kmv_state``): a delete-heavy lake
re-bootstraps from the batch operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yadex_spark.streaming.dedup_ingest import DedupIngest
from yadex_spark.streaming.stats_ingest import STATS_FEED_SCHEMA

#: distinct() output schema (identical to operators.sketch.distinct_kmv)
KMV_SCHEMA = "source string, n_kept long, kth_hash long, est_distinct long"


@dataclass
class KmvIngest(DedupIngest):
    REGISTRY_DIR = "_kmv_partials"
    FEED_SCHEMA = STATS_FEED_SCHEMA

    k: int = 64

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from yadex_spark.operators.sketch import kmv_state

        scope = self._scope()
        batch_id = f"{scope}/kmv-e{epoch_id}"
        if batch_id in self.seen.committed_batch_ids():
            return  # crash-replayed epoch: state already committed
        words = batch.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("w")
        ).where(F.col("w") != "")
        state = kmv_state(words, "source", F.col("w"), k=self.k)
        delta = state.select(
            F.concat(F.lit(f"e{epoch_id}|"), F.col("source")).alias("doc_id"),
            F.lit("insert").alias("op"),
            F.lit(epoch_id).cast("long").alias("op_seq"),
            F.struct("source", "hs").alias("after"),
        )
        self.seen.commit_delta(delta, batch_id=batch_id)

    def distinct(self) -> DataFrame:
        """Accumulated per-source distinct-word estimate — the batch
        ``distinct_kmv`` answer for everything ingested so far, from
        #epochs x #sources x k partial hashes (never the corpus);
        typed-empty before any epoch."""
        from yadex_spark.operators.sketch import kmv_estimate

        if not self.seen.snapshots():
            return self.spark.createDataFrame([], KMV_SCHEMA)
        partials = self.seen.read_keys("source", "hs")
        h = partials.select(
            "source", F.explode("hs").alias("h")
        ).distinct()
        # single per-source window is fine HERE: input is the
        # model-sized partials union, not corpus rows
        w = Window.partitionBy("source").orderBy(F.asc("h"))
        state = (
            h.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= self.k)
            .groupBy("source")
            .agg(F.array_sort(F.collect_list("h")).alias("hs"))
        )
        return kmv_estimate(state, "source", k=self.k)

    def maintain(self, minor: bool = False) -> dict:
        """Compact + vacuum the partials table under the shared
        nonce-confirmed maintenance lease (the partials grow by
        #sources rows per epoch forever; the answer is unchanged)."""
        from yadex_spark.lake.lease import maintenance_lease

        with maintenance_lease(self.lake_dir):
            v = self.seen.compact_minor() if minor else self.seen.compact()
            removed = self.seen.vacuum() if (not minor or v is not None) else []
        return {"kmv": {("minicompacted_version" if minor
                        else "compacted_version"): v,
                        "data_dirs_removed": len(removed)}}
