"""Streaming dedup-on-ingest: exact dedup of documents AS THEY ARRIVE.

The composition a training-data lake actually runs: the CDC micro-batch
machinery (checkpointed feed, exactly-once commits, crash replay) around
the dedup suite's content hashing.  Each epoch:

1. hash the batch's documents (md5 of text — the exact-dedup key),
2. collapse the batch to its FIRST arrival per hash (min ingest_seq —
   the dedup analogue of the CDC LWW collapse, with first-wins instead
   of last-wins),
3. anti-join against the persistent seen-hash table (the initial-clone
   existing-key anti-join, /root/reference/msync/syncst.go:11-28,
   applied to content hashes), and
4. commit the newly-seen hashes to the seen table + append the accepted
   documents — both idempotent by scoped batch id, so a crash-replayed
   epoch cannot double-accept.

First-arrival-wins holds across epochs by construction: an epoch only
accepts hashes absent from the seen table, and epochs apply in feed
order.

Scale notes (10^9+ docs): the anti-join's right side is the seen table
— Catalyst broadcasts it while small and falls back to a shuffled join;
the seen table stores ONLY (hash, canonical doc, seq) (~50 B/doc, 50 GB
at 10^9 — a join, not a problem).  Production on Iceberg swaps step 3+4
for one MERGE ... WHEN NOT MATCHED INSERT (same plan shape) and can
bolt a Bloom-filter pre-filter in front to skip the join for
definitely-new hashes; the per-epoch cost is O(batch + matched state),
never O(corpus) rewrite.  Maintenance (compaction of the seen table)
runs out-of-band exactly like the CDC lake's.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yadex_spark.lake.table import LakeTable

#: feed schema: arrival order + document
INGEST_SCHEMA = "ingest_seq long, doc_id string, text string"


@dataclass
class DedupIngest:
    spark: SparkSession
    feed_dir: str        # parquet dir of INGEST_SCHEMA chunks
    lake_dir: str        # root: seen-hash table + accepted output
    checkpoint_dir: str
    max_files_per_trigger: int = 4

    @property
    def seen(self) -> LakeTable:
        return LakeTable(self.spark, os.path.join(self.lake_dir, "_seen_hashes"))

    def _scope(self) -> str:
        from yadex_spark.streaming.pipeline import checkpoint_scope

        return checkpoint_scope(self.checkpoint_dir)

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        scope = self._scope()
        batch_id = f"{scope}/dedup-e{epoch_id}"
        if batch_id in self.seen.committed_batch_ids():
            return  # crash-replayed epoch: already fully applied
        hashed = batch.select(
            "ingest_seq", "doc_id", "text", F.md5("text").alias("h")
        )
        # batch-local first arrival per hash (min ingest_seq, doc_id
        # tiebreak) — narrow agg + join-back, the collapse shape
        winners = hashed.groupBy("h").agg(
            F.min(F.struct("ingest_seq", "doc_id")).alias("w")
        ).select("h", F.col("w.ingest_seq").alias("ingest_seq"),
                 F.col("w.doc_id").alias("first_doc_id"))
        first = winners.join(
            hashed.select("h", "ingest_seq", "text"), ["h", "ingest_seq"]
        )
        # cross-epoch dedup: only hashes the corpus has never seen
        seen_keys = self.seen.read().select(F.col("doc_id").alias("h"))
        accepted = first.join(seen_keys, "h", "left_anti").persist()
        try:
            n = accepted.count()
            # accepted docs out (idempotent: epoch+scope-keyed overwrite)
            out = os.path.join(self.lake_dir, "accepted", f"{scope}-e{epoch_id:08d}")
            accepted.select(
                F.col("first_doc_id").alias("doc_id"), "text", "ingest_seq"
            ).write.mode("overwrite").parquet(out)
            if n:
                # record the newly-seen hashes (hash is the table key;
                # canonical doc and arrival seq are the payload).  An
                # all-duplicate epoch commits nothing — a replay of it is
                # naturally a no-op via the anti-join, and an empty
                # parquet snapshot would have no readable schema.
                delta = accepted.select(
                    F.col("h").alias("doc_id"),
                    F.lit("insert").alias("op"),
                    F.col("ingest_seq").alias("op_seq"),
                    F.struct(
                        F.col("first_doc_id").alias("canonical_doc_id"),
                        F.col("ingest_seq").alias("first_seen_seq"),
                    ).alias("after"),
                )
                self.seen.commit_delta(delta, batch_id=batch_id, n_rows=n)
        finally:
            accepted.unpersist()

    def run_available_now(self, timeout_s: int = 600) -> None:
        q = (
            self.spark.readStream.schema(INGEST_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.feed_dir)
            .writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("dedup ingest did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def maintain(self) -> dict:
        """Compact the seen-hash table and vacuum superseded snapshots —
        the same out-of-band maintenance discipline as the CDC lake
        (run with the stream stopped; at scale, Iceberg
        rewrite_data_files + expire_snapshots)."""
        v = self.seen.compact()
        removed = self.seen.vacuum()
        return {"compacted_version": v, "data_dirs_removed": len(removed)}

    def accepted(self) -> DataFrame:
        """All accepted (first-arrival) documents so far."""
        return self.spark.read.schema(
            "doc_id string, text string, ingest_seq long"
        ).parquet(os.path.join(self.lake_dir, "accepted", "*"))
