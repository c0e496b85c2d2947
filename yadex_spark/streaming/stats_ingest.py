"""Streaming corpus-stats-on-ingest: per-source composition accounting
AS THE LAKE FILLS, exactly-once under crash replay.

The observability member of the ingest family (exact/near-dup/span
dedup strip data; this one only counts it): every mixing and sampling
decision starts from "what do I have per source" (`text.corpus_stats`),
and a training-data lake wants that answer CONTINUOUSLY — without
re-scanning the corpus — and correctly even when an epoch crashes
between commit and checkpoint.  The CDC machinery already solves the
hard part (idempotent scoped batch ids): additive counters become
exactly-once by storing PER-EPOCH PARTIALS keyed by (epoch, source)
and summing at read time, so a crash-replayed epoch overwrites its own
partial instead of double-adding — the classic idempotent-counter
construction, the streaming analogue of a Spark Observation that
survives restarts.

Per epoch:

1. aggregate the batch with the batch ``corpus_stats`` operator (one
   partial HashAggregate keyed by source — O(batch) work, a handful of
   result rows),
2. commit the per-source partial rows to a LakeTable keyed by
   ``e{epoch}|{source}`` under the epoch's scoped batch id — replayed
   epochs no-op by batch id, and the key makes even a concurrent
   replay LWW-idempotent.

``stats()`` folds the partials: an insert-only narrow read (no LWW
shuffle) + one tiny partial agg over #epochs x #sources rows — never
the corpus.  ``maintain()`` compacts the partials table under the
shared maintenance lease (the partial count grows by #sources per
epoch forever; compaction keeps the read O(files) small).

Scale shape: per-epoch cost is O(batch) map-side work + a #sources-row
commit; reading stats is O(epochs x sources), independent of corpus
size; nothing ever rescans accepted data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadex_spark.streaming.dedup_ingest import DedupIngest

#: feed schema — the ingest family's arrival triple plus the source tag
STATS_FEED_SCHEMA = "ingest_seq long, doc_id string, text string, source string"

#: additive counter columns (the batch corpus_stats output, minus the key)
STAT_COLS = (
    "n_docs", "n_tokens_est", "n_chars", "n_words",
    "n_lt16w", "n_lt64w", "n_lt256w", "n_ge256w",
)

#: stats() output schema (identical to text.corpus_stats)
STATS_SCHEMA = "source string, " + ", ".join(f"{c} long" for c in STAT_COLS)


@dataclass
class StatsIngest(DedupIngest):
    REGISTRY_DIR = "_stats_partials"
    FEED_SCHEMA = STATS_FEED_SCHEMA

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from yadex_spark.operators.text import corpus_stats

        scope = self._scope()
        batch_id = f"{scope}/stats-e{epoch_id}"
        if batch_id in self.seen.committed_batch_ids():
            return  # crash-replayed epoch: partial already committed
        partial = corpus_stats(batch)
        delta = partial.select(
            F.concat(F.lit(f"e{epoch_id}|"), F.col("source")).alias("doc_id"),
            F.lit("insert").alias("op"),
            F.lit(epoch_id).cast("long").alias("op_seq"),
            F.struct("source", *STAT_COLS).alias("after"),
        )
        self.seen.commit_delta(delta, batch_id=batch_id)

    def stats(self) -> DataFrame:
        """Accumulated per-source composition — the batch
        ``corpus_stats`` answer for everything ingested so far.
        Insert-only narrow read of the partials (each (epoch, source)
        key commits at most once) + one partial agg over
        #epochs x #sources rows; typed-empty before any epoch."""
        if not self.seen.snapshots():
            return self.spark.createDataFrame([], STATS_SCHEMA)
        partials = self.seen.read_keys("source", *STAT_COLS)
        return partials.groupBy("source").agg(
            *[F.sum(c).alias(c) for c in STAT_COLS]
        )

    def maintain(self, minor: bool = False) -> dict:
        """Compact + vacuum the partials table (there is no accepted
        output to maintain — this member only counts).  Same
        nonce-confirmed maintenance lease as the rest of the family."""
        from yadex_spark.lake.lease import maintenance_lease

        with maintenance_lease(self.lake_dir):
            v = self.seen.compact_minor() if minor else self.seen.compact()
            removed = self.seen.vacuum() if (not minor or v is not None) else []
        return {"stats": {("minicompacted_version" if minor
                        else "compacted_version"): v,
                          "data_dirs_removed": len(removed)}}
