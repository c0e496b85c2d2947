"""Streaming DSIR-model-on-ingest: maintain the raw-corpus hashed
n-gram bucket model INCREMENTALLY as documents arrive, exactly-once
under crash replay.

The seventh ingest-family member, and (with stats-on-ingest) its
second counting one: batch ``text.dsir_weights`` builds its raw-corpus
bag-of-words model with a full corpus pass — at 10^9 docs that pass is
the expensive half of every re-selection run, and it repeats every
time the corpus grows.  This member keeps the model CURRENT instead:
each epoch commits the batch's per-bucket feature counts as additive
partials, so the up-to-date raw model is always a fold over
#epochs x #buckets partial rows — never a corpus rescan.

Exactly-once is the idempotent-counter construction shared with
``stats_ingest``: partials are keyed by (epoch, bucket) and committed
under the epoch's scoped batch id, so a crash-replayed epoch
overwrites its own partial instead of double-adding.

``raw_model()`` folds the partials to (b, c_r); feeding that into
``dsir_weights(corpus, target, raw_counts=...)`` produces BIT-IDENTICAL
output to the batch operator over everything ingested (the feature
extractor is shared and counting is associative — no online-vs-batch
caveat, unlike the near-dup member's greedy rule), while skipping the
model's corpus pass.  The target-side model stays a batch concern:
targets are small, static benchmark sets by definition.

Scale shape: per-epoch cost is O(batch) map-side feature hashing + one
partial HashAggregate with <= n_buckets groups + a <= n_buckets-row
commit; ``raw_model()`` reads O(epochs x buckets) narrow rows;
``maintain()`` compacts the partials under the shared lease.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadex_spark.streaming.dedup_ingest import DedupIngest

#: raw_model() output schema
MODEL_SCHEMA = "b long, c_r long"


@dataclass
class DsirIngest(DedupIngest):
    n_buckets: int = 1024

    REGISTRY_DIR = "_dsir_partials"

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from yadex_spark.operators.text import dsir_features

        scope = self._scope()
        batch_id = f"{scope}/dsir-e{epoch_id}"
        if batch_id in self.seen.committed_batch_ids():
            return  # crash-replayed epoch: partial already committed
        partial = (
            dsir_features(batch, self.n_buckets)
            .where(F.col("b").isNotNull())
            .groupBy("b")
            .agg(F.count("*").alias("c_r"))
        )
        delta = partial.select(
            F.concat(F.lit(f"e{epoch_id}|b"), F.col("b")).alias("doc_id"),
            F.lit("insert").alias("op"),
            F.lit(epoch_id).cast("long").alias("op_seq"),
            F.struct("b", "c_r").alias("after"),
        )
        self.seen.commit_delta(delta, batch_id=batch_id)

    def raw_model(self) -> DataFrame:
        """The accumulated raw-corpus bucket model (b, c_r) — equal to
        what a fresh ``dsir_features(corpus).groupBy(b).count()`` pass
        over everything ingested would produce, without the corpus
        pass.  Insert-only narrow read of the partials + one partial
        agg over #epochs x #buckets rows; typed-empty before any
        epoch."""
        if not self.seen.snapshots():
            return self.spark.createDataFrame([], MODEL_SCHEMA)
        partials = self.seen.read_keys("b", "c_r")
        return partials.groupBy("b").agg(F.sum("c_r").alias("c_r"))

    def weights(self, corpus: DataFrame, target: DataFrame,
                salt: str = "dsir") -> DataFrame:
        """Batch ``dsir_weights`` over ``corpus`` with the raw model
        supplied by the accumulated partials.  Caller's contract (same
        as the batch operator's ``raw_counts``): ``corpus`` is exactly
        the ingested feed."""
        from yadex_spark.operators.text import dsir_weights

        return dsir_weights(corpus, target, n_buckets=self.n_buckets,
                            salt=salt, raw_counts=self.raw_model())

    def maintain(self, minor: bool = False) -> dict:
        """Compact + vacuum the partials table (this member only
        counts — there is no accepted output).  Same nonce-confirmed
        maintenance lease as the rest of the family."""
        from yadex_spark.lake.lease import maintenance_lease

        with maintenance_lease(self.lake_dir):
            v = self.seen.compact_minor() if minor else self.seen.compact()
            removed = self.seen.vacuum() if (not minor or v is not None) else []
        return {"dsir": {("minicompacted_version" if minor
                        else "compacted_version"): v,
                         "data_dirs_removed": len(removed)}}
