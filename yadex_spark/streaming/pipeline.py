"""The CDC pipeline: readStream → route → collapse → exactly-once apply.

This is the Spark re-expression of the reference's whole channel
topology (runSToplog, /root/reference/msync/run.go:137-210):

  reference stage                      -> here
  ---------------------------------------------------------------
  change-stream tail + resume token    -> readStream + checkpointLocation
  source pump / idle flush (S2)        -> micro-batch trigger boundary
  namespace filter (F1)                -> where(table is not null)
  regex classify + route (F2/T2)       -> Router + isin filter
  size+time batcher (B1)               -> maxFilesPerTrigger / trigger
  event decode → write model (T1)      -> collapse to terminal op per key
  bulk apply, dup-key tolerant (W1)    -> LakeTable.commit_delta (MERGE)
  RT expiry drop (W3)                  -> watermark-style late filter
  bookmark commit + pending list (C1/2)-> checkpoint offsets/commits +
                                          idempotent batch_id + lineage rows

Exactly-once: Structured Streaming writes offsets before and commits
after each epoch; if the process dies mid-epoch the epoch replays, and
``LakeTable.commit_delta`` skips batch_ids it has already committed.
The lineage write is made idempotent the same way (per-epoch overwrite
into an epoch-keyed directory).  This deliberately FIXES the
reference's leaky advance-bookmark-on-error
(/root/reference/msync/bulkwrite.go:96-110; SURVEY.md §2.1).

Scale notes (100 TB / 1000 executors):
- the only wide exchange per epoch is the collapse aggregate, which
  does map-side partial aggregation → skew-safe (hot keys pre-merge).
- apply cost is O(batch) (merge-on-read delta), never O(table);
  compaction runs every ``compact_every`` epochs to bound read
  amplification, exactly like Iceberg maintenance.
- per-table work is independent → tables could be separate queries
  (the reference's RT/ST split) or one multiplexed query as here.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yadex_spark.lake.table import LakeTable
from yadex_spark.operators.collapse import ORDER_COLS, collapse, split_drops
from yadex_spark.operators.route import Router, namespace_filter, route_filter
from yadex_spark.schema import oplog_schema


@dataclass
class CdcPipeline:
    spark: SparkSession
    oplog_dir: str          # directory of parquet chunks (the change feed)
    lake_dir: str           # root dir; one LakeTable per routed table
    checkpoint_dir: str
    router: Router = field(default_factory=Router)
    max_files_per_trigger: int = 1
    expiry_ms: int | None = None   # RT tier: drop events older than this vs batch max
    compact_every: int = 0         # 0 = never
    collapse_impl: str = "agg"
    evolved: bool = False

    def table(self, name: str) -> LakeTable:
        return LakeTable(self.spark, os.path.join(self.lake_dir, name))

    # ---------- the per-epoch apply (foreachBatch body) ----------

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        t0 = time.monotonic()
        spark = batch.sparkSession
        batch = namespace_filter(batch)

        # resolve routing on the (small) distinct table set, driver-side
        names = [r["table"] for r in batch.select("table").distinct().collect()]
        st_tables = self.router.tier_tables(names, "ST") + self.router.tier_tables(names, "RT")
        batch = route_filter(batch, st_tables)
        if not st_tables:
            return

        n_late = 0
        if self.expiry_ms is not None:
            # lossy RT semantics (msync/bulkwrite.go:60-63): an event whose
            # op_ts lags the high-watermark by more than the window is
            # expired.  The watermark is persistent (max op_ts ever seen),
            # not batch-local — a late event alone in its own micro-batch
            # must still be dropped.
            mx = batch.agg(F.max("op_ts")).first()[0]
            wm = self._advance_watermark(mx)
            if wm is not None:
                late = F.col("op_ts") < F.lit(wm) - F.expr(f"INTERVAL {self.expiry_ms} MILLISECOND")
                n_late = batch.where(late).count()
                batch = batch.where(~late)

        live, truncates = split_drops(batch)
        trunc_rows = truncates.collect()
        collapsed = collapse(live.where(F.col("doc_id").isNotNull()), impl=self.collapse_impl)
        collapsed.persist()
        try:
            lineage_rows = []
            for tname in st_tables:
                tbl = self.table(tname)
                if any(r["table"] == tname for r in trunc_rows):
                    tbl.commit_truncate(batch_id=f"e{epoch_id}-trunc")
                part = collapsed.where(F.col("table") == tname).drop("table")
                stats = part.agg(
                    F.min("op_seq"), F.max("op_seq"), F.count("*"),
                    F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)),
                    F.sum(F.when(F.col("op").isin("update", "replace"), 1).otherwise(0)),
                    F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)),
                ).first()
                if stats[2]:
                    tbl.commit_delta(part, batch_id=f"e{epoch_id}")
                if self.compact_every and (epoch_id + 1) % self.compact_every == 0:
                    tbl.compact()
                lineage_rows.append(
                    (epoch_id, tname, 0, stats[0], stats[1],
                     stats[3] or 0, stats[4] or 0, stats[5] or 0, n_late,
                     (time.monotonic() - t0) * 1000.0)
                )
            self._write_lineage(spark, epoch_id, lineage_rows)
        finally:
            collapsed.unpersist()

    def _advance_watermark(self, batch_max) -> object:
        """Monotone persistent high-watermark over op_ts (idempotent:
        re-running an epoch can only re-propose the same max)."""
        import datetime as _dt
        import json as _json

        os.makedirs(self.lake_dir, exist_ok=True)
        path = os.path.join(self.lake_dir, "_watermark.json")
        stored = None
        if os.path.exists(path):
            with open(path) as f:
                stored = _dt.datetime.fromisoformat(_json.load(f)["max_op_ts"])
        best = max([t for t in (stored, batch_max) if t is not None], default=None)
        if best is not None and best != stored:
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"max_op_ts": best.isoformat()}, f)
            os.replace(tmp, path)
        return best

    def _write_lineage(self, spark: SparkSession, epoch_id: int, rows: list) -> None:
        """Per-partition lineage (north_rule).  Idempotent: epoch-keyed
        overwrite, so a replayed epoch rewrites rather than duplicates."""
        if not rows:
            return
        df = spark.createDataFrame(
            rows,
            "batch_id long, table string, partition_id int, offset_lo long, "
            "offset_hi long, n_insert long, n_update long, n_delete long, "
            "n_dropped_late long, apply_ms double",
        ).withColumn("committed_at", F.current_timestamp())
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.lake_dir, "_lineage", f"epoch={epoch_id}")
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.lake_dir, "_lineage", "epoch=*"))

    # ---------- run ----------

    def stream(self) -> DataFrame:
        return (
            self.spark.readStream.schema(oplog_schema(self.evolved))
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.oplog_dir)
        )

    def run_available_now(self, timeout_s: int = 600) -> None:
        """Drain everything currently in the feed, then stop — the
        analogue of the reference's WaitJobDone quiescence barrier
        (/root/reference/msync/debug.go:37-63)."""
        q = (
            self.stream()
            .writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("stream did not drain in time")
        if q.exception() is not None:
            raise q.exception()
