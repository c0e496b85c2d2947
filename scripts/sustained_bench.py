"""Sustained-ingest evidence: per-epoch apply latency must stay FLAT as
the lake grows — the O(batch) apply claim behind the 10^10-event story
(a merge-on-read delta commit never rewrites the table; compaction every
K epochs bounds read amplification).

Streams a pre-generated feed through MANY micro-batches (small
maxFilesPerTrigger), with periodic compaction, then reads per-epoch
apply_ms from the engine's own lineage and reports the trend: median of
the FIRST quartile of epochs vs the LAST quartile.  A ratio near 1 means
epoch cost is independent of accumulated table size.

Usage: python scripts/sustained_bench.py [feed_dir] [files_per_trigger] [compact_every]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    feed = sys.argv[1] if len(sys.argv) > 1 else "/tmp/feed16"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from yadex_spark.session import get_spark
    from yadex_spark.streaming.pipeline import CdcPipeline

    spark = get_spark("sustained", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      shuffle_partitions=64)
    work = tempfile.mkdtemp(prefix="sustained-")
    try:
        pipe = CdcPipeline(
            spark, feed, os.path.join(work, "lake"), os.path.join(work, "ckpt"),
            max_files_per_trigger=per_trigger, compact_every=compact_every,
        )
        pipe.run_available_now(timeout_s=3600)
        lin = (
            pipe.lineage()
            .groupBy("batch_id")
            .agg(F.max("apply_ms").alias("apply_ms"),
                 F.sum(F.col("n_insert") + F.col("n_update") + F.col("n_delete")).alias("n"))
            .orderBy("batch_id")
            .collect()
        )
        rows = [(int(r["batch_id"]), float(r["apply_ms"]), int(r["n"])) for r in lin]
        # the apply-cost trend covers PURE apply epochs: the first two
        # (JIT/codegen warm-up) and the compaction epochs (inline
        # maintenance, reported separately — a production deployment runs
        # compaction as a separate job, like Iceberg maintenance) are not
        # table-size effects
        is_compact = lambda b: compact_every and (b + 1) % compact_every == 0
        per_row = [
            (b, ms / max(n, 1)) for b, ms, n in rows[2:] if n > 0 and not is_compact(b)
        ]
        compact_ms = [round(ms, 1) for b, ms, _ in rows if is_compact(b)]
        q = max(1, len(per_row) // 4)
        first = statistics.median(v for _, v in per_row[:q])
        last = statistics.median(v for _, v in per_row[-q:])
        n_state = pipe.table("seqs").read().count()
        out = {
            "epochs": len(rows),
            "collapsed_rows_applied": sum(n for _, _, n in rows),
            "final_state_rows": n_state,
            "compact_every": compact_every,
            "apply_ms_per_row_first_quartile": round(first, 4),
            "apply_ms_per_row_last_quartile": round(last, 4),
            "last_over_first": round(last / first, 3),
            "compact_epoch_ms": compact_ms,
            "epoch_apply_ms": [round(ms, 1) for _, ms, _ in rows],
        }
        print(json.dumps(out))
        stamp_lines = [
            "\n## Sustained ingest (O(batch) apply evidence)\n",
            f"{len(rows)} micro-batch epochs over the same feed "
            f"(maxFilesPerTrigger={per_trigger}, compact_every={compact_every}); "
            "per-epoch apply latency from the engine's own lineage, normalized "
            "per collapsed row:\n",
            f"- first-quartile median: {first:.4f} ms/row; last-quartile median: "
            f"{last:.4f} ms/row → **last/first = {last / first:.2f}** "
            "(≈1 ⇒ epoch cost independent of accumulated table size)",
            f"- compaction epochs (inline maintenance, excluded from the apply "
            f"trend): {compact_ms} ms",
            f"- {out['collapsed_rows_applied']:,} collapsed rows applied, final state "
            f"{n_state:,} rows, per-epoch apply_ms: {out['epoch_apply_ms']}",
        ]
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write("\n".join(stamp_lines) + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
