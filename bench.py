"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR plus the
CDC replay engine's end-to-end throughput.  Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "cdc": {"n_events": N, "events_per_sec": X}}

The CDC replay bench is the authoritative number (BASELINE.json
metric): synthetic oplog -> streamed exactly-once apply -> committed
lake state, measured as change-events/sec.  Scaling-efficiency evidence
(local[8] vs local[32]) lives in scripts/scaling_bench.py ->
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from yadex_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_lww_collapse",
    "cdc_final_state",
    "cdc_full_outer_diff",
    "tpch_q1",
    "tpch_q3",
    "topk_orders_per_customer",
    "events_sessionize",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_passages",
    "embed_cosine_topk",
    "embed_near_dup",
    "embed_lsh_near_dup",
    "embed_ivf_topk",
    "embed_semdedup",
    "text_quality",
    "text_repetition",
    "decontaminate",
    "decontaminate_fuzzy",
    "sample_by_source",
    "cap_per_source",
    "scrub_pii",
    "dedup_doc_lines",
    "lm_bigram_score",
    "dsir_weights",
    "wordpiece_tokenize",
    "mix_corpus",
    "corpus_stats",
    "filter_corpus",
    "vocab_topk",
    "pack_sequences",
    "chunk_sequences",
    "mask_spans",
    "multimodal_byte_features",
    "shuffle_corpus",
    "train_val_split",
    "bpe_train",
    "quality_score",
    "events_funnel",
    "events_retention",
    "length_quantiles",
    "tfidf_keywords",
    "events_asof_join",
    "range_join_balance",
    "corpus_distinct_kmv",
    "corpus_kmv_merge",
    "corpus_cms_counts",
    "prepare_corpus",
    "cdc_engine_replay",
    "cdc_time_travel",
    "cdc_change_feed",
    "cdc_replicate",
    "cdc_point_lookup",
    "embed_sq8_codes",
    "embed_sq8_topk",
    "corpus_bucketed_join",
    "split_leakage_safe",
    "cdc_zorder_scan",
    "cdc_tagged_read",
    "cdc_pruned_scan",
    "dedup_cross_doc_lines",
    "cdc_restore_read",
]

CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "1000000"))
CDC_DOCS = int(os.environ.get("BENCH_CDC_DOCS", "100000"))


def bench_cdc_replay(spark) -> dict:
    """End-to-end streamed replay throughput (generation + feed-write
    excluded; the measured span is stream-read -> collapse -> committed
    lake state, the BASELINE.json metric)."""
    from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
    from yadex_spark.streaming.pipeline import CdcPipeline

    work = tempfile.mkdtemp(prefix="bench-cdc-")
    try:
        feed = os.path.join(work, "oplog")
        oplog = gen_oplog(spark, CDC_EVENTS, CDC_DOCS, seed=42)
        write_oplog_chunks(oplog, feed, n_chunks=4, bounds=(0, CDC_EVENTS - 1))

        # JIT/codegen warm-up on a small throwaway feed: 10^10-event
        # ingest runs at steady state, which is what the metric models
        # (same protocol as scripts/scaling_bench.py)
        warm_feed = os.path.join(work, "oplog-warm")
        write_oplog_chunks(gen_oplog(spark, 50_000, 5_000, seed=7), warm_feed,
                           n_chunks=1, bounds=(0, 49_999))
        warm = CdcPipeline(
            spark, warm_feed, os.path.join(work, "warm-lake"),
            os.path.join(work, "warm-ckpt"), max_files_per_trigger=256,
        )
        warm.run_available_now(timeout_s=600)
        warm.table("seqs").read().count()

        pipe = CdcPipeline(
            spark, feed, os.path.join(work, "lake"), os.path.join(work, "ckpt"),
            max_files_per_trigger=256,
        )
        t0 = time.monotonic()
        pipe.run_available_now(timeout_s=3600)
        # make the committed state real: force a full state read
        n_state = pipe.table("seqs").read().count()
        dt = time.monotonic() - t0
        from yadex_spark.streaming.pipeline import rolling_events_per_sec

        rolling = rolling_events_per_sec(spark, os.path.join(work, "lake"))
        return {
            "n_events": CDC_EVENTS,
            "n_docs": CDC_DOCS,
            "final_rows": n_state,
            "sec": round(dt, 2),
            "events_per_sec": round(CDC_EVENTS / dt, 1),
            # M1 rolling view from the engine's own lineage (apply time
            # only, excludes stream-source overhead + final state read)
            "events_per_sec_rolling": round(rolling, 1) if rolling else None,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    qs = entrymod.queries()
    # untimed session warm-up (scan + agg + tiny shuffle): JVM/codegen/
    # Arrow init otherwise lands entirely on the first headline query —
    # same discipline as scripts/scaling_bench.py's warm feed; steady
    # state is what a long-running 100 TB job sees.
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    )
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)

    cdc = bench_cdc_replay(spark)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline queries + CDC replay (events/sec in cdc.events_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "cdc": cdc,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
