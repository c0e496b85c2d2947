"""Physical-plan audit: capture .explain('formatted') for the engine's
hot paths and the headline queries, and assert the scale-critical plan
properties:

- parquet scans are column-pruned (ReadSchema ⊂ full schema) and
  filter-pushed (PushedFilters non-empty where a filter exists)
- the LWW collapse runs as HashAggregate with a partial_ pass
  (map-side combine — the skew story depends on it)
- broadcast joins where a small side exists
(note: AQE formatted plans are pre-execution and do not carry codegen
annotations; codegen coverage is implied by HashAggregate/Project nodes)

Writes BENCH/PLANS.md.  Usage: python scripts/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yadex_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDITS = {
    # query name -> list of (description, predicate over plan text)
    "cdc_lww_collapse": [
        ("map-side partial aggregation", lambda p: "partial_max" in p or "partial_" in p),
        ("hash aggregate, no sort fallback", lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("column-pruned scan", lambda p: "ReadSchema" in p),
    ],
    "lake_read": [
        ("narrow LWW: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
    ],
    "cdc_final_state": [
        ("map-side partial aggregation", lambda p: "partial_" in p),
    ],
    "cdc_time_travel": [
        ("narrow LWW: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
    ],
    "quality_score": [
        # r6: features are per-row HOFs (zero shuffle) and the trained
        # weights ride as an array literal — the scoring plan is a pure
        # projection over the scan: NO exchange, no join, JVM-side
        ("zero-shuffle scoring plan (no exchange)",
         lambda p: "Exchange" not in p),
        ("no Python in the training/scoring path",
         lambda p: "EvalPython" not in p),
        ("pure projection (no aggregate needed)",
         lambda p: "Project" in p),
    ],
    "cdc_change_feed": [
        # O(changed keys): the pre-state LWW shuffle must see only the
        # window's keys — the semi join sits BELOW the aggregate
        ("pre-state key-filtered via semi join", lambda p: "LeftSemi" in p),
        ("hash aggregates, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
    ],
    "engine_collapse": [
        ("hash aggregate (not sort)", lambda p: "HashAggregate" in p),
        ("map-side partial max", lambda p: "partial_max" in p),
        ("winner join-back present", lambda p: "Join" in p),
    ],
    "cdc_catchup_filter": [
        ("broadcast join on bookmarks", lambda p: "BroadcastHashJoin" in p),
        ("pushed filter on event_id", lambda p: "PushedFilters: [" in p),
    ],
    "cdc_anti_join_clone": [
        ("anti join", lambda p: "LeftAnti" in p or "anti" in p.lower()),
        ("pushed orderdate filter", lambda p: "PushedFilters" in p),
    ],
    "tpch_q1": [
        ("pushed shipdate filter", lambda p: "PushedFilters" in p and "l_shipdate" in p),
        ("pruned columns", lambda p: "ReadSchema" in p and "l_comment" not in p),
        ("hash aggregate", lambda p: "HashAggregate" in p),
    ],
    "tpch_q3": [
        ("join present", lambda p: "Join" in p),
        ("pushed orderdate filter", lambda p: "PushedFilters" in p and "o_orderdate" in p),
    ],
    "dedup_minhash_lsh": [
        ("hash aggregate for signatures (BIGINT sigs, no sort fallback)",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("bucketed candidate equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "dedup_simhash_pairs": [
        ("band equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "embed_near_dup": [
        ("grid-bucketed equi-join, no all-pairs cross/range join",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "embed_cosine_topk": [
        ("broadcast of the query side", lambda p: "Broadcast" in p),
        ("top-k window", lambda p: "Window" in p or "WindowGroupLimit" in p),
    ],
    "pack_sequences": [
        ("per-shard running-total window (no global single-partition sort)",
         lambda p: "Window" in p and "SinglePartition" not in p),
        ("column-pruned scan (text read only for lengths)", lambda p: "ReadSchema" in p),
    ],
    "train_val_split": [
        ("pure projection, no shuffle",
         lambda p: "Exchange" not in p and "ReadSchema" in p),
    ],
    "embed_ann_grid": [
        ("probed candidates still an equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "embed_lsh_near_dup": [
        ("banded candidate equi-join, no all-pairs cross/range join",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("signature dots stay JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "embed_kmeans_assign": [
        ("literal-centroid assignment is a pure narrow projection (no join, no shuffle)",
         lambda p: "Exchange" not in p and "Join" not in p),
        ("argmin stays JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "embed_ivf_topk": [
        ("IVF search is a cluster-id equi-join, no all-pairs cross join",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("top-k window present", lambda p: "Window" in p or "WindowGroupLimit" in p),
    ],
    "embed_sq8_codes": [
        ("quantization is a pure narrow projection (no join, no shuffle)",
         lambda p: "Exchange" not in p and "Join" not in p),
        ("code math stays JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "corpus_bucketed_join": [
        ("co-located sort-merge join over bucketed scans — zero shuffle Exchange",
         lambda p: "SortMergeJoin" in p
         and not any("Exchange" in ln and "BroadcastExchange" not in ln
                     for ln in p.splitlines())),
        ("bucketed scans selected (scan carries the bucket spec)",
         lambda p: "Bucketed: true" in p or "SelectedBucketsCount" in p),
    ],
    "mix_corpus_upsampled": [
        ("rates side broadcast (corpus never shuffles for the join)",
         lambda p: "Broadcast" in p),
        ("epoch fan-out is a per-row generator, no shuffle after the join",
         lambda p: "Generate" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "cdc_zorder_scan": [
        ("both z-order columns' filters pushed to the compacted scan",
         lambda p: "PushedFilters" in p and "source" in p and "doc_id" in p),
        ("narrow LWW over the base: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("no python in the scan path",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "cdc_pruned_scan": [
        ("winner aggregate runs narrow: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("exact predicate still applied after the manifest file skip",
         lambda p: "Filter" in p and "source" in p),
        ("payload join-back present (pruned side joined to winners)",
         lambda p: "Join" in p),
        ("no python in the scan path",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "cdc_restore_read": [
        ("post-restore head read is the compacted narrow-LWW shape",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
    ],
    "cdc_tagged_read": [
        ("tagged read is the same narrow-LWW shape as time travel",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
    ],
    "dedup_cross_doc_lines": [
        ("df count is a partial hash agg over hashed (line, doc) pairs",
         lambda p: "HashAggregate" in p and "partial_" in p),
        ("boilerplate set joined back as anti-join (broadcast-able)",
         lambda p: "LeftAnti" in p or "left_anti" in p.lower()),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "split_leakage_safe": [
        ("split is hash projection + one label join — no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("whole path stays JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "embed_sq8_topk": [
        ("query side broadcast (corpus scan never shuffles for the join)",
         lambda p: "Broadcast" in p),
        ("shortlist + rerank windows present",
         lambda p: "Window" in p or "WindowGroupLimit" in p),
        ("code/rerank cosines stay JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "dedup_passages": [
        ("chunking stays per-row JVM HOFs (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("winner dedup is a partial hash agg, no window sort over the chunk hash",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
    ],
    "decontaminate": [
        ("hashed-shingle equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("per-row shingling stays JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "dedup_clean_corpus": [
        ("canonical filter + size/corpus joins stay equi-joins, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("cluster-size agg is a hash aggregate",
         lambda p: "HashAggregate" in p),
    ],
    "decontaminate_fuzzy": [
        ("band equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("BIGINT signature hash aggregates, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
    ],
    "text_repetition": [
        ("pure per-row HOFs, no shuffle at all",
         lambda p: "Exchange" not in p),
        ("JVM-side only", lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "corpus_stats": [
        ("one partial hash agg keyed by source (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("per-row lengths stay JVM-side",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "sample_by_source": [
        ("pure per-row filter, no shuffle",
         lambda p: "Exchange" not in p and "ReadSchema" in p),
    ],
    "chunk_sequences": [
        ("per-row explode only, no shuffle at all",
         lambda p: "Exchange" not in p),
        ("JVM-side only", lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "shuffle_corpus": [
        ("rank windows are per-shard, never a single global partition",
         lambda p: "Window" in p and "SinglePartition" not in p),
        ("shard hash exchange (parallel, skew-free window sort)",
         lambda p: "hashpartitioning(shard" in p),
    ],
    "mix_rates": [
        ("source totals are partial hash aggregates (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("JVM-side only", lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "mix_corpus": [
        ("rates join is an equi-join, no nested loop over the corpus",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("corpus scan is column-pruned", lambda p: "ReadSchema" in p),
    ],
    "filter_corpus": [
        ("pure per-row HOF rules, no shuffle at all",
         lambda p: "Exchange" not in p),
        ("JVM-side only", lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "vocab_topk": [
        ("top-k is TakeOrdered (per-partition heaps), not a global sort",
         lambda p: "TakeOrderedAndProject" in p),
        ("word counts are partial hash aggregates (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
    ],
    "scrub_pii": [
        ("pure per-row regexp pass, no shuffle at all",
         lambda p: "Exchange" not in p),
        ("regexes stay JVM-side (no python UDF)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    # audited in its stage_barrier=False (fully declarative) form —
    # the default lazy-localCheckpoint barriers replace the upstream
    # stages with ExistingRDD placeholders in a formatted plan
    "prepare_corpus_declarative": [
        ("composed pipeline stays equi-joins end-to-end, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("JVM-side end-to-end (no python UDF in any stage)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("final shuffle windows are per-shard (hash-partitioned)",
         lambda p: "hashpartitioning(shard" in p),
        ("dedup/stats aggregates never fall back to SortAggregate",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
    ],
    "lm_bigram_score": [
        ("model cut is TakeOrdered (per-partition heaps), not a global sort",
         lambda p: "TakeOrderedAndProject" in p),
        ("count aggregates are partial hash aggs on BIGINT hashes, no sort fallback",
         lambda p: "HashAggregate" in p and "partial" in p.lower()
         and "SortAggregate" not in p),
        ("scoring join is an equi-join, no nested loop over the corpus",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "wordpiece_tokenize": [
        ("python surface is Arrow-batched (MapInPandas), never row-at-a-time",
         lambda p: ("MapInPandas" in p or "ArrowEvalPython" in p)
         and "BatchEvalPython" not in p),
        ("text-only pruned scan under the UDF", lambda p: "ReadSchema" in p),
    ],
    "multimodal_byte_features": [
        ("python surface is Arrow-batched (MapInPandas), never row-at-a-time",
         lambda p: ("MapInPandas" in p or "ArrowEvalPython" in p)
         and "BatchEvalPython" not in p),
        ("column-pruned scan under the UDF", lambda p: "ReadSchema" in p),
    ],
    "mask_spans": [
        ("pure per-row explode: no shuffle (Exchange) anywhere",
         lambda p: "Exchange" not in p),
        ("no python in the hash rule",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "cap_per_source": [
        ("rank windows are per-(source, shard) hash-partitioned (no per-source funnel)",
         lambda p: __import__("re").search(
             r"hashpartitioning\(source#\d+[^)]*\bshard#", p) is not None),
        ("offsets attach via equi-join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
    ],
    "embed_semdedup": [
        ("intra-cluster candidates via equi-join, no all-pairs cross join",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("centroid argmin is a literal projection (no python, no model join)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "dsir_weights": [
        # the two bucket models are EAGER model-sized jobs at build time
        # (driver computes the <= n_buckets weight literals); the
        # returned plan is scoring only
        ("per-doc rollup is a partial hash agg, no sort fallback",
         lambda p: "HashAggregate" in p and "partial" in p.lower()
         and "SortAggregate" not in p),
        ("weight-table join broadcasts the <= n_buckets literal side",
         lambda p: "BroadcastHashJoin" in p),
        ("no nested loop / cross join anywhere",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("scoring plan scans the corpus exactly once (models were "
         "separate model-sized jobs); formatted plans list each scan "
         "twice (tree + detail)",
         lambda p: p.count("Scan parquet") <= 2),
        ("no window over the weight table (the old cold-codegen shape)",
         lambda p: "Window" not in p),
    ],
    "bpe_pair_count": [
        # one BPE training iteration's pair-count + argmax job (the
        # returned bpe_train df is a literal merge table, so the audit
        # drives the iteration plan directly)
        ("pair counts are a partial hash agg, no sort fallback",
         lambda p: "HashAggregate" in p and "partial" in p.lower()
         and "SortAggregate" not in p),
        ("argmax is TakeOrdered (per-partition heaps), never a global sort",
         lambda p: "TakeOrderedAndProject" in p),
        ("no python in the loop (HOF explode, string replace)",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "events_asof_join": [
        # the union-merge as-of form: one sort per key over L+R, never
        # a per-key inequality cartesian
        ("no nested loop / cartesian (the naive asof rewrite)",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("union + window carry present",
         lambda p: "Union" in p and "Window" in p),
        ("single exchange feeds the carry window (L+R shuffled once "
         "on the key; the purchase-dedup agg upstream has its own)",
         lambda p: "Window" in p and "Exchange" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "corpus_distinct_kmv": [
        ("distinct is a partial hash agg (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("no whole-group state: no collect_list/ObjectHashAggregate",
         lambda p: "collect_list" not in p and "ObjectHashAggregate" not in p),
        ("two-phase top-k: local shard window before the global one",
         lambda p: p.count("Window") >= 2),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "events_funnel": [
        ("per-stage mins are partial hash aggs",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("stage joins are hash joins, no nested loop / cartesian",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("no window over a key's full event list",
         lambda p: "Window" not in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "events_retention": [
        # the stream reduces to distinct (user, period) immediately:
        # every agg is a partial hash agg; the first-period join shares
        # the user key; no window at all
        ("distinct + aggs are partial hash aggs",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("first-period join is a hash join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("no window over a user's event list", lambda p: "Window" not in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "cdc_replicate": [
        # the replica read is the same narrow LWW shape as any lake read
        ("narrow LWW on the replica: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "dedup_doc_lines": [
        # per-row HOF fold: the whole operator is one projection
        ("no shuffle anywhere (no Exchange)", lambda p: "Exchange" not in p),
        ("no window, no join", lambda p: "Window" not in p and "Join" not in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
        ("column-pruned scan", lambda p: "ReadSchema" in p),
    ],
    "cdc_point_lookup": [
        # the serving read: probe filter pushed into the parquet scan
        # (on top of the driver-side footer file pruning), LWW narrow
        ("probe IN-filter pushed to the scan",
         lambda p: "PushedFilters" in p and "In(doc_id" in p),
        ("narrow LWW: hash aggregate, no sort fallback",
         lambda p: "HashAggregate" in p and "SortAggregate" not in p),
        ("winner join-back present", lambda p: "Join" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "length_quantiles": [
        ("histogram is a partial hash agg over the corpus",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("windows run over the histogram, group size = value domain",
         lambda p: "Window" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "tfidf_keywords": [
        ("tf/df are partial hash aggs (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("df join-back is a hash join, no nested loop",
         lambda p: "NestedLoop" not in p and "CartesianProduct" not in p),
        ("per-doc top-k window present (group size = doc vocabulary)",
         lambda p: "Window" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "range_join_balance": [
        # the whole point: bin equi-join, never the nested-loop
        # cartesian Catalyst picks for a bare BETWEEN join
        ("no BroadcastNestedLoopJoin / cartesian",
         lambda p: "BroadcastNestedLoop" not in p and "CartesianProduct" not in p),
        ("interval explode (Generate) feeds an equi-join",
         lambda p: "Generate" in p
         and ("BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p)),
        ("count rollup is a partial hash agg",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "corpus_kmv_merge": [
        # state merge is per-row array algebra over #groups-row inputs
        ("merge is a join + array expressions, no explode of states",
         lambda p: "Join" in p),
        ("bounded collect_list only in state build (k-capped by the "
         "upstream windows)", lambda p: p.count("Window") >= 2),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "corpus_cms_counts": [
        # sketch build: one explode (x depth) into ONE partial hash agg
        # keyed by (r, cell) — the shuffle is O(depth*width*partitions)
        ("cell counts are partial hash aggs (map-side combine)",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("probe joins the <=depth*width sketch broadcast, never shuffled",
         lambda p: "BroadcastHashJoin" in p),
        ("no window anywhere in the sketch path",
         lambda p: "Window" not in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
    "corpus_cms_merge": [
        # additivity: merge is union + re-aggregate, never a join of states
        ("merged halves re-aggregate as partial hash aggs",
         lambda p: "HashAggregate" in p and "partial" in p.lower()),
        ("union of half-sketches present", lambda p: "Union" in p),
        ("estimate join is broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no python anywhere", lambda p: "EvalPython" not in p),
    ],
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _engine_collapse_df(spark):
    """The production collapse plan (narrow impl) over a generated batch."""
    from yadex_spark.operators.collapse import collapse
    from yadex_spark.sources.genlog import gen_oplog

    return collapse(gen_oplog(spark, 10_000, 2_000).where("op != 'drop'"))


def _lake_read_df(spark):
    """The production state-read plan over a two-snapshot table."""
    import tempfile

    from yadex_spark.lake.table import LakeTable
    from yadex_spark.operators.collapse import collapse
    from yadex_spark.sources.genlog import gen_oplog

    live = gen_oplog(spark, 10_000, 2_000).where("op != 'drop'")
    tbl = LakeTable(spark, tempfile.mkdtemp(prefix="audit-lake-"))
    tbl.commit_delta(collapse(live.where("op_seq < 5000")).drop("table"), "e0")
    tbl.commit_delta(collapse(live.where("op_seq >= 5000")).drop("table"), "e1")
    return tbl.read()


def _prepare_declarative_df(spark, sf):
    """prepare_corpus with stage_barrier=False: the one-plan form whose
    whole pipeline is visible to a formatted explain."""
    from pyspark.sql import functions as F

    from yadex_spark.operators.prepare import prepare_corpus

    d = entrymod._t(spark, sf, "documents")
    return prepare_corpus(
        d.where(F.col("doc_id") % 10 != 0),
        d.where(F.col("doc_id") % 10 == 0),
        min_words=40, max_words=100_000, min_wlen_c=400, max_wlen_c=700,
        min_stop=2, max_top_word_bp=1_500, max_dup_2gram_bp=2_000,
        decontam_n=8, max_bench_df=100,
        target_bp=entrymod._MIX_TARGETS, shuffle_salt="shuf", n_shards=16,
        stage_barrier=False,
    )


def _bpe_pair_count_df(spark, sf):
    """One BPE training iteration's pair-count+argmax plan over the
    initial symbol table (the loop body bpe_train runs per merge)."""
    from pyspark.sql import functions as F

    from yadex_spark.operators.bpe import DELIM, _initial_syms, bpe_word_freq

    wf = bpe_word_freq(entrymod._t(spark, sf, "documents"))
    words = wf.select(_initial_syms(F.col("word")).alias("syms"), "freq")
    toks = F.filter(F.split("syms", DELIM * 2), lambda x: x != "")
    pair_rows = (
        words.where(F.size(toks) >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.struct(
                        F.get(toks, i).alias("lhs"),
                        F.get(toks, i + 1).alias("rhs"),
                    ),
                )
            ).alias("p"),
        )
    )
    return (
        pair_rows.groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").alias("f"))
        .orderBy(F.desc("f"), "lhs", "rhs")
        .limit(1)
    )


def main() -> None:
    spark = get_spark("explain-audit", cpus=8, shuffle_partitions=8)
    qs = dict(entrymod.queries())
    qs["engine_collapse"] = lambda s, sf: _engine_collapse_df(s)
    qs["lake_read"] = lambda s, sf: _lake_read_df(s)
    qs["prepare_corpus_declarative"] = lambda s, sf: _prepare_declarative_df(s, sf)
    qs["bpe_pair_count"] = _bpe_pair_count_df
    lines = ["# PLANS — physical-plan audit\n",
             f"Generated by scripts/explain_audit.py at sf dir `{SF}`.\n"]
    failures = 0
    for name, checks in AUDITS.items():
        p = plan_of(qs[name](spark, SF))
        lines.append(f"\n## {name}\n")
        for desc, pred in checks:
            ok = pred(p)
            failures += 0 if ok else 1
            lines.append(f"- {'✅' if ok else '❌'} {desc}")
            print(("PASS " if ok else "FAIL ") + f"{name}: {desc}")
        lines.append("\n<details><summary>plan</summary>\n\n```\n" + p.strip() + "\n```\n</details>\n")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
