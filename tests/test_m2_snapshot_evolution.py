"""M2/M4/M5 — snapshot clone + handoff, schema evolution, late-data expiry.

Reference analogues:
- multi-round delta-only clone: TestSyncCollectionMultiple
  (/root/reference/msync/syncst_test.go:101-142)
- snapshot-then-stream handoff with pre-copy resume point
  (/root/reference/msync/syncst.go:76,91)
- schema tolerance (BSON shape change mid-stream → Iceberg-style merge)
- RT expiry drop (/root/reference/msync/bulkwrite.go:60-63)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yadex_spark.lake.table import LakeTable
from yadex_spark.oracle import replay, state_to_pdf
from yadex_spark.snapshot import capture_handoff_offset, clone_snapshot
from yadex_spark.sources.genlog import gen_oplog, gen_snapshot, write_oplog_chunks
from yadex_spark.streaming.pipeline import CdcPipeline
from yadex_spark.verify import assert_equal_state


def test_multi_round_clone_copies_only_delta(spark, tmp_path):
    tbl = LakeTable(spark, str(tmp_path / "t"))
    for rnd in range(4):
        n = 101 * (rnd + 1)
        src = gen_snapshot(spark, n, seed=7)
        clone_snapshot(src, tbl, batch_id=f"clone-{rnd}")
        assert tbl.read().count() == n
        # the latest append holds only the 101-row delta (anti-join I1)
        appended = [s for s in tbl.snapshots() if s.action == "append"]
        assert appended[-1].n_rows == 101
    # idempotent re-clone: nothing to copy
    assert clone_snapshot(gen_snapshot(spark, 404, seed=7), tbl, batch_id="again") is None


def test_snapshot_then_stream_handoff(spark, tmp_path):
    """Clone a pre-existing table, then stream changes over the same key
    space; final state == oracle replay seeded with the snapshot."""
    n_docs = 1_200
    snap = gen_snapshot(spark, n_docs, seed=7)
    oplog = gen_oplog(spark, 6_000, n_docs, seed=21)
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=3)

    pipe = CdcPipeline(spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"))
    tbl = pipe.table("seqs")
    assert capture_handoff_offset(spark.read.parquet(path)) == 5_999
    clone_snapshot(snap, tbl, batch_id="clone")
    pipe.run_available_now()

    snap_pdf = snap.toPandas()
    initial = {
        "seqs": {
            r.doc_id: {"tokens": list(map(int, r.tokens)), "n_tok": int(r.n_tok), "source": r.source}
            for r in snap_pdf.itertuples(index=False)
        }
    }
    expected = spark.createDataFrame(
        state_to_pdf(replay(oplog.toPandas(), initial=initial), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected, tbl.read())


def test_clone_with_handoff_orchestration(spark, tmp_path):
    """I3: the orchestrator captures the pre-copy resume point, clones,
    and re-checks feed retention; the stream replayed from the handoff
    lands on the oracle state seeded with the snapshot."""
    from yadex_spark.snapshot import clone_with_handoff

    n_docs = 800
    snap = gen_snapshot(spark, n_docs, seed=7)
    oplog = gen_oplog(spark, 4_000, n_docs, seed=29)
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=2)

    pipe = CdcPipeline(spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"))
    tbl = pipe.table("seqs")
    handoff = clone_with_handoff(snap, tbl, spark.read.parquet(path))
    assert handoff == 3_999  # pre-copy resume point = feed max
    assert tbl.read().count() == n_docs
    pipe.run_available_now()

    snap_pdf = snap.toPandas()
    initial = {"seqs": {
        r.doc_id: {"tokens": list(map(int, r.tokens)), "n_tok": int(r.n_tok), "source": r.source}
        for r in snap_pdf.itertuples(index=False)
    }}
    expected = spark.createDataFrame(
        state_to_pdf(replay(oplog.toPandas(), initial=initial), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected, tbl.read())


def test_schema_evolution_mid_stream(spark, tmp_path):
    """Feed part 1 with the base schema, then redeploy the pipeline with
    the evolved schema (added source_meta) on feed part 2 — same lake,
    same checkpoint.  Old rows read as source_meta=null (FIXTURES.md §4)."""
    n_events, n_docs, half = 6_000, 1_200, 3_000
    base = gen_oplog(spark, n_events, n_docs, seed=31)           # base schema
    evolved = gen_oplog(spark, n_events, n_docs, seed=31, evolve_at=half)
    path = str(tmp_path / "oplog")
    write_oplog_chunks(base.where(F.col("op_seq") < half), path, n_chunks=2)

    pipe1 = CdcPipeline(spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"))
    pipe1.run_available_now()
    assert "source_meta" not in pipe1.table("seqs").read().columns

    # evolved rows arrive; pipeline redeployed with evolved schema
    evolved.where(F.col("op_seq") >= half).coalesce(1).write.mode("append").parquet(path)
    pipe2 = CdcPipeline(
        spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"), evolved=True
    )
    pipe2.run_available_now()
    actual = pipe2.table("seqs").read()
    assert "source_meta" in actual.columns

    expected = spark.createDataFrame(
        state_to_pdf(replay(evolved.toPandas()), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string, source_meta string",
    )
    assert_equal_state(expected, actual)
    # keys last touched before the evolution point read as null
    stale = actual.where(F.col("source_meta").isNull()).count()
    assert stale > 0


def test_late_data_expiry_rt_tier(spark, tmp_path):
    """RT tier drops events older than the expiry window vs the running
    high-watermark; final state matches the lossy oracle and lineage
    counts the drops.  Expiry applies because the route pattern is RT —
    ST tables never expire (msync/bulkwrite.go runBulkWriteRT)."""
    from yadex_spark.operators.route import RT, RoutePattern, Router

    oplog = gen_oplog(
        spark, 6_000, 1_200, seed=41, late_frac=0.05, late_lag_ms=10_000
    )
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=3)
    pipe = CdcPipeline(
        spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"),
        router=Router(patterns=(RoutePattern(".*", RT),)),
        expiry_ms=5_000,
    )
    pipe.run_available_now()

    expected = spark.createDataFrame(
        state_to_pdf(replay(oplog.toPandas(), expiry_ms=5_000), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected, pipe.table("seqs").read())
    dropped = pipe.lineage().agg(F.sum("n_dropped_late")).first()[0]
    assert dropped and dropped > 0


def test_two_tier_rt_and_st_in_one_pipeline(spark, tmp_path):
    """Per-pattern expiry (config.go:19 Expires): one pipeline routes an
    RT table (lossy, expiring per its pattern's expires_ms) and an ST
    table (lossless) — late events are dropped ONLY from the RT table."""
    from yadex_spark.operators.route import RT, ST, RoutePattern, Router

    oplog = gen_oplog(
        spark, 6_000, 1_200, seed=43, tables=("rt_feed", "st_feed"),
        late_frac=0.05, late_lag_ms=10_000,
    )
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=3)
    pipe = CdcPipeline(
        spark, path, str(tmp_path / "lake"), str(tmp_path / "ckpt"),
        router=Router(patterns=(
            RoutePattern("rt_.*", RT, expires_ms=5_000),
            RoutePattern("st_.*", ST),
        )),
    )
    pipe.run_available_now()

    pdf = oplog.toPandas()
    # per-table oracle: the RT slice replays lossy, the ST slice lossless
    for tname, window in (("rt_feed", 5_000), ("st_feed", None)):
        expected = spark.createDataFrame(
            state_to_pdf(replay(pdf[pdf.table == tname], expiry_ms=window), tname),
            "doc_id string, tokens array<int>, n_tok int, source string",
        )
        assert_equal_state(expected, pipe.table(tname).read())
    late = {
        r["table"]: r["n"]
        for r in pipe.lineage().groupBy("table").agg(F.sum("n_dropped_late").alias("n")).collect()
    }
    assert late["rt_feed"] > 0 and late["st_feed"] == 0
