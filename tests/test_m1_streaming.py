"""M1 — streaming + exactly-once (SURVEY.md §7.2).

- full streamed replay == oracle (TestSync analogue,
  /root/reference/msync/msync_test.go:72-126)
- resume from checkpoint when new chunks arrive (bookmark resume,
  /root/reference/msync/syncst_test.go:40-94 restart test)
- replayed epoch after a simulated crash (commit log truncated) does
  not double-apply — the fix for the reference's §2.1 leak
- multi-table routing with an excluded collection
  (/root/reference/msync/match_test.go:9-42)
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from yadex_spark.operators.route import Router, RoutePattern
from yadex_spark.oracle import replay, state_to_pdf
from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
from yadex_spark.streaming.pipeline import CdcPipeline
from yadex_spark.verify import assert_equal_state

N_EVENTS = 8_000
N_DOCS = 1_500


def _expected(spark, oplog, table="seqs"):
    pdf = state_to_pdf(replay(oplog.toPandas()), table)
    return spark.createDataFrame(
        pdf, "doc_id string, tokens array<int>, n_tok int, source string"
    )


@pytest.fixture()
def feed(spark, tmp_path):
    oplog = gen_oplog(spark, N_EVENTS, N_DOCS, seed=11, drop_at=(3_500,))
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=6)
    return oplog, path


def _pipe(spark, tmp_path, path, **kw) -> CdcPipeline:
    return CdcPipeline(
        spark,
        oplog_dir=path,
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )


def test_streamed_replay_matches_oracle(spark, tmp_path, feed):
    oplog, path = feed
    pipe = _pipe(spark, tmp_path, path, compact_every=3)
    pipe.run_available_now()
    actual = pipe.table("seqs").read()
    assert_equal_state(_expected(spark, oplog), actual)
    # lineage exists and covers the whole offset range
    lin = pipe.lineage()
    lo, hi = lin.agg(F.min("offset_lo"), F.max("offset_hi")).first()
    assert lo == 0 and hi == N_EVENTS - 1


def test_resume_from_checkpoint(spark, tmp_path):
    """Write half the feed, drain, write the rest, drain again with the
    same checkpoint: second run must process only the delta and end
    row-equal to a full replay."""
    oplog = gen_oplog(spark, N_EVENTS, N_DOCS, seed=12)
    path = str(tmp_path / "oplog")
    half = N_EVENTS // 2
    write_oplog_chunks(oplog.where(F.col("op_seq") < half), path, n_chunks=3)

    pipe = _pipe(spark, tmp_path, path)
    pipe.run_available_now()
    v_after_first = pipe.table("seqs").latest_version()
    assert v_after_first >= 1

    # feed the remainder (later mtime chunks), resume from checkpoint
    span = half // 3 + 1
    for i in range(3):
        chunk = oplog.where(
            (F.col("op_seq") >= half + i * span) & (F.col("op_seq") < half + (i + 1) * span)
        )
        chunk.coalesce(1).write.mode("append").parquet(path)
    pipe2 = _pipe(spark, tmp_path, path)
    pipe2.run_available_now()

    actual = pipe2.table("seqs").read()
    assert_equal_state(_expected(spark, oplog), actual)
    # the resumed run committed new versions (processed the delta)...
    assert pipe2.table("seqs").latest_version() > v_after_first
    # ...and did not reprocess epoch 0 (batch ids unique in manifests)
    ids = [s.batch_id for s in pipe2.table("seqs").snapshots() if s.batch_id]
    assert len(ids) == len(set(ids))


def test_crash_replay_is_exactly_once(spark, tmp_path, feed):
    """Simulate dying after the lake commit but before the streaming
    commit log records the epoch: remove the last checkpoint commit
    file and rerun.  The epoch replays; the lake must not double-apply."""
    oplog, path = feed
    pipe = _pipe(spark, tmp_path, path)
    pipe.run_available_now()
    versions_before = pipe.table("seqs").latest_version()

    commits = sorted(
        f for f in glob.glob(os.path.join(str(tmp_path / "ckpt"), "commits", "*"))
        if not f.endswith(".tmp") and not os.path.basename(f).startswith(".")
    )
    os.remove(commits[-1])  # forget the last epoch's commit → replay it
    crc = os.path.join(os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    pipe2 = _pipe(spark, tmp_path, path)
    pipe2.run_available_now()
    assert pipe2.table("seqs").latest_version() == versions_before  # no new snapshot
    actual = pipe2.table("seqs").read()
    assert_equal_state(_expected(spark, oplog), actual)


def test_multi_table_routing_and_exclude(spark, tmp_path):
    """Three tables; 'skip_me' excluded by the router — its events must
    not create a lake table (match_test.go:9-42 semantics)."""
    oplog = gen_oplog(
        spark, 4_000, 800, seed=13, tables=("seqs", "seqs_rt", "skip_me")
    )
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=2)
    router = Router(patterns=(RoutePattern(r"seqs.*", "ST", exclude=()),))
    pipe = _pipe(spark, tmp_path, path, router=router)
    pipe.run_available_now()

    for t in ("seqs", "seqs_rt"):
        actual = pipe.table(t).read()
        assert_equal_state(_expected(spark, oplog, t), actual)
    assert not os.path.exists(str(tmp_path / "lake" / "skip_me" / "_meta")) or (
        pipe.table("skip_me").latest_version() == 0
    )


def test_multi_table_drop_barriers(spark, tmp_path):
    """B1 rule (c) across tables: drop events land on concrete tables in
    multi-table feeds, and each table's barrier kills only ITS history
    (input.go:113-123 per-collection drop)."""
    oplog = gen_oplog(
        spark, 6_000, 1_000, seed=17, tables=("seqs", "aux"),
        drop_at=(2_500, 2_501, 4_000),
    )
    drops = oplog.where("op = 'drop'").select("table").collect()
    assert {r["table"] for r in drops} == {"seqs", "aux"}  # both tables hit
    path = str(tmp_path / "oplog")
    write_oplog_chunks(oplog, path, n_chunks=4)
    pipe = _pipe(spark, tmp_path, path)
    pipe.run_available_now()
    for t in ("seqs", "aux"):
        assert_equal_state(_expected(spark, oplog, t), pipe.table(t).read())
