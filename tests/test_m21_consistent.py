"""M21 — cross-table consistent reads (snapshot isolation across the lake).

The pipeline commits tables one at a time inside an epoch, so a naive
multi-table reader can see table A at epoch N and table B at N-1.
``read_consistent()`` pins every table to the same FULLY-applied epoch
(the lineage marker written after all table commits), via per-table
time travel — and must therefore (a) equal the plain reads when the
lake is quiescent, (b) hide a partially-committed epoch entirely, and
(c) reproduce any earlier epoch's cross-table state exactly.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from yadex_spark.operators.route import Router, RoutePattern
from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
from yadex_spark.streaming.pipeline import CdcPipeline

TABLES = ("seqs", "seqs_rt")


def _pipe(spark, tmp_path, path) -> CdcPipeline:
    return CdcPipeline(
        spark,
        oplog_dir=path,
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        router=Router(patterns=(RoutePattern(r"seqs.*", "ST", exclude=()),)),
        max_files_per_trigger=1,
    )


N_EVENTS = 4_000
SPAN = (N_EVENTS + 2) // 3  # write_oplog_chunks' op_seq chunking rule


@pytest.fixture()
def ran(spark, tmp_path):
    """3 single-file chunks with staggered mtimes: with
    maxFilesPerTrigger=1, epoch i ingests exactly op_seq range i."""
    oplog = gen_oplog(spark, N_EVENTS, 800, seed=19, tables=TABLES)
    path = str(tmp_path / "oplog")
    base = time.time() - 600
    for i in range(3):
        oplog.where(
            (F.col("op_seq") >= i * SPAN) & (F.col("op_seq") < (i + 1) * SPAN)
        ).repartition(1).write.mode("append").parquet(path)
        for f in os.listdir(path):
            fp = os.path.join(path, f)
            if f.endswith(".parquet") and os.path.getmtime(fp) > base + 10:
                os.utime(fp, (base + i, base + i))
    pipe = _pipe(spark, tmp_path, path)
    pipe.run_available_now()
    return oplog, pipe


def _state(df):
    return sorted(map(tuple, df.collect()))


def test_consistent_read_equals_plain_read_when_quiescent(spark, ran):
    _, pipe = ran
    assert pipe.last_applied_epoch() is not None
    cons = pipe.read_consistent()
    assert sorted(cons) == sorted(pipe.tables())
    for t in TABLES:
        assert _state(cons[t]) == _state(pipe.table(t).read())


def test_partial_epoch_is_invisible(spark, ran):
    """Commit one table for a NEWER epoch with no lineage marker (a
    crash mid-apply): plain reads see it, read_consistent must not."""
    _, pipe = ran
    before = {t: _state(pipe.table(t).read()) for t in TABLES}
    e = pipe.last_applied_epoch()

    extra = (
        pipe.table("seqs").read().limit(1)
        .select(
            F.lit("phantom-doc").alias("doc_id"),
            F.col("tokens"), F.col("n_tok"), F.col("source"),
            F.lit(10_000_000).cast("long").alias("op_seq"),
            F.lit("insert").alias("op"),
        )
    )
    pipe.table("seqs").commit_delta(
        extra, batch_id=f"{pipe._scope()}/e{e + 1}"
    )
    # plain read sees the phantom row
    assert len(_state(pipe.table("seqs").read())) == len(before["seqs"]) + 1
    # the consistent view does not — and the untouched table is intact
    assert pipe.last_applied_epoch() == e
    cons = pipe.read_consistent()
    assert _state(cons["seqs"]) == before["seqs"]
    assert _state(cons["seqs_rt"]) == before["seqs_rt"]


def test_explicit_epoch_reproduces_prefix_state(spark, tmp_path, ran):
    """read_consistent(epoch=first) must equal a fresh pipeline run
    over only the events the first epoch ingested — cross-table."""
    oplog, pipe = ran
    first = sorted(
        int((s.batch_id or "x/e-1").split("/e", 1)[1].split("-", 1)[0])
        for s in pipe.table("seqs").snapshots()
        if (s.batch_id or "").startswith(f"{pipe._scope()}/e")
    )[0]
    cons = pipe.read_consistent(epoch=first)

    # replay only chunk 0 (epochs ingest one file each) through a fresh lake
    path2 = str(tmp_path / "oplog2")
    write_oplog_chunks(oplog.where(F.col("op_seq") < SPAN), path2, n_chunks=1)
    pipe2 = CdcPipeline(
        spark, oplog_dir=path2,
        lake_dir=str(tmp_path / "lake2"), checkpoint_dir=str(tmp_path / "ckpt2"),
        router=Router(patterns=(RoutePattern(r"seqs.*", "ST", exclude=()),)),
    )
    pipe2.run_available_now()
    for t in TABLES:
        assert _state(cons[t]) == _state(pipe2.table(t).read()), t
