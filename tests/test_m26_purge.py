"""M26 — GDPR hard erase (purge_keys): table, history, and DLQ.

The law pinned: after a purge, NO reachable data file anywhere under
the lake contains the key — not the live state, not tombstones, not
pre-purge history (vacuumed), not the dead-letter queue.  Everything
else is value-identical to before the purge.  A future feed event for
the key legitimately recreates it (new data, not resurrection).
"""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow.parquet as pq
import pytest

from yadex_spark.lake.table import LakeTable
from yadex_spark.operators.collapse import collapse

TS = datetime.datetime(2026, 1, 1)
OPLOG_DDL = (
    "op_seq long, op_ts timestamp, op string, table string, doc_id string, "
    "after struct<tokens:array<int>,n_tok:int,source:string>"
)


def _commit(spark, tbl, rows, batch_id):
    return tbl.commit_delta(
        collapse(spark.createDataFrame(rows, OPLOG_DDL)).drop("table"),
        batch_id=batch_id,
    )


def _keys_on_disk(root: str) -> set[str]:
    """doc_id values physically present in ANY parquet file under root
    — the raw filesystem truth an auditor would check."""
    out: set[str] = set()
    for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        if "doc_id" in t.column_names:
            out.update(x for x in t.column("doc_id").to_pylist() if x is not None)
    return out


@pytest.fixture()
def lake(spark, tmp_path):
    tbl = LakeTable(spark, str(tmp_path / "lake"))
    _commit(spark, tbl, [
        (1, TS, "insert", "t", "victim", ([6, 6], 2, "pii")),
        (2, TS, "insert", "t", "a", ([1], 1, "s1")),
        (3, TS, "insert", "t", "b", ([2], 1, "s1")),
    ], "A")
    _commit(spark, tbl, [
        (4, TS, "update", "t", "victim", ([7], 1, "pii")),
        (5, TS, "delete", "t", "b", None),  # tombstone survives purge
        (6, TS, "insert", "t", "c", ([3], 1, "s2")),
    ], "B")
    return tbl


def test_purge_erases_key_from_state_history_and_disk(spark, lake, tmp_path):
    before = {r["doc_id"]: r["n_tok"] for r in lake.read().collect()}
    assert "victim" in before
    v = lake.purge_keys(["victim"])
    assert v is not None
    after = {r["doc_id"]: r["n_tok"] for r in lake.read().collect()}
    assert "victim" not in after
    # everything else value-identical
    assert after == {k: n for k, n in before.items() if k != "victim"}
    # the filesystem truth: no reachable parquet file carries the key
    assert "victim" not in _keys_on_disk(str(tmp_path / "lake"))
    # other keys' tombstones survive (b stays deleted, not resurrected)
    assert "b" not in after


def test_purge_is_idempotent_and_future_events_recreate(spark, lake):
    lake.purge_keys(["victim"])
    v2 = lake.purge_keys(["victim"])  # second purge: clean no-surprise run
    assert v2 is not None  # another compact, still victim-free
    assert "victim" not in {r["doc_id"] for r in lake.read().collect()}
    # a FUTURE event (higher op_seq) legitimately recreates the key
    _commit(spark, lake, [
        (9, TS, "insert", "t", "victim", ([1], 1, "fresh")),
    ], "C")
    got = {r["doc_id"]: r["source"] for r in lake.read().collect()}
    assert got["victim"] == "fresh"


def test_purge_to_empty_table_keeps_schema(spark, tmp_path):
    tbl = LakeTable(spark, str(tmp_path / "lake"))
    _commit(spark, tbl, [(1, TS, "insert", "t", "x", ([1], 1, "s"))], "A")
    tbl.purge_keys(["x"])
    df = tbl.read()
    assert df.count() == 0
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}
    assert "x" not in _keys_on_disk(str(tmp_path / "lake"))


def test_pipeline_purge_scrubs_tables_and_dlq(spark, tmp_path):
    from pyspark.sql import types as T

    from yadex_spark.schema import oplog_schema
    from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
    from yadex_spark.streaming.pipeline import CdcPipeline

    feed = str(tmp_path / "feed")
    oplog = gen_oplog(spark, 2_000, 400, seed=66)
    write_oplog_chunks(oplog, feed, n_chunks=2)
    victim = [r["doc_id"] for r in oplog.where("op='insert'").limit(1).collect()][0]
    # a malformed row carrying the SAME key lands in the DLQ
    sch = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in oplog_schema().fields]
    )
    spark.createDataFrame(
        [(None, TS, "update", "seqs", victim, ([9], 1, "pii"))], sch
    ).write.mode("append").parquet(feed)

    pipe = CdcPipeline(
        spark, oplog_dir=feed, lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe.run_available_now()
    assert victim in {r["doc_id"] for r in pipe.dlq().collect()}

    report = pipe.purge_keys([victim])
    assert report["dlq_dirs_rewritten"] >= 1
    assert victim not in {r["doc_id"] for r in pipe.table("seqs").read().collect()}
    assert victim not in {r["doc_id"] for r in pipe.dlq().collect()}
    # filesystem truth across the WHOLE lake dir (tables + _dlq + staging)
    assert victim not in _keys_on_disk(str(tmp_path / "lake"))
    # the rest of the DLQ (other malformed rows, if any) is untouched,
    # and healthy keys still read back
    assert pipe.table("seqs").read().count() > 0
