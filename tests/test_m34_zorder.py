"""Z-order clustered compaction (lake/zorder.py + compact(cluster_by)).

Pins (1) the layout is PURELY physical — table state, exactly-once
batch ids, and point lookups are unchanged through a z-order compact;
(2) the pruning claim is MEASURED, not asserted: per-file parquet
footer bounds exclude files for single-column predicates on BOTH
z-order columns, where the doc_id layout's footers exclude (almost)
nothing; (3) the bucket fold is bisect_right, property-tested.
"""

from __future__ import annotations

import bisect
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from yadex_spark.lake.table import LakeTable
from yadex_spark.lake.zorder import bucket_expr, column_cuts, zorder_expr
from yadex_spark.operators.collapse import collapse
from yadex_spark.sources.genlog import gen_oplog


def _build(spark, path, n_events=6000, n_docs=1500):
    tbl = LakeTable(spark, path)
    ev = gen_oplog(spark, n_events=n_events, n_docs=n_docs, seed=11)
    tbl.commit_delta(collapse(ev), batch_id="z-epoch-0")
    return tbl


def _file_bounds(root, files_dir, col):
    """[(min, max)] per data file for ``col``, from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    d = os.path.join(root, files_dir)
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            assert stats is not None and stats.has_min_max
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        out.append((lo, hi))
    return out


def test_zorder_compact_is_purely_physical(spark, tmp_path):
    """State, schema, batch-id replay, and lookup() all unchanged."""
    tbl = _build(spark, str(tmp_path / "z1"))
    before = sorted(
        (r["doc_id"], r["n_tok"], r["source"], list(r["tokens"]))
        for r in tbl.read().collect()
    )
    v = tbl.compact(cluster_by=["source", "n_tok"])
    assert v is not None
    after = sorted(
        (r["doc_id"], r["n_tok"], r["source"], list(r["tokens"]))
        for r in tbl.read().collect()
    )
    assert after == before
    # exactly-once: the epoch's batch id still registers as committed
    assert "z-epoch-0" in tbl.committed_batch_ids()
    # point lookup stays correct on the z-ordered base (pruning is
    # conservative: broad doc_id footers admit more files, never fewer)
    probes = [before[0][0], before[len(before) // 2][0], "no-such-doc"]
    got = {r["doc_id"] for r in tbl.lookup(probes).collect()}
    assert got == {probes[0], probes[1]}


def test_zorder_prunes_both_columns_where_docid_layout_cannot(spark, tmp_path):
    """The measured claim: on the z layout, per-file footer bounds on
    EACH participating column exclude a solid share of files for a
    single-column predicate; the doc_id layout excludes ~nothing."""
    tbl_z = _build(spark, str(tmp_path / "zz"))
    tbl_d = _build(spark, str(tmp_path / "zd"))
    n_files = 16
    vz = tbl_z.compact(cluster_by=["source", "n_tok"], n_buckets=n_files)
    vd = tbl_d.compact(n_buckets=n_files)

    def pruned(tbl, v, col, lo, hi):
        files_dir = next(s for s in tbl.snapshots() if s.version == v).files_dir
        bounds = _file_bounds(tbl.path, files_dir, col)
        assert len(bounds) > 4  # the measurement needs real file spread
        skipped = sum(1 for (mn, mx) in bounds if mx < lo or mn > hi)
        return skipped / len(bounds)

    # source equality: 1 of 4 generator sources
    assert pruned(tbl_z, vz, "source", "web", "web") >= 0.5
    assert pruned(tbl_d, vd, "source", "web", "web") == 0.0
    # n_tok range: bottom ~eighth of the value domain
    hi = int(tbl_z.read().agg(F.expr("percentile(n_tok, 0.125)")).first()[0])
    assert pruned(tbl_z, vz, "n_tok", 1, hi) >= 0.5
    assert pruned(tbl_d, vd, "n_tok", 1, hi) == 0.0
    # ...and the z layout still serves the exact same rows
    a = sorted(r["doc_id"] for r in tbl_z.read().where(F.col("source") == "web").collect())
    b = sorted(r["doc_id"] for r in tbl_d.read().where(F.col("source") == "web").collect())
    assert a == b


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
       cuts=st.lists(st.integers(-50, 50), max_size=10))
def test_bucket_expr_is_bisect_right(spark, vals, cuts):
    cuts = sorted(set(cuts))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["b"] for r in df.select("x", bucket_expr("x", cuts).alias("b")).collect()}
    for v in vals:
        assert got[v] == bisect.bisect_right(cuts, v)


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    with pytest.raises(ValueError):
        zorder_expr(df, [], bits=4)
    with pytest.raises(ValueError):
        zorder_expr(df, ["x", "s"], bits=32)  # 64 bits > long
    # unsupported type fails loudly
    arr = spark.createDataFrame([([1],)], "a array<int>")
    with pytest.raises(ValueError):
        column_cuts(arr, "a")


def test_string_cuts_low_cardinality_exact(spark):
    df = spark.createDataFrame([(s,) for s in "aabbccdd"], "s string")
    cuts = column_cuts(df, "s", bits=4)
    # every distinct boundary above the minimum is representable
    assert cuts == ["b", "c", "d"]
    got = {r["s"]: r["b"] for r in
           df.select("s", bucket_expr("s", cuts).alias("b")).distinct().collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_pipeline_maintain_cluster_by(spark, tmp_path):
    """The pipeline's maintenance tier reaches the z-order layout:
    maintain(cluster_by=...) rewrites every table's base clustered and
    state is unchanged (the m1 maintain law, analytics layout)."""
    from tests.test_m1_streaming import _expected, _pipe
    from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
    from yadex_spark.verify import assert_equal_state

    oplog = gen_oplog(spark, n_events=3000, n_docs=600, seed=5)
    path = str(tmp_path / "feed")
    write_oplog_chunks(oplog, path, n_chunks=3)
    pipe = _pipe(spark, tmp_path, path)
    pipe.run_available_now()
    expected = _expected(spark, oplog)
    report = pipe.maintain(min_live_seq=3000,
                           cluster_by=["source", "n_tok"])
    assert report["tables"]["seqs"]["compacted_version"] is not None
    assert_equal_state(expected, pipe.table("seqs").read())
