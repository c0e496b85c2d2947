"""Manifest-carried file stats (Iceberg manifest-skip shape).

Every data-bearing commit captures per-file doc_id bounds from the
freshly-written footers into the manifest (``Snapshot.file_stats``);
probe reads (read_keys / lookup / key_history) then plan from the
manifest ALONE — zero data-file footer opens — falling back to footer
probing for pre-stats manifests or unprovable files.  At 100 TB on
object storage this moves O(files) planning GETs per point lookup to
the one manifest read the operation already does.
"""

from __future__ import annotations

import json
import os

import pytest

import yadex_spark.lake.table as T
from yadex_spark.lake.table import (
    LakeTable,
    _bounds_may_contain,
    _file_key_bounds,
)
from yadex_spark.operators.collapse import collapse
from yadex_spark.sources.genlog import gen_oplog


@pytest.fixture()
def lake(spark, tmp_path):
    tbl = LakeTable(spark, str(tmp_path / "lake"))
    ev = gen_oplog(spark, n_events=5000, n_docs=1000, seed=3)
    half = 2500
    from pyspark.sql import functions as F

    tbl.commit_delta(collapse(ev.where(F.col("op_seq") < half)), batch_id="e0")
    tbl.commit_delta(collapse(ev.where(F.col("op_seq") >= half)), batch_id="e1")
    return tbl


def _no_footer(monkeypatch):
    """Make any data-file footer probe AND any data-directory listing
    explode — proves probe planning came from the manifest alone (on
    object storage both are per-snapshot round-trips)."""

    def boom(path, key, probes):  # pragma: no cover - must not run
        raise AssertionError(f"footer opened for {path}")

    def boom_ls(d):  # pragma: no cover - must not run
        raise AssertionError(f"directory listed: {d}")

    monkeypatch.setattr(T, "_file_may_contain", boom)
    monkeypatch.setattr(T, "_parquet_files", boom_ls)


def test_stats_recorded_and_exact(lake):
    for s in lake.snapshots():
        if s.files_dir is None:
            continue
        assert s.file_stats, f"v{s.version} missing stats"
        d = os.path.join(lake.path, s.files_dir)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert set(s.file_stats) == set(files)
        for rel, bounds in s.file_stats.items():
            assert bounds == _file_key_bounds(os.path.join(d, rel))


def test_probe_reads_plan_with_zero_footer_opens(lake, monkeypatch):
    probes = [r["doc_id"] for r in lake.read().limit(5).collect()]
    # footer-planned baseline first (stats forced off via a stripped view)
    want_lookup = sorted(r["doc_id"] for r in lake.lookup(probes).collect())
    want_keys = sorted(
        r["doc_id"] for r in lake.read_keys(probes=probes).collect()
    )
    _no_footer(monkeypatch)
    st = {}
    got = sorted(r["doc_id"] for r in lake.lookup(probes, prune_stats=st).collect())
    assert got == want_lookup and st["pruned"] > 0
    got = sorted(r["doc_id"] for r in lake.read_keys(probes=probes).collect())
    assert got == want_keys
    hist = lake.key_history(probes[:2])
    assert {r["doc_id"] for r in hist.collect()} <= set(probes[:2])


def test_prestats_manifest_falls_back_to_footers(lake, spark):
    # strip file_stats from every manifest on disk (a pre-stats lake)
    meta = os.path.join(lake.path, "_meta")
    for n in os.listdir(meta):
        if not n.endswith(".json"):
            continue
        p = os.path.join(meta, n)
        with open(p) as f:
            m = json.load(f)
        m.pop("file_stats", None)
        with open(p, "w") as f:
            json.dump(m, f)
    old = LakeTable(spark, lake.path)
    assert all(s.file_stats is None for s in old.snapshots())
    probes = [r["doc_id"] for r in old.read().limit(3).collect()]
    st = {}
    got = {r["doc_id"] for r in old.lookup(probes, prune_stats=st).collect()}
    assert got == set(probes)
    assert st["pruned"] > 0  # footer zone maps still prune


def test_checkpoint_fold_preserves_stats(lake, monkeypatch):
    lake.compact()
    lake.compact_meta(keep_recent=0)
    meta = os.path.join(lake.path, "_meta")
    assert any(n.startswith("checkpoint-v") for n in os.listdir(meta))
    fresh = LakeTable(lake.spark, lake.path)
    probes = [r["doc_id"] for r in fresh.read().limit(3).collect()]
    _no_footer(monkeypatch)
    st = {}
    got = {r["doc_id"] for r in fresh.lookup(probes, prune_stats=st).collect()}
    assert got == set(probes) and st["pruned"] > 0


def test_bounds_rule_edges():
    # empty file: always prunable
    assert _bounds_may_contain([], ["a"]) is False
    # inside / outside
    assert _bounds_may_contain(["b", "d"], ["c"]) is True
    assert _bounds_may_contain(["b", "d"], ["a", "e"]) is False
    assert _bounds_may_contain(["b", "d"], ["d"]) is True
    # type drift between stored bounds and probes: keep (conservative)
    assert _bounds_may_contain([1, 5], ["3"]) is True
    # no probes: nothing can match
    assert _bounds_may_contain(["b", "d"], []) is False


def test_stats_survive_minor_compaction_and_zorder(lake, monkeypatch):
    lake.compact_minor()
    lake.compact(cluster_by=["source", "n_tok"])
    probes = [r["doc_id"] for r in lake.read().limit(3).collect()]
    _no_footer(monkeypatch)
    got = {r["doc_id"] for r in lake.lookup(probes).collect()}
    # z-order broadens doc_id bounds (pruning may admit every file) but
    # planning must still come from the manifest and stay correct
    assert got == set(probes)


def test_fsck_detects_stale_file_stats(lake):
    assert lake.fsck()["errors"] == []
    # corrupt one manifest's bounds on disk
    meta = os.path.join(lake.path, "_meta")
    victim = sorted(n for n in os.listdir(meta) if n.startswith("v"))[0]
    p = os.path.join(meta, victim)
    with open(p) as f:
        m = json.load(f)
    rel = next(iter(m["file_stats"]))
    m["file_stats"][rel] = ["zzzz-not-a-real-min", "zzzz-not-a-real-min"]
    with open(p, "w") as f:
        json.dump(m, f)
    errs = LakeTable(lake.spark, lake.path).fsck()["errors"]
    assert any("file_stats bounds stale" in e for e in errs)


def test_fsck_inventory_gap_flagged_none_bounds_tolerated(lake):
    assert lake.fsck()["errors"] == []
    meta = os.path.join(lake.path, "_meta")
    victim = sorted(n for n in os.listdir(meta) if n.startswith("v"))[0]
    p = os.path.join(meta, victim)
    with open(p) as f:
        m = json.load(f)
    rel = next(iter(m["file_stats"]))
    # None bounds (unprovable at commit) are always-keep: never stale
    m["file_stats"][rel] = None
    with open(p, "w") as f:
        json.dump(m, f)
    assert LakeTable(lake.spark, lake.path).fsck()["errors"] == []
    # dropping the entry makes the file invisible to probe planning
    # (readers plan from the inventory alone) — fsck must flag the gap
    del m["file_stats"][rel]
    with open(p, "w") as f:
        json.dump(m, f)
    errs = LakeTable(lake.spark, lake.path).fsck()["errors"]
    assert any("absent from file_stats inventory" in e for e in errs)
