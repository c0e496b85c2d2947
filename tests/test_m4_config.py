"""M4 — config file + hot-reload loop (config/watch.go:19-79 analogue).

The reference's reaction to a config change is stop → recreate → rerun
(cmd/yadex.go:59-77); here the driver loop rebuilds the pipeline against
the same checkpoint between drain rounds.  The reload test mutates the
config (and extends the feed) exactly in the between-rounds window by
patching the loop's sleep — deterministic, no racing threads.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import yadex_spark.config as cfgmod
from yadex_spark.config import ConfigWatcher, load_config, run_with_reload
from yadex_spark.oracle import replay, state_to_pdf
from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks
from yadex_spark.verify import assert_equal_state


def _write_cfg(path, **kw):
    with open(path, "w") as f:
        json.dump(kw, f)


def test_load_config_defaults_and_repair(tmp_path):
    p = str(tmp_path / "cfg.json")
    # RT pattern without expires_ms -> reference default 5000 (config.go:19);
    # expires_ms <= delay_ms -> repaired upward (config.go:100-112)
    _write_cfg(p, rt_patterns=[{"regex": "rt_.*"}], delay_ms=100)
    cfg = load_config(p)
    rt = cfg.patterns[0]
    assert rt.tier == "RT" and rt.expires_ms == 5_000
    # RT-only config: NO silent ST catch-all — in the reference a
    # collection matching no configured pattern is not synced
    # (msync/match.go findEntry -> nil); round-2 advice flagged the old
    # catch-all fill-in as a lossless sync of every non-RT table
    assert len(cfg.patterns) == 1
    r = cfg.router()
    assert r.classify("rt_x") is not None and r.classify("rt_x").tier == "RT"
    assert r.classify("seqs") is None  # unmatched -> not synced

    _write_cfg(p, rt_patterns=[{"regex": "rt_.*", "expires_ms": 50}], delay_ms=100)
    assert load_config(p).patterns[0].expires_ms > 100  # repaired, not failed

    # neither key present -> the catch-all default still applies
    _write_cfg(p, delay_ms=100)
    assert load_config(p).router().classify("anything").tier == "ST"


def test_config_watcher_detects_change(tmp_path):
    p = str(tmp_path / "cfg.json")
    _write_cfg(p, patterns=[{"regex": ".*"}])
    w = ConfigWatcher(p)
    assert w.changed()        # first sighting
    assert not w.changed()    # stable
    _write_cfg(p, patterns=[{"regex": "seqs"}])
    assert w.changed()        # mtime moved


def test_hot_reload_picks_up_new_table(spark, tmp_path, monkeypatch):
    """Round 1 syncs only 'seqs'; the config gains 'aux' between rounds;
    round 2 must route aux events (from the new feed chunk) into a new
    lake table while seqs stays complete and exactly-once."""
    n1, n2 = 3_000, 6_000
    oplog = gen_oplog(spark, n2, 800, seed=19, tables=("seqs", "aux"))
    feed = str(tmp_path / "oplog")
    write_oplog_chunks(oplog.where(F.col("op_seq") < n1), feed, n_chunks=2)

    cfg_path = str(tmp_path / "cfg.json")
    _write_cfg(cfg_path, patterns=[{"regex": "seqs"}], delay_ms=10)

    def between_rounds(_cfg):
        # the reference's "config changed while running" moment
        _write_cfg(cfg_path, patterns=[{"regex": "seqs"}, {"regex": "aux"}],
                   delay_ms=10)
        oplog.where(F.col("op_seq") >= n1).coalesce(1).write.mode("append").parquet(feed)

    monkeypatch.setattr(cfgmod, "_sleep_between_rounds", between_rounds)
    rounds = run_with_reload(
        spark, cfg_path, feed, str(tmp_path / "lake"), str(tmp_path / "ckpt"),
        max_rounds=2,
    )
    assert rounds == 2

    from yadex_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(spark, feed, str(tmp_path / "lake"), str(tmp_path / "ckpt"))
    pdf = oplog.toPandas()
    # seqs saw every chunk
    expected_seqs = spark.createDataFrame(
        state_to_pdf(replay(pdf[pdf.table == "seqs"]), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected_seqs, pipe.table("seqs").read())
    # aux was routed only from the post-change chunk (pre-change aux
    # events were skipped while unrouted — reference semantics: an
    # unsynced collection's oplog entries are not buffered)
    aux_pdf = pdf[(pdf.table == "aux") & (pdf.op_seq >= n1)]
    expected_aux = spark.createDataFrame(
        state_to_pdf(replay(aux_pdf), "aux"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected_aux, pipe.table("aux").read())


def test_reload_loop_minicompact_cadence(spark, tmp_path, monkeypatch):
    """minicompact_every=1 folds each round's small deltas between drain
    rounds (the cheap LSM tier the full compact_every rarely runs);
    state must stay oracle-equal and the manifest log must show the
    minicompact."""
    n1, n2 = 2_000, 4_000
    oplog = gen_oplog(spark, n2, 500, seed=23)
    feed = str(tmp_path / "oplog")
    write_oplog_chunks(oplog.where(F.col("op_seq") < n1), feed, n_chunks=2)

    cfg_path = str(tmp_path / "cfg.json")
    _write_cfg(cfg_path, patterns=[{"regex": "seqs"}], delay_ms=10,
               minicompact_every=1, max_files_per_trigger=1)
    assert load_config(cfg_path).minicompact_every == 1

    def between_rounds(_cfg):
        oplog.where(F.col("op_seq") >= n1).coalesce(1).write.mode("append").parquet(feed)

    monkeypatch.setattr(cfgmod, "_sleep_between_rounds", between_rounds)
    run_with_reload(
        spark, cfg_path, feed, str(tmp_path / "lake"), str(tmp_path / "ckpt"),
        max_rounds=2,
    )

    from yadex_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline(spark, feed, str(tmp_path / "lake"), str(tmp_path / "ckpt"))
    tbl = pipe.table("seqs")
    actions = [s.action for s in tbl.snapshots()]
    assert "minicompact" in actions
    # each round left at most one files-bearing snapshot behind: round 2
    # merged everything committed up to it
    active, _ = tbl._active_chain()
    assert active[-1].action == "minicompact"
    expected = spark.createDataFrame(
        state_to_pdf(replay(oplog.toPandas()), "seqs"),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert_equal_state(expected, tbl.read())
