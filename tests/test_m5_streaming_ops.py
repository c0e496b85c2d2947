"""M5 — custom stateful streaming operators over the change feed.

sessionize_stream (applyInPandasWithState) is checked against a pandas
gap-sessionization oracle — the same semantics as the batch
``events_sessionize`` gate query; windowed_counts against a batch window
aggregation over the identical input.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks


@pytest.fixture()
def user_feed(spark, tmp_path):
    """(user_id, ts) event feed derived from the oplog generator, written
    as ordered chunks so the stream replays deterministically."""
    oplog = gen_oplog(spark, 4_000, 120, seed=23, ties_per_ms=1)
    ev = oplog.select(
        F.col("op_seq").alias("event_id"),
        (F.xxhash64("doc_id") % 40).alias("user_id"),
        # ~16.6 min per global step: a user hit on nearby steps stays in
        # one session, a user idle for >3 steps crosses the 1 h gap —
        # monotone in event_id so the chunked feed replays in order
        F.timestamp_millis(F.col("op_seq") * 997_000).alias("ts"),
        F.col("op").alias("event_type"),
    )
    path = str(tmp_path / "events")
    n = 4_000
    # the sessionizer is ORDER-SENSITIVE (unlike the LWW tests, which
    # are order-free by construction): the file source replays files in
    # mtime order, so every FILE gets a strictly increasing RECENT
    # mtime in id order (coalesce preserves partition order, so
    # part-00000 holds lower event_ids than part-00001).  The observed
    # flake: two same-mtime files of one append could split across
    # 2-file triggers in either half order whenever an append produced
    # an odd file count — batch N+1 then carried timestamps EARLIER
    # than batch N's max and the stream legitimately split sessions the
    # global-order batch oracle doesn't.  (Recent stamps matter too:
    # past-epoch stamps fall outside the source's maxFileAge window and
    # files get re-listed.)
    import os as _os
    import time as _time

    base = _time.time() - 600
    stamped: set[str] = set()
    seq = 0
    for i in range(3):
        ev.where(
            (F.col("event_id") >= i * n // 3) & (F.col("event_id") < (i + 1) * n // 3)
        ).coalesce(2).write.mode("append").parquet(path)
        for f in sorted(_os.listdir(path)):  # part-00000 < part-00001
            fp = _os.path.join(path, f)
            if f.endswith(".parquet") and fp not in stamped:
                _os.utime(fp, (base + seq, base + seq))
                stamped.add(fp)
                seq += 1
    return ev, path


def _py_sessions(pdf: pd.DataFrame, gap_s: int) -> set:
    out = set()
    for uid, g in pdf.groupby("user_id"):
        ts = sorted(g["ts"])
        sid, start, last, n = 0, None, None, 0
        for t in ts:
            if last is not None and (t - last).total_seconds() > gap_s:
                out.add((uid, sid, start, last, n))
                sid += 1
                start, n = None, 0
            if start is None:
                start = t
            last = t
            n += 1
        out.add((uid, sid, start, last, n))
    return out


def test_sessionize_stream_matches_oracle(spark, user_feed):
    from yadex_spark.streaming.stateful import sessionize_stream

    ev, path = user_feed
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 2).parquet(path)

    q = (
        sessionize_stream(stream, gap="1 hour")
        .writeStream.format("memory").queryName("sess")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain (ambient load?)"
    assert q.exception() is None
    rows = spark.table("sess").collect()
    # update-mode emissions: the final fact per (user, session) is the
    # row with the highest n_events (counts only grow across batches)
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        if k not in final or r["n_events"] > final[k]["n_events"]:
            final[k] = r
    got = {
        (r["user_id"], r["session_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in final.values()
    }
    want = _py_sessions(ev.select("user_id", "ts").toPandas(), 3600)
    assert got == want
    assert len({k[0] for k in want}) > 10  # fixture is multi-user
    assert any(k[1] > 0 for k in want)     # and actually splits sessions


def test_sessionize_group_spanning_arrow_chunks(spark, tmp_path):
    """One hot user whose micro-batch group spans MANY Arrow chunks,
    with timestamps shuffled so disorder crosses chunk boundaries: the
    sessionizer must sort the CONCATENATED group, not each chunk
    (round-2 advice: per-chunk sorting produced spurious session
    splits; the multi-user fixture never spanned chunks)."""
    from yadex_spark.streaming.stateful import sessionize_stream

    n = 240
    base = pd.Timestamp("2026-01-01")
    # 6 bursts of 40 events (each burst 39 s wide), bursts 2 h apart
    # -> exactly 6 sessions under a 1 h gap
    ts = [base + pd.Timedelta(seconds=(i // 40) * 7200 + (i % 40)) for i in range(n)]
    perm = sorted(range(n), key=lambda i: (i * 7919) % n)  # deterministic shuffle
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [1] * n,
            "ts": [ts[j] for j in perm],
            "event_type": ["click"] * n,
        }
    )
    path = str(tmp_path / "ev")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(path)

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        ).parquet(path)
        q = (
            sessionize_stream(stream, gap="1 hour")
            .writeStream.format("memory").queryName("sess_chunks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not drain (ambient load?)"
        assert q.exception() is None
        rows = spark.table("sess_chunks").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        if k not in final or r["n_events"] > final[k]["n_events"]:
            final[k] = r
    got = sorted(
        (r["session_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in final.values()
    )
    want = sorted(
        (s, 40, base + pd.Timedelta(seconds=s * 7200),
         base + pd.Timedelta(seconds=s * 7200 + 39))
        for s in range(6)
    )
    assert got == want


def test_windowed_counts_matches_batch(spark, user_feed):
    from yadex_spark.streaming.stateful import windowed_counts

    ev, path = user_feed
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 2).parquet(path)
    q = (
        windowed_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory").queryName("wc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain (ambient load?)"
    assert q.exception() is None
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("wc").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want
