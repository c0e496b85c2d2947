"""Initial clone: snapshot copy + anti-join dedup + stream handoff
(SURVEY.md I1/I2/I3).

Reference semantics:
- I1: clone inserts only docs whose _id is NOT already at the receiver
  (fetch receiver ids, ``$nin`` filter — /root/reference/msync/syncst.go:11-28,66-71)
  → ``left_anti`` join here (broadcast when the id set is small; AQE
  picks the strategy otherwise).  At 10^10-key scale Catalyst
  additionally injects a runtime Bloom filter on the probe side
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default
  — verified in this build) once the build side crosses its
  creation threshold, so most already-present keys are dropped at the
  scan before the shuffle.
- I2: the resume token is captured *before* the copy
  (/root/reference/msync/syncst.go:76,91), so the stream replays the
  copy window; idempotent apply makes the overlap safe (there: dup-key
  tolerance, /root/reference/msync/bulkwrite.go:98-102; here: LWW —
  snapshot rows carry _seq=-1 so any change event wins).
- Stale-snapshot safety (beyond the reference): snapshot rows carry
  _seq=-1, so a re-clone of an out-of-date snapshot can never resurrect
  a key the stream has since deleted — its tombstone (higher _seq)
  wins the LWW.  The reference never faces this because it clones from
  the live sender; we may clone from a lagging export.
- I3: multi-pass orchestration if bookmarks were purged mid-clone
  (/root/reference/msync/syncst.go:137-145); with a lake source the
  retention race is checked once (``handoff_offset`` vs feed min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadex_spark.lake.table import LakeTable


def clone_snapshot(source: DataFrame, target: LakeTable, batch_id: str = "clone") -> int | None:
    """Copy ``source`` (one row per doc_id, flat payload columns — the
    lake's storage layout) into ``target``, skipping keys already
    present (anti-join I1).  Idempotent by batch_id AND by the
    anti-join itself — a re-run after partial success copies only the
    missing delta (TestSyncCollectionMultiple semantics,
    /root/reference/msync/syncst_test.go:101-142)."""
    existing = target.read().select("doc_id")
    missing = source.join(existing, "doc_id", "left_anti")
    if missing.isEmpty():
        return None
    return target.commit_append(missing, batch_id=batch_id)


def clone_with_handoff(source: DataFrame, target: LakeTable, oplog: DataFrame,
                       batch_id: str = "clone", max_rounds: int = 3) -> int:
    """I3: full clone orchestration — capture the pre-copy resume point,
    anti-join copy, then re-check that the feed can still serve the
    handoff (the bookmark-purge race, /root/reference/msync/
    syncst.go:137-145: if bookmarks were purged mid-clone the reference
    loops another clone pass).  With a retained feed the race shows as
    the feed's oldest offset advancing past the captured handoff; each
    extra round re-captures and copies only the missing delta (the
    anti-join makes re-passes cheap).

    Returns the handoff op_seq the stream must resume at or before.
    """
    for i in range(max_rounds):
        handoff = capture_handoff_offset(oplog)
        clone_snapshot(source, target, batch_id=f"{batch_id}-r{i}")
        row = oplog.agg(F.min("op_seq")).first()
        feed_min = row[0]
        if feed_min is None or int(feed_min) <= handoff + 1:
            return handoff
    raise RuntimeError(
        f"feed retention outran the clone {max_rounds} times "
        "(reference behavior: keep looping clone passes)"
    )


def capture_handoff_offset(oplog: DataFrame) -> int:
    """The pre-copy resume point: stream replay must start at or before
    this op_seq.  With a file/lake feed the analogue of the reference's
    'SyncId captured before the copy' is the current max op_seq (or -1
    for an empty feed)."""
    row = oplog.agg(F.max("op_seq")).first()
    return -1 if row[0] is None else int(row[0])
