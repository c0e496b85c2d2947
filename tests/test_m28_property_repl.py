"""M28 — property-based laws for the resumed-session lake surfaces.

- Replication law: for ANY random op sequence, split into ANY epochs,
  with a sync after ANY prefix of commits and again at the end, BOTH
  replicator modes leave the target live-state-equal to the source —
  and equal to a driver-side LWW fold of the same events.
- Purge law: for ANY op sequence and ANY victim subset, after
  purge_keys the live state equals the fold minus the victims, and NO
  parquet file under the table root contains a victim key.

Each Spark round-trip is seconds, so examples are few but the inputs
are adversarial (hot keys, deletes of absent keys, interleaved
epochs); hypothesis shrinks any violation.
"""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings, strategies as st

from yadex_spark.lake.replicate import LakeReplicator
from yadex_spark.lake.table import LakeTable
from yadex_spark.operators.collapse import collapse

TS = datetime.datetime(2026, 1, 1)
OPLOG_DDL = (
    "op_seq long, op_ts timestamp, op string, table string, doc_id string, "
    "after struct<tokens:array<int>,n_tok:int,source:string>"
)

SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    print_blob=True,
)

#: (key 0-3, op 0-3) per event: tight key domain forces multi-epoch
#: update/delete chains on the same key
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=14
)


def _materialize_events(evs):
    """(key, opcode) pairs -> oplog rows with op_seq = position."""
    ops = ["insert", "update", "replace", "delete"]
    return [
        (i, TS, ops[code], "t", f"k{key}",
         None if ops[code] == "delete" else ([i, key], 2, f"s{key}"))
        for i, (key, code) in enumerate(evs)
    ]


def _fold(rows):
    """Driver-side LWW fold -> {doc_id: (n_tok, source)} of live keys."""
    state: dict[str, tuple] = {}
    for _i, _ts, op, _t, k, after in rows:
        if op == "delete":
            state[k] = None
        else:
            state[k] = (after[1], after[2])
    return {k: v for k, v in state.items() if v is not None}


def _commit_epochs(spark, tbl, rows, n_epochs, tag):
    """``tag`` namespaces batch ids per call — committing two halves
    with overlapping ids would (correctly) skip the second half as an
    idempotent replay, which is the engine working, not a bug."""
    if not rows:
        return
    per = max(1, (len(rows) + n_epochs - 1) // n_epochs)
    for e in range(0, len(rows), per):
        chunk = rows[e:e + per]
        df = collapse(spark.createDataFrame(chunk, OPLOG_DDL)).drop("table")
        tbl.commit_delta(df, batch_id=f"{tag}-e{e}")


def _live(tbl):
    return {
        r["doc_id"]: (r["n_tok"], r["source"]) for r in tbl.read().collect()
    }


@settings(max_examples=6, **SETTINGS)
@given(evs=events_strategy, n_epochs=st.integers(1, 4),
       mode=st.sampled_from(["physical", "logical"]),
       mid_sync=st.booleans())
def test_replication_law(spark, tmp_path_factory, evs, n_epochs, mode, mid_sync):
    base = tmp_path_factory.mktemp("repl")
    rows = _materialize_events(evs)
    src = LakeTable(spark, str(base / "src"))
    dst = LakeTable(spark, str(base / "dst"))
    rep = LakeReplicator(src, dst, mode=mode)

    half = len(rows) // 2
    _commit_epochs(spark, src, rows[:half], n_epochs, "a")
    if mid_sync:
        rep.sync()  # bookmark mid-history; the tail must still converge
    _commit_epochs(spark, src, rows[half:], n_epochs, "b")
    rep.sync()

    want = _fold(rows)
    assert _live(src) == want
    assert _live(dst) == want
    assert rep.sync() == 0  # caught up: replay is a no-op


@settings(max_examples=6, **SETTINGS)
@given(evs=events_strategy, victims=st.sets(st.integers(0, 3), max_size=3))
def test_purge_law(spark, tmp_path_factory, evs, victims):
    base = tmp_path_factory.mktemp("purge")
    rows = _materialize_events(evs)
    tbl = LakeTable(spark, str(base / "t"))
    _commit_epochs(spark, tbl, rows, 3, "p")
    vkeys = [f"k{v}" for v in victims]
    tbl.purge_keys(vkeys)

    want = {k: v for k, v in _fold(rows).items() if k not in vkeys}
    assert _live(tbl) == want
    on_disk: set[str] = set()
    for f in glob.glob(os.path.join(str(base / "t"), "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f)
        if "doc_id" in t.column_names:
            on_disk.update(x for x in t.column("doc_id").to_pylist() if x)
    assert not (on_disk & set(vkeys))
