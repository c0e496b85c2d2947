"""M14 — property-based test of the lake table's apply algebra.

The exactly-once core's CLAIMS, tested on arbitrary histories instead
of the fixed crash fixtures:

For ANY event history split into micro-batches, the final
``LakeTable.read()`` state equals a driver-side LWW fold of the raw
events, and is INVARIANT under

- the order the batches are committed in (out-of-order epoch arrival —
  table.py commit_truncate/_active_chain docstrings),
- replaying any batch any number of times (idempotence by batch_id),
- where in the apply sequence a seq-scoped drop barrier lands
  (order-free ``_seq >= barrier`` read predicate),
- an optional initial snapshot clone at as_of_seq=-1 (loses LWW to
  every replayed event, dies under any barrier >= 0).

hypothesis shrinks violations to a minimal history; the fixed m0/m1
crash tests pin specific orchestrations, this pins the algebra.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from yadex_spark.lake.table import LakeTable

DOCS = [f"d{i}" for i in range(6)]

SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)


@st.composite
def histories(draw):
    n_batches = draw(st.integers(1, 4))
    seq = 0
    batches = []
    for _ in range(n_batches):
        evs = []
        for _ in range(draw(st.integers(0, 6))):
            evs.append(
                (
                    draw(st.sampled_from(DOCS)),
                    draw(st.sampled_from(["insert", "update", "delete"])),
                    seq,
                )
            )
            seq += 1
        batches.append(evs)
    apply_seq = list(draw(st.permutations(range(n_batches)))) + draw(
        st.lists(st.integers(0, n_batches - 1), max_size=3)  # replays
    )
    trunc = draw(st.one_of(st.none(), st.integers(0, max(seq, 1))))
    trunc_pos = draw(st.integers(0, len(apply_seq)))
    clone = draw(st.booleans())
    return batches, apply_seq, trunc, trunc_pos, clone


def _collapse_py(evs):
    best = {}
    for doc, op, s in evs:
        if doc not in best or s > best[doc][1]:
            best[doc] = (op, s)
    return [(doc, op, s) for doc, (op, s) in best.items()]


def _oracle(batches, trunc, clone):
    rows = []
    if clone:
        rows += [(d, -1, False, "init") for d in DOCS[:3]]
    for evs in batches:
        rows += [
            (doc, s, op == "delete", f"v{s}") for doc, op, s in _collapse_py(evs)
        ]
    if trunc is not None:
        rows = [r for r in rows if r[1] >= trunc]
    best = {}
    for doc, s, dead, val in rows:
        if doc not in best or s > best[doc][0]:
            best[doc] = (s, dead, val)
    return sorted(
        (doc, val) for doc, (s, dead, val) in best.items() if not dead
    )


@settings(max_examples=6, **SETTINGS)
@given(h=histories())
def test_lake_state_invariant_under_order_replay_and_barriers(spark, h):
    batches, apply_seq, trunc, trunc_pos, clone = h
    root = tempfile.mkdtemp(prefix="prop-lake-")
    try:
        tbl = LakeTable(spark, root)
        if clone:
            tbl.commit_append(
                spark.createDataFrame(
                    [(d, "init") for d in DOCS[:3]], "doc_id string, val string"
                ),
                batch_id="clone",
            )
        for pos, bi in enumerate(apply_seq):
            if trunc is not None and pos == trunc_pos:
                tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
            rows = [
                (doc, op, s, f"v{s}") for doc, op, s in _collapse_py(batches[bi])
            ]
            if rows:
                tbl.commit_delta(
                    spark.createDataFrame(
                        rows, "doc_id string, op string, op_seq long, val string"
                    ),
                    batch_id=f"b{bi}",
                )
        if trunc is not None and trunc_pos == len(apply_seq):
            tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
        got = sorted((r.doc_id, r.val) for r in tbl.read().collect())
        assert got == _oracle(batches, trunc, clone)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def histories_with_minicompacts(draw):
    h = draw(histories())
    batches, apply_seq, trunc, trunc_pos, clone = h
    # after which apply positions to run compact_minor (any subset,
    # including immediately after the barrier or at the very end)
    minis = draw(st.sets(st.integers(0, len(apply_seq)), max_size=3))
    vacuum = draw(st.booleans())
    return h, sorted(minis), vacuum


@settings(max_examples=6, **SETTINGS)
@given(hm=histories_with_minicompacts())
def test_lake_state_invariant_under_interleaved_minicompacts(spark, hm):
    """The m14 algebra with compact_minor thrown anywhere into the apply
    sequence (and an optional closing vacuum): the read state, the
    barrier, the clone fencing, AND batch-id idempotence must all be
    unchanged — a minor compaction is invisible to every law."""
    (batches, apply_seq, trunc, trunc_pos, clone), minis, vacuum = hm
    root = tempfile.mkdtemp(prefix="prop-mini-")
    try:
        tbl = LakeTable(spark, root)
        if clone:
            tbl.commit_append(
                spark.createDataFrame(
                    [(d, "init") for d in DOCS[:3]], "doc_id string, val string"
                ),
                batch_id="clone",
            )
        for pos, bi in enumerate(apply_seq):
            if trunc is not None and pos == trunc_pos:
                tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
            if pos in minis:
                tbl.compact_minor(min_deltas=1)
            rows = [
                (doc, op, s, f"v{s}") for doc, op, s in _collapse_py(batches[bi])
            ]
            if rows:
                tbl.commit_delta(
                    spark.createDataFrame(
                        rows, "doc_id string, op string, op_seq long, val string"
                    ),
                    batch_id=f"b{bi}",
                )
        if trunc is not None and trunc_pos == len(apply_seq):
            tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
        if len(apply_seq) in minis:
            tbl.compact_minor(min_deltas=1)
        if vacuum:
            tbl.vacuum()
        got = sorted((r.doc_id, r.val) for r in tbl.read().collect())
        assert got == _oracle(batches, trunc, clone)
        # the pruned point-lookup read obeys the same algebra: for any
        # probe subset, lookup == the full read restricted to the probes
        probes = DOCS[::2] + ["nope"]
        lk = sorted((r.doc_id, r.val) for r in tbl.lookup(probes).collect())
        assert lk == [(d, v) for d, v in got if d in probes]
        # idempotence survives the merges + vacuum: replay every batch
        for bi, evs in enumerate(batches):
            rows = [(doc, op, s, f"v{s}") for doc, op, s in _collapse_py(evs)]
            if rows:
                assert tbl.commit_delta(
                    spark.createDataFrame(
                        rows, "doc_id string, op string, op_seq long, val string"
                    ),
                    batch_id=f"b{bi}",
                ) is None
        got2 = sorted((r.doc_id, r.val) for r in tbl.read().collect())
        assert got2 == got
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def histories_with_clustered_compacts(draw):
    h = draw(histories())
    _, apply_seq, _, _, _ = h
    # (position -> "full" | "minor") clustered compactions anywhere
    kinds = draw(
        st.dictionaries(
            st.integers(0, len(apply_seq)),
            st.sampled_from(["full", "minor"]),
            max_size=2,
        )
    )
    lo = draw(st.integers(0, 4))
    hi = draw(st.integers(lo, 4))
    vacuum = draw(st.booleans())
    return h, kinds, (lo, hi), vacuum


@settings(max_examples=6, **SETTINGS)
@given(hc=histories_with_clustered_compacts())
def test_read_where_equals_filtered_read_on_any_history(spark, hc):
    """read_where's manifest-planned pruning law on ARBITRARY histories:
    for any event history, any interleaving of clustered full/minor
    compactions (which commit the col_stats pruning relies on), any
    barrier position, and any range predicate, read_where == the
    unpruned read().where() == the driver oracle filtered — i.e. file
    pruning can never change an answer, only skip IO (the m37 fixed
    fixtures pin instances; this pins the algebra)."""
    from pyspark.sql import functions as F

    (batches, apply_seq, trunc, trunc_pos, clone), kinds, (lo, hi), vacuum = hc
    root = tempfile.mkdtemp(prefix="prop-rw-")
    try:
        tbl = LakeTable(spark, root)
        if clone:
            tbl.commit_append(
                spark.createDataFrame(
                    [(d, "init", -1) for d in DOCS[:3]],
                    "doc_id string, val string, num int",
                ),
                batch_id="clone",
            )
        for pos, bi in enumerate(apply_seq):
            if trunc is not None and pos == trunc_pos:
                tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
            if pos in kinds:
                if kinds[pos] == "full":
                    tbl.compact(cluster_by=["num"])
                else:
                    tbl.compact_minor(min_deltas=2, cluster_by=["num"])
            rows = [
                (doc, op, s, f"v{s}", s % 5)
                for doc, op, s in _collapse_py(batches[bi])
            ]
            if rows:
                tbl.commit_delta(
                    spark.createDataFrame(
                        rows,
                        "doc_id string, op string, op_seq long, val string, num int",
                    ),
                    batch_id=f"b{bi}",
                )
        if trunc is not None and trunc_pos == len(apply_seq):
            tbl.commit_truncate(batch_id="tr", trunc_seq=trunc)
        if len(apply_seq) in kinds:
            if kinds[len(apply_seq)] == "full":
                tbl.compact(cluster_by=["num"])
            else:
                tbl.compact_minor(min_deltas=2, cluster_by=["num"])
        if vacuum:
            tbl.vacuum()
        got = sorted(
            (r.doc_id, r.val)
            for r in tbl.read_where({"num": (lo, hi)}).collect()
        )
        full = tbl.read()
        # mirror read_where's degenerate rule: a frame that never
        # committed the predicate column can satisfy nothing
        ctl = (
            sorted(
                (r.doc_id, r.val)
                for r in full.where(F.col("num").between(lo, hi)).collect()
            )
            if "num" in full.columns
            else []
        )
        # clone rows carry num=-1 (never in [lo, hi]); delta rows num=s%5
        want = [
            (doc, val)
            for doc, val in _oracle(batches, trunc, clone)
            if val != "init" and lo <= int(val[1:]) % 5 <= hi
        ]
        assert got == ctl == sorted(want)
    finally:
        shutil.rmtree(root, ignore_errors=True)
