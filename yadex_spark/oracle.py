"""Single-threaded replay oracle — the reference semantics, literally.

Applies an oplog to a per-table dict keyed by doc_id, one event at a
time in (op_ts, op_seq) order, exactly as the reference's receiver ends
up after yadex replays the change stream
(/root/reference/msync/oploggetters.go:94-112: insert/update/replace →
set post-image, delete → remove; /root/reference/msync/input.go:113-123:
drop → clear table).  This is the ground truth every distributed path
is verified against (the analogue of running the real yadex pair and
then /root/reference/cmd/compare-dbs.go).
"""

from __future__ import annotations

import pandas as pd


def replay(
    oplog_pdf: pd.DataFrame,
    expiry_ms: int | None = None,
    initial: dict[str, dict[str, dict]] | None = None,
) -> dict[str, dict[str, dict]]:
    """Replay events; returns {table: {doc_id: payload_dict}}.

    ``expiry_ms``: if set, RT-tier lossy semantics — an event whose
    op_ts lags the max op_ts seen so far by more than the window is
    dropped (/root/reference/msync/bulkwrite.go:60-63, README.md:33-36).
    ``initial``: pre-clone state (snapshot handoff, SURVEY.md I2).

    Events are applied in ARRIVAL order (op_seq — the change stream's
    resume-token order), exactly as the reference's receiver applies
    them.  op_ts is monotone in op_seq for on-time events, so the
    engine's (op_ts, op_seq) LWW agrees; late events (older op_ts,
    newer op_seq) exist only in the lossy RT tier where the expiry
    window must drop them (the generator's late_lag_ms > expiry_ms
    guarantees that).
    """
    df = oplog_pdf.sort_values("op_seq", kind="stable")
    state: dict[str, dict[str, dict]] = {
        t: dict(d) for t, d in (initial or {}).items()
    }
    # expiry is judged against the feed-wide max op_ts (the fixture
    # guarantees late_lag >> expiry + on-time span, so this equals the
    # engine's persistent-watermark rule batch by batch)
    max_ts = df["op_ts"].max() if expiry_ms is not None and len(df) else None
    payload_cols = [c for c in df.columns if c not in ("op_seq", "op_ts", "op", "table", "doc_id")]
    assert payload_cols == ["after"], f"unexpected oplog columns: {df.columns}"
    for row in df.itertuples(index=False):
        op = row.op
        table = row.table
        if expiry_ms is not None and (max_ts - row.op_ts).total_seconds() * 1000 > expiry_ms:
            continue  # expired — lossy RT tier drops it
        if op == "drop":
            state.pop(table, None)
            continue
        if table is None or row.doc_id is None:
            continue  # namespace filter F1
        tbl = state.setdefault(table, {})
        if op == "delete":
            tbl.pop(row.doc_id, None)
        elif op in ("insert", "update", "replace"):
            after = row.after
            if isinstance(after, dict):
                payload = dict(after)
            else:  # Row or tuple-like
                payload = after.asDict(recursive=True) if hasattr(after, "asDict") else dict(after)
            tbl[row.doc_id] = payload
    return state


def state_to_pdf(state: dict[str, dict], table: str = "seqs") -> pd.DataFrame:
    """Flatten one table's dict state to a pandas frame (doc_id + payload)."""
    rows = []
    for doc_id, payload in state.get(table, {}).items():
        r = {"doc_id": doc_id}
        r.update(payload)
        if r.get("tokens") is not None:
            r["tokens"] = [int(t) for t in r["tokens"]]
        rows.append(r)
    if not rows:
        return pd.DataFrame(columns=["doc_id", "tokens", "n_tok", "source"])
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
