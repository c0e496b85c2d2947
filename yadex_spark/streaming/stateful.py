"""Custom stateful streaming operators (Structured Streaming surface).

Two shapes a training-data ingest pipeline needs beyond the CDC apply:

- ``windowed_counts``: watermarked tumbling-window event counts — the
  declarative path (built-in window aggregation; late data beyond the
  watermark is dropped, the streaming analogue of the RT expiry rule in
  /root/reference/msync/bulkwrite.go:60-63).
- ``sessionize_stream``: per-key session assembly as a CUSTOM stateful
  operator via ``applyInPandasWithState`` — Arrow-batched (no per-row
  Python), explicit state schema, update-mode emission.  This is the
  escape hatch for stateful semantics the built-ins can't express; the
  batch equivalent (gap-based sessionization) is the
  ``events_sessionize`` gate query, which doubles as its oracle.

State discipline (100 TB notes): state is keyed by user/doc id and holds
O(1) per key (open-session triple), so the state store scales with
distinct keys, not events; the watermark bounds how long a key's state
can grow stale before the session closes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, open boolean"
)
SESSION_STATE = "session_id long, start_us long, last_us long, n long"


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "30 minutes",
                    ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling-window counts with late-data watermark (declarative)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def _sessionize_fn(gap_us: int):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, start_us, last_us, n = state.get
        else:
            session_id, start_us, last_us, n = 0, None, None, 0
        out: list[tuple[Any, ...]] = []
        # a group large enough to span multiple Arrow chunks in one
        # micro-batch can present out-of-order timestamps ACROSS chunk
        # boundaries — concatenate first, sort the combined series once,
        # then walk (sorting per chunk produced spurious session splits)
        frames = [pdf["ts"] for pdf in pdfs]
        ts_us = (
            pd.concat(frames).astype("datetime64[us]").astype("int64").sort_values()
            if frames
            else pd.Series([], dtype="int64")
        )
        for t in ts_us:              # touches session BOUNDARIES only
            if last_us is not None and t - last_us > gap_us:
                out.append((user_id, session_id, start_us, last_us, n, False))
                session_id += 1
                start_us, n = t, 0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
        state.update((session_id, int(start_us), int(last_us), int(n)))
        out.append((user_id, session_id, start_us, last_us, n, True))  # open snapshot
        res = pd.DataFrame(
            out,
            columns=["user_id", "session_id", "session_start", "session_end",
                     "n_events", "open"],
        )
        for c in ("session_start", "session_end"):
            res[c] = pd.to_datetime(res[c], unit="us")
        yield res

    return fn


def sessionize_stream(stream: DataFrame, gap: str = "6 hours") -> DataFrame:
    """Per-user gap-based sessionization as a custom stateful operator.

    Emits a row per CLOSED session plus an open-session snapshot each
    batch (update semantics); the batch gate query
    ``events_sessionize`` computes the same sessions declaratively and
    serves as the oracle in tests.
    """
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", gap.strip())
    if not m:
        raise ValueError(f"unsupported gap {gap!r}")
    unit_us = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)] * 1_000_000
    gap_us = int(m.group(1)) * unit_us
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
