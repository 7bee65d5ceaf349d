"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.9 — the Structured Streaming
upgrade path for the reference's cron-state-in-filesystem pattern).

Per user, events separated by more than ``gap_minutes`` start a new
session.  State (running counts + last-seen timestamp) lives in the
streaming state store, checkpointed — an availableNow run picks up
exactly where the previous run stopped, the same way the reference's
extraction resumes from its filesystem markers (but exactly-once).

This is the one sanctioned stateful-Python surface; batch callers
should use the window/lag formulation in catalog.events_sessionize.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, n_sessions bigint"
STATE_SCHEMA = "n_events bigint, n_sessions bigint, last_ts double"


def _make_fn(gap_seconds: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_events, n_sessions, last_ts = state.get
        else:
            n_events, n_sessions, last_ts = 0, 0, None
        ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for t in ts_all:
            tsec = t.timestamp()
            if last_ts is None or tsec - last_ts > gap_seconds:
                n_sessions += 1
            n_events += 1
            last_ts = tsec
        state.update((n_events, n_sessions, last_ts))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n_events, "n_sessions": n_sessions}]
        )

    return fn


def sessionize_stream(events: DataFrame, *, gap_minutes: float = 30.0) -> DataFrame:
    """events stream (user_id, ts, …) → per-user running session/event
    counts, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_minutes * 60.0),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
