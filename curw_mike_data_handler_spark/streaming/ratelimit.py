"""Streaming token-bucket rate limiting — the stateful-stream twin of
``operators.ratelimit.token_bucket_throttle``.

The batch operator folds a whole per-key history; the stream folds the
SAME integer recurrence incrementally, with (level, last event time,
running admit/total counts) living in the streaming state store.  A
checkpointed availableNow run resumes exactly where the previous run
stopped, so admission decisions are identical whether the history
arrives in one batch or dribbles in over many restarts — the test
drives two separate runs and compares against the one-shot batch fold.

Same ground rules as the batch side: integer cents, integer
microseconds, refill ``gap_us * rate // 1_000_000_000`` (all
non-negative, so floor/trunc division agree), O(1) state per key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_admitted bigint, "
    "n_throttled bigint, final_level_cents bigint"
)
STATE_SCHEMA = "level bigint, last_us bigint, n bigint, admitted bigint"


def _make_fn(capacity_cents: int, rate_cents_per_ks: int):
    cap, rate = int(capacity_cents), int(rate_cents_per_ks)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            level, last_us, n, admitted = state.get
        else:
            level, last_us, n, admitted = cap, None, 0, 0
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["t_us", "ord"], kind="mergesort")
        for t_us, cost in zip(pdf["t_us"].values, pdf["cost"].values):
            t_us, cost = int(t_us), int(cost)
            if last_us is not None:
                level = min(cap, level + (t_us - last_us) * rate // 1_000_000_000)
            last_us = t_us
            if level >= cost:
                level -= cost
                admitted += 1
            n += 1
        state.update((level, last_us, n, admitted))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "n_admitted": admitted,
                    "n_throttled": n - admitted,
                    "final_level_cents": level,
                }
            ]
        )

    return fn


def token_bucket_stream(
    events: DataFrame,
    *,
    capacity_cents: int = 20_000,
    rate_cents_per_ks: int = 100,
) -> DataFrame:
    """events stream (user_id, t_us, ord, cost) → per-user running
    admission census, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(capacity_cents, rate_cents_per_ks),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
