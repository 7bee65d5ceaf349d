"""Stream-stream interval join (SURVEY §2.9 extension).

The reference joins its observation streams only after landing them in
MySQL (each extract_* script reads the other series back out of the
DB — e.g. the water-level extractor re-reading rainfall context).  In
Spark the two live streams join directly: an inner join on key plus a
bounded time-range predicate.  The range bound is what makes the state
finite — with both sides watermarked, Spark evicts a left row once the
global watermark passes ``left_time + max_lag`` (no unbounded buffer,
the requirement for a join that runs forever on an unbounded stream).

Scale shape: both sides shuffle on hash(key) once; state lives in the
join operator keyed by the equi-key, range-pruned per trigger.  This
is the streaming twin of the batch range join (operators/rangejoin.py).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_time: str,
    right_time: str,
    max_lag_minutes: int,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key_cols`` where ``right_time`` falls
    in ``[left_time, left_time + max_lag_minutes]``.

    Both inputs must carry distinct non-key column names (rename before
    calling); both get ``watermark`` applied to their own time column,
    which bounds join state as described in the module docstring.

    ``how='left_outer'`` (r9 roadmap #2) additionally emits every
    unmatched left row with NULL right columns — but only once the
    GLOBAL watermark (the min across both inputs) passes
    ``left_time + max_lag``, the earliest moment Spark can prove no
    matching right row can still arrive.  Consequences callers must
    plan for: (a) NULL rows trail the event time by the watermark
    delay, and (b) a stream that simply ENDS never advances the
    watermark past its last row, so the final unmatched rows stay in
    state — production feeds tick forever, but bounded replays must
    append a watermark-advancing row (see replay_file_stream's
    ``trailing_files``)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream interval join type {how!r}")
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    conds: list[Column] = [l[k] == r[k] for k in key_cols]
    conds.append(r[right_time] >= l[left_time])
    conds.append(
        r[right_time] <= l[left_time] + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
    )
    joined = l.join(r, reduce(lambda a, b: a & b, conds), how)
    # drop the duplicate key columns from the right side (on an outer
    # join the right copy is NULL for unmatched rows — the left copy is
    # the one that is always present)
    keep = [l[k] for k in key_cols]
    keep += [l[c] for c in left.columns if c not in key_cols]
    keep += [r[c] for c in right.columns if c not in key_cols]
    return joined.select(*keep)
