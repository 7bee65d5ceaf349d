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
    ``trailing_files``).

    ``how='right_outer'`` / ``how='full_outer'`` complete the family
    over the same machinery: unmatched RIGHT rows expire once the
    watermark passes ``right_time`` (their window looks backward —
    a right row at t can only match left rows in [t − max_lag, t]).
    On the outer sides the key columns are taken from whichever side
    is present (coalesce for full outer)."""
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported stream interval join type {how!r}")
    l = left.withWatermark(left_time, watermark)
    # rename the right side's key columns up front: both branches
    # usually derive from the SAME source stream (a self-join), and
    # dataset-qualified references (l[k]/r[k]) inside a coalesce are
    # ambiguous to the analyzer there — distinct names never are
    r = right.withWatermark(right_time, watermark).withColumnsRenamed(
        {k: f"__r_{k}" for k in key_cols}
    )
    conds: list[Column] = [l[k] == r[f"__r_{k}"] for k in key_cols]
    conds.append(r[right_time] >= l[left_time])
    conds.append(
        r[right_time] <= l[left_time] + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
    )
    joined = l.join(r, reduce(lambda a, b: a & b, conds), how)
    # collapse the key columns: take the side that is always present —
    # left for inner/left_outer, right for right_outer, and whichever
    # side matched for full_outer
    if how == "right_outer":
        keep = [F.col(f"__r_{k}").alias(k) for k in key_cols]
    elif how == "full_outer":
        keep = [F.coalesce(F.col(k), F.col(f"__r_{k}")).alias(k) for k in key_cols]
    else:
        keep = [F.col(k) for k in key_cols]
    keep += [l[c] for c in left.columns if c not in key_cols]
    keep += [r[c] for c in right.columns if c not in key_cols]
    return joined.select(*keep)
