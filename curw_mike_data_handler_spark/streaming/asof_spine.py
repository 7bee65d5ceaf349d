"""Stream-side as-of spine join (SURVEY §2.9 extension, r9).

The batch operator (``operators/spine.py``) left-joins a regular time
grid against the latest observation at or before each grid point — the
reference's model-input preparation re-done declaratively (it fills a
15-minute spine from the newest DB rows each cron tick, e.g. the
water-level extractor's grid alignment).  On a live feed the same
question is continuous: *as each observation arrives, which upcoming
grid points does it answer?*

Spark's streaming joins cannot express "latest per key at each grid
point" directly (an as-of needs an ordered reduction, not an equality
match), but the grid is ARITHMETIC — so the join inverts into a
map-side expansion plus a windowed reduction, both natively streaming:

1. each observation at time t serves the next ``tolerance_steps`` grid
   points (slot ends ``ceil(t/step)·step + i·step``) — a narrow
   ``explode``, no shuffle;
2. per (key, slot) the latest observation wins — ``max_by`` under a
   ``window(slot, step)`` aggregation, ONE shuffle on (key, window).

With a watermark this runs in append mode with bounded state (a slot
finalizes once the watermark passes it, exactly like the windowed
resample); the gate replays it in complete mode with a
span-exceeding watermark for deterministic batch equivalence
(streaming/replay.py).  This is the streaming twin of the batch spine
join: same answer, incremental emission.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def slot_ends(time_col: Column, step_minutes: int, tolerance_steps: int) -> Column:
    """Array of grid-point timestamps an observation at ``time_col``
    serves: the first grid point at or after it (right-closed — an
    observation exactly on the grid serves its own point) and the next
    ``tolerance_steps - 1`` points."""
    step_us = step_minutes * 60_000_000
    t = F.unix_micros(time_col)
    # right-closed ceil: grid point g serves observations in
    # (g - step, g], so the first served slot is ceil(t / step) * step.
    # EXACT long arithmetic — a double division (floor(t/step)) can
    # round across an integer at large epochs and assign a row one
    # slot early (the FP-ceil hazard prefix.py documents).  t + step
    # cannot overflow for any real timestamp (epoch micros ≈ 1.7e15
    # ≪ 2^63).
    biased = t + F.lit(step_us - 1)
    first = biased - F.pmod(biased, F.lit(step_us))
    return F.transform(
        F.sequence(F.lit(0), F.lit(tolerance_steps - 1)),
        lambda i: F.timestamp_micros(
            (first + i.cast("long") * F.lit(step_us)).cast("long")
        ),
    )


def stream_asof_spine(
    events: DataFrame,
    *,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    step_minutes: int,
    tolerance_steps: int = 1,
    watermark: str | None = None,
) -> DataFrame:
    """Per (key, grid point): the value of the LATEST observation at or
    before the grid point and within ``tolerance_steps`` grid steps of
    it — emitted as ``(key…, slot, value, obs_time, n_obs)`` where
    ``slot`` is the grid-point timestamp.  Works on a stream (append
    mode needs ``watermark``; the replay gate uses complete mode) and
    on a batch frame identically — the batch run IS the oracle."""
    exploded = events.withColumn(
        "__slot_end",
        F.explode(slot_ends(F.col(time_col), step_minutes, tolerance_steps)),
    )
    if watermark is not None:
        exploded = exploded.withWatermark("__slot_end", watermark)
    won = F.max_by(
        F.struct(F.col(value_col).alias("v"), F.col(time_col).alias("t")),
        F.struct(F.col(time_col), F.col(value_col)),
    ).alias("__win")
    out = (
        exploded.groupBy(
            *key_cols,
            F.window("__slot_end", f"{step_minutes} minutes").alias("__w"),
        )
        .agg(won, F.count("*").alias("n_obs"))
    )
    return out.select(
        *key_cols,
        # window(ts, step) buckets ts into [start, end); a slot-end
        # timestamp g lands in the window that ENDS at g + step, so the
        # slot itself is the window start... except that g is always a
        # step multiple, making window.start == g exactly.
        F.col("__w.start").alias("slot"),
        F.col("__win.v").alias("value"),
        F.col("__win.t").alias("obs_time"),
        "n_obs",
    )
