"""Watermarked tumbling-window aggregation — the Structured Streaming
form of the reference's 15-minute accumulation (SURVEY §2.4 A1 /
§2.9 late-data row).

The batch engine resamples with right-closed/right-labeled buckets
(operators/resample.py); this is the same bucket algebra on an
unbounded stream: a watermark bounds how late an observation may
arrive (the reference's analog is the `obs_end ≥ now()−1d` staleness
predicate, gen_mike_input_rf_linux.py:115-121 — data older than the
horizon simply never enters a run), windows finalize exactly once when
the watermark passes their end, and later-than-watermark rows are
dropped instead of silently mutating an already-shipped MIKE input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The 1-microsecond shift converting Spark's [start, end) windows to
# the reference's pandas (start, end] resample buckets — identical to
# the batch helper so batch and stream agree bucket-for-bucket.
_EPS = "INTERVAL 0.000001 SECONDS"


def windowed_sum_right_closed_stream(
    events: DataFrame,
    *,
    step_minutes: int = 15,
    watermark: str = "30 minutes",
    time_col: str = "time",
    value_col: str = "value",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Streaming right-closed tumbling sum: one output row per
    (keys, bucket-end) with the bucket's sum, emitted exactly once in
    append mode when the watermark passes the bucket end.

    Use with ``file_watch.run_available_now`` for the cron-cadence
    deployment: each tick drains new files, finalizes every bucket the
    new watermark has passed, and appends them to the sink.
    """
    shifted = events.withColumn("__t", F.col(time_col) - F.expr(_EPS))
    agg = (
        shifted.withWatermark("__t", watermark)
        .groupBy(*key_cols, F.window("__t", f"{step_minutes} minutes").alias("__w"))
        .agg(F.coalesce(F.sum(value_col), F.lit(0.0)).alias(value_col))
    )
    return agg.select(*key_cols, F.col("__w.end").alias(time_col), value_col)


def ohlc_bars_stream(
    events: DataFrame,
    *,
    step_minutes: int = 60,
    watermark: str = "30 minutes",
    time_col: str = "time",
    value_col: str = "value",
    key_cols: Sequence[str] = (),
    seq_col: str | None = None,
) -> DataFrame:
    """Streaming OHLC bars: one row per (keys, bucket-start) with
    open/high/low/close/n_events, finalized exactly once when the
    watermark passes the bucket end (append mode) — the unbounded
    twin of catalog.events_ohlc_bars, sharing its semantics: buckets
    are [start, end) labeled by start (`date_trunc` parity), and
    open/close are `min_by`/`max_by` on a lexicographic
    [epoch_us(, seq)] array key, so first/last are deterministic
    under same-microsecond ties when ``seq_col`` is given.

    Scale shape: a plain watermarked streaming aggregation — state is
    one row per open (keys, bucket), evicted at finalization; the
    min_by/max_by pairs fold incrementally per micro-batch exactly
    like sum/min/max (no sorted buffer, no per-event state)."""
    key_parts = [F.unix_micros(F.col(time_col))]
    if seq_col is not None:
        key_parts.append(F.col(seq_col).cast("long"))
    key = F.array(*key_parts)
    agg = (
        events.withWatermark(time_col, watermark)
        .groupBy(
            *key_cols, F.window(time_col, f"{step_minutes} minutes").alias("__w")
        )
        .agg(
            F.min_by(value_col, key).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, key).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    return agg.select(
        *key_cols,
        F.col("__w.start").alias(time_col),
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )
