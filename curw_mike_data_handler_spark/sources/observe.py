"""In-flight pipeline metrics via Spark's Observation API.

The reference audits its runs by RE-QUERYING what it just wrote (row
counts and max(time) selected back from MySQL after every insert,
e.g. the post-write checks around wl_x:96 and the run-header updates).
On a 100-TB pipeline a second read-back pass doubles IO; Spark's
``df.observe(...)`` attaches aggregate metrics to the SAME action
that materializes the data — the counts are collected as a side
effect of the one pass, with zero extra scans, and work identically
under batch and streaming (StreamingQueryProgress carries them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_ingest_metrics(
    df: DataFrame,
    *,
    value_col: str = "value",
    time_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach standard ingest metrics (rows, null/negative values,
    value min/max, and optionally max event time — the watermark the
    reference re-SELECTs after every write) to ``df``'s next action.

    Returns ``(df, observation)``; run any action on the returned
    frame, then read ``observation.get`` — a dict like
    ``{"n_rows": ..., "n_null_value": ..., "max_time": ...}``.
    The metrics ride the existing job: no second scan, no count()
    re-execution, exact even under retries (Spark reports the
    successful attempt's values).
    """
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null_value"),
        F.sum((F.col(value_col) < 0).cast("long")).alias("n_negative_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]
    if time_col is not None:
        metrics.append(F.max(time_col).alias("max_time"))
    obs = Observation("ingest_metrics")
    return df.observe(obs, *metrics), obs
