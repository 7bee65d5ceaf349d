"""Spine alignment + wide⇄long reshaping (SURVEY §2.3 J1, §1.2).

The reference loops stations issuing one DB query each and left-merges
them one at a time onto a pd.date_range spine (rf_linux:155-162 — an
O(stations) sequential merge and an N+1 query pattern).  Spark-first
replacement: keep series LONG, do ONE left join of the spine against
all series at once, and pivot only at the file edge.  That is a single
shuffle regardless of station count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spine_align_long(
    spine: DataFrame,
    ts_long: DataFrame,
    series_df: DataFrame,
    *,
    time_col: str = "time",
    series_col: str = "series",
) -> DataFrame:
    """(spine ⨯ series) LEFT JOIN ts_long — every series gets every
    spine tick; absent observations are NULL (to be imputed downstream).
    ``series_df`` is the tiny distinct-series dimension → the cross is
    a broadcast nested-loop (rows = ticks × series, generated, not
    shuffled) and the join broadcasts nothing big."""
    full_grid = spine.crossJoin(F.broadcast(series_df))
    return full_grid.join(ts_long, [time_col, series_col], "left")


def pivot_wide(
    df: DataFrame,
    time_col: str = "time",
    series_col: str = "series",
    value_col: str = "value",
    series_order: Sequence[str] | None = None,
) -> DataFrame:
    """Long → wide time×series matrix (file-edge layout, §1.2).
    Passing ``series_order`` pins the output column order (a file
    CONTRACT for MIKE inputs) and lets Spark skip the extra
    distinct-scan pivot pass."""
    p = df.groupBy(time_col).pivot(
        series_col, values=list(series_order) if series_order else None
    )
    return p.agg(F.first(value_col))


def melt_long(
    df: DataFrame,
    id_col: str,
    value_cols: Sequence[str],
    series_col: str = "series",
    value_col: str = "value",
) -> DataFrame:
    """Wide → long via native unpivot (Spark ≥3.4) — the reference's
    per-column ``output[station].values.tolist()`` melt (wl_x:78)."""
    return df.unpivot(
        ids=[id_col],
        values=list(value_cols),
        variableColumnName=series_col,
        valueColumnName=value_col,
    )
