"""PySpark-native analytics engine with the query/data-processing
capabilities of CUrW-SL/curw_mike_data_handler (reference read-only at
/root/reference), rebuilt Spark-first.

Canonical data model (SURVEY.md §1): long-form keyed time-series
``ts(series_id, time, value)`` plus small dimension tables; wide
time-by-station matrices exist only at file edges (pivot / unpivot).
All core operators are built-in Column expressions (whole-stage
codegen); no RDDs; Python UDFs only in the explicitly-marked
multimodal plumbing.
"""

from curw_mike_data_handler_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
