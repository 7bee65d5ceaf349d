"""Hive-style partitioned parquet layout — partition pruning and
idempotent partition-level backfill.

The reference lays its exports out as one directory per run/date
(``MIKE_rf_{date}.csv`` per run day, SURVEY S7/S11) and re-runs a day
by overwriting that day's file only (``rf_linux:271`` skips a date
whose output already exists).  At warehouse scale the same layout is a
``partitionBy`` parquet table: each partition value becomes a
directory, a filter on the partition column prunes the listing BEFORE
any file is opened (the 100-TB table reads only the requested days),
and a backfill re-run replaces exactly the partitions it recomputed.

Rules enforced here (easy to get silently wrong):

* partition columns must be LOW cardinality (dates, sources, regions —
  not ids): every distinct value is a directory, and a high-cardinality
  partition key melts the file listing and writes one tiny file per
  value;
* re-runs must use DYNAMIC partition overwrite
  (``spark.sql.sources.partitionOverwriteMode=dynamic``): static mode
  (the default) TRUNCATES THE WHOLE TABLE and rewrites only the
  partitions present in the incoming frame — the classic
  lost-history backfill accident;
* repartition by the partition columns before writing, or every task
  writes a sliver of every partition (tasks × partitions small files
  instead of one file per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Write ``df`` as Hive-partitioned parquet at ``path``.

    ``dynamic=True`` replaces only the partitions present in ``df``
    (idempotent re-run of one day — the reference's skip/overwrite
    gate at file granularity); otherwise ``mode`` has plain Spark
    semantics over the whole table.  Rows are hash-repartitioned on
    the partition key first so each partition value is held by ONE
    task and lands as one file, not one sliver per task.
    """
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    writer = (
        df.repartition(*partition_cols)
        .write.format("parquet")
        .partitionBy(*partition_cols)
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic").mode(
            "overwrite"
        )
    else:
        writer = writer.mode(mode)
    writer.save(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain path read — partition columns come back as real columns
    reconstructed from the directory names; a filter on them shows up
    in the scan as ``PartitionFilters`` (pruned at listing time), NOT
    ``PushedFilters`` (evaluated per row group)."""
    return spark.read.parquet(path)


def partition_filters_of(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` clause of ``df``'s scan, for
    plan-shape assertions ('this query listed only the partitions it
    asked for')."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters:" in line:
            return line.split("PartitionFilters:", 1)[1].strip()
    return ""
