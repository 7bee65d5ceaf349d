"""Retention maintenance (reference: flush_mike_data_in_bucket.sh:20-24
— delete run directories older than 60 days, monthly cron).

Spark-first equivalent: data lives date-partitioned
(``.../run_date=YYYY-MM-DD/``); retention is partition-directory
deletion — a metadata operation, no data rewrite, exactly what
``ALTER TABLE … DROP PARTITION`` / Delta retention does at scale.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import datetime, timedelta

PARTITION_RE = re.compile(r"^(?P<key>\w+)=(?P<value>\d{4}-\d{2}-\d{2})$")


def retention_sweep(
    table_path: str,
    *,
    keep_days: int = 60,
    now: datetime | None = None,
    partition_key: str = "run_date",
    dry_run: bool = False,
) -> list[str]:
    """Drop date partitions older than ``keep_days``; returns the list
    of dropped partition values.  Idempotent."""
    now = now or datetime.now()
    cutoff = (now - timedelta(days=keep_days)).strftime("%Y-%m-%d")
    dropped = []
    if not os.path.isdir(table_path):
        return dropped
    for entry in sorted(os.listdir(table_path)):
        m = PARTITION_RE.match(entry)
        if not m or m.group("key") != partition_key:
            continue
        if m.group("value") < cutoff:
            dropped.append(m.group("value"))
            if not dry_run:
                shutil.rmtree(os.path.join(table_path, entry))
    return dropped


def compact_partition(
    spark,
    partition_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Small-files compaction: rewrite a partition directory into
    ~``target_file_bytes`` parquet files via an atomic staging swap.

    Streaming/cron ingestion (file_watch + upsert) accretes one file
    per tick; at 100 TB the resulting millions of tiny files dominate
    scan planning time and kill scan throughput.  Compaction is the
    standard companion job (Delta OPTIMIZE / Iceberg rewrite_data_files
    do the same).  Returns the new file count (0 = skipped: already
    compact)."""
    import os
    import shutil

    files = [
        f
        for f in os.listdir(partition_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if len(files) < min_files:
        return 0
    total = sum(os.path.getsize(os.path.join(partition_path, f)) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil-div

    staging = partition_path.rstrip("/") + "__compact_staging"
    (
        spark.read.parquet(partition_path)
        .repartition(int(n_out))
        .write.mode("overwrite")
        .parquet(staging)
    )
    backup = partition_path.rstrip("/") + "__compact_old"
    os.rename(partition_path, backup)
    os.rename(staging, partition_path)
    shutil.rmtree(backup)
    return int(n_out)
