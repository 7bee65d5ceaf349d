"""Hive-partitioned parquet layout: pruning + dynamic backfill.

Mirrors the reference's one-directory-per-run-day export layout
(``MIKE_rf_{date}.csv``, SURVEY S7/S11) and its skip/overwrite re-run
gate (``rf_linux:271``) at table granularity: a date filter must prune
the listing (PartitionFilters, not per-row-group PushedFilters), and a
one-day backfill must replace exactly that day.
"""

import os

import pyspark.sql.functions as F
import pytest

from curw_mike_data_handler_spark.sources.partitioned import (
    partition_filters_of,
    read_pruned,
    write_partitioned,
)
from curw_mike_data_handler_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def part_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date",
        F.date_format("ts", "yyyy-MM-dd"),
    )
    write_partitioned(ev, path, partition_cols="event_date")
    return path


def test_layout_one_dir_per_day_one_file_each(spark, part_path):
    days = [
        d for d in os.listdir(part_path) if d.startswith("event_date=")
    ]
    assert len(days) >= 2
    for d in days:
        files = [
            f
            for f in os.listdir(os.path.join(part_path, d))
            if f.endswith(".parquet")
        ]
        # hash-repartition on the partition key → one task owns each
        # day → one file per directory, not one sliver per task
        assert len(files) == 1, (d, files)


def test_partition_filter_prunes_listing(spark, part_path):
    df = read_pruned(spark, part_path)
    days = sorted(r["event_date"] for r in df.select("event_date").distinct().collect())
    pick = days[0]
    q = df.filter(F.col("event_date") == pick)
    pf = partition_filters_of(q)
    assert "event_date" in pf, pf
    # the pruned scan must read ONLY that day's rows and the plan must
    # not carry the partition predicate as a data filter
    full = df.count()
    got = q.count()
    assert 0 < got < full
    pushed = _pushed_filters_of(q)
    assert "event_date" not in pushed, pushed


def _pushed_filters_of(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan, plan
    return plan.split("PushedFilters:", 1)[1].split("]", 1)[0]


def test_partition_and_data_filters_compose(spark, part_path):
    df = read_pruned(spark, part_path)
    pick = df.select(F.min("event_date").alias("d")).first()["d"]
    q = df.filter(
        (F.col("event_date") == pick) & (F.col("event_type") == "click")
    )
    assert "event_date" in partition_filters_of(q)
    assert "event_type" in _pushed_filters_of(q)


def test_dynamic_overwrite_replaces_only_touched_day(spark, part_path):
    df = read_pruned(spark, part_path)
    days = sorted(r["event_date"] for r in df.select("event_date").distinct().collect())
    target, kept = days[0], days[1]
    before_kept = df.filter(F.col("event_date") == kept).count()

    patch = (
        df.filter(F.col("event_date") == target)
        .limit(5)
        .withColumn("value", F.lit(0.0))
    )
    write_partitioned(
        patch, part_path, partition_cols="event_date", dynamic=True
    )

    after = read_pruned(spark, part_path)
    assert after.filter(F.col("event_date") == target).count() == 5
    # the untouched day survives — static overwrite would have
    # truncated the whole table (the lost-history backfill accident)
    assert after.filter(F.col("event_date") == kept).count() == before_kept


def test_static_overwrite_truncates_whole_table(spark, sf_dir, tmp_path):
    """Document the failure mode dynamic=True exists to prevent."""
    path = str(tmp_path / "t")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date",
        F.date_format("ts", "yyyy-MM-dd"),
    )
    write_partitioned(ev, path, partition_cols="event_date")
    days = sorted(
        r["event_date"]
        for r in read_pruned(spark, path).select("event_date").distinct().collect()
    )
    patch = (
        read_pruned(spark, path)
        .filter(F.col("event_date") == days[0])
        .limit(1)
    )
    write_partitioned(patch, path, partition_cols="event_date")  # static
    left = sorted(
        r["event_date"]
        for r in read_pruned(spark, path).select("event_date").distinct().collect()
    )
    assert left == [days[0]]
