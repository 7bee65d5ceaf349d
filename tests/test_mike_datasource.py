"""Python Data Source tests: batch read (melt + pruning + pushdown),
writer commit protocol, and the append-only streaming reader."""

from __future__ import annotations

import csv
import json
import os

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources.mike_datasource import (
    EqualTo,
    In,
    _StationPruner,
    register,
)

STATIONS = ["hanwella", "glencourse", "kitulgala", "holombuwa", "daraniyagala"]


def _write_wide(path: str, n_rows: int, t0: int = 0) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Time Stamp"] + STATIONS)
        for i in range(n_rows):
            h = (t0 + i) % 24
            w.writerow(
                [f"2024-03-01 {h:02d}:00:00"]
                + [round(10.0 * s + i * 0.25, 2) for s in range(len(STATIONS))]
            )


@pytest.fixture()
def mike_dir(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    _write_wide(str(d / "res_00.csv"), 6, t0=0)
    _write_wide(str(d / "res_01.csv"), 4, t0=6)
    return str(d)


@pytest.fixture()
def ds_spark(spark):
    register(spark)
    return spark


def test_batch_read_melts_wide_matrix(ds_spark, mike_dir):
    df = ds_spark.read.format("mike_results").option("path", mike_dir).load()
    rows = df.collect()
    assert len(rows) == (6 + 4) * len(STATIONS)
    assert sorted(df.columns) == ["src_file", "station", "ts", "value"]
    one = df.filter(
        (F.col("station") == "glencourse")
        & (F.col("src_file") == "res_00.csv")
        & (F.col("ts") == "2024-03-01 02:00:00")
    ).collect()
    assert len(one) == 1 and one[0].value == 10.5


def test_station_filter_prunes_partitions(ds_spark, mike_dir):
    df = (
        ds_spark.read.format("mike_results")
        .option("path", mike_dir)
        .option("stations_per_partition", "1")
        .load()
        .filter(F.col("station") == "hanwella")
    )
    assert df.count() == 10
    assert {r.station for r in df.collect()} == {"hanwella"}


def test_pruner_unit_semantics(mike_dir):
    p = _StationPruner()
    leftover = p.push(
        [In(("station",), ("hanwella", "kitulgala")), EqualTo(("value",), 1.0)]
    )
    # unsupported filters are handed back for Spark to re-apply
    assert len(leftover) == 1 and isinstance(leftover[0], EqualTo)
    files = sorted(os.path.join(mike_dir, f) for f in os.listdir(mike_dir))
    parts = p.partitions_for(files, "Time Stamp", chunk=8)
    assert len(parts) == 2  # one chunk per file, stations pre-pruned
    assert all(set(pt.stations) == {"hanwella", "kitulgala"} for pt in parts)

    p2 = _StationPruner()
    p2.push([EqualTo(("src_file",), "res_01.csv")])
    parts2 = p2.partitions_for(files, "Time Stamp", chunk=2)
    assert {pt.file.rsplit("/", 1)[-1] for pt in parts2} == {"res_01.csv"}
    assert len(parts2) == 3  # 5 stations in chunks of 2


def test_writer_commit_protocol(ds_spark, mike_dir, tmp_path):
    out = str(tmp_path / "sink")
    df = ds_spark.read.format("mike_results").option("path", mike_dir).load()
    df.write.format("mike_results").option("path", out).mode("append").save()
    manifest = json.loads(open(os.path.join(out, "_mike_manifest.json")).read())
    assert manifest["parts"], "commit must record part files"
    on_disk = {f for f in os.listdir(out) if f.startswith("part-")}
    assert set(manifest["parts"]) == on_disk
    n_lines = sum(
        sum(1 for _ in open(os.path.join(out, f))) for f in manifest["parts"]
    )
    assert n_lines == 50

    # overwrite replaces the manifest and removes stale parts
    df.limit(5).write.format("mike_results").option("path", out).mode(
        "overwrite"
    ).save()
    manifest2 = json.loads(open(os.path.join(out, "_mike_manifest.json")).read())
    on_disk2 = {f for f in os.listdir(out) if f.startswith("part-")}
    assert set(manifest2["parts"]) == on_disk2
    n_lines2 = sum(
        sum(1 for _ in open(os.path.join(out, f))) for f in manifest2["parts"]
    )
    assert n_lines2 == 5


def test_stream_reads_only_new_files(ds_spark, mike_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        q = (
            ds_spark.readStream.format("mike_results")
            .option("path", mike_dir)
            .load()
            .groupBy("src_file")
            .count()
            .writeStream.format("memory")
            .queryName("mike_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.src_file: r["count"]
            for r in ds_spark.sql("SELECT * FROM mike_stream").collect()
        }

    first = run_batch()
    assert first == {"res_00.csv": 30, "res_01.csv": 20}

    # append-only arrival: a new (lexicographically later) file
    _write_wide(os.path.join(mike_dir, "res_02.csv"), 3, t0=10)
    second = run_batch()
    assert second == {"res_00.csv": 30, "res_01.csv": 20, "res_02.csv": 15}
