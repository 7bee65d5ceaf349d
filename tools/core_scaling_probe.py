#!/usr/bin/env python
"""r13 core-count scaling spot-check (r12 verdict #7): two
compute-bound queries at ~sf1 input volume, 8 vs 32 cores, fresh JVM
per (cores, pass).  At sf0.1 every per-query ratio sat at 0.5-1.3x
because 2-5 s queries are dominated by the per-job scheduling floor;
this probe feeds 10x the rows so compute dominates and the ratio can
actually open toward the core ratio.

The scaled corpus is derived deterministically from
/root/testdata/sf0.1 (never modified) into .scratch/sf1_core
(gitignored): lineitem and documents x10 with shifted keys; the other
eight tables are copied as-is.  Results are wall times only (no oracle
at this scale; correctness is pinned at sf0.001/0.01/0.1).

Usage: python tools/core_scaling_probe.py [build|run <cores>|report]
(`report` orchestrates everything: build, then one subprocess per
cores value, then a markdown table for SCALE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCRATCH = os.path.join(REPO, ".scratch", "sf1_core")
SRC = "/root/testdata/sf0.1"
QUERIES = ["dedup_keep_list", "basket_apriori_triples"]
COPIES = 10


def build() -> None:
    import shutil

    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark import get_spark

    if os.path.exists(os.path.join(SCRATCH, "_built")):
        return
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(app_name="core-probe-build",
                      extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    (li.crossJoin(copies)
       .withColumn("l_orderkey",
                   F.col("l_orderkey") + F.col("__copy") * 100_000_000)
       .drop("__copy")
       .repartition(32)
       .write.parquet(f"{SCRATCH}/lineitem.parquet"))
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (docs.crossJoin(copies)
         .withColumn("doc_id",
                     F.col("doc_id") + F.col("__copy") * 10_000_000)
         .withColumn(
             "text",
             F.concat_ws(" ", F.col("text"), F.concat(
                 F.lit("m"), F.md5(F.concat_ws(
                     ":", F.col("doc_id"), F.col("__copy"))).substr(1, 8))),
         )
         .drop("__copy")
         .repartition(32)
         .write.parquet(f"{SCRATCH}/documents.parquet"))
    spark.stop()
    for t in ("customer", "embeddings", "events", "nation", "orders",
              "part", "region", "supplier"):
        os.symlink(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")
    open(os.path.join(SCRATCH, "_built"), "w").write("ok\n")


def run(cores: int) -> None:
    from curw_mike_data_handler_spark import catalog, get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    spark = get_spark(app_name=f"core-probe-{cores}", extra_conf={
        "spark.driver.memory": "24g",
        "spark.driver.extraJavaOptions":
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
    })
    spark.sparkContext.setLogLevel("ERROR")
    catalog.QUERIES["a5_distinct"](spark, SCRATCH).write.format("noop").mode(
        "overwrite").save()
    out = {"cores": cores}
    for label in ("cold", "warm"):
        t = {}
        for n in QUERIES:
            t0 = time.perf_counter()
            catalog.QUERIES[n](spark, SCRATCH).write.format("noop").mode(
                "overwrite").save()
            t[n] = round(time.perf_counter() - t0, 2)
        out[label] = t
    print(json.dumps(out), flush=True)
    spark.stop()


def report() -> None:
    build()
    rows = []
    for cores in (32, 8, 32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", str(cores)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                rows.append(json.loads(line))
                break
            except ValueError:
                continue
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        build()
    elif len(sys.argv) > 1 and sys.argv[1] == "run":
        run(int(sys.argv[2]))
    else:
        report()
