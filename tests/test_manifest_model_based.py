"""Model-based random walk over the manifest-table write surface:
append / merge / delete / range-delete / rebucket interleave in a
seeded random order, and after EVERY published generation the table
must equal an in-memory dict model — the interaction-bug net the
per-operation tests can't cast (e.g. a merge after a rebucket after a
range delete touching files the earlier ops linked).

Invariants checked at every step: content equality, version strictly
increments, every file's bucket id fits the CURRENT spec, no claim
debris left behind, and every retained historical version still
resolves (snapshot isolation end to end).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

SCHEMA = "k long, v long, ts_k long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _check(spark, root, model, n_buckets):
    m = mb.read_manifest(root, "mw")
    rows = mb.read_manifest_table(spark, root, "mw").collect()
    got = {r["k"]: (r["v"], r["ts_k"]) for r in rows}
    assert len(rows) == len(got), "duplicate keys leaked into the table"
    assert got == model, (
        f"content diverged from the model: extra="
        f"{set(got) - set(model)} missing={set(model) - set(got)} "
        f"changed={[k for k in set(got) & set(model) if got[k] != model[k]]}"
    )
    assert m["num_buckets"] == n_buckets
    assert {mb._file_bucket(f) for f in m["files"]} <= set(range(n_buckets))
    mdir = os.path.join(root, "mw", "manifests")
    assert not [f for f in os.listdir(mdir) if f.startswith("claim-")]
    return m["version"]


def test_manifest_random_walk_matches_model(spark, tmp_path):
    rng = random.Random(20260816)
    root = str(tmp_path)
    model: dict[int, tuple[int, int]] = {}
    n_buckets = 2
    next_k = 0

    def fresh_rows(n):
        nonlocal next_k
        rows = [(k, rng.randrange(1000), k) for k in range(next_k, next_k + n)]
        next_k += n
        return rows

    init = fresh_rows(120)
    mb.create_manifest_table(
        spark, _df(spark, init), root, "mw",
        bucket_cols="k", num_buckets=n_buckets, sort_cols="ts_k",
    )
    model.update({k: (v, t) for k, v, t in init})
    last_version = _check(spark, root, model, n_buckets)

    try:
        for step in range(14):
            op = rng.choice(
                ["append", "merge", "delete", "delete_range", "rebucket"]
            )
            if op == "append":
                rows = fresh_rows(rng.randrange(10, 60))
                mb.append_manifest_table(
                    spark, _df(spark, rows), root, "mw",
                    compact_files_per_bucket=4,
                )
                model.update({k: (v, t) for k, v, t in rows})
            elif op == "merge" and model:
                upd_keys = rng.sample(sorted(model), min(8, len(model)))
                ins = fresh_rows(rng.randrange(0, 4))
                rows = [
                    (k, rng.randrange(1000), model[k][1]) for k in upd_keys
                ] + ins
                mb.merge_manifest_table(
                    spark, _df(spark, rows), root, "mw", key_cols="k"
                )
                model.update({k: (v, t) for k, v, t in rows})
            elif op == "delete" and model:
                doomed = rng.sample(sorted(model), min(5, len(model)))
                mb.delete_manifest_rows(
                    spark, spark.createDataFrame([(k,) for k in doomed],
                                                 "k long"),
                    root, "mw", key_cols="k",
                )
                for k in doomed:
                    model.pop(k)
            elif op == "delete_range" and model:
                lo = rng.randrange(0, max(next_k, 1))
                hi = lo + rng.randrange(5, 40)
                mb.delete_manifest_range(spark, root, "mw",
                                         lower=lo, upper=hi)
                model = {k: vt for k, vt in model.items()
                         if not (lo <= vt[1] <= hi)}
            elif op == "rebucket":
                n_buckets = rng.choice([b for b in (2, 3, 4, 8)
                                        if b != n_buckets])
                mb.rebucket_manifest_table(spark, root, "mw",
                                           num_buckets=n_buckets)
            else:
                continue
            v = _check(spark, root, model, n_buckets)
            assert v > last_version
            last_version = v

        # snapshot isolation across the whole walk: every retained
        # version still resolves and reads without error
        for ver in range(last_version + 1):
            n = mb.read_manifest_table(spark, root, "mw", version=ver).count()
            assert n >= 0
        # and expire keeps the newest window readable
        mb.expire_generations(spark, root, "mw", keep=3)
        assert (
            mb.read_manifest_table(spark, root, "mw").count() == len(model)
        )
        got = {
            r["k"]: (r["v"], r["ts_k"])
            for r in mb.read_manifest_table(spark, root, "mw").collect()
        }
        assert got == model
    finally:
        mb.drop_catalog_entries(spark, root, "mw")


def test_manifest_random_walk_with_shred(spark, tmp_path):
    """Shorter walk on a SHREDDED table with an evolution mid-way:
    routed reads must equal the model through append/merge/rebucket
    with mixed coverage."""
    rng = random.Random(7)
    root = str(tmp_path)
    model: dict[int, int] = {}  # k -> x

    def rows_df(pairs):
        return spark.createDataFrame(pairs, "k long, x long").select(
            "k", F.to_json(F.struct(F.col("x"))).alias("payload")
        )

    init = [(k, rng.randrange(100)) for k in range(80)]
    mb.create_manifest_table(
        spark, rows_df(init), root, "sw",
        bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    model.update(dict(init))
    try:
        mb.evolve_shred(spark, root, "sw", remove=["x"])
        mb.evolve_shred(spark, root, "sw", add={"x": "bigint"})
        for step in range(6):
            op = rng.choice(["append", "merge", "rebucket"])
            if op == "append":
                rows = [(k, rng.randrange(100))
                        for k in range(80 + step * 20, 100 + step * 20)]
                mb.append_manifest_table(spark, rows_df(rows), root, "sw",
                                         compact_files_per_bucket=5)
                model.update(dict(rows))
            elif op == "merge":
                ks = rng.sample(sorted(model), 6)
                rows = [(k, rng.randrange(100)) for k in ks]
                mb.merge_manifest_table(spark, rows_df(rows), root, "sw",
                                        key_cols="k")
                model.update(dict(rows))
            else:
                cur = mb.read_manifest(root, "sw")["num_buckets"]
                mb.rebucket_manifest_table(
                    spark, root, "sw", num_buckets=(4 if cur == 2 else 2)
                )
            r = mb.read_manifest_table_shredded(
                spark, root, "sw", {"x": "bigint"}, base_cols="k"
            )
            got = {row["k"]: row["x"] for row in r.collect()}
            assert got == model, f"step {step} ({op}) diverged"
    finally:
        mb.drop_catalog_entries(spark, root, "sw")
