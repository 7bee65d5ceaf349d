"""Model-based random walk over the manifest-table write surface:
append / merge / delete / range-delete / rebucket / CONCURRENT appends
/ merge-on-read upserts / merge-on-read deletes (r12)
interleave in a seeded random order, and after EVERY published
generation the table must equal an in-memory dict model — the
interaction-bug net the per-operation tests can't cast (e.g. a merge
after a rebucket after a range delete touching files the earlier ops
linked).

Invariants checked at every step: content equality, version strictly
increments, every file's bucket id fits the CURRENT spec, no claim
debris left behind, point-filter lookups lose no rows (no false
negatives through any rewrite), size-stat rollups match the model's
cardinality, and every retained historical version still resolves
(snapshot isolation end to end).

A second walk drives a SHREDDED table through append/merge/rebucket
with shred EVOLUTION steps interleaved (r10 verdict #5: the features
that shipped after the walk was written join the net): a field is
retired and re-added mid-walk, so routed reads cross generations with
mixed coverage — stored column, coalesce repair, and raw-parse
fallback all live in one table at once.
"""

from __future__ import annotations

import os
import random
import threading

from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

SCHEMA = "k long, v long, ts_k long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _check(spark, root, model, n_buckets, rng):
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
    # size stats never go stale through links/rewrites; the rollup is
    # PHYSICAL rows — merge-on-read vectors keep dead rows in the
    # files, so logical cardinality is row_count minus dv_positions
    if m.get("size_rollup") is not None:
        physical = m["size_rollup"]["row_count"]
        assert physical - m.get("dv_positions", 0) == len(model)
    # point-filter lookups: NO false negative for any probed value,
    # through every append/merge/delete/rebucket interleaving
    if model:
        probe_vals = rng.sample([vt[0] for vt in model.values()],
                                min(3, len(model)))
        for pv in probe_vals:
            want = sorted(k for k, vt in model.items() if vt[0] == pv)
            pr = mb.read_manifest_table_point(spark, root, "mw", "v", pv)
            got_k = sorted(
                r["k"] for r in pr.filter(F.col("v") == pv).collect()
            )
            assert got_k == want, (
                f"point lookup v={pv} lost rows: {want} vs {got_k}"
            )
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
        point_filter_cols="v",
    )
    model.update({k: (v, t) for k, v, t in init})
    last_version = _check(spark, root, model, n_buckets, rng)

    try:
        for step in range(16):
            op = rng.choice(
                ["append", "merge", "delete", "delete_range", "rebucket",
                 "concurrent_append", "merge_mor", "delete_mor"]
            )
            if op == "append":
                rows = fresh_rows(rng.randrange(10, 60))
                mb.append_manifest_table(
                    spark, _df(spark, rows), root, "mw",
                    compact_files_per_bucket=4,
                )
                model.update({k: (v, t) for k, v, t in rows})
            elif op == "concurrent_append":
                # two racing writers: the claim CAS serializes them,
                # both batches land exactly once in some order
                batches = [fresh_rows(12), fresh_rows(12)]
                errors: list = []

                def _run(rows):
                    try:
                        mb.append_manifest_table(
                            spark, _df(spark, rows), root, "mw",
                            compact_files_per_bucket=100,
                        )
                    except Exception as e:  # pragma: no cover
                        errors.append(e)

                threads = [threading.Thread(target=_run, args=(b,))
                           for b in batches]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                assert not errors, errors
                for rows in batches:
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
            elif op == "merge_mor" and model:
                # merge-on-read upsert (r12): vectors + delta files
                upd_keys = rng.sample(sorted(model), min(8, len(model)))
                ins = fresh_rows(rng.randrange(0, 4))
                rows = [
                    (k, rng.randrange(1000), model[k][1]) for k in upd_keys
                ] + ins
                mb.merge_manifest_table_mor(
                    spark, _df(spark, rows), root, "mw", key_cols="k",
                    compact_files_per_bucket=4,
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
            elif op == "delete_mor" and model:
                doomed = rng.sample(sorted(model), min(4, len(model)))
                mb.delete_manifest_rows_mor(
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
            v = _check(spark, root, model, n_buckets, rng)
            assert v > last_version
            last_version = v

        # snapshot isolation across the whole walk: every retained
        # version still resolves and reads without error
        for ver in range(last_version + 1):
            n = mb.read_manifest_table(spark, root, "mw", version=ver).count()
            assert n >= 0
        # the STREAM reader over the whole walk equals the batch feed
        # (multiset, r12): the dv/mor/cow/rebucket interleavings flow
        # through the executor-side pyarrow partitions here, not just
        # the scripted cases in tests/test_cdf_source.py
        from collections import Counter

        from curw_mike_data_handler_spark.streaming.cdf_source import (
            ManifestCDFStreamReader,
        )

        reader = ManifestCDFStreamReader(
            {"root": root, "table": "mw", "startingVersion": 0}
        )
        srows = []
        for p in reader.partitions({"version": 0},
                                   {"version": last_version}):
            for batch in reader.read(p):
                srows.extend(batch.to_pylist())

        def _ms(rows):
            return Counter(
                (r["k"], r["v"], r["ts_k"], r["_change_type"],
                 r["_commit_version"]) for r in rows
            )

        assert _ms(srows) == _ms(
            mb.read_manifest_changes(
                spark, root, "mw", from_version=0
            ).collect()
        ), "stream feed diverged from the batch feed over the walk"
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


def test_manifest_random_walk_with_shred_and_evolution(spark, tmp_path):
    """Walk on a SHREDDED table with EVOLUTION steps in the op mix:
    field ``y`` is retired and re-added at random points, so the table
    permanently mixes pre/post-evolution files — routed reads must
    equal the model whether ``y`` comes from the stored column, the
    coalesce repair, or the raw-parse fallback."""
    rng = random.Random(7)
    root = str(tmp_path)
    model: dict[int, tuple[int, int]] = {}  # k -> (x, y)
    y_shredded = True

    def rows_df(triples):
        return spark.createDataFrame(
            triples, "k long, x long, y long"
        ).select(
            "k",
            F.to_json(F.struct(F.col("x"), F.col("y"))).alias("payload"),
        )

    init = [(k, rng.randrange(100), rng.randrange(100)) for k in range(80)]
    mb.create_manifest_table(
        spark, rows_df(init), root, "sw",
        bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint", "y": "bigint"}},
    )
    model.update({k: (x, y) for k, x, y in init})
    try:
        for step in range(10):
            op = rng.choice(["append", "merge", "rebucket", "evolve"])
            if op == "append":
                rows = [(k, rng.randrange(100), rng.randrange(100))
                        for k in range(80 + step * 20, 100 + step * 20)]
                mb.append_manifest_table(spark, rows_df(rows), root, "sw",
                                         compact_files_per_bucket=5)
                model.update({k: (x, y) for k, x, y in rows})
            elif op == "merge":
                ks = rng.sample(sorted(model), 6)
                rows = [(k, rng.randrange(100), rng.randrange(100))
                        for k in ks]
                mb.merge_manifest_table(spark, rows_df(rows), root, "sw",
                                        key_cols="k")
                model.update({k: (x, y) for k, x, y in rows})
            elif op == "rebucket":
                cur = mb.read_manifest(root, "sw")["num_buckets"]
                mb.rebucket_manifest_table(
                    spark, root, "sw", num_buckets=(4 if cur == 2 else 2)
                )
            else:  # evolve: toggle y between shredded and raw-fallback
                if y_shredded:
                    mb.evolve_shred(spark, root, "sw", remove=["y"])
                else:
                    mb.evolve_shred(spark, root, "sw", add={"y": "bigint"})
                y_shredded = not y_shredded
            # routed read: x always shredded; y stored / repaired /
            # parsed depending on the walk's evolution history
            r = mb.read_manifest_table_shredded(
                spark, root, "sw", {"x": "bigint", "y": "bigint"},
                base_cols="k",
            )
            got = {row["k"]: (row["x"], row["y"]) for row in r.collect()}
            assert got == model, f"step {step} ({op}) diverged"
            # spec invariant: the manifest's shred fields match the
            # evolution state
            m = mb.read_manifest(root, "sw")
            want_fields = {"x"} | ({"y"} if y_shredded else set())
            assert set(m["shred"]["fields"]) == want_fields
            mdir = os.path.join(root, "sw", "manifests")
            assert not [f for f in os.listdir(mdir)
                        if f.startswith("claim-")]
    finally:
        mb.drop_catalog_entries(spark, root, "sw")
