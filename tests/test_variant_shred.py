"""Variant/JSON shredding in the manifest-bucketed layout (round-10
roadmap #1): shred-at-write materialized columns, manifest shred
stats, routed reads with raw fallback, and shred-stat file pruning.

Plan guards here are the done-criteria from the r9 verdict: the pruned
read must (a) scan ONLY the files whose shredded-field range survives,
and (b) keep the raw JSON column OUT of ReadSchema when every
requested field is shredded.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_json_batch(spark, lo: int, hi: int, *, null_every: int = 0):
    """Rows k in [lo, hi) with payload = {"k": k, "t": "t<k%3>",
    "c": 10k}; every ``null_every``-th row gets a payload with k
    MISSING (shred → NULL) to exercise null stats."""
    df = spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("uid"),
        F.col("id").alias("_k"),
    )
    body = F.to_json(
        F.struct(
            F.col("_k").alias("k"),
            F.concat(F.lit("t"), (F.col("_k") % 3).cast("string")).alias("t"),
            (F.col("_k") * 10).alias("c"),
        )
    )
    nobody = F.to_json(F.struct(F.concat(F.lit("t"), (F.col("_k") % 3).cast("string")).alias("t")))
    payload = (
        F.when((F.col("_k") % null_every) == 0, nobody).otherwise(body)
        if null_every
        else body
    )
    return df.select("event_id", "uid", payload.alias("payload"))


SHRED = {"column": "payload", "fields": {"k": "bigint", "c": "bigint"}}


@pytest.fixture()
def shredded_table(spark, tmp_path):
    """Three appends with disjoint k ranges → per-file shred stats are
    tight per batch, so range pruning can drop whole appends."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk_json_batch(spark, 0, 100), root, "ev",
        bucket_cols="uid", num_buckets=4, shred=SHRED,
    )
    mb.append_manifest_table(spark, _mk_json_batch(spark, 100, 200), root, "ev")
    mb.append_manifest_table(spark, _mk_json_batch(spark, 200, 300), root, "ev")
    yield root
    mb.drop_catalog_entries(spark, root, "ev")


def test_shred_columns_materialized_and_manifest_records_spec(spark, shredded_table):
    m = mb.read_manifest(shredded_table, "ev")
    assert m["shred"] == SHRED
    ddl = m["schema_ddl"]
    assert "_shred_payload_k` bigint" in ddl and "_shred_payload_c` bigint" in ddl
    # the stored shred columns equal the read-time extraction exactly
    raw = mb.read_manifest_table(spark, shredded_table, "ev")
    diff = raw.filter(
        F.col("_shred_payload_k")
        != F.variant_get(F.try_parse_json("payload"), "$.k", "bigint")
    )
    assert diff.count() == 0


def test_manifest_shred_field_stats(spark, shredded_table):
    """Per-field rollup in the manifest: exact min/max/null-count from
    the parquet footers, no data scan."""
    m = mb.read_manifest(shredded_table, "ev")
    fs = m["shred_field_stats"]
    assert fs["k"] == {"min": 0, "max": 299, "n_nulls": 0}
    assert fs["c"] == {"min": 0, "max": 2990, "n_nulls": 0}
    # per-file stats exist for every file and carry [min, max, nulls]
    assert set(m["shred_stats"]) == set(m["files"])
    for per_field in m["shred_stats"].values():
        for field in ("k", "c"):
            mn, mx, nn = per_field[field]
            assert mn is not None and mx is not None and nn == 0


def test_shred_stats_carry_across_hardlinked_appends(spark, shredded_table):
    """An append hard-links the parent's files: their shred stats must
    be inherited from the parent manifest, not recomputed (same inode,
    same footer) — the carry path."""
    m2 = mb.read_manifest(shredded_table, "ev", version=2)
    m1 = mb.read_manifest(shredded_table, "ev", version=1)
    linked = set(m1["files"]) & set(m2["files"])
    assert linked, "append must hard-link the parent's files"
    for f in linked:
        assert m2["shred_stats"][f] == m1["shred_stats"][f]


def test_shred_pruned_read_prunes_files_and_read_schema(spark, shredded_table):
    """The verdict's plan guard: a [120, 180] range on the shredded
    field keeps ONLY the files the middle append wrote (k ∈ [100, 200)),
    and the all-shredded projection keeps 'payload' out of ReadSchema."""
    m = mb.read_manifest(shredded_table, "ev")
    m0 = mb.read_manifest(shredded_table, "ev", version=0)
    m1 = mb.read_manifest(shredded_table, "ev", version=1)
    middle = set(m1["files"]) - set(m0["files"])
    kept = mb.shred_pruned_files(m, "k", lower=120, upper=180)
    assert set(kept) == middle
    assert len(kept) < len(m["files"])
    r = mb.read_manifest_table_shred_pruned(
        spark, shredded_table, "ev", {"k": "bigint", "c": "bigint"},
        prune_field="k", lower=120, upper=180,
    ).filter(F.col("k").between(120, 180))
    plan = _executed(r)
    assert f"InMemoryFileIndex({len(kept)} paths)" in plan, plan
    import re

    rs = re.search(r"ReadSchema: (struct<[^>]*>)", plan).group(1)
    assert "payload:string" not in rs, rs  # the raw JSON column
    assert "_shred_payload_k" in rs and "_shred_payload_c" in rs
    # the residual filter pushes down on the typed column
    assert "PushedFilters: [" in plan and "_shred_payload_k" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    got = r.agg(F.count("*"), F.sum("c")).first()
    assert got[0] == 61 and got[1] == sum(10 * k for k in range(120, 181))


def test_pruning_is_never_a_filter(spark, shredded_table):
    """Stats prune files, not rows: composing the pruned read with the
    real filter gives exactly the unpruned answer for ANY bounds."""
    full = (
        mb.read_manifest_table_shredded(
            spark, shredded_table, "ev", {"k": "bigint"}
        )
        .filter(F.col("k").between(50, 250))
        .agg(F.count("*"), F.sum("k"))
        .first()
    )
    pruned = (
        mb.read_manifest_table_shred_pruned(
            spark, shredded_table, "ev", {"k": "bigint"},
            prune_field="k", lower=50, upper=250,
        )
        .filter(F.col("k").between(50, 250))
        .agg(F.count("*"), F.sum("k"))
        .first()
    )
    assert tuple(full) == tuple(pruned)


def test_raw_fallback_matches_shredded_semantics(spark, tmp_path):
    """A field outside the shred spec resolves via parse-at-read over
    the raw column — same expression, same answer as if it had been
    shredded (shredding is an optimization, never a semantic fork)."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk_json_batch(spark, 0, 120), root, "ev",
        bucket_cols="uid", num_buckets=4,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    try:
        r = mb.read_manifest_table_shredded(
            spark, root, "ev", {"k": "bigint", "t": "string", "c": "bigint"}
        )
        rows = r.groupBy("t").agg(F.count("*").alias("n"), F.sum("c").alias("sc"))
        got = {row["t"]: (row["n"], row["sc"]) for row in rows.collect()}
        exp: dict[str, list[int]] = {}
        for k in range(120):
            t = f"t{k % 3}"
            n, sc = exp.get(t, (0, 0))
            exp[t] = (n + 1, sc + 10 * k)
        assert got == exp
        # the fallback leg necessarily reads payload; the projection is
        # still pruned to (payload + shred cols), nothing else
        plan = _executed(r)
        import re

        rs = re.search(r"ReadSchema: (struct<[^>]*>)", plan).group(1)
        assert "payload" in rs and "event_id" not in rs and "uid" not in rs
    finally:
        mb.drop_catalog_entries(spark, root, "ev")


def test_missing_and_malformed_fields_shred_to_null(spark, tmp_path):
    """A payload without the field (or unparseable JSON) shreds to
    NULL; null counts land in the per-file and per-field stats; files
    whose only rows are NULL keep no min/max and are never pruned."""
    root = str(tmp_path)
    batch = _mk_json_batch(spark, 0, 90, null_every=3)
    broken = spark.createDataFrame(
        [(10_001, 0, "{not json")], "event_id long, uid long, payload string"
    )
    mb.create_manifest_table(
        spark, batch.unionByName(broken), root, "ev",
        bucket_cols="uid", num_buckets=2, shred=SHRED,
    )
    try:
        m = mb.read_manifest(root, "ev")
        # 30 missing-k rows + 1 malformed row
        assert m["shred_field_stats"]["k"]["n_nulls"] == 31
        r = mb.read_manifest_table_shredded(spark, root, "ev", {"k": "bigint"})
        assert r.filter(F.col("k").isNull()).count() == 31
        # pruning keeps every file containing in-range non-null values
        kept = mb.shred_pruned_files(m, "k", lower=0, upper=1000)
        assert set(kept) == set(m["files"])
    finally:
        mb.drop_catalog_entries(spark, root, "ev")


def test_compaction_preserves_shred_columns_and_stats(spark, tmp_path):
    """Crossing the per-bucket file bound compacts into a fresh
    generation: the shredded columns ride along (no re-parse — they are
    plain columns now) and the new files get fresh footer stats."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk_json_batch(spark, 0, 50), root, "ev",
        bucket_cols="uid", num_buckets=2, shred=SHRED,
    )
    for i in range(1, 4):
        mb.append_manifest_table(
            spark, _mk_json_batch(spark, 50 * i, 50 * (i + 1)), root, "ev",
            compact_files_per_bucket=3,
        )
    try:
        m = mb.read_manifest(root, "ev")
        assert m.get("compacted_from") is not None
        assert len(m["files"]) == 2  # one file per bucket after compaction
        assert m["shred"] == SHRED
        assert m["shred_field_stats"]["k"] == {
            "min": 0, "max": 199, "n_nulls": 0
        }
        r = mb.read_manifest_table_shredded(spark, root, "ev", {"k": "bigint"})
        assert r.agg(F.sum("k")).first()[0] == sum(range(200))
    finally:
        mb.drop_catalog_entries(spark, root, "ev")


def test_hostile_shred_spec_rejected(spark, tmp_path):
    df = _mk_json_batch(spark, 0, 10)
    for bad in (
        {"column": "payload", "fields": {"k; DROP": "bigint"}},
        {"column": "payload", "fields": {"a'b": "string"}},
        {"column": "payload"},
    ):
        with pytest.raises(ValueError):
            mb.create_manifest_table(
                spark, df, str(tmp_path), "ev",
                bucket_cols="uid", num_buckets=2, shred=bad,
            )


def test_manifest_json_is_serializable_and_complete(spark, shredded_table):
    """The manifest is the durable contract: round-trip through json
    and check the shred block survives verbatim."""
    path = os.path.join(shredded_table, "ev", "manifests", "manifest-2.json")
    with open(path) as fh:
        m = json.load(fh)
    assert m["shred"] == SHRED
    assert m["shred_field_stats"]["k"]["max"] == 299
