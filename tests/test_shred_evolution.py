"""Shred-spec evolution + streaming shred ingestion (round-10 roadmap
items): metadata-only spec generations, lazy materialization with
coalesce repair, compaction-driven full coverage, expire safety for
shared generation directories, and the exactly-once foreachBatch sink.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _mk(spark, lo, hi, *, null_c_every=0):
    df = spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("uid"),
        F.col("id").alias("_k"),
    )
    full = F.to_json(F.struct(F.col("_k").alias("k"), (F.col("_k") * 10).alias("c")))
    no_c = F.to_json(F.struct(F.col("_k").alias("k")))
    payload = (
        F.when((F.col("_k") % null_c_every) == 0, no_c).otherwise(full)
        if null_c_every
        else full
    )
    return df.select("event_id", "uid", payload.alias("payload"))


@pytest.fixture()
def evolved_table(spark, tmp_path):
    """k shredded at create, half loaded; evolve adds c; second half
    appended → mixed coverage."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 100), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    mb.evolve_shred(spark, root, "t", add={"c": "bigint"})
    mb.append_manifest_table(spark, _mk(spark, 100, 200), root, "t")
    yield root
    mb.drop_catalog_entries(spark, root, "t")


def test_evolution_is_metadata_only(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 50), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    try:
        m0 = mb.read_manifest(root, "t")
        v = mb.evolve_shred(spark, root, "t", add={"c": "bigint"})
        m1 = mb.read_manifest(root, "t")
        assert v == 1 and m1["parent"] == 0
        # SAME data directory, SAME files — nothing was written
        assert m1["generation"] == m0["generation"]
        assert m1["files"] == m0["files"]
        assert m1["shred"]["fields"] == {"k": "bigint", "c": "bigint"}
        assert "_shred_payload_c` bigint" in m1["schema_ddl"]
        # the new field is not covered anywhere yet
        assert mb.covered_fields(m1) == {"k"}
        # but appears in the field summary with unknown stats
        assert m1["shred_field_stats"]["c"] == {
            "min": None, "max": None, "n_nulls": None
        }
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_mixed_coverage_read_repairs_old_files(spark, evolved_table):
    """Pre-evolution files lack the c column: the router's coalesce
    repair re-parses their raw JSON, post-evolution files use the
    stored column — the combined answer equals full shred-at-create."""
    m = mb.read_manifest(evolved_table, "t")
    assert mb.covered_fields(m) == {"k"}  # c only in the new files
    r = mb.read_manifest_table_shredded(
        spark, evolved_table, "t", {"k": "bigint", "c": "bigint"}
    )
    got = r.agg(
        F.count("*"), F.sum("c"), F.count(F.when(F.col("c").isNull(), 1))
    ).first()
    assert tuple(got) == (200, sum(10 * k for k in range(200)), 0)


def test_repair_keeps_genuine_nulls_null(spark, tmp_path):
    """The coalesce repair must not resurrect a genuinely-NULL field:
    re-parsing raw JSON without the key yields NULL again."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 90, null_c_every=3), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    try:
        mb.evolve_shred(spark, root, "t", add={"c": "bigint"})
        r = mb.read_manifest_table_shredded(
            spark, root, "t", {"k": "bigint", "c": "bigint"}
        )
        assert r.filter(F.col("c").isNull()).count() == 30
        assert r.filter(F.col("c").isNotNull()).count() == 60
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_compaction_materializes_evolved_field_everywhere(spark, evolved_table):
    """A compaction rewrite repairs lazily-evolved fields from raw, so
    afterwards coverage is complete and the routed read drops BOTH the
    coalesce and the raw column from the scan."""
    import re

    # force a compaction by appending past the file bound
    for i in range(2, 5):
        mb.append_manifest_table(
            spark, _mk(spark, 100 * i, 100 * (i + 1)), evolved_table, "t",
            compact_files_per_bucket=3,
        )
    m = mb.read_manifest(evolved_table, "t")
    # the compaction fired somewhere in the chain (not necessarily the
    # head — a plain append may follow it)
    compacted = []
    v = m["version"]
    while v is not None:
        mm = mb.read_manifest(evolved_table, "t", version=v)
        if mm.get("compacted_from") is not None:
            compacted.append(v)
        v = mm.get("parent")
    assert compacted, "no compaction fired in the chain"
    assert mb.covered_fields(m) == {"k", "c"}
    # the compacted files carry real stats for c now
    assert m["shred_field_stats"]["c"]["min"] == 0
    assert m["shred_field_stats"]["c"]["max"] == 4990
    r = mb.read_manifest_table_shredded(
        spark, evolved_table, "t", {"k": "bigint", "c": "bigint"}
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    rs = re.search(r"ReadSchema: (struct<[^>]*>)", plan).group(1)
    assert "payload:string" not in rs, rs
    got = r.agg(F.count("*"), F.sum("c")).first()
    assert tuple(got) == (500, sum(10 * k for k in range(500)))


def test_evolve_remove_falls_back_to_raw(spark, evolved_table):
    v = mb.evolve_shred(spark, evolved_table, "t", remove=["k"])
    m = mb.read_manifest(evolved_table, "t")
    assert m["version"] == v and list(m["shred"]["fields"]) == ["c"]
    assert "k" not in m["shred_field_stats"]
    # reads still answer k — via parse-at-read now
    r = mb.read_manifest_table_shredded(
        spark, evolved_table, "t", {"k": "bigint"}
    )
    assert r.agg(F.sum("k")).first()[0] == sum(range(200))


def test_evolve_guards(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 20), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    try:
        with pytest.raises(ValueError, match="nothing to add"):
            mb.evolve_shred(spark, root, "t")
        with pytest.raises(ValueError, match="one shred column"):
            mb.evolve_shred(spark, root, "t", add={"x": "bigint"},
                            column="other")
        with pytest.raises(ValueError, match="mistype|already shredded"):
            mb.evolve_shred(spark, root, "t", add={"k": "string"})
        # remove then re-add with a DIFFERENT type: the stored column's
        # parquet type is fixed — rejected
        mb.evolve_shred(spark, root, "t", remove=["k"])
        with pytest.raises(ValueError, match="mistype"):
            mb.evolve_shred(spark, root, "t", add={"k": "string"})
        # same type is fine (coverage resumes where columns exist)
        mb.evolve_shred(spark, root, "t", add={"k": "bigint"})
        assert mb.covered_fields(mb.read_manifest(root, "t")) == {"k"}
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_expire_never_deletes_shared_generation_dir(spark, tmp_path):
    """The evolution manifest shares its parent's directory: expiring
    the parent while the evolution (or its descendants) is retained
    must NOT delete the shared directory."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 50), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )
    try:
        mb.evolve_shred(spark, root, "t", add={"c": "bigint"})  # v1, shares gen-00000
        gen_dir = os.path.join(root, "t", mb.read_manifest(root, "t")["generation"])
        # keep=2 retains v1 (evolution) and... only v0+v1 exist; expire
        # with keep=1 retains v1 alone, expiring v0 which SHARES v1's dir
        expired = mb.expire_generations(spark, root, "t", keep=1)
        assert expired == [0]
        assert os.path.isdir(gen_dir), "shared generation dir was deleted"
        r = mb.read_manifest_table_shredded(spark, root, "t", {"k": "bigint"})
        assert r.count() == 50
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_foreach_batch_append_exactly_once_and_restart(spark, tmp_path):
    """The streaming sink: epoch batch_ids make foreachBatch replays
    idempotent — including the interleaved-writer case where ANOTHER
    append lands between the crash and the replay (the manifest-chain
    walk, not a head-only compare)."""
    root = str(tmp_path / "tbl")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    feed_schema = "event_id long, uid long, payload string"
    mb.create_manifest_table(
        spark, spark.createDataFrame([], feed_schema), root, "ing",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint"}},
    )

    def run():
        stream = (
            spark.readStream.schema(feed_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        (stream.writeStream
         .foreachBatch(mb.foreach_batch_append(root, "ing"))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())

    try:
        _mk(spark, 0, 60).coalesce(1).write.mode("append").parquet(str(src))
        run()
        _mk(spark, 60, 120).coalesce(1).write.mode("append").parquet(str(src))
        run()  # restart from checkpoint: only the new file lands
        r = mb.read_manifest_table_shredded(
            spark, root, "ing", {"k": "bigint"}, base_cols="event_id"
        )
        assert r.count() == 120
        assert r.select("event_id").distinct().count() == 120

        # at-least-once replay of an ALREADY-LANDED epoch, with an
        # interleaved batch append in between
        sink = mb.foreach_batch_append(root, "ing")
        batch = _mk(spark, 200, 230)
        sink(batch, 7)
        v_after = mb.current_version(root, "ing")
        mb.append_manifest_table(spark, _mk(spark, 300, 310), root, "ing")
        sink(batch, 7)  # replayed epoch — must be a no-op
        m = mb.read_manifest(root, "ing")
        assert m["version"] == v_after + 1  # only the interleaved append
        r2 = mb.read_manifest_table_shredded(
            spark, root, "ing", {"k": "bigint"}, base_cols="event_id"
        )
        assert r2.count() == 160
        assert r2.select("event_id").distinct().count() == 160
        # and the stream's rows landed SHREDDED with stats
        assert mb.covered_fields(m) == {"k"}
        assert m["shred_field_stats"]["k"]["max"] == 309
    finally:
        mb.drop_catalog_entries(spark, root, "ing")


def test_append_after_remove_pads_retired_column(spark, tmp_path):
    """Review regression (reproduced live): after evolve_shred(remove),
    the retired physical column stays in the table schema — appends
    must pad it with typed NULLs instead of failing the by-name insert
    on column-count mismatch."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 40), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"k": "bigint", "c": "bigint"}},
    )
    try:
        mb.evolve_shred(spark, root, "t", remove=["k"])
        mb.append_manifest_table(spark, _mk(spark, 40, 80), root, "t")
        r = mb.read_manifest_table_shredded(
            spark, root, "t", {"k": "bigint", "c": "bigint"}
        )
        # k answers via fallback everywhere; c stays stored
        got = r.agg(F.count("*"), F.sum("k"), F.sum("c")).first()
        assert tuple(got) == (80, sum(range(80)), sum(10 * x for x in range(80)))
        # the padded column really is NULL in the new files (it is no
        # longer maintained) — visible through the raw table
        raw = mb.read_manifest_table(spark, root, "t")
        assert raw.filter(
            (F.col("event_id") >= 40) & F.col("_shred_payload_k").isNotNull()
        ).count() == 0
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_parameterized_type_readd_and_ddl_parse(spark, tmp_path):
    """Review regression: the DDL type lookup must parse parameterized
    types (decimal(10,2)) — re-adding with the IDENTICAL type is legal,
    a different type is rejected."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 20), root, "t",
        bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"c": "decimal(10,2)"}},
    )
    try:
        mb.evolve_shred(spark, root, "t", remove=["c"])
        v = mb.evolve_shred(spark, root, "t", add={"c": "decimal(10,2)"})
        assert mb.read_manifest(root, "t")["version"] == v
        mb.evolve_shred(spark, root, "t", remove=["c"])
        # a DIFFERENT parameterization is a different type — rejected
        with pytest.raises(ValueError, match="mistype"):
            mb.evolve_shred(spark, root, "t", add={"c": "decimal(12,4)"})
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_hostile_type_strings_rejected(spark, tmp_path):
    """Review regression: type strings are interpolated into generated
    DDL — backtick/injection shapes must be rejected up front."""
    df = _mk(spark, 0, 10)
    for bad_type in ("bigint, `y` string", "big`int", "bigint\n--x"):
        with pytest.raises(ValueError, match="not a plain SQL type"):
            mb.create_manifest_table(
                spark, df, str(tmp_path), "t",
                bucket_cols="uid", num_buckets=2,
                shred={"column": "payload", "fields": {"x": bad_type}},
            )


def test_comma_smuggled_type_strings_rejected():
    """Advisor regression: the character-class regex allowed commas
    ANYWHERE, so 'bigint, extra int' validated and interpolated an
    unintended extra column into the CREATE TABLE column list.  Commas
    and spaces are now legal only inside balanced parens/angle
    brackets; unbalanced brackets are rejected too."""
    for bad_type in (
        "bigint, extra int",      # top-level comma: column smuggling
        "bigint extra",           # top-level space: mangled DDL
        "decimal(10,2",           # unbalanced open
        "array<int>>",            # unbalanced close
        "int), `y` string, (int",  # re-balanced smuggle attempt
    ):
        with pytest.raises(ValueError, match="not a plain SQL type"):
            mb._check_shred(
                {"column": "payload", "fields": {"x": bad_type}}
            )
    # legitimately parameterized types still pass
    for ok in ("bigint", "decimal(10,2)", "decimal(10, 2)",
               "map<string, int>", "array<int>"):
        mb._check_shred({"column": "payload", "fields": {"x": ok}})



def test_cow_rewrite_repairs_lazily_evolved_fields(spark, tmp_path):
    """Review regression (reproduced live): a COW merge after
    evolve_shred(add=...) rewrote surviving pre-evolution rows WITHOUT
    the coalesce repair — physically materializing all-NULL columns,
    flipping covered_fields to true, and silently corrupting routed
    reads.  The rewrite region now repairs like compaction/rebucket."""
    root = str(tmp_path)
    rows = spark.range(0, 24).select(
        F.col("id").alias("uid"),
        F.to_json(
            F.struct((F.col("id") * 3).alias("x"),
                     (F.col("id") * 7).alias("y"))
        ).alias("payload"),
    )
    mb.create_manifest_table(
        spark, rows, root, "cr", bucket_cols="uid", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    try:
        mb.evolve_shred(spark, root, "cr", add={"y": "bigint"})
        # merge touching EVERY bucket: keys 0..23 cover both buckets
        upd = spark.range(0, 24).select(
            F.col("id").alias("uid"),
            F.to_json(
                F.struct((F.col("id") * 3).alias("x"),
                         (F.col("id") * 7).alias("y"))
            ).alias("payload"),
        ).filter(F.col("uid") < 2)
        mb.merge_manifest_table(spark, upd, root, "cr", key_cols="uid")
        r = mb.read_manifest_table_shredded(
            spark, root, "cr", {"x": "bigint", "y": "bigint"},
            base_cols="uid",
        )
        got = {row["uid"]: (row["x"], row["y"]) for row in r.collect()}
        assert got == {k: (k * 3, k * 7) for k in range(24)}, (
            "rewritten survivors lost their lazily-evolved field"
        )
    finally:
        mb.drop_catalog_entries(spark, root, "cr")


def test_mismatched_bracket_types_rejected():
    """Review regression: the depth counter let ')' close '<'."""
    for bad in ("array<int)", "decimal(10,2>", "map<string,(int>)"):
        with pytest.raises(ValueError, match="not a plain SQL type"):
            mb._check_shred({"column": "p", "fields": {"x": bad}})
    mb._check_shred({"column": "p", "fields": {"x": "map<string, decimal(10,2)>"}})
