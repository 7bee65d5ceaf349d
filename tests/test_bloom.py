"""Bloom prefilter contract: no false negatives ever, false positives
removed by the exact join, probe stays map-only on the fact side."""

import pyspark.sql.functions as F

from curw_mike_data_handler_spark.operators.bloom import (
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
)


def _fixture(spark, n=5000, step=23):
    fact = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    keys = spark.range(0, n, step).select(F.col("id").alias("kk"))
    return fact, keys, (n + step - 1) // step


def test_no_false_negatives_any_size(spark):
    fact, keys, true_n = _fixture(spark)
    # even an absurdly small sketch may only ADD rows, never drop one
    for m in (64, 1024, 1 << 16):
        pre = bloom_prefilter(fact, keys, "k", "kk", m_bits=m, k_hashes=3)
        members = pre.join(
            keys.select(F.col("kk").alias("k")), "k", "left_semi"
        ).count()
        assert members == true_n, m


def test_small_sketch_has_false_positives_exact_join_removes_them(spark):
    fact, keys, true_n = _fixture(spark)
    pre_n = bloom_prefilter(fact, keys, "k", "kk", m_bits=1024, k_hashes=2).count()
    assert pre_n > true_n  # saturated sketch lets non-members through
    exact = bloom_semi_join(fact, keys, "k", "kk", m_bits=1024, k_hashes=2)
    assert exact.count() == true_n


def test_sized_sketch_is_selective(spark):
    fact, keys, true_n = _fixture(spark)
    pre_n = bloom_prefilter(fact, keys, "k", "kk").count()  # ~300 bits/key
    n = fact.count()
    assert true_n <= pre_n < n * 0.05 + true_n


def test_semi_join_matches_plain_semi_join(spark):
    fact, keys, _ = _fixture(spark, step=7)
    got = sorted(
        tuple(r) for r in bloom_semi_join(fact, keys, "k", "kk").collect()
    )
    want = sorted(
        tuple(r)
        for r in fact.join(
            keys.select(F.col("kk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want


def test_sketch_is_one_fixed_width_row(spark):
    _, keys, _ = _fixture(spark)
    rows = build_bloom(keys, "kk", m_bits=4096).collect()
    assert len(rows) == 1 and len(rows[0]["words"]) == 4096 // 64


def test_probe_is_map_only(spark):
    """The prefilter must be a pure map over the fact: scan →
    project(__pos) → filter, with NO exchange and NO join (the sketch
    is an inlined literal, so there is nothing Catalyst can reorder
    above a downstream join)."""
    fact, keys, _ = _fixture(spark)
    pre = bloom_prefilter(fact, keys, "k", "kk")
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_semi_join_runs_bloom_below_the_join(spark):
    """In the composed exact form the bloom filter must sit BELOW the
    semi join (on its streamed side), not above it — the reorder the
    literal formulation exists to prevent."""
    fact, keys, _ = _fixture(spark)
    j = bloom_semi_join(fact, keys, "k", "kk")
    plan = j._jdf.queryExecution().executedPlan().toString()
    join_pos = plan.find("LeftSemi")
    probe_pos = plan.find("forall(")
    assert join_pos != -1 and probe_pos != -1
    # physical plans print top-down: the filter must appear AFTER the
    # join line (i.e. deeper in the tree)
    assert probe_pos > join_pos, plan[:1500]
