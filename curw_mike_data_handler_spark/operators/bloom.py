"""Bloom-filter semi-join pruning — runtime filters as DataFrame ops.

The 100-TB join problem this solves: a selective dimension predicate
(the reference's station whitelist / model whitelist, ``wl_x:193-195``)
should stop fact rows BEFORE the join shuffle, not after it.  Engines
do this with runtime bloom filters (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects one when
statistics allow); ``bloom_filter_agg`` is not registered for SQL use
in Spark 4, so this module builds the same sketch out of public
DataFrame ops:

* build: k hashed bit positions per key (``xxhash64(key, seed)`` —
  seed varied through the extra hash argument), OR-folded into a
  bitset of ``m`` bits stored as ``array<bigint>`` words via
  ``bit_or`` — ONE small-side rollup whose output is the sketch
  (m/64 longs), never the keys;
* probe: the one-row bitset crossJoin-broadcasts to the fact side and
  membership is a ``forall`` over the k positions — map-only, fused
  into the fact scan, no shuffle of the big side;
* the filter admits false POSITIVES only (classic bloom bound
  ≈ (1 - e^{-kn/m})^k), so callers needing exact semantics follow
  with the real (now much smaller) join — `bloom_semi_join` does
  both, and its result is hash-identical to a plain semi join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """ONE-row DataFrame ``(words array<bigint>)`` — the bitset of the
    distinct values of ``keys[key_col]``.  m_bits/64 longs regardless
    of key count; size the sketch at ~10 bits/key for ~1% fp."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = keys.select(
        F.explode(hash_positions(key_col, m_bits, k_hashes)).alias("p")
    ).distinct()
    words = pos.groupBy(F.expr("p div 64").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))")
        ).alias("bits")
    )
    # densify to a fixed-width array: unset words are 0.  The sketch is
    # O(m) — driver/broadcast-safe by construction, like k-means
    # centroids; map_from_entries keeps the densify JVM-side.
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("w", "bits"))
        ).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(wm[cast(i as bigint)], cast(0 as bigint)))"
        ).alias("words")
    )


def hash_positions(key_col: str, m_bits: int, k_hashes: int) -> Column:
    """The k bloom bit positions of ``key_col`` as ``array<bigint>`` —
    shared by build and probe so both sides hash identically."""
    return F.expr(
        f"transform(sequence(0, {k_hashes - 1}),"
        f" s -> pmod(xxhash64({key_col}, s), {m_bits}))"
    )


def might_contain_positions() -> Column:
    """Membership probe of a precomputed ``__pos`` array against the
    broadcast ``words`` column: true iff ALL k bits are set.  False
    positives possible, false negatives impossible (the property the
    prefilter contract rests on).

    The positions are projected into ``__pos`` BEFORE the filter (not
    inlined) so the predicate's column references are just
    (__pos, words) — Catalyst mis-binds the fact key when it sits
    inside the doubly-nested lambda of a filter pushed through the
    broadcast cross join."""
    return F.expr(
        "forall(__pos, p -> (element_at(words, cast(p div 64 as int) + 1)"
        " & shiftleft(cast(1 as bigint), cast(p % 64 as int))) != 0)"
    )


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """``fact`` reduced to PROBABLE members of ``keys`` — map-only on
    the fact side.  Superset of the true semi join; pair with an exact
    join for exactness.

    The sketch is COLLECTED (one row of m/64 longs — O(sketch) driver
    state, the same sanctioned shape as k-means centroids, never data)
    and inlined as a literal, so the probe is a plain filter on the
    fact columns.  The earlier broadcast-cross-join formulation kept
    everything lazy but Catalyst pulls the cross join ABOVE a
    downstream semi join (join reorder), running the bloom AFTER the
    join it was meant to protect; a literal filter stays put and
    pushes down like any other predicate."""
    [words_row] = build_bloom(
        keys, keys_key, m_bits=m_bits, k_hashes=k_hashes
    ).collect()
    lit_words = F.array(*[F.lit(int(w)) for w in words_row["words"]])
    return (
        fact.withColumn("__pos", hash_positions(fact_key, m_bits, k_hashes))
        .withColumn("words", lit_words)
        .filter(might_contain_positions())
        .drop("words", "__pos")
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Exact semi join with a bloom prefilter in front: identical
    rows to ``fact.join(keys, semi)``, but only the prefiltered
    survivors reach the join — at scale the shuffle carries the
    selectivity × fact, not the fact."""
    pre = bloom_prefilter(
        fact, keys, fact_key, keys_key, m_bits=m_bits, k_hashes=k_hashes
    )
    return pre.join(
        keys.select(F.col(keys_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
