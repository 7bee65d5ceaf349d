"""Edit-distance-1 similarity self-join via a deletion-variant index
(the FastSS / SymSpell blocking scheme).

Reference parity: the reference's only fuzzy matching is exact
dictionary lookups after manual name normalization (station-name →
id mapping built by hand in its pipelines); this operator is the
scalable generalization a 100-TB curation stack needs for
vocabulary/entity canonicalization (typo clustering, OCR noise,
near-identical entity names).

Why not a cross join + levenshtein: O(n²) comparisons — 1e6 distinct
strings is 5e11 pairs.  The deletion-variant index is the standard
linear-work blocking: two strings are within edit distance 1 iff
their deletion-1 neighborhoods (the string itself plus every string
obtainable by deleting exactly one character) intersect.  Each string
of length L emits L+1 variant keys; candidates come from a hash
self-join on the variant key; a final ``levenshtein`` verify removes
the distance-2 false positives the blocking admits (e.g. "xy"/"yx"
share variants "x" and "y" but are distance 2).

Scale shape: variant generation is a map-only ``explode`` (output is
Σ(L+1) rows, linear in input bytes); the self-join hashes on the
variant key — no cross product anywhere; candidate pairs are
``distinct``-ed before the (cheap, JVM-side) verify so each pair is
scored once.  Skew guard: a length cap bounds the per-string fanout,
and a ``max_bucket`` cap (same pattern as dedup.jaccard_pairs'
``max_df``) drops degenerate variant buckets — a variant shared by
thousands of strings (e.g. the empty string from 1-char tokens)
would otherwise be a quadratic hot spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit1_self_join(
    df: DataFrame,
    col: str = "word",
    *,
    max_len: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """All unordered pairs of distinct ``col`` values within
    Levenshtein distance 1.  Output: ``word_a < word_b``, ``dist``
    (always 1 for distinct inputs).

    ``max_len`` drops pathological strings (fanout bound);
    ``max_bucket`` drops variant buckets with more members than the
    cap BEFORE the self-join (recall loss only inside degenerate
    buckets, and only for pairs not covered by another shared
    variant — property-tested identical to uncapped on real data).
    """
    words = (
        df.select(F.col(col).alias("word"))
        .filter(F.col("word").isNotNull() & (F.length("word") <= max_len))
        .distinct()
    )
    # word itself + every deletion-1 variant, as one generated array:
    # index 0 keeps the word, index i (1..L) deletes character i
    variants = words.select(
        "word",
        F.explode(
            F.expr(
                "transform(sequence(0, length(word)), i -> "
                "IF(i = 0, word, "
                "concat(substring(word, 1, i - 1), substring(word, i + 1, length(word)))))"
            )
        ).alias("variant"),
    ).distinct()
    if max_bucket is not None:
        sizes = variants.groupBy("variant").agg(F.count("*").alias("__vb"))
        variants = (
            variants.join(
                F.broadcast(sizes.filter(F.col("__vb") > max_bucket)),
                "variant",
                "left_anti",
            )
        )
    a = variants.select(F.col("word").alias("word_a"), "variant")
    b = variants.select(F.col("word").alias("word_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("word_a", "word_b").cast("long"))
        .filter(F.col("dist") <= 1)
    )
