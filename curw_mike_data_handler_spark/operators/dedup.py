"""Deduplication operators for corpus-scale pipelines.

Exact, n-gram Jaccard, MinHash+LSH and SimHash — all built from
portable primitives (md5-derived 60-bit integer hashes) so results are
engine-reproducible (the DuckDB oracle computes the identical values).

Scale design:
* exact: one hash-groupBy shuffle on the fingerprint.
* jaccard pairs: explode to (doc, token) posting list, self-join on
  token (the classic inverted-index plan) — shuffle is bounded by
  posting-list sizes, not |docs|²; hot tokens should be stop-worded
  out at 100 TB (parameter ``min_token_len``).
* minhash-lsh: signatures via one groupBy over (doc, seed); candidate
  generation joins band buckets (shuffle on band hash — only docs
  sharing a band collide); verification re-computes true Jaccard on
  candidates only.
* simhash: 32-bit signature via bit-position explode + groupBy, then
  banded matching on signature halves + Hamming verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.ids import doc_fingerprint
from curw_mike_data_handler_spark.functions.text import tokens


def portable_hash60(col, salt=None):
    """60-bit positive integer from md5 — identical in any engine with
    md5(): ('0x' || first 15 hex chars)::bigint."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(salt.cast("string") if hasattr(salt, "cast") else F.lit(str(salt)),
                     F.lit(":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keep the minimum id
    per group; report group size.  One shuffle."""
    fp = docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def line_level_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 3,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Corpus-level line deduplication (C4/RefinedWeb boilerplate
    removal): split each document into fixed ``chunk_words``-word
    'lines', drop every line whose exact text occurs in more than
    ``max_doc_freq`` distinct documents, reassemble survivors in
    original order.  Returns (id_col, n_kept, n_dropped, cleaned_text)
    — one row per input document, empty string when nothing survives.

    Scale shape: one exchange on hash(line) for the document-frequency
    count (map-side partial count-distinct), one join back, one
    exchange on hash(id) to reassemble — linear in total line count,
    no all-pairs step.  Boilerplate lines are heavy-tail-safe: they
    collapse to a single df row each.  At lake scale, checkpoint the
    exploded lines relation once (it feeds both the df aggregate and
    the join)."""
    k = int(chunk_words)
    w = F.split(F.col(text_col), " ")
    n_lines = F.floor((F.size(w) + (k - 1)) / k).cast("int")
    lines = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(" ", F.slice(w, (i - F.lit(1)) * k + 1, k)).alias("line"),
        ),
    )
    ex = (
        docs.select(F.col(id_col), F.explode(lines).alias("c"))
        .select(id_col, F.col("c.idx").alias("idx"), F.col("c.line").alias("line"))
    )
    dfreq = ex.groupBy("line").agg(F.countDistinct(id_col).alias("df"))
    kept = ex.join(dfreq, "line").filter(F.col("df") <= int(max_doc_freq))
    reasm = kept.groupBy(id_col).agg(
        F.count("*").alias("k"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda x: x["line"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    base = docs.select(F.col(id_col), n_lines.cast("long").alias("n_lines"))
    return base.join(reasm, id_col, "left").select(
        id_col,
        F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_lines") - F.coalesce(F.col("k"), F.lit(0))).cast("long").alias("n_dropped"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )


def _distinct_doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs (a<b) with token-set Jaccard ≥ threshold via the
    inverted-index self-join plan.

    ``max_df`` is the skew guard for corpus scale: a token present in d
    documents contributes d² rows to the self-join, so stop-word-grade
    tokens dominate the shuffle.  When set, tokens with document
    frequency > max_df are dropped BEFORE the join (one extra count
    window on the posting list — no second pass over the corpus), and
    per-doc sizes are computed on the capped token sets so the reported
    Jaccard is exactly the Jaccard of those sets (self-consistent, no
    systematic underestimate).  With no token over the cap the output
    is identical to the uncapped plan (property-tested)."""
    dt = _distinct_doc_tokens(docs, id_col, text_col)
    if max_df is not None:
        df_counts = dt.groupBy("token").agg(F.count("*").alias("__df"))
        dt = (
            dt.join(df_counts.filter(F.col("__df") <= max_df), "token")
            .select("doc", "token")
        )
    sizes = dt.groupBy("doc").agg(F.count("*").alias("n_tokens"))
    a = dt.select(F.col("doc").alias("doc_a"), "token")
    b = dt.select(F.col("doc").alias("doc_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Directed token-set CONTAINMENT |A∩B| / |A| for every ordered
    pair with containment ≥ threshold (both directions emitted when
    both clear it).

    Jaccard misses doc-inclusion duplication: a paragraph quoted
    verbatim inside a 100× longer page has Jaccard ≈ 0.01 but
    containment ≈ 1.0 — the signal used for quote/boilerplate
    detection and "is this doc subsumed by that one" curation calls
    (cf. the containment variant of MinHash in Broder's resemblance
    work).  Same inverted-index plan as ``jaccard_pairs`` — ONE
    posting-list self-join bounded by document frequency, never
    |docs|² — with the same ``max_df`` hot-token guard; the only
    difference is the final normalization (by |A| instead of |A∪B|),
    so the scale shape is identical."""
    dt = _distinct_doc_tokens(docs, id_col, text_col)
    if max_df is not None:
        df_counts = dt.groupBy("token").agg(F.count("*").alias("__df"))
        dt = (
            dt.join(df_counts.filter(F.col("__df") <= max_df), "token")
            .select("doc", "token")
        )
    sizes = dt.groupBy("doc").agg(F.count("*").alias("n_tokens"))
    a = dt.select(F.col("doc").alias("doc_a"), "token")
    b = dt.select(F.col("doc").alias("doc_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    both = inter.join(sa, "doc_a").join(sb, "doc_b")
    # emit the two directions from the one undirected intersection —
    # the join work is not repeated, only the 4-column result is
    fwd = both.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        F.round(F.col("n_common") / F.col("n_a"), 6).alias("containment"),
    )
    rev = both.select(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_dst"),
        F.round(F.col("n_common") / F.col("n_b"), 6).alias("containment"),
    )
    return fwd.unionAll(rev).filter(F.col("containment") >= threshold)


def jaccard_pairs_prefix(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """All pairs (a<b) with token-set Jaccard ≥ threshold via PREFIX
    FILTERING (SSJoin / AllPairs / PPJoin family — Chaudhuri et al.
    ICDE'06, Bayardo et al. WWW'07): a LOSSLESS candidate-pruning
    upgrade over the plain inverted-index join, same output, far fewer
    candidate pairs.

    Tokens get one global total order, rarest first (df asc, token) —
    the order that makes prefixes maximally selective.  A document of
    size n only indexes its first ``n − ceil(t·n) + 1`` tokens in that
    order: two sets with Jaccard ≥ t must overlap by ≥ ceil(t·max(na,
    nb)), and the prefix theorem guarantees such pairs share at least
    one PREFIX token, so joining on prefix postings alone misses
    nothing.  Candidates also pass the length filter (t·na ≤ nb and
    t·nb ≤ na, a necessary Jaccard condition) before the exact
    verification join over the full posting lists.

    Scale shape: a token with document frequency d contributes d² rows
    to the plain self-join but only (prefix-d)² here — and frequent
    tokens are precisely the ones prefixes EXCLUDE (rarest-first
    order), so the quadratic term collapses where it hurts most.  The
    df census and the per-doc rank reuse one hash(doc) window; the
    verification is bounded by Σ|candidates|·doc-size.  Equality with
    ``jaccard_pairs`` is property-tested; the candidate-count
    reduction is asserted, not assumed.

    Boundary note: the output filter accepts ROUNDED 6-dp jaccard ≥ t,
    admitting true similarity down to t − 5e-7, so the prefix length
    and length filter are computed against that effective threshold —
    without it, a pair with true J just under t (needs ~10⁶-token
    documents to exist) would survive the plain join's rounding but be
    pruned here."""
    from pyspark.sql import Window

    dt = _distinct_doc_tokens(docs, id_col, text_col)
    dfc = dt.groupBy("token").agg(F.count("*").alias("__df"))
    sizes = dt.groupBy("doc").agg(F.count("*").alias("n"))
    ranked = (
        dt.join(dfc, "token")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("__df", "token")
            ),
        )
        .join(sizes, "doc")
    )
    # The output filter accepts ROUNDED jaccard >= threshold (6 dp, the
    # engine-parity contract), which admits true J down to t - 5e-7; the
    # prefix length and length filter must therefore be computed against
    # that slightly lower effective threshold or a boundary pair (true J
    # in [t-5e-7, t), reachable only with ~1e6-token documents) could be
    # pruned here yet emitted by the plain join.
    t_eff = threshold - 5e-7
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(t_eff) * F.col("n")) + 1
    )
    a = prefix.select(F.col("doc").alias("doc_a"), "token", F.col("n").alias("n_a"))
    b = prefix.select(F.col("doc").alias("doc_b"), "token", F.col("n").alias("n_b"))
    # n_a/n_b are functionally dependent on the doc ids, so carrying
    # them through the distinct costs nothing and saves re-joining
    # sizes twice for the verification step
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.lit(t_eff) * F.col("n_a") <= F.col("n_b"))
            & (F.lit(t_eff) * F.col("n_b") <= F.col("n_a"))
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    ta = dt.select(F.col("doc").alias("doc_a"), "token")
    tb = dt.select(F.col("doc").alias("doc_b"), "token")
    return (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
) -> DataFrame:
    """(doc, seed, minhash) — min over the doc's distinct tokens of the
    salted portable hash.  One explode + one groupBy."""
    dt = _distinct_doc_tokens(docs, id_col, text_col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    salted = dt.select("doc", "token", seeds)
    hashed = salted.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col("token"))), 1, 15),
            16,
            10,
        ).cast("bigint"),
    )
    return hashed.groupBy("doc", "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash→banded LSH candidates→exact-Jaccard verification.

    Bands: ``num_hashes/band_size`` buckets keyed by the md5 of the
    band's concatenated minhashes; docs sharing any band bucket become
    candidates; candidates are verified with true Jaccard (no false
    positives in the output; recall is the standard LSH S-curve).

    ``max_bucket`` is the skew guard for corpus scale (the analog of
    ``jaccard_pairs``' ``max_df``): a band bucket holding d docs
    contributes d² candidate rows to the self-join, so one degenerate
    bucket — boilerplate-heavy corpora where thousands of near-empty
    docs share a minhash band — is a quadratic hot spot.  When set,
    buckets with more than ``max_bucket`` members are dropped BEFORE
    the self-join (one grouped count on the band keys — no second pass
    over the corpus).  Docs in a dropped bucket can still pair through
    their other bands; with no bucket over the cap the output is
    identical to the uncapped plan (property-tested)."""
    sigs = minhash_signatures(docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes)
    banded = sigs.withColumn("band", F.floor(F.col("seed") / band_size))
    band_keys = (
        banded.groupBy("doc", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list("minhash")))).alias("band_key"))
    )
    if max_bucket is not None:
        bucket_sizes = band_keys.groupBy("band", "band_key").agg(
            F.count("*").alias("__bs")
        )
        band_keys = band_keys.join(
            bucket_sizes.filter(F.col("__bs") <= max_bucket),
            ["band", "band_key"],
        ).select("doc", "band", "band_key")
    left = band_keys.select(F.col("doc").alias("doc_a"), "band", "band_key")
    right = band_keys.select(F.col("doc").alias("doc_b"), "band", "band_key")
    candidates = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    docs_a = docs.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("text_a"))
    docs_b = docs.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("text_b"))
    cand_texts = candidates.join(docs_a, "doc_a").join(docs_b, "doc_b")
    verified = cand_texts.select(
        "doc_a",
        "doc_b",
        F.round(
            F.size(F.array_intersect(F.array_distinct(tokens("text_a")),
                                     F.array_distinct(tokens("text_b"))))
            / F.size(F.array_union(F.array_distinct(tokens("text_a")),
                                   F.array_distinct(tokens("text_b")))),
            6,
        ).alias("jaccard"),
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """32-bit SimHash over distinct tokens: bit j of the signature is 1
    iff Σ_tokens (±1 per token-hash bit j) > 0."""
    dt = _distinct_doc_tokens(docs, id_col, text_col)
    hashed = dt.withColumn("h", portable_hash60("token"))
    expanded = hashed.select(
        "doc",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    ).withColumn(
        # SQL-expr form: pyspark's shiftright/shiftleft wrappers only
        # take literal shift amounts, the SQL functions take columns.
        "vote",
        F.expr("CASE WHEN (shiftright(h, CAST(j AS INT)) & CAST(1 AS BIGINT)) = 1 "
               "THEN 1 ELSE -1 END"),
    )
    return (
        expanded.groupBy("doc", "j")
        .agg(F.sum("vote").alias("s"))
        .withColumn("bit", (F.col("s") > 0).cast("bigint"))
        .groupBy("doc")
        .agg(F.sum(F.expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
             .alias("simhash"))
    )


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, banded on
    signature halves (a pair within distance k must agree exactly on at
    least one half when k < bits/2 … pigeonhole with 2 bands covers
    k ≤ 1 exactly; for larger k this is a recall-bounded candidate
    filter, verified precisely with bit_count)."""
    sigs = simhash_signatures(docs, id_col=id_col, text_col=text_col, bits=bits)
    half = bits // 2
    banded = sigs.select(
        "doc",
        "simhash",
        (F.col("simhash").bitwiseAND(F.lit((1 << half) - 1))).alias("lo"),
        F.shiftright(F.col("simhash"), half).alias("hi"),
    )
    cands = None
    for band in ("lo", "hi"):
        l = banded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"), band)
        r = banded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"), band)
        c = l.join(r, band).filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b", "sig_a", "sig_b"
        )
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _two_phase_components(edges: DataFrame, max_iter: int) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") → (node, label).

    Each round is two grouped-min + join passes over the edge list:

    * large-star: every node u links its LARGER neighbors to
      m(u) = min(N(u) ∪ {u});
    * small-star: keyed on the larger endpoint, every node links its
      smaller neighbors (and itself) to the minimum.

    Converges to min-rooted stars in O(log² n) rounds regardless of
    graph DIAMETER — the upgrade over per-round label propagation
    (diameter-bound) for path-shaped or billion-edge graphs.
    Convergence is detected by an O(1) driver aggregate (edge count +
    xor-ish hash sum), never by collecting edges."""
    E = (
        edges.select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        sym = E.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            E.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mn = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("mn"), F.col("u")).alias("b"),
            )
        )
        E1 = (
            large.select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
        mn2 = E1.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = E1.join(mn2, "hi")
        # no inner distinct on the (hi, m) branch: the round-final
        # distinct below already dedupes (the planner elided the inner
        # distinct's exchange but still paid its two aggregate passes
        # per round — r12, guide §2.2)
        small = joined.select(F.col("lo").alias("a"), F.col("m").alias("b")).union(
            joined.select(F.col("hi").alias("a"), F.col("m").alias("b"))
        )
        # lazy localCheckpoint: the signature aggregate right below is
        # the materializing action (it computes every partition), so
        # checkpoint + convergence check cost ONE job per round
        # instead of two (r12)
        E = (
            small.select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # bit_xor, not sum: order-independent AND overflow-free (a
        # summed 64-bit hash overflows long under ANSI mode — the
        # driver's vanilla session — while xor cannot)
        sig = E.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(lo, hi))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: E holds min-rooted star edges (root = lo side)
    return E.select(F.col("hi").alias("node"), F.col("lo").alias("label")).union(
        E.select(F.col("lo").alias("node"), F.col("lo").alias("label"))
    ).distinct()


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Duplicate-pair lists → duplicate GROUPS: the step that turns any
    of the pair generators — exact, Jaccard, MinHash-LSH, SimHash,
    embedding — into an actionable keep/drop partition of the corpus.

    → (node, component, component_size) where component is the minimum
    reachable node id (identical under both algorithms).

    ``algorithm="label_prop"`` (default): per-round min-label
    propagation — one shuffle per round, converges in graph-DIAMETER
    rounds; right for near-dup clusters, whose diameter is single-digit
    even at corpus scale.  The driver loop is the standard
    iterative-algorithm shape (GraphX / MLlib do the same); per-round
    lineage is truncated with localCheckpoint so plans don't grow.

    ``algorithm="two_phase"``: the large-star/small-star contraction
    (Kiveris et al.) — O(log² n) rounds regardless of diameter, the
    at-scale path for billions of edges or chain-shaped graphs
    (property-tested equal to label_prop, including on a path graph
    whose diameter exceeds the round budget).
    """
    if algorithm not in ("label_prop", "two_phase"):
        raise ValueError(f"unknown connected_components algorithm: {algorithm!r}")
    edges = pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    if algorithm == "two_phase":
        labels = _two_phase_components(edges, max_iter)
        sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
        return labels.join(sizes, "label").select(
            "node", F.col("label").alias("component"), "component_size"
        )
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the per-node improvement flag through the round so
        # convergence costs one tiny aggregate over the checkpointed
        # frame instead of a second old-vs-new join
        stepped = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias(
                    "__improved"
                ),
            )
            # lazy: the convergence aggregate below materializes the
            # checkpoint in the same job (one job/round, not two — r12)
            .localCheckpoint(eager=False)
        )
        changed = stepped.agg(F.max("__improved")).collect()[0][0]
        labels = stepped.drop("__improved")
        if not changed:
            break
    # the final labels are localCheckpoint-ed (lineage truncated), so
    # the symmetrized-edge cache can be released instead of leaking
    # into the CacheManager for the rest of the session — same fix as
    # graph.pagerank's working caches
    sym.unpersist()
    sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
    return labels.join(sizes, "label").select(
        "node", F.col("label").alias("component"), "component_size"
    )


def substring_dup_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication census (the DataFrame re-expression
    of suffix-array substring dedup, Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better"): every ``k``-word
    window whose exact text occurs at least ``min_count`` times
    corpus-wide marks its tokens as duplicated; overlapping or
    adjacent marked windows merge into maximal spans
    (gaps-and-islands).  Returns one row per document:
    (id, n_tokens, n_dup_spans, dup_tokens, dup_bp) where dup_bp is
    basis points of duplicated tokens — integer math end-to-end so the
    cross-engine hash compare is exact.

    Scale shape (the suffix-array stand-in that distributes): windows
    come from a narrow explode (k-sliding slice of the token array —
    no self-join); corpus window frequency is ONE exchange on
    hash(window) with map-side partial counts; marking joins instances
    back on that key; span merging is a per-document sort window (one
    exchange on hash(id)).  Linear in corpus token count — the
    suffix-array construction this replaces is O(n log n) with a
    global sort; the window-hash formulation trades the guarantee of
    maximal-length detection for pure data-parallel shuffles, matching
    what BigQuery/Spark implementations of C4/RefinedWeb actually ship.
    Heavy-tail safe: a boilerplate window collapses to one freq row."""
    from pyspark.sql import Window

    kk = int(k)
    w = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col), w.alias("__w"), F.size(w).cast("long").alias("n_tokens")
    )
    wins = base.filter(F.col("n_tokens") >= kk).select(
        id_col,
        F.explode(F.sequence(F.lit(1), (F.col("n_tokens") - kk + 1).cast("int"))).alias(
            "i"
        ),
        F.col("__w").alias("__w"),
    ).select(id_col, "i", F.concat_ws(" ", F.slice("__w", F.col("i"), kk)).alias("win"))
    freq = wins.groupBy("win").agg(F.count("*").alias("c"))
    marked = (
        wins.join(freq.filter(F.col("c") >= int(min_count)), "win")
        .select(id_col, "i")
    )
    ow = Window.partitionBy(id_col).orderBy("i")
    brk = F.when(F.col("i") > F.lag("i").over(ow) + kk, 1).otherwise(0)
    isl = marked.withColumn(
        "grp", F.sum(brk).over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    spans = isl.groupBy(id_col, "grp").agg(
        (F.max("i") + kk - F.min("i")).cast("long").alias("span_len")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_dup_spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.expr("(10000 * coalesce(dup_tokens, 0)) div n_tokens").alias("dup_bp"),
        )
    )
