#!/usr/bin/env python
"""sf1 scale probe: run the nonlinear dedup operators and the composed
curation pipeline on a 50k-document corpus (10× the sf0.1 table) and
record wall time + ACTUAL shuffle bytes from the Spark UI REST API —
measured evidence that the posting-list / candidate-pair plans stay
bounded at 10× the bench scale (VERDICT r2, item 6).

Two probe corpora are derived deterministically from
``/root/testdata/sf0.1/documents.parquet`` (never modified) into
``.scratch/`` (gitignored):

* ``sf1_linear`` — the natural text ×10 copies (doc_id shifted, a
  rare per-copy marker token appended).  Drives the LINEAR operators:
  line_dedup, curation_pipeline_e2e, dedup_exact.  Its ~50-word
  vocabulary is exactly the all-pairs-pathological case for
  inverted-index joins, so for the uncapped token-Jaccard join we
  MEASURE the blowup from the document-frequency census (Σ df² join
  rows) instead of executing it.
* ``sf1_pairwise`` — 40 family-hash tokens per base document (shared
  verbatim by its 10 copies, disjoint across families) + the rare
  marker.  True near-dup structure is bounded (10-copy families), so
  the banded-LSH and capped-Jaccard pair plans are exercised end to
  end at 50k docs with nonzero, verifiable output.

Usage: ``python tools/scale_probe.py`` (writes BENCH_sf1.json and
prints a markdown table for SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog, get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch")
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def build_corpora(spark) -> tuple[str, str]:
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    base = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        F.col("doc_id").alias("family"),
        "copy",
        "text",
        "lang",
        "source",
    )
    # rare marker: unique per (family, copy) so it never grows a
    # posting list; keeps every copy's token set distinct
    marker = F.concat(
        F.lit("m"),
        F.substring(
            F.md5(F.concat_ws(":", F.col("family"), F.col("copy"))), 1, 8
        ),
    )
    lin_dir = os.path.join(SCRATCH, "sf1_linear")
    pw_dir = os.path.join(SCRATCH, "sf1_pairwise")

    lin = base.select(
        "doc_id",
        F.concat_ws(" ", F.col("text"), marker).alias("text"),
        "lang",
        "source",
        F.length(F.concat_ws(" ", F.col("text"), marker)).alias("n_chars"),
    )
    lin.write.mode("overwrite").parquet(os.path.join(lin_dir, "documents.parquet"))

    fam_tokens = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.concat(
                F.lit("t"),
                F.substring(
                    F.md5(F.concat_ws(":", F.col("family").cast("string"), j.cast("string"))),
                    1,
                    7,
                ),
            ),
        ),
    )
    pw_text = F.concat_ws(" ", fam_tokens, marker)
    pw = base.select(
        "doc_id",
        pw_text.alias("text"),
        "lang",
        "source",
        F.length(pw_text).alias("n_chars"),
    )
    pw.write.mode("overwrite").parquet(os.path.join(pw_dir, "documents.parquet"))
    return lin_dir, pw_dir


def _stage_totals(spark) -> tuple[int, int]:
    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def measure(spark, label: str, df_factory, results: dict) -> None:
    # materialize through a noop WRITE, not count(): count() lets
    # Catalyst prune whole subtrees (line_dedup's reassembly join
    # vanished — 0 shuffle bytes), which under-reports the real cost
    w0, r0 = _stage_totals(spark)
    t0 = time.perf_counter()
    df_factory().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    w1, r1 = _stage_totals(spark)
    n = df_factory().count()
    results[label] = {
        "wall_s": round(wall, 2),
        "rows_out": n,
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
    }
    print(f"  {label}: {wall:.1f}s, {n} rows, "
          f"W {results[label]['shuffle_write_mb']} MB / R {results[label]['shuffle_read_mb']} MB")


def main() -> None:
    spark = get_spark(
        app_name="scale-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the probe chains a dozen 50k-doc jobs (with checkpoints
            # and caches) through one local JVM; the 1g default heap
            # OOMs late in the sequence on this box's 32 cores
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("building sf1 probe corpora (50k docs each)...")
    lin_dir, pw_dir = build_corpora(spark)

    from curw_mike_data_handler_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    results: dict[str, dict] = {}
    docs_lin = spark.read.parquet(os.path.join(lin_dir, "documents.parquet"))
    docs_pw = spark.read.parquet(os.path.join(pw_dir, "documents.parquet"))

    print("linear corpus (natural text x10):")
    measure(spark, "dedup_exact", lambda: catalog.QUERIES["dedup_exact"](spark, lin_dir), results)
    measure(spark, "line_dedup", lambda: catalog.QUERIES["line_dedup"](spark, lin_dir), results)
    measure(
        spark,
        "curation_pipeline_e2e",
        lambda: catalog.QUERIES["curation_pipeline_e2e"](spark, lin_dir),
        results,
    )

    # uncapped inverted-index join size on the NATURAL corpus, from the
    # df census (Σ df² = self-join rows) — measured, not executed: this
    # is the blowup max_df exists to prevent.
    from curw_mike_data_handler_spark.operators.dedup import _distinct_doc_tokens

    dt = _distinct_doc_tokens(docs_lin, "doc_id", "text")
    census = (
        dt.groupBy("token")
        .agg(F.count("*").alias("df"))
        .agg(
            F.count("*").alias("vocab"),
            F.sum(F.col("df") * F.col("df")).alias("join_rows_uncapped"),
            F.sum(
                F.when(F.col("df") <= 1000, F.col("df") * F.col("df")).otherwise(0)
            ).alias("join_rows_capped_1000"),
        )
        .collect()[0]
    )
    results["jaccard_join_census_linear"] = {
        "vocab": census["vocab"],
        "join_rows_uncapped": int(census["join_rows_uncapped"]),
        "join_rows_capped_1000": int(census["join_rows_capped_1000"]),
    }
    print(f"  df census: vocab={census['vocab']}, uncapped join rows="
          f"{census['join_rows_uncapped']:,}, capped(1000)={census['join_rows_capped_1000']:,}")

    print("pairwise corpus (bounded near-dup families):")
    measure(
        spark,
        "jaccard_pairs_capped",
        lambda: jaccard_pairs(docs_pw, threshold=0.6, max_df=1000),
        results,
    )
    measure(
        spark,
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(docs_pw, threshold=0.5),
        results,
    )
    # capped variant: same output here (no bucket over the cap in the
    # bounded-family corpus), so the delta vs the row above is the pure
    # cost of the skew-guard's bucket-count join
    measure(
        spark,
        "minhash_lsh_pairs_capped",
        lambda: minhash_lsh_pairs(docs_pw, threshold=0.5, max_bucket=1000),
        results,
    )

    # band-bucket census on the LINEAR corpus (the boilerplate-shaped
    # one): Σ bucket² = candidate rows of the band self-join, uncapped
    # vs capped — the LSH analog of the jaccard df census above,
    # measured from the same grouped count the capped plan runs.
    from curw_mike_data_handler_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(docs_lin, id_col="doc_id", text_col="text")
    band_keys = (
        sigs.withColumn("band", F.floor(F.col("seed") / 2))
        .groupBy("doc", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list("minhash")))).alias("band_key"))
    )
    bc = (
        band_keys.groupBy("band", "band_key")
        .agg(F.count("*").alias("bs"))
        .agg(
            F.count("*").alias("buckets"),
            F.max("bs").alias("max_bucket"),
            F.sum(F.col("bs") * F.col("bs")).alias("cand_rows_uncapped"),
            F.sum(
                F.when(F.col("bs") <= 100, F.col("bs") * F.col("bs")).otherwise(0)
            ).alias("cand_rows_capped_100"),
        )
        .collect()[0]
    )
    results["lsh_bucket_census_linear"] = {
        "buckets": bc["buckets"],
        "max_bucket": int(bc["max_bucket"]),
        "cand_rows_uncapped": int(bc["cand_rows_uncapped"]),
        "cand_rows_capped_100": int(bc["cand_rows_capped_100"]),
    }
    print(f"  lsh census: buckets={bc['buckets']:,}, max_bucket={bc['max_bucket']:,}, "
          f"cand rows uncapped={bc['cand_rows_uncapped']:,}, capped(100)={bc['cand_rows_capped_100']:,}")

    # connected components at sf1: label propagation vs the
    # large-star/small-star contraction over the same ~225k-pair input
    from curw_mike_data_handler_spark.operators.dedup import connected_components

    pairs_pw = minhash_lsh_pairs(docs_pw, threshold=0.5).localCheckpoint()
    measure(
        spark,
        "components_label_prop",
        lambda: connected_components(pairs_pw),
        results,
    )
    measure(
        spark,
        "components_two_phase",
        lambda: connected_components(pairs_pw, algorithm="two_phase"),
        results,
    )

    # bloom runtime filter vs plain shuffle semi join: broadcast is
    # DISABLED so both sides of the plain semi join shuffle (the
    # too-big-to-broadcast dimension case bloom exists for); the bloom
    # variant drops non-members map-side, so the fact shuffle carries
    # selectivity × fact.  Same rows out — the delta is pure shuffle.
    from curw_mike_data_handler_spark.operators.bloom import bloom_semi_join

    # the key set must be defined by a NON-join-column predicate, or
    # Catalyst infers the predicate onto the fact scan and no shuffle
    # is left to save (the real dimension-whitelist case is exactly
    # this: the predicate lives on dimension attributes)
    keys = docs_lin.filter(F.col("n_chars") % 211 == 0).select("doc_id")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        aqe_thr = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        aqe_thr = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE re-plans the shuffle join back into a broadcast at runtime
    # (its own threshold) — disable that too or the "plain" arm
    # silently measures a broadcast join
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        measure(
            spark,
            "semi_join_shuffle_plain",
            lambda: docs_lin.join(keys, "doc_id", "left_semi"),
            results,
        )
        measure(
            spark,
            "semi_join_bloom_prefiltered",
            lambda: bloom_semi_join(docs_lin, keys, "doc_id", "doc_id"),
            results,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        if aqe_thr:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqe_thr)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # edit-1 fuzzy join at 50k distinct strings: the deletion-variant
    # index executes (linear Σ(len+1) keys); the cross-join alternative
    # is REPORTED (n², the blowup the blocking avoids), not executed.
    # Vocabulary: md5-derived 8-hex "words" in 5k clusters of 10 — each
    # cluster shares a 7-hex stem with a varying last char, so every
    # cluster contributes C(10,2) true edit-1 pairs (verifiable volume)
    # while stems are disjoint across clusters.
    from curw_mike_data_handler_spark.operators.fuzzyjoin import edit1_self_join

    vocab = spark.range(50_000).select(
        F.concat(
            F.substring(F.md5((F.col("id") / 10).cast("long").cast("string")), 1, 7),
            F.substring(F.md5(F.col("id").cast("string")), 1, 1),
        ).alias("word")
    ).distinct()
    n_vocab = vocab.count()
    measure(
        spark,
        "fuzzy_edit1_variant_index",
        lambda: edit1_self_join(vocab, "word", max_bucket=1000),
        results,
    )
    results["fuzzy_edit1_cross_join_rows"] = {
        "vocab": n_vocab,
        "cross_join_rows_not_executed": n_vocab * (n_vocab - 1) // 2,
        "variant_index_rows": n_vocab * 9,  # len 8 → 9 keys per word
    }
    print(f"  fuzzy census: vocab={n_vocab:,}, cross-join rows (avoided)="
          f"{n_vocab * (n_vocab - 1) // 2:,}, index rows={n_vocab * 9:,}")

    # DBSCAN at 10× the sf0.1 point density (150k md5-placed points on
    # the same 1000×1000 grid, eps=25): the eps-disk now holds ~300
    # neighbors, the core graph is one giant blob, and the candidate
    # pair count — not the point count — is the scaling variable the
    # grid blocking controls (Σ cell² × 9 candidate bound measured
    # from the same grouped count the plan runs).  The clique
    # contraction + two-phase components keep the iterative part on
    # the |occupied subcells| graph.
    from curw_mike_data_handler_spark.operators.density import dbscan_grid

    def _h(sfx):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(sfx))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
        )

    pts = spark.range(150_000).select(
        F.col("id"), _h(":x").alias("x"), _h(":y").alias("y")
    )
    cellc = (
        pts.groupBy((F.expr("x div 25") * 1024 + F.expr("y div 25")).alias("cell"))
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("cells"),
            F.max("n").alias("max_cell"),
            F.sum(F.col("n") * F.col("n") * 9).alias("cand_pair_bound"),
        )
        .collect()[0]
    )
    results["dbscan_cell_census_10x"] = {
        "points": 150_000,
        "cells": cellc["cells"],
        "max_cell": int(cellc["max_cell"]),
        "cand_pair_bound": int(cellc["cand_pair_bound"]),
    }
    print(f"  dbscan census: cells={cellc['cells']:,}, max_cell={cellc['max_cell']}, "
          f"candidate bound={cellc['cand_pair_bound']:,}")
    measure(
        spark,
        "dbscan_grid_10x_density",
        lambda: dbscan_grid(pts, eps=25, min_pts=4),
        results,
    )

    # ------------------------------------------------------------------
    # Round-5e probes: the new operators' scale claims at 10× the
    # bench inputs.  events ×10 (1M rows, 1500 users, SAME 30-day
    # range — the point: time-bounded censuses must not grow) and
    # lineitem ×10 (6M rows, same parts/suppliers — the point: the
    # distinct-collapsed edge/affinity relations must not grow).
    # ------------------------------------------------------------------
    ev10_dir = os.path.join(SCRATCH, "sf1_events")
    li10_dir = os.path.join(SCRATCH, "sf1_lineitem")
    from curw_mike_data_handler_spark.sources.tables import load_table

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    ev = load_table(spark, SRC, "events")
    ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * 10_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(os.path.join(ev10_dir, "events.parquet"))
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li.crossJoin(copies).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("copy") * 100_000_000
    ).drop("copy").write.mode("overwrite").parquet(
        os.path.join(li10_dir, "lineitem.parquet")
    )
    spark.read.parquet(os.path.join(SRC, "supplier.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(li10_dir, "supplier.parquet"))

    print("round-5e probes (events x10 = 1M rows, lineitem x10 = 6M rows):")
    for name, sf_dir in (
        ("theilsen_trend", ev10_dir),
        ("ts_autocorrelation", ev10_dir),
        ("scd2_daily_snapshot", ev10_dir),
        ("token_bucket_throttle", ev10_dir),
        ("m4_downsample", ev10_dir),
        ("item_cooccurrence_cosine", li10_dir),
        ("graph_weighted_paths", li10_dir),
        ("graph_assortativity", li10_dir),
    ):
        measure(
            spark,
            f"{name}_10x",
            lambda name=name, sf_dir=sf_dir: catalog.QUERIES[name](spark, sf_dir),
            results,
        )

    # ------------------------------------------------------------------
    # Round-6 probe: the JPEG/MJPEG decode family is MAP-ONLY — at 10×
    # the id count the wall must scale with rows/core and the shuffle
    # stays ZERO (the claim the plan guard pins, here measured).
    # ------------------------------------------------------------------
    from curw_mike_data_handler_spark.operators.multimodal import (
        avi_frame_pixel_stats,
        jpeg_pixel_stats,
        synthesize_avi,
        synthesize_media,
    )

    ids10 = spark.range(5_000).select(F.col("id").alias("doc_id"))
    print("round-6 probes (decode family at 10x ids):")
    measure(
        spark,
        "jpeg_pixel_decode_10x",
        lambda: jpeg_pixel_stats(
            synthesize_media(ids10.filter(F.col("doc_id") % 3 == 1),
                             jpeg_pixels=True)
        ),
        results,
    )
    measure(
        spark,
        "mjpeg_frame_decode_10x",
        lambda: avi_frame_pixel_stats(
            synthesize_avi(ids10, mjpeg_pixels=True), every_n=10
        ),
        results,
    )
    measure(
        spark,
        "prog_jpeg_pixel_decode_10x",
        lambda: jpeg_pixel_stats(
            synthesize_media(ids10.filter(F.col("doc_id") % 6 == 4),
                             jpeg_pixels=True, jpeg_progressive=True)
        ),
        results,
    )
    measure(
        spark,
        "rgb_frame_decode_10x",
        lambda: avi_frame_pixel_stats(
            synthesize_avi(ids10, rgb_pixels=True), every_n=10
        ),
        results,
    )
    from curw_mike_data_handler_spark.operators.multimodal import (
        gif_pixel_stats,
        synthesize_gif,
    )

    measure(
        spark,
        "gif_pixel_decode_10x",
        lambda: gif_pixel_stats(synthesize_gif(ids10)),
        results,
    )

    # ------------------------------------------------------------------
    # Round-7 probe: bucketed_running_agg — the exact two-phase prefix
    # scan behind pack_sequences/compaction_bins/cusum/sweep/records.
    # At 10× rows the shuffle must stay LINEAR (edges broadcast, one
    # groupBy of |keys|×buckets partials, one (key,bucket) exchange)
    # and the max task must be ~slice/n_buckets, not a whole key.
    # ------------------------------------------------------------------
    from curw_mike_data_handler_spark.operators.prefix import (
        bucketed_running_agg,
    )

    prefix_rows = spark.range(2_000_000).select(
        (F.col("id") % 4).cast("string").alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 997).alias("v"),
    )
    print("round-7 probe (bucketed prefix scan, 2M rows / 4 enum keys):")
    measure(
        spark,
        "bucketed_prefix_sum_2m",
        lambda: bucketed_running_agg(
            prefix_rows, "v", by=["k"], order_cols=["uid"],
            out_col="r", n_buckets=64,
        ).groupBy("k").agg(F.max("r").alias("mx")),
        results,
    )

    # ------------------------------------------------------------------
    # Round-8 probes:
    # (a) bucketed_range_agg on a COARSE order domain — every distinct
    #     order value a point mass (duplicate sketch edges, the ADVICE
    #     r8 regime): carry copies ≈ rows × lookback × buckets/values;
    #     wall and shuffle must stay linear, never |rows|².
    # (b) the mixed-corpus media router: one Arrow pass over 4 formats
    #     + NULLs at 10× docs — map-only, zero shuffle, like its
    #     per-format siblings.
    # ------------------------------------------------------------------
    from curw_mike_data_handler_spark.operators.prefix import (
        bucketed_range_agg,
    )

    coarse_rows = spark.range(2_000_000).select(
        (F.col("id") % 4).cast("string").alias("k"),
        F.col("id").alias("uid"),
        # id%4 and id%30 share factor 2: each key sees 15 distinct
        # days (even or odd residues) — still far above 2/n_buckets
        # per mass, the duplicate-edge regime this probe exists for
        (F.col("id") % 30).alias("day"),
        (F.col("id") % 997).alias("v"),
    )
    print("round-8 probe (coarse-domain range agg, 2M rows / "
          "15 masses per key):")
    measure(
        spark,
        "bucketed_range_pointmass_2m",
        lambda: bucketed_range_agg(
            coarse_rows, "v", by=["k"], order_col="day", lookback=2,
            out_col="r", count_col="n", n_buckets=64,
        ).groupBy("k").agg(F.max("r").alias("mx"), F.sum("n").alias("sn")),
        results,
    )

    from curw_mike_data_handler_spark.operators.multimodal import (
        media_pixel_stats,
        synthesize_mixed_corpus,
    )

    print("round-8 probe (mixed-corpus media router, 10× docs):")
    measure(
        spark,
        "media_mixed_router_10x",
        lambda: media_pixel_stats(synthesize_mixed_corpus(ids10)),
        results,
    )

    # ------------------------------------------------------------------
    # Round-9 probes:
    # (a) TIFF decode at 10× ids — map-only zero shuffle, like its
    #     per-format siblings (and re-measuring the r8
    #     bucketed_range_pointmass_2m above shows the edge-thinning
    #     carry bound: shuffle should drop ~4× vs the r8 record).
    # (b) skew joins on a 2M-row zipfian fact (2/3 of rows on one key):
    #     the salted rewrite and the AQE path must both stay linear —
    #     the salted plan spreads the hot key by construction, the AQE
    #     plan splits it at runtime.
    # (c) the streaming replay queries over events ×10 (1M rows):
    #     real Structured Streaming jobs; state bounded by key/window,
    #     shuffle one pass per side.
    # ------------------------------------------------------------------
    from curw_mike_data_handler_spark.operators.multimodal import (
        synthesize_tiff,
        tiff_pixel_stats,
    )

    print("round-9 probes (tiff decode, skew joins, streaming replay):")
    measure(
        spark,
        "tiff_decode_10x",
        lambda: tiff_pixel_stats(synthesize_tiff(ids10)),
        results,
    )

    from curw_mike_data_handler_spark.operators.skewjoin import (
        salted_equi_join,
    )

    skew_fact = spark.range(2_000_000).select(
        F.when(F.col("id") % 3 != 0, F.lit(0))
        .otherwise(F.col("id") % 1500)
        .alias("hot_key"),
        F.col("id").alias("uid"),
        (F.col("id") % 997).alias("v"),
    )
    skew_dim = spark.range(1500).select(
        F.col("id").alias("dk"), (F.col("id") % 5).alias("seg")
    )
    measure(
        spark,
        "salted_skew_join_2m",
        lambda: salted_equi_join(
            skew_fact, skew_dim.hint("merge"), "hot_key", "dk",
            n_salts=8, salt_source="uid",
        ).groupBy("seg").agg(F.count("*").alias("n")),
        results,
    )
    measure(
        spark,
        "aqe_skew_join_2m",
        lambda: skew_fact.join(
            skew_dim.hint("merge"),
            skew_fact["hot_key"] == skew_dim["dk"],
        ).groupBy("seg").agg(F.count("*").alias("n")),
        results,
    )

    print("round-9 probes (streaming replay at events ×10):")
    measure(
        spark,
        "stream_interval_join_1m",
        lambda: catalog.QUERIES["stream_interval_join_replay"](spark, ev10_dir),
        results,
    )
    measure(
        spark,
        "stream_asof_spine_1m",
        lambda: catalog.QUERIES["stream_asof_spine_replay"](spark, ev10_dir),
        results,
    )

    # ------------------------------------------------------------------
    # Round-9b probes (the post-drain roadmap additions):
    # (a) PackBits TIFF decode at 10× ids — must stay map-only like
    #     its uncompressed twin; the delta vs tiff_decode_10x is the
    #     RLE inflate cost.
    # (b) OPQ over a 10× embedding corpus (20k vectors) — rotation +
    #     reconstruction are scan-fused map work; the only shuffle is
    #     the per-query top-k window.  recall@5 vs the exact top-k is
    #     recorded alongside (the quantizer's quality number at scale).
    # (c) the LEFT OUTER interval-join replay at events ×10 — the NULL
    #     eviction path through a real streaming job at 1M rows.
    # (d) manifest-table maintenance at 2M rows: per-append cost
    #     (hard-link + one clustered shuffle of the batch) vs the
    #     amortized compaction rewrite.
    # ------------------------------------------------------------------
    from curw_mike_data_handler_spark.operators.multimodal import (
        synthesize_tiff_packbits,
    )

    print("round-9b probes (packbits, OPQ, outer join, manifest):")
    measure(
        spark,
        "tiff_packbits_decode_10x",
        lambda: tiff_pixel_stats(synthesize_tiff_packbits(ids10)),
        results,
    )

    from curw_mike_data_handler_spark.operators.multimodal import (
        synthesize_tiff_multipage,
        tiff_page_stats,
    )

    measure(
        spark,
        "tiff_multipage_decode_10x",
        lambda: tiff_page_stats(synthesize_tiff_multipage(ids10)),
        results,
    )

    from curw_mike_data_handler_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_bucketed,
        opq_rotate,
        opq_signed_rows,
        pq_gain_shape_reconstruct,
    )

    emb1 = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    copies = spark.range(10).select(F.col("id").alias("copy"))
    # 10 copies with distinct ids, SAME label (a 10× corpus is 10×
    # denser buckets — that's the scale being probed), and a small
    # deterministic per-(copy, dim) perturbation: exact duplicates
    # would make the exact top-5 all cos=1.0 ties (recall trivially 1)
    # — or, with per-copy label remapping, structurally 0 (every
    # duplicate lands in a different bucket than its query; review
    # finding).  Perturbed copies give the metric meaning: near but
    # not identical neighbors, rankable by both paths.
    emb10 = emb1.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: ((F.col("copy") * 7 + i) % 11 - 5).cast("double") * 0.01,
            ),
            lambda x, d: x.cast("double") + d,
        ).alias("embedding"),
        "label",
    ).localCheckpoint()
    rows_hd = opq_signed_rows()
    rotated10 = emb10.withColumn("embedding", opq_rotate(F.col("embedding"), rows_hd))
    corpus10 = rotated10.withColumn(
        "embedding", pq_gain_shape_reconstruct(F.col("embedding"))
    )
    queries10 = rotated10.filter(F.col("vec_id") % 1000 == 0)
    measure(
        spark,
        "ann_topk_opq_20k",
        lambda: ann_topk_bucketed(
            queries10, corpus10, k=5,
            corpus_partitions=spark.sparkContext.defaultParallelism,
        ),
        results,
    )
    exact10 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(
            emb10.filter(F.col("vec_id") % 1000 == 0), emb10, k=5,
            corpus_partitions=spark.sparkContext.defaultParallelism,
        ).collect()
    }
    opq10 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bucketed(
            queries10, corpus10, k=5,
            corpus_partitions=spark.sparkContext.defaultParallelism,
        ).collect()
    }
    results["ann_topk_opq_20k"]["recall_at_5_vs_exact"] = round(
        len(exact10 & opq10) / max(len(exact10), 1), 3
    )
    print(f"  OPQ recall@5 vs exact at 20k: "
          f"{results['ann_topk_opq_20k']['recall_at_5_vs_exact']}")

    # the SCALE engine: same math through one Arrow numpy matmul per
    # batch instead of the oracle-exact interpreted fold — this is the
    # form a 100 TB corpus would run (the fold exists for the DuckDB
    # bit-parity gate)
    rot_arrow = emb10.withColumn(
        "embedding", opq_rotate(F.col("embedding"), rows_hd, engine="arrow")
    )
    corpus_arrow = rot_arrow.withColumn(
        "embedding",
        pq_gain_shape_reconstruct(F.col("embedding"), engine="arrow"),
    )
    queries_arrow = rot_arrow.filter(F.col("vec_id") % 1000 == 0)
    measure(
        spark,
        "ann_topk_opq_20k_arrow",
        lambda: ann_topk_bucketed(
            queries_arrow, corpus_arrow, k=5,
            corpus_partitions=spark.sparkContext.defaultParallelism,
        ),
        results,
    )
    arrow10 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bucketed(
            queries_arrow, corpus_arrow, k=5,
            corpus_partitions=spark.sparkContext.defaultParallelism,
        ).collect()
    }
    results["ann_topk_opq_20k_arrow"]["recall_at_5_vs_exact"] = round(
        len(exact10 & arrow10) / max(len(exact10), 1), 3
    )
    print(f"  OPQ(arrow) recall@5 vs exact at 20k: "
          f"{results['ann_topk_opq_20k_arrow']['recall_at_5_vs_exact']}")

    measure(
        spark,
        "stream_outer_interval_join_1m",
        lambda: catalog.QUERIES["stream_outer_interval_join_replay"](
            spark, ev10_dir
        ),
        results,
    )
    measure(
        spark,
        "stream_full_outer_interval_join_1m",
        lambda: catalog.QUERIES["stream_full_outer_interval_join_replay"](
            spark, ev10_dir
        ),
        results,
    )

    from curw_mike_data_handler_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )

    hh_fact = spark.range(4_000_000).select(
        F.when(
            F.col("id") % 5 < 2,
            F.concat(F.lit("hot_"), (F.col("id") % 7).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 999983).cast("string"))
        )
        .alias("key")
    )
    measure(
        spark,
        "heavy_hitters_mg_4m_1m_keys",
        lambda: heavy_hitters_exact(hh_fact, "key", k=32),
        results,
    )

    import shutil
    import tempfile

    from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

    mroot = tempfile.mkdtemp(prefix="cm_probe_manifest_")
    try:
        base_rows = spark.range(2_000_000).selectExpr(
            "id % 100000 AS k", "id AS v"
        )
        t_create = time.time()
        mb.create_manifest_table(
            spark, base_rows, mroot, "probe_facts",
            bucket_cols="k", num_buckets=32, sort_cols="k",
        )
        create_s = round(time.time() - t_create, 2)
        append_s = []
        compacted_at = None
        for i in range(1, 5):
            batch = spark.range(200_000).selectExpr(
                f"(id + {i} * 1000000) % 100000 AS k", "id AS v"
            )
            t_a = time.time()
            v = mb.append_manifest_table(
                spark, batch, mroot, "probe_facts",
                compact_files_per_bucket=3,
            )
            append_s.append(round(time.time() - t_a, 2))
            m = mb.read_manifest(mroot, "probe_facts")
            if "compacted_from" in m and compacted_at is None:
                compacted_at = i
        final = mb.read_manifest(mroot, "probe_facts")
        results["manifest_append_compact_2m"] = {
            "create_s": create_s,
            "append_s": append_s,
            "compacted_at_append": compacted_at,
            "final_files": len(final["files"]),
            "rows": mb.read_manifest_table(spark, mroot, "probe_facts").count(),
        }
        print(f"  manifest 2M: create {create_s}s, appends {append_s}, "
              f"compaction at append {compacted_at}, "
              f"final files {len(final['files'])}")
        mb.expire_generations(spark, mroot, "probe_facts", keep=1)
    finally:
        for vv in range(0, 8):
            spark.sql(
                "DROP TABLE IF EXISTS "
                + mb._catalog_name(mroot, "probe_facts", vv)
            )
        shutil.rmtree(mroot, ignore_errors=True)

    # ---- round-10 probes: MEASURED streaming state + shred at scale ----
    # (r9 verdict #6: "state bounded by rate × horizon" must be a
    # number from lastProgress.stateOperators, not prose)
    from curw_mike_data_handler_spark.streaming.joins import (
        stream_interval_join,
    )
    from curw_mike_data_handler_spark.streaming.replay import (
        replay_file_stream,
    )

    ev1m = spark.read.parquet(os.path.join(ev10_dir, "events.parquet"))
    sides = ev1m.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_id", "ts", "event_type"
    )

    def ij_plan(watermark):
        def plan(stream):
            v = stream.filter(F.col("event_type") == "view").select(
                "user_id", F.col("event_id").alias("v_id"),
                F.col("ts").alias("v_ts"),
            )
            b = stream.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("b_id"),
                F.col("ts").alias("b_ts"),
            )
            return stream_interval_join(
                v, b, ["user_id"], "v_ts", "b_ts",
                max_lag_minutes=720, watermark=watermark,
            )
        return plan

    for label, wm, nf, order in (
        ("stream_interval_join_state_loose_wm", "365 days", 4, None),
        # tight: the 12 h join horizon + 1 day late-data slack, with
        # TIME-ORDERED arrival (order_by) so the watermark advances
        # per trigger — the production regime where eviction must CAP
        # state while the feed keeps flowing
        ("stream_interval_join_state_tight_wm", "1 day", 8, "ts"),
    ):
        prog: dict = {}
        t0 = time.perf_counter()
        out = replay_file_stream(
            spark, sides, ij_plan(wm), n_files=nf, progress_out=prog,
            order_by=order,
        )
        results[label] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "rows_out": out.count(),
            "num_triggers": prog["num_triggers"],
            "max_state_rows": prog["max_state_rows"],
            "max_state_bytes": prog["max_state_bytes"],
        }
        print(f"  {label}: {results[label]}")
    feed_rows = sides.count()
    loose = results["stream_interval_join_state_loose_wm"]
    tight = results["stream_interval_join_state_tight_wm"]
    results["stream_interval_join_state_tight_wm"]["feed_rows"] = feed_rows
    results["stream_interval_join_state_tight_wm"]["state_rows_over_feed"] = (
        round(tight["max_state_rows"] / feed_rows, 4)
    )
    # the loose run holds everything (gate regime); the tight run must
    # hold a small fraction — the measured eviction bound
    assert tight["max_state_rows"] < loose["max_state_rows"] / 2, (
        "tight watermark failed to cap interval-join state",
        tight["max_state_rows"], loose["max_state_rows"],
    )

    from curw_mike_data_handler_spark.streaming.heavyhitters import (
        heavy_hitter_candidates_stream,
    )

    mg_feed = hh_fact.limit(1_000_000)
    prog_mg: dict = {}
    t0 = time.perf_counter()
    out_mg = replay_file_stream(
        spark, mg_feed,
        lambda s: heavy_hitter_candidates_stream(s, "key", k=32, n_buckets=8),
        output_mode="update", n_files=4, progress_out=prog_mg,
    )
    results["stream_heavy_hitters_state_1m"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "rows_out": out_mg.count(),
        "num_triggers": prog_mg["num_triggers"],
        "max_state_rows": prog_mg["max_state_rows"],
        "max_state_bytes": prog_mg["max_state_bytes"],
    }
    print(f"  stream_heavy_hitters_state_1m: "
          f"{results['stream_heavy_hitters_state_1m']}")
    # MG state = one state-store row per hash bucket, O(k) ints inside,
    # for 1M rows over ~400k distinct keys
    assert prog_mg["max_state_rows"] <= 8

    from curw_mike_data_handler_spark.streaming.quantiles import (
        quantile_drift_stream,
    )

    ts_minmax = ev1m.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).collect()[0]
    bd = ts_minmax["mn"] + (ts_minmax["mx"] - ts_minmax["mn"]) // 2
    qfeed = ev1m.select(
        "event_type", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    prog_q: dict = {}
    t0 = time.perf_counter()
    out_q = replay_file_stream(
        spark, qfeed,
        lambda s: quantile_drift_stream(
            s, "event_type", "cents", "ts", boundary_us=bd, capacity=128,
        ),
        output_mode="update", n_files=4, progress_out=prog_q,
    )
    final_snaps = (
        out_q.groupBy("key")
        .agg(
            F.max(F.col("n_ref") + F.col("n_cur")).alias("n"),
            F.max_by("state_items", F.col("n_ref") + F.col("n_cur"))
            .alias("state_items"),
            F.max_by("err_bound", F.col("n_ref") + F.col("n_cur"))
            .alias("err_bound"),
        )
        .collect()
    )
    results["stream_quantile_drift_state_1m_cap128"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "num_triggers": prog_q["num_triggers"],
        "max_state_bytes": prog_q["max_state_bytes"],
        "per_key": {
            r["key"]: {
                "n": r["n"],
                "state_items": r["state_items"],
                "err_bound": r["err_bound"],
            }
            for r in final_snaps
        },
    }
    print(f"  stream_quantile_drift_state_1m_cap128: "
          f"{results['stream_quantile_drift_state_1m_cap128']}")
    # 2 summaries × capacity 128 × ≤14 levels, vs ~200k values per key
    for r in final_snaps:
        assert r["state_items"] <= 2 * 128 * 14, r

    # shredded manifest at 2M rows: routed all-shredded read + file
    # pruning vs parse-at-read over the raw JSON — the scan-cost win
    # shredding exists for
    shroot = tempfile.mkdtemp(prefix="cm_probe_shred_")
    try:
        payload_col = F.to_json(
            F.struct(
                (F.col("id") % 100_000).alias("k"),
                F.md5(F.col("id").cast("string")).alias("tag"),
                (F.col("id") * 3).alias("c"),
            )
        )
        srows = spark.range(2_000_000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 4096).alias("uid"),
            payload_col.alias("payload"),
            (F.col("id") % 100_000).alias("_k"),
        )
        t0 = time.perf_counter()
        mb.create_manifest_table(
            spark, srows.filter(F.col("_k") < 50_000).drop("_k"),
            shroot, "probe_shred", bucket_cols="uid", num_buckets=32,
            shred={"column": "payload", "fields": {"k": "bigint", "c": "bigint"}},
        )
        mb.append_manifest_table(
            spark, srows.filter(F.col("_k") >= 50_000).drop("_k"),
            shroot, "probe_shred", compact_files_per_bucket=100,
        )
        create_s = round(time.perf_counter() - t0, 2)
        m = mb.read_manifest(shroot, "probe_shred")
        kept = mb.shred_pruned_files(m, "k", lower=60_000, upper=70_000)
        measure(
            spark, "shred_routed_pruned_read_2m",
            lambda: mb.read_manifest_table_shred_pruned(
                spark, shroot, "probe_shred", {"k": "bigint", "c": "bigint"},
                prune_field="k", lower=60_000, upper=70_000,
            ).filter(F.col("k").between(60_000, 70_000))
            .groupBy((F.col("k") % 7).alias("m")).agg(F.sum("c").alias("s")),
            results,
        )
        measure(
            spark, "shred_raw_parse_read_2m",
            lambda: mb.read_manifest_table(spark, shroot, "probe_shred")
            .select(
                mb.shred_expr("payload", "k", "bigint").alias("k"),
                mb.shred_expr("payload", "c", "bigint").alias("c"),
            )
            .filter(F.col("k").between(60_000, 70_000))
            .groupBy((F.col("k") % 7).alias("m")).agg(F.sum("c").alias("s")),
            results,
        )
        results["shred_routed_pruned_read_2m"]["publish_s"] = create_s
        results["shred_routed_pruned_read_2m"]["files_kept"] = len(kept)
        results["shred_routed_pruned_read_2m"]["files_total"] = len(m["files"])
        print(f"  shred 2M: publish {create_s}s, pruned files "
              f"{len(kept)}/{len(m['files'])}")
    finally:
        mb.drop_catalog_entries(spark, shroot, "probe_shred")
        shutil.rmtree(shroot, ignore_errors=True)

    # copy-on-write MERGE at 2M rows / 32 buckets: an upsert of ~100
    # keys confined to a few buckets must rewrite ONLY those buckets'
    # files — the rewrite ratio is the whole point of the row-level
    # write path at 100 TB
    cowroot = tempfile.mkdtemp(prefix="cm_probe_cow_")
    try:
        base_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, base_rows, cowroot, "probe_cow",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        # the realistic shape: one entity's keys cluster in FEW buckets
        # (here: 100 keys drawn from 2 of the 32 buckets) — the rewrite
        # must touch only those buckets' files
        ups = (
            spark.range(200_000)
            .selectExpr("id AS k")
            .filter(mb.spark_bucket_id(32, "k") <= 1)
            .limit(100)
            .selectExpr("k", "CAST(-1 AS BIGINT) AS v", "k AS ts_k")
        )
        n_touched_buckets = ups.select(
            mb.spark_bucket_id(32, "k").alias("b")
        ).distinct().count()
        t0 = time.perf_counter()
        mb.merge_manifest_table(spark, ups, cowroot, "probe_cow",
                                key_cols="k")
        merge_s = round(time.perf_counter() - t0, 2)
        m = mb.read_manifest(cowroot, "probe_cow")
        results["cow_merge_2m_100keys"] = {
            "wall_s": merge_s,
            "rewritten_files": m["rewritten_files"],
            "linked_files": m["linked_files"],
            "touched_buckets": n_touched_buckets,
            "rows": mb.read_manifest_table(spark, cowroot, "probe_cow").count(),
        }
        print(f"  cow merge 2M: {merge_s}s, rewrote "
              f"{m['rewritten_files']}/{m['rewritten_files'] + m['linked_files']}"
              f" files ({n_touched_buckets} buckets touched)")
        assert m["rewritten_files"] <= n_touched_buckets
    finally:
        mb.drop_catalog_entries(spark, cowroot, "probe_cow")
        shutil.rmtree(cowroot, ignore_errors=True)

    # re-bucketing at 2M rows (r10 verdict #6): a FULL-table rewrite by
    # design — record the cost so it's a measured number, not a guess,
    # and pin that the new layout's file census matches the new spec.
    rbroot = tempfile.mkdtemp(prefix="cm_probe_rb_")
    try:
        rb_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, rb_rows, rbroot, "probe_rb",
            bucket_cols="k", num_buckets=16, sort_cols="ts_k",
        )
        t0 = time.perf_counter()
        mb.rebucket_manifest_table(spark, rbroot, "probe_rb",
                                   num_buckets=32)
        rb_s = round(time.perf_counter() - t0, 2)
        m = mb.read_manifest(rbroot, "probe_rb")
        results["rebucket_2m_16_to_32"] = {
            "wall_s": rb_s,
            "files_after": len(m["files"]),
            "rows": m["size_rollup"]["row_count"],
            "buckets_after": m["num_buckets"],
        }
        print(f"  rebucket 2M 16->32: {rb_s}s, {len(m['files'])} files")
        assert m["size_rollup"]["row_count"] == 2_000_000
    finally:
        mb.drop_catalog_entries(spark, rbroot, "probe_rb")
        shutil.rmtree(rbroot, ignore_errors=True)

    # Bloom point-filter PUBLISH overhead (r10 verdict #1/#6): three
    # equal appends onto a point-filtered 2M-row table — per-append
    # publish wall must stay flat as the table's file count grows
    # (only NEW files build filters; carried files inherit), and the
    # DRIVER must do zero column reads (the build is the distributed
    # job — enforced here by poisoning pq.read_table for the whole
    # probe, same guard as the unit test).
    import pyarrow.parquet as _pq

    pfroot = tempfile.mkdtemp(prefix="cm_probe_pf_")
    orig_read_table = _pq.read_table

    def _forbidden(*a, **kw):
        raise AssertionError("driver-side pq.read_table during publish")

    try:
        _pq.read_table = _forbidden
        pf_rows = spark.range(2_000_000).selectExpr(
            "id AS k",
            "CAST(id % 200000 AS BIGINT) AS sec",
            "id AS ts_k",
        )
        t0 = time.perf_counter()
        mb.create_manifest_table(
            spark, pf_rows.filter("k < 800000"), pfroot, "probe_pf",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
            point_filter_cols="sec",
        )
        create_s = round(time.perf_counter() - t0, 2)
        append_walls = []
        for lo in (800_000, 1_200_000, 1_600_000):
            batch = pf_rows.filter(
                (F.col("k") >= lo) & (F.col("k") < lo + 400_000)
            )
            t0 = time.perf_counter()
            mb.append_manifest_table(spark, batch, pfroot, "probe_pf",
                                     compact_files_per_bucket=100)
            append_walls.append(round(time.perf_counter() - t0, 2))
        m = mb.read_manifest(pfroot, "probe_pf")
        t0 = time.perf_counter()
        kept = mb.point_pruned_files(m, "sec", 123_456)
        n_hit = (
            mb.read_manifest_table_point(spark, pfroot, "probe_pf",
                                         "sec", 123_456)
            .filter(F.col("sec") == 123_456)
            .count()
        )
        point_read_s = round(time.perf_counter() - t0, 2)
        results["bloom_publish_2m"] = {
            "create_s": create_s,
            "append_walls_s": append_walls,
            "files_total": len(m["files"]),
            "point_read_s": point_read_s,
            "files_kept_point": len(kept),
            "rows_hit": n_hit,
        }
        print(f"  bloom publish 2M: create {create_s}s, appends "
              f"{append_walls} (files grow {len(m['files'])}), point read "
              f"{point_read_s}s over {len(kept)}/{len(m['files'])} files")
        # flatness: the last append (most carried files) must not cost
        # multiples of the first — filters are built for NEW files only
        assert append_walls[-1] < 3 * append_walls[0] + 2, append_walls
        assert n_hit == 10  # 2M rows / 200k distinct sec values
    finally:
        _pq.read_table = orig_read_table
        mb.drop_catalog_entries(spark, pfroot, "probe_pf")
        shutil.rmtree(pfroot, ignore_errors=True)

    # merge-on-read deletion vector + change feed at 2M rows (round
    # 11): the MoR delete must be METADATA-class work (one
    # bucket-pruned scan, no file rewrite — compare wall against the
    # COW merge probe above), and the change feed for a small merge
    # must be bounded by the touched region, not the table.
    dvroot = tempfile.mkdtemp(prefix="cm_probe_dv_")
    try:
        dv_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, dv_rows, dvroot, "probe_dv",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        doomed = spark.range(1000).selectExpr("id * 1999 AS k")
        t0 = time.perf_counter()
        mb.delete_manifest_rows_mor(spark, doomed, dvroot, "probe_dv",
                                    key_cols="k")
        dv_s = round(time.perf_counter() - t0, 2)
        m = mb.read_manifest(dvroot, "probe_dv")
        t0 = time.perf_counter()
        n_live = mb.read_manifest_table(spark, dvroot, "probe_dv").count()
        dv_read_s = round(time.perf_counter() - t0, 2)
        # a bucket-confined merge, then the incremental feed across
        # the whole history (create → dv-delete → merge)
        ups = (
            spark.range(200_000).selectExpr("id AS k")
            .filter(mb.spark_bucket_id(32, "k") <= 1).limit(100)
            .selectExpr("k", "CAST(-1 AS BIGINT) AS v", "k AS ts_k")
        )
        mb.merge_manifest_table(spark, ups, dvroot, "probe_dv", key_cols="k")
        t0 = time.perf_counter()
        ch = mb.read_manifest_changes(spark, dvroot, "probe_dv",
                                      from_version=0)
        n_changes = ch.count()
        feed_s = round(time.perf_counter() - t0, 2)
        results["dv_delete_and_feed_2m"] = {
            "dv_delete_wall_s": dv_s,
            "dv_positions": m["dv_positions"],
            "rows_live": n_live,
            "read_with_dv_s": dv_read_s,
            "feed_wall_s": feed_s,
            "feed_changes": n_changes,
        }
        print(f"  dv 2M: delete {dv_s}s ({m['dv_positions']} positions, "
              f"0 files rewritten), read {dv_read_s}s, feed {feed_s}s "
              f"({n_changes} changes)")
        assert n_live == 2_000_000 - 1000
        # MoR delete writes NO data file: generation dir unchanged
        assert m["generation"] == mb.read_manifest(
            dvroot, "probe_dv", version=0)["generation"]
    finally:
        mb.drop_catalog_entries(spark, dvroot, "probe_dv")
        shutil.rmtree(dvroot, ignore_errors=True)

    # streaming COW-upsert sink under sustained load (r10 verdict #7):
    # 50 epochs of per-epoch MERGE into one keyed table — per-epoch
    # publish wall must stay flat as generations accumulate (the chain
    # grows to 50 manifests; reads resolve via LATEST, the batch-id
    # dedupe walk is bounded small-file metadata).  The sink callable
    # is driven directly: the micro-batch SCHEDULER's wall is a gate
    # artifact measured elsewhere (replay_harness_total); what must
    # not grow with epoch count is the ENGINE's publish path.
    epoch_root = tempfile.mkdtemp(prefix="cm_probe_ep_")
    try:
        base50 = spark.range(400_000).selectExpr(
            "id AS user_id", "CAST(0 AS BIGINT) AS ts",
            "CAST(0 AS BIGINT) AS event_id", "CAST(0 AS BIGINT) AS cents",
        )
        mb.create_manifest_table(
            spark, base50, epoch_root, "probe_state",
            bucket_cols="user_id", num_buckets=32,
        )
        sink = mb.foreach_batch_merge(
            epoch_root, "probe_state", key_cols="user_id",
            order_cols=["ts", "event_id"],
        )
        epoch_walls = []
        for epoch in range(50):
            batch = spark.range(2000).selectExpr(
                f"(id * 193 + {epoch} * 7919) % 400000 AS user_id",
                f"CAST({epoch} AS BIGINT) AS ts",
                "id AS event_id",
                f"CAST(id + {epoch} AS BIGINT) AS cents",
            )
            t0 = time.perf_counter()
            sink(batch, epoch)
            epoch_walls.append(time.perf_counter() - t0)
        first10 = sum(epoch_walls[:10]) / 10
        last10 = sum(epoch_walls[-10:]) / 10
        m = mb.read_manifest(epoch_root, "probe_state")
        results["stream_cow_upsert_50_epochs"] = {
            "epochs": 50,
            "rows_per_epoch": 2000,
            "first10_avg_s": round(first10, 2),
            "last10_avg_s": round(last10, 2),
            "total_s": round(sum(epoch_walls), 2),
            "final_version": m["version"],
            "rows": m["size_rollup"]["row_count"],
        }
        print(f"  stream cow upsert 50 epochs: first10 {first10:.2f}s, "
              f"last10 {last10:.2f}s, version {m['version']}")
        # flat within noise: no O(versions) term in the publish path
        assert last10 < 2.5 * first10 + 1, epoch_walls
        assert m["size_rollup"]["row_count"] == 400_000  # pure upserts
    finally:
        mb.drop_catalog_entries(spark, epoch_root, "probe_state")
        shutil.rmtree(epoch_root, ignore_errors=True)

    # deletion vectors AT THE 1M-POSITION CAP (r11 verdict #4): the
    # positions live inline in the manifest JSON — measure the
    # manifest file size, its parse cost, and the vectored read tax at
    # the cap to decide whether a binary sidecar is warranted.
    caproot = tempfile.mkdtemp(prefix="cm_probe_dvcap_")
    try:
        cap_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, cap_rows, caproot, "probe_cap",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        t0 = time.perf_counter()
        n0 = mb.read_manifest_table(spark, caproot, "probe_cap").count()
        read_plain_s = round(time.perf_counter() - t0, 2)
        doomed = spark.range(1_000_000).selectExpr("id * 2 AS k")
        t0 = time.perf_counter()
        mb.delete_manifest_rows_mor(
            spark, doomed, caproot, "probe_cap", key_cols="k",
            max_positions=1_000_000,
        )
        dv_write_s = round(time.perf_counter() - t0, 2)
        mpath = mb._manifest_path(caproot, "probe_cap", 1)
        manifest_mb = round(os.path.getsize(mpath) / 1e6, 2)
        t0 = time.perf_counter()
        for _ in range(3):
            m = mb.read_manifest(caproot, "probe_cap")
        parse_s = round((time.perf_counter() - t0) / 3, 3)
        t0 = time.perf_counter()
        n_live = mb.read_manifest_table(spark, caproot, "probe_cap").count()
        read_dv_s = round(time.perf_counter() - t0, 2)
        results["dv_manifest_1m_positions"] = {
            "dv_positions": m["dv_positions"],
            "manifest_mb": manifest_mb,
            "manifest_parse_s": parse_s,
            "dv_write_wall_s": dv_write_s,
            "read_plain_s": read_plain_s,
            "read_with_1m_dv_s": read_dv_s,
            "rows_live": n_live,
        }
        print(f"  dv at cap: manifest {manifest_mb} MB, parse {parse_s}s, "
              f"read {read_plain_s}s -> {read_dv_s}s with 1M positions")
        assert n0 == 2_000_000 and n_live == 1_000_000
    finally:
        mb.drop_catalog_entries(spark, caproot, "probe_cap")
        shutil.rmtree(caproot, ignore_errors=True)

    # merge-on-read UPSERT vs the COW merge at 2M rows (round 12): the
    # MoR write must be metadata-class (positions scan + tiny delta
    # write, zero touched-file rewrites — compare cow_merge_2m_100keys
    # above), and the read tax must stay one broadcast anti-join.
    morroot = tempfile.mkdtemp(prefix="cm_probe_mor_")
    try:
        mor_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, mor_rows, morroot, "probe_mor",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        ups = spark.range(100).selectExpr(
            "id * 19997 AS k", "CAST(-1 AS BIGINT) AS v", "id AS ts_k"
        )
        t0 = time.perf_counter()
        mb.merge_manifest_table_mor(
            spark, ups, morroot, "probe_mor", key_cols="k",
            compact_files_per_bucket=100,
        )
        mor_s = round(time.perf_counter() - t0, 2)
        m = mb.read_manifest(morroot, "probe_mor")
        t0 = time.perf_counter()
        n_live = mb.read_manifest_table(spark, morroot, "probe_mor").count()
        mor_read_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        feed_n = mb.read_manifest_changes(
            spark, morroot, "probe_mor", from_version=0
        ).count()
        feed_s = round(time.perf_counter() - t0, 2)
        results["mor_merge_2m_100keys"] = {
            "wall_s": mor_s,
            "rewritten_files": m.get("rewritten_files", 0),
            "delta_files": len(m["files"])
            - len(mb.read_manifest(morroot, "probe_mor", 0)["files"]),
            "dv_positions": m["dv_positions"],
            "read_s": mor_read_s,
            "rows_live": n_live,
            "feed_wall_s": feed_s,
            "feed_changes": feed_n,
        }
        print(f"  mor merge 2M/100keys: {mor_s}s write (0 rewrites, "
              f"{m['dv_positions']} positions), read {mor_read_s}s, "
              f"feed {feed_s}s ({feed_n} changes)")
        assert n_live == 2_000_000  # pure upserts of existing keys
        assert m.get("rewritten_files", 0) == 0 or "rewritten_files" not in m
        assert feed_n == 200  # 100 deletes + 100 inserts
    finally:
        mb.drop_catalog_entries(spark, morroot, "probe_mor")
        shutil.rmtree(morroot, ignore_errors=True)

    # mirror sync chain (r11 verdict #5): 25 sync cycles on a GROWING
    # source — per-sync wall must track the changed-region size, never
    # source size or accumulated version count.
    mirroot = tempfile.mkdtemp(prefix="cm_probe_mir_")
    try:
        src_rows = spark.range(400_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, src_rows, mirroot, "probe_src",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        mb.create_manifest_mirror(spark, mirroot, "probe_src", "probe_dst")
        sync_walls = []
        next_k = 400_000
        for cycle in range(25):
            batch = spark.range(next_k, next_k + 2000).selectExpr(
                "id AS k", "id * 2 AS v", "id AS ts_k"
            )
            next_k += 2000
            mb.append_manifest_table(
                spark, batch, mirroot, "probe_src",
                compact_files_per_bucket=100,
            )
            ups = spark.range(500).selectExpr(
                f"(id * 797 + {cycle} * 13) % 400000 AS k",
                "CAST(-1 AS BIGINT) AS v",
                f"CAST({cycle} AS BIGINT) AS ts_k",
            )
            mb.merge_manifest_table(spark, ups, mirroot, "probe_src",
                                    key_cols="k")
            t0 = time.perf_counter()
            mb.sync_manifest_mirror(spark, mirroot, "probe_dst",
                                    key_cols="k")
            sync_walls.append(time.perf_counter() - t0)
        first10 = sum(sync_walls[:10]) / 10
        last10 = sum(sync_walls[-10:]) / 10
        n_src = mb.read_manifest_table(spark, mirroot, "probe_src").count()
        n_dst = mb.read_manifest_table(spark, mirroot, "probe_dst").count()
        results["mirror_sync_25x"] = {
            "cycles": 25,
            "changed_rows_per_cycle": 2500,
            "first10_avg_s": round(first10, 2),
            "last10_avg_s": round(last10, 2),
            "total_s": round(sum(sync_walls), 2),
            "src_rows_final": n_src,
            "dst_rows_final": n_dst,
        }
        print(f"  mirror sync 25x: first10 {first10:.2f}s, last10 "
              f"{last10:.2f}s, dst rows {n_dst}")
        assert n_dst == n_src, "mirror diverged from source"
        # flat within noise: cost tracks the changed region, not the
        # growing source or version count
        assert last10 < 2.5 * first10 + 1, sync_walls
    finally:
        mb.drop_catalog_entries(spark, mirroot, "probe_src")
        mb.drop_catalog_entries(spark, mirroot, "probe_dst")
        shutil.rmtree(mirroot, ignore_errors=True)

    # transactional secondary index at 2M rows (round 12): the indexed
    # point lookup must beat the full-scan filter in files opened AND
    # wall time.
    ixroot = tempfile.mkdtemp(prefix="cm_probe_ix_")
    try:
        from curw_mike_data_handler_spark.sources import (
            manifest_index as mi,
        )

        ix_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id % 200000 AS c", "id * 2 AS v"
        )
        mb.create_manifest_table(
            spark, ix_rows, ixroot, "probe_base",
            bucket_cols="k", num_buckets=32, sort_cols="k",
        )
        t0 = time.perf_counter()
        mi.create_manifest_index(spark, ixroot, "probe_base", "probe_ix",
                                 column="c", num_buckets=16)
        build_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_hit = mi.read_manifest_point_indexed(
            spark, ixroot, "probe_base", "probe_ix", 12345
        ).count()
        lookup_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_full = (
            mb.read_manifest_table(spark, ixroot, "probe_base")
            .filter(F.col("c") == 12345).count()
        )
        full_s = round(time.perf_counter() - t0, 2)
        scanned, total = mi.indexed_lookup_files(
            ixroot, "probe_base", "probe_ix", 12345
        )
        # index-maintained COW merge (round 12): move 100 keys to a
        # brand-new c value — cost must scale with the update batch
        # (touched buckets only), and the post-merge-only value must
        # resolve through the postings the SAME transaction wrote
        ups = spark.range(100).selectExpr(
            "id * 19997 AS k", "CAST(900000001 AS BIGINT) AS c",
            "CAST(-1 AS BIGINT) AS v",
        )
        t0 = time.perf_counter()
        mi.merge_with_index(
            spark, ups, ixroot, "probe_base", "probe_ix", key_cols="k",
            compact_files_per_bucket=100,
        )
        merge_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_moved = mi.read_manifest_point_indexed(
            spark, ixroot, "probe_base", "probe_ix", 900000001
        ).count()
        merged_lookup_s = round(time.perf_counter() - t0, 2)
        results["index_lookup_2m"] = {
            "build_s": build_s,
            "lookup_wall_s": lookup_s,
            "full_filter_wall_s": full_s,
            "files_scanned": scanned,
            "files_total": total,
            "rows_hit": n_hit,
            "merge_with_index_100keys_s": merge_s,
            "post_merge_lookup_s": merged_lookup_s,
        }
        print(f"  index lookup 2M: build {build_s}s, lookup {lookup_s}s "
              f"({scanned}/{total} files) vs full filter {full_s}s; "
              f"maintained merge {merge_s}s, post-merge lookup "
              f"{merged_lookup_s}s")
        assert n_hit == n_full == 10  # 2M / 200k distinct c values
        assert scanned < total
        assert n_moved == 100
    finally:
        mb.drop_catalog_entries(spark, ixroot, "probe_base")
        mb.drop_catalog_entries(spark, ixroot, "probe_ix")
        shutil.rmtree(ixroot, ignore_errors=True)

    # CDF STREAM reader at 2M rows (round 12): the partition plan must
    # mirror the feed's cost contract at scale — appends plan per new
    # FILE, MoR vector growth per touched FILE, COW merges per touched
    # BUCKET — and the executor-side pyarrow read of a bounded window
    # must cost rewritten-region time, not table-scan time.
    cdfroot = tempfile.mkdtemp(prefix="cm_probe_cdf_")
    try:
        from curw_mike_data_handler_spark.streaming.cdf_source import (
            ManifestCDFStreamReader,
        )

        cdf_rows = spark.range(2_000_000).selectExpr(
            "id AS k", "id * 2 AS v", "id AS ts_k"
        )
        mb.create_manifest_table(
            spark, cdf_rows, cdfroot, "probe_cdf",
            bucket_cols="k", num_buckets=32, sort_cols="ts_k",
        )
        mb.append_manifest_table(
            spark,
            spark.range(2_000_000, 2_020_000).selectExpr(
                "id AS k", "id * 2 AS v", "id AS ts_k"
            ),
            cdfroot, "probe_cdf", compact_files_per_bucket=100,
        )                                                            # v1
        mb.merge_manifest_table(
            spark,
            spark.range(100).selectExpr(
                "id * 19997 AS k", "CAST(-1 AS BIGINT) AS v",
                "id AS ts_k",
            ),
            cdfroot, "probe_cdf", key_cols="k",
        )                                                            # v2
        mb.delete_manifest_rows_mor(
            spark,
            spark.range(100).selectExpr("id * 17389 + 7 AS k"),
            cdfroot, "probe_cdf", key_cols="k",
        )                                                            # v3
        reader = ManifestCDFStreamReader(
            {"root": cdfroot, "table": "probe_cdf", "startingVersion": 0}
        )
        t0 = time.perf_counter()
        parts = reader.partitions({"version": 0}, {"version": 3})
        plan_s = round(time.perf_counter() - t0, 3)
        kinds: dict = {}
        for p in parts:
            kinds[p.kind] = kinds.get(p.kind, 0) + 1
        t0 = time.perf_counter()
        n_rows = sum(
            b.num_rows for p in parts for b in reader.read(p)
        )
        read_s = round(time.perf_counter() - t0, 2)
        m1 = mb.read_manifest(cdfroot, "probe_cdf", 1)
        m0 = mb.read_manifest(cdfroot, "probe_cdf", 0)
        new_v1 = len(set(m1["files"]) - set(m0["files"]))
        results["cdf_stream_2m_window"] = {
            "plan_s": plan_s,
            "partitions": kinds,
            "read_all_partitions_s": read_s,
            "change_rows": n_rows,
        }
        print(f"  cdf stream 2M window: plan {plan_s}s, partitions "
              f"{kinds}, serial in-process read {read_s}s, "
              f"{n_rows} change rows")
        # appends plan per new file, never per table file
        assert kinds["insert"] == new_v1
        # the COW merge plans at most one diff per touched bucket (100
        # distinct keys over 32 buckets => <= 32), the MoR delete at
        # most one dv partition per touched FILE (<= one per doomed
        # key, typically far fewer)
        assert kinds["diff"] <= 32
        assert kinds["dv"] <= 100
        # window = appended inserts + merge delete/insert pairs + dv
        # deletes; the serial read is rewritten-region bounded, so it
        # must not read 2M rows
        assert n_rows == 20_000 + 200 + 100
    finally:
        mb.drop_catalog_entries(spark, cdfroot, "probe_cdf")
        shutil.rmtree(cdfroot, ignore_errors=True)

    payload = {
        "sf": 1.0,
        "docs": docs_lin.count(),
        "copies": COPIES,
        "cpus": spark.sparkContext.defaultParallelism,
        "results": results,
    }
    out = os.path.join(REPO, "BENCH_sf1.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out}")

    print("\n| operator | corpus | wall s | rows out | shuffle W MB | shuffle R MB |")
    print("|---|---|---|---|---|---|")
    corpus_of = {
        "dedup_exact": "linear",
        "line_dedup": "linear",
        "curation_pipeline_e2e": "linear",
        "jaccard_pairs_capped": "pairwise",
        "minhash_lsh_pairs": "pairwise",
        "minhash_lsh_pairs_capped": "pairwise",
        "components_label_prop": "pairwise",
        "components_two_phase": "pairwise",
        "semi_join_shuffle_plain": "linear",
        "semi_join_bloom_prefiltered": "linear",
        "fuzzy_edit1_variant_index": "synthetic-vocab",
    }
    for k, v in results.items():
        if "wall_s" in v:
            corpus = corpus_of.get(
                k, "events-10x" if k.endswith("_10x") else "10x"
            )
            print(f"| {k} | {corpus} | {v['wall_s']} "
                  f"| {v.get('rows_out', '—')} "
                  f"| {v.get('shuffle_write_mb', '—')} "
                  f"| {v.get('shuffle_read_mb', '—')} |")
    spark.stop()


if __name__ == "__main__":
    main()
