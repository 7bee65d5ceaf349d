#!/usr/bin/env python
"""Regenerate PLANS.md: the physical plans of representative catalog
queries, with the plan properties each one is meant to exhibit.
Run from the repo root: ``python tools/dump_plans.py``."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curw_mike_data_handler_spark import catalog, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SHOWCASE = [
    ("q1_pricing_summary", "pushed filter, pruned 7-col scan, partial+final agg, ONE exchange"),
    ("q5_regional_revenue", "fact streams once; every dim BroadcastHashJoin; single agg shuffle"),
    ("s4_filtered_scan", "PushedFilters + minimal ReadSchema at the parquet scan"),
    ("s5_active_stations", "stored-proc replacement: pushdown time filter + broadcast LeftSemi"),
    ("w2_topk_per_group", "Partial+Final WindowGroupLimit: per-partition top-k before the shuffle"),
    ("j1_spine_gapfill", "generated spine, single pivot shuffle instead of O(stations) merges"),
    ("j3_w2_nearest_stations", "broadcast nested-loop cross join on repartitioned probe side"),
    ("j6_asof_join", "as-of as tagged union + forward-fill window — one exchange, no BNLJ"),
    ("j7_range_join", "interval containment as bucketed HASH join — no nested loop"),
    ("rf_weighted_catchment", "the reference's core: weights broadcast, one weighted-sum shuffle"),
    ("dedup_minhash_lsh", "minhash → banded self-join → verify; every join hashed"),
    ("ann_topk_lsh", "sign-bit LSH buckets computed in-scan; broadcast query side"),
    ("q6_revenue_delta", "one scan stage: all predicates pushed, scalar partial+final agg"),
    ("q18_large_orders", "HAVING aggregate below the join: only surviving keys join orders"),
    ("q19_disjunctive", "OR-of-ANDs rewrite: implied per-side prefilters + broadcast + residual OR"),
    ("decontam_ngram", "narrow per-doc gram dedup; test grams distinct+broadcast; train side unshuffled"),
    ("text_repetition", "map-only quality signals: HOFs on the token array, no grouped agg"),
    ("quota_cap_per_source", "WindowGroupLimit caps each source to k rows before the exchange"),
    ("q17_small_qty_revenue", "correlated avg as ONE window over the broadcast-semi-filtered slice"),
    ("q22_idle_rich_customers", "broadcast 1-row threshold; LeftAnti on date-pruned orders scan"),
    ("a11_cube", "CUBE = one Expand + one exchange; grouping() flags disambiguate subtotals"),
    ("pack_sequences", "bucketed prefix scan (r7): edges broadcast, (source,bucket) window + offset join — no whole-source task"),
    ("q2_min_cost_supplier", "correlated MIN as window-over-slice; distinct reuses the window clustering"),
    ("q13_order_distribution", "outer join with join-condition predicate; double aggregation"),
    ("q21_sole_late_shipper", "double EXISTS/NOT EXISTS as stacked windows over ONE hash(orderkey) exchange"),
    ("events_interval_merge", "gaps-and-islands: lag, running-sum islands, two clustering-reusing rollups"),
    ("w7_ratio_to_report", "agg-first ratio-to-report: share windows over 25 rows, never the fact"),
    ("text_pii_redaction", "inject + extract + redact as ONE narrow map stage — zero exchanges"),
    ("embedding_quantize_int8", "scalar quantization map-only: codes/recon-dist in-scan, zero exchanges"),
    ("multimodal_decode", "binary build + REAL header parse: two Arrow mapInPandas stages, no shuffle"),
    ("approx_quantiles_contract", "sketch + exact quantiles in ONE grouped agg — single fact exchange"),
    ("dedup_keep_list", "pairs → components → left join back: corpus partition with component map"),
    ("text_chunking", "tokenize+sequence+slice+explode: overlapping chunks in one narrow stage"),
    ("s14_latest_version_read", "latest-fgt window + summary agg share ONE hash(series) exchange"),
    ("line_dedup", "corpus line dedup: df count on hash(line), join back, doc reassembly — linear, no all-pairs"),
    ("scd2_user_state", "CDC→SCD2: lag + running version + run collapse + lead stitch on ONE fact exchange"),
    ("gopher_rules_census", "quality-rule battery: map-only HOFs, single hash(source) exchange"),
    ("ann_recall_census", "eval harness: three bounded top-k operators + tiny-list joins, no extra corpus pass"),
    ("curation_pipeline_e2e", "composed pipeline: gate+sample fuse into dedup scans; 4 exchanges, nothing materializes"),
    ("s15_forecast_revision_delta", "fgt revision compare: rank, prefilter, two rollups on ONE hash(series) exchange"),
    ("cross_source_contamination", "dup-leakage matrix: distinct (fp,source) exchange + bounded pair join"),
    ("events_funnel", "3-stage ordered funnel: stacked conditional min windows on ONE user exchange"),
    ("w9_linear_interpolate", "IGNORE NULLS neighbor frames share one exchange + one sort"),
    ("p10_pivot_wide", "pinned-value pivot: grouped aggregate, no per-column join chain"),
    ("semdedup_clusters", "kmeans blocking key feeds within-cluster cosine pairs; cached assignment"),
    ("ann_topk_pq", "IVF-ADC: exact queries vs int8-reconstructed corpus, bucket equi join"),
    ("graph_pagerank", "Pregel dataflow: edges⋈ranks + dst rollup per round, checkpoint-truncated"),
    ("hll_mergeable_rollup", "per-group HLL sketches unioned driver-free to a global estimate"),
    ("dq_expectations", "validation suite: per-table checks fuse to one conditional-sum scan each"),
    ("events_session_window_native", "native session windows: gap-merge inside ONE aggregate, no self-join"),
    ("basket_lift_top_pairs", "a-priori pair join bounded by basket width; rounded-lift total-order top-k"),
    ("multimodal_pixel_stats", "REAL zlib inflate + inverse PNG filters: two Arrow map stages, zero exchanges"),
    ("multimodal_jpeg_pixel_stats", "REAL baseline JPEG Huffman+IDCT decode: fused Arrow map stages, zero exchanges"),
    ("multimodal_video_frame_pixels", "MJPEG demux + per-frame JPEG decode: map-only, rows bounded by frames/every_n"),
    ("multimodal_jpeg_progressive_pixels", "multi-scan SOF2 coefficient accumulation + one IDCT pass: map-only, zero exchanges"),
    ("w8_ntile_deciles", "oracle gate pins exact ntile; equidepth_bins DEFAULT is edges-broadcast map-only binning"),
    ("a14_winsorized_mean", "1-row quantile thresholds broadcast into one grouped agg (approx sketch at scale)"),
    ("graph_triangles", "node-ordered two-join enumeration; corners via ONE explode, no union re-execution"),
    ("bm25_topdocs", "postings filtered at the explode; df count window; TakeOrdered global top-k"),
    ("zorder_cell_stats", "Morton key as one codegen span; scan → project → single rollup exchange"),
    ("skyline_pareto_parts", "distinct-price contraction + frontier window + broadcast membership join"),
    ("weighted_sample_es", "md5-uniform priority in-scan; WindowGroupLimit top-5 per source"),
    ("j8_nearest_grid", "grid-cell hash join (3x3 neighborhood); only the 9-row offsets nested-loop"),
    ("j9_interval_overlap", "bucket-blocked interval overlap: equi join, first-bucket dedup, no BNLJ"),
    ("countmin_heavy_hitters", "mergeable d*w integer sketch: tiny partial-agg exchange, broadcast lookups"),
    ("ivm_incremental_rollup", "three partial rollups folded by keyed merges — no base-data re-read"),
    ("bigram_logprob_quality", "bigrams from one narrow array zip; model counts as grouped counts"),
    ("variant_shred_extract", "parse_json + variant_get fused in the scan projection; one rollup exchange"),
    ("source_quota_apportion", "integer Hamilton quotas; remainder rank on the broadcast-sized source frontier"),
    ("multi_touch_attribution", "desc purchase-count seq turns next-purchase lookup into an equi-join; two keyed exchanges"),
    ("j11_bloom_semi_join", "literal bloom filter BELOW the semi join — map-side prune before the shuffle"),
    ("fuzzy_join_edit1", "FastSS deletion-variant index: hash join on variants, verify on candidates — no cross join"),
    ("events_ohlc_bars", "all four OHLC prices from ONE min_by/max_by hash aggregate — no window, one exchange"),
    ("weighted_median_price", "cumulative-weight window over the value-distinct pre-aggregate, not the raw fact"),
    ("dedup_incremental_batch", "batch probes the corpus fingerprint index on one hash join — corpus never rescanned"),
    ("compaction_bins", "bucketed exclusive prefix scan (r7): (source,bucket) window; parallel across AND within sources"),
    ("entity_canonicalize", "fuzzy pairs → min-label components → canonical map, string node ids on the doc-id plan"),
    ("events_anomaly_episodes", "pushed threshold filter; bucketed lag + episode cumsum share ONE sketch pass (r7) — no whole-type sort"),
    ("skew_key_census", "partial-aggregated key counts → bit-length buckets (≤64 rows) → share window"),
    ("customer_rfm_segments", "fact collapses to customers first; ntile windows on the dimension-scale aggregate"),
    ("w11_distribution_ranks", "oracle gate pins exact window; distribution_ranks DEFAULT is sketch-CDF map-only assignment (r7)"),
    ("w13_trailing_range_frame", "bucket+overlap carry-in range frame (r7): (type,bucket) window, carries complete cross-edge frames"),
    ("w16_trailing_range_point_mass", "coarse-domain range frame (r8): duplicate sketch edges, position-mapped carries, (type,bucket) window"),
    ("media_mixed_pixel_stats", "magic-byte mixed-corpus router (r8): four decoders + NULL drop in ONE Arrow pass, map-only, zero exchanges"),
    ("running_records_census", "bucketed exclusive running max (r7): bucket partials + broadcast offsets, no whole-type task"),
    ("max_concurrency_sweep", "sweep-line cumsum bucket-partitioned (r7); WindowGroupLimit top-1 pick"),
    ("multimodal_video_rgb_frames", "BI_RGB DIB demux + padded-row unpack (r7): map-only, zero exchanges"),
    ("multimodal_gif_pixels", "full GIF89a LZW inflate + de-interlace + palette map (r7): map-only, zero exchanges"),
    ("multimodal_bmp_pixels", "BMP file-header offset walk into the shared DIB unpack (r7): map-only, zero exchanges"),
    ("multimodal_gif_anim_frames", "animated GIF: every descriptor through LZW+LCT+de-interlace (r7): map-only, zero exchanges"),
    ("multimodal_audio_float_stats", "IEEE-float WAV decode, double-schema stats (r7): map-only, zero exchanges"),
    ("survival_km_curve", "KM estimator: per-duration census, reverse-cumsum risk set, log-sum windows on census rows only"),
    ("stats_ks_two_sample", "integer sup-norm: grouped value census, bounded cumulative window, 1-row broadcast totals"),
    ("w14_max_drawdown", "three stacked running windows + rollup share ONE hash(user) exchange and sort"),
    ("events_debounce", "lag-gap burst counter + first-of-burst rollup on ONE (user,type) exchange"),
    ("cdc_apply_changelog", "I/U/D fold: rank + count windows share hash(key); WindowGroupLimit prunes rank>1"),
    ("bom_subtree_rollup", "recursion-free hierarchy rollup: array_distinct ancestor explode + one hash aggregate"),
    ("trending_decay_counts", "exact (type, age-day) census first; FP decay touches census rows only"),
    ("session_path_trigrams", "session windows + lag chain on one hash(user) exchange; |types|^3-bounded rank window"),
    ("a16_regression_residual_topk", "closed-form residual moments (no 2nd fact pass); broadcast model; exact-key WindowGroupLimit"),
    ("w15_rolling_corr", "six integer moment windows share one frame over the hourly census"),
    ("dbscan_station_clusters", "grid-blocked pairs, subcell clique contraction, two-phase components on the cell graph"),
    ("snm_candidate_pairs", "two sorted-vocab lead windows emit w·|vocab| candidates; levenshtein verify on candidates only"),
    ("gini_nation_revenue", "per-nation rank window on the customer-scale rollup; exact integer sums to one edge division"),
    ("clamped_running_balance", "prefix-min identity: two stacked windows + rollup on ONE hash(user) exchange — no per-key recursion"),
    ("cusum_changepoint", "integer n-scaled CUSUM; WindowGroupLimit prunes the argmax to a streaming top-1 per series"),
    ("ts_autocorrelation", "bucket census first; gap-correct lag pairing as equi join; 4-row lag dim broadcast"),
    ("m4_downsample", "first/last from ONE window sort (rn + partition count); min/max ride the same rollup"),
    ("scd2_daily_snapshot", "SCD2→snapshot via ceil-day sequence-explode — linear in output, no interval theta join"),
    ("target_encode_loo", "closed-form LOO encoding: two-scalar category dim broadcast back onto the fact"),
    ("abc_classification", "cumulative DECIMAL window on the part aggregate; integer cross-multiplied class boundaries"),
    ("graph_weighted_paths", "bounded Bellman-Ford: |nodes| DP state per round, join+min-agg, checkpoint-truncated"),
    ("trajectory_path_length", "integer-meter great-circle hops: lag + rollup share one user exchange, trig in codegen"),
    ("gdpr_erasure_cascade", "erasure cohort cascaded by broadcast semi joins — every fact scanned once, zero fact shuffles"),
    ("max_concurrency_sweep", "sweep line: union of ±1 boundary points, ONE running-sum window, WindowGroupLimit top-1"),
    ("fifo_allocation", "FIFO as cumulative-quantity interval join: two flow windows + one keyed overlap join, no ledger walk"),
    ("diversified_topk", "quota window caps nations BEFORE the regional rank — second sort touches only survivors"),
    ("sessionize_incremental", "state + delta phases, each one hash(user) exchange; full outer merge of dimension-sized relations"),
    ("chi2_independence", "fact → census exchange; margins broadcast back; exact integer cell contributions"),
    ("activity_streaks", "islands via day−rank key: distinct-collapse + window + two rollups on one user exchange"),
    ("token_bucket_throttle", "the sanctioned sequential tier: ONE exchange + JVM sort into one Arrow MapInArrow fold, O(1) state per key run (r12)"),
    ("wavelet_energy_levels", "three chained signed-sum aggregates over geometrically shrinking bucket relations"),
    ("ann_topk_opq", "OPQ (r9): HD rotation + gain-shape PQ fused into the scan; broadcast bucket join, one top-k exchange"),
    ("multimodal_tiff_packbits", "PackBits TIFF (r9): per-strip RLE inflate in the same Arrow pass as the IFD walk — map-only"),
    ("sql_window_tvf_tumble_hop", "pure-SQL tumble+hop (r9): window() grouping = map-side expand + hash agg, no grid join"),
    ("sql_session_window_tvf", "pure-SQL session_window + HAVING (r9): gap-merge in ONE aggregate on one user exchange"),
    ("heavy_hitters_mg", "exact heavy hitters (r9): checkpointed MG candidate summary, broadcast LeftSemi + partial-agg verify — raw key domain never shuffles"),
    ("variant_shred_pruned_read", "variant shredding (r10): shred-stat file pruning + all-shredded projection — raw JSON column absent from ReadSchema, residual filter pushed on the typed column"),
    ("quantile_sketch_merge_batch", "mergeable quantile summary (r10): map-side partial sketches (MapInPandas below the exchange), ONE hash(key) exchange carrying summary rows, FlatMapGroupsInPandas merge"),
]


def main() -> None:
    spark = get_spark(app_name="plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of representative catalog queries\n",
        f"Auto-generated by `tools/dump_plans.py` at `{SF_DIR}`.",
        "Simple-mode `.explain()` under AQE (isFinalPlan=false: AQE",
        "re-optimizes stages from runtime stats at execution).\n",
    ]
    for name, why in SHOWCASE:
        df = catalog.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        out.append(f"## {name}\n\n*{why}*\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
