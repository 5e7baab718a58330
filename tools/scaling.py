#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 fixtures K× into /tmp (deterministic
key-offset copies, written as parquet so scans are included), time the
headline query shapes at each K, and print a sec-per-K table.

Purpose: local evidence for the 100 TB posture — a shape whose runtime
grows ~linearly in K here is shuffle/agg-bound with bounded group state,
exactly the profile that scales out by adding executors; superlinear
growth would flag a plan that re-couples partitions (global sorts,
driver collects, quadratic joins).

Usage: python tools/scaling.py [K ...]   (default: 1 3 10)
Writes scaled tables under /tmp/spark_scaling_probe/ and prints one
markdown table to stdout.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splio_etl_aggregations_spark.functions.helpers import net_price, r4  # noqa: E402
from splio_etl_aggregations_spark.session import get_spark  # noqa: E402
from splio_etl_aggregations_spark.sources.loader import load  # noqa: E402

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_scaling_probe"


def scaled_tables(spark, k: int):
    """K deterministic copies of the variable-size sf0.1 tables, keys
    offset per copy so cardinalities scale with K; dims stay fixed."""
    t = load(spark, BASE)
    if k == 1:
        return t
    out = dict(t)
    path = os.path.join(ROOT, f"k{k}")
    specs = {
        # table -> (key columns to offset, optional ts column to shift)
        "lineitem": (["l_orderkey"], None),
        "orders": (["o_orderkey"], None),
        "events": (["event_id"], "ts"),
        "documents": (["doc_id"], None),
        "embeddings": (["vec_id"], None),
    }
    for name, (keys, ts_col) in specs.items():
        dest = os.path.join(path, name)
        if not os.path.exists(dest):
            df = t[name]
            offsets = [int(1e12) * i for i in range(k)]
            copies = []
            for i, off in enumerate(offsets):
                c = df
                for key in keys:
                    c = c.withColumn(key, F.col(key) + F.lit(off))
                if ts_col and i:
                    # shift each copy by i×30 days → window/group counts
                    # scale with K instead of piling into the same hours
                    c = c.withColumn(
                        ts_col, F.col(ts_col) + F.expr(f"INTERVAL {30 * i} DAYS")
                    )
                copies.append(c)
            full = copies[0]
            for c in copies[1:]:
                full = full.unionByName(c)
            full.write.mode("overwrite").parquet(dest)
        out[name] = spark.read.parquet(dest)
    return out


def shapes(spark, t, k: int = 1):
    from splio_etl_aggregations_spark.registry import get

    return {
        # the distributed block-pair cosine kernel (pair count grows K²;
        # the local top-k cut keeps emitted rows constant) — measured
        # through the registered operator so the probe covers the real
        # plan, driver-collect-free since round 2
        "sim_cosine_topk": lambda: get("sim_cosine_topk").builder(spark, t),
        "agg_pricing_summary": lambda: t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum(net_price())).alias("sum_net"),
            F.count(F.lit(1)).alias("n"),
        ),
        "join_orders_lineitem_agg": lambda: t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(r4(F.sum(net_price())).alias("rev"), F.count(F.lit(1)).alias("n")),
        "win_running_total": lambda: t["events"].select(
            "event_id",
            F.sum("value")
            .over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("rt"),
        ),
        "hourly_buckets": lambda: t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("s")),
        "token_counts": lambda: t["documents"]
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n")),
        "topk_spenders": lambda: t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .orderBy(F.desc("s"), F.asc("o_custkey"))
        .limit(10),
        # r2 operators, probed through their registered plans. Copies are
        # 30-day-shifted, so interval overlaps and view→purchase pairs
        # never cross copies (output scales with K, not K²); scd2 keeps
        # customer keys fixed, so per-key change logs grow K× long —
        # a deliberate partitioned-window depth stress.
        "interval_overlap": lambda: get("join_interval_overlap").builder(spark, t),
        "scd2_history": lambda: get("etl_scd2_history").builder(spark, t),
        "stream_stream_join": lambda: get("stream_stream_join").builder(spark, t),
        # r2 second wave: the codegen n-gram rebuild (per-doc work is
        # constant, docs grow K× → expect linear), the broadcast-model
        # LM scorer, and the per-user double-percentile anomaly pass
        # (user count fixed, per-user event history grows K× — a
        # deliberate partitioned-aggregation depth stress)
        "rep_ngram_filter": lambda: get("text_rep_ngram_filter").builder(spark, t),
        "lm_quality": lambda: get("corpus_lm_quality").builder(spark, t),
        "anomaly_mad": lambda: get("ts_anomaly_mad").builder(spark, t),
        # the 4-stage composite (gate → dedup → rebalance → shard) and
        # the hash-order token-budget cut — both should inherit their
        # stages' sub-linear profiles
        "pipeline_training_set": lambda: get("pipeline_training_set").builder(spark, t),
        "subsample_tokens": lambda: get("corpus_subsample_tokens").builder(spark, t),
        # r2 third wave: merge-stream bidirectional as-of (one user
        # sort, should be linear), broadcast-fit target encoding (one
        # pass), HLL set algebra (distinct shuffles then constant-size
        # sketch math), pagerank (graph is |brands|-bounded — expect
        # growth only from the fact-reduction scan), PSI drift (one
        # pruned-column pass into a 10-bucket agg)
        "asof_nearest": lambda: get("join_asof_nearest").builder(spark, t),
        "target_encoding": lambda: get("ml_target_encoding").builder(spark, t),
        "hll_set_algebra": lambda: get("agg_hll_set_algebra").builder(spark, t),
        "pagerank": lambda: get("graph_pagerank").builder(spark, t),
        "psi_drift": lambda: get("dq_psi_drift").builder(spark, t),
        # r2 fourth wave: the double-RANGE-window attribution (per-user
        # depth stress like asof), the two-phase-cumsum AUC, the KS
        # drift CDF pass, and the attribution→segment composite
        "attr_linear": lambda: get("attribution_linear_multi_touch").builder(
            spark, t
        ),
        "auc_eval": lambda: get("ml_auc_eval").builder(spark, t),
        "ks_drift": lambda: get("dq_ks_drift").builder(spark, t),
        "marketing_mix": lambda: get("pipeline_marketing_mix").builder(spark, t),
        # r2 fifth wave: the 7-table Q8 snowflake (fact chain grows K×,
        # dims fixed — expect join-bound linear like Q5), the Q21 dual
        # semi+anti lineitem self-join (both sides grow K×, keyed on the
        # order key so the self-join stays per-order bounded), the
        # bigram-novelty inverted index (vocabulary-bounded exchanges),
        # and the co-purchase degree histogram (per-order bounded pairs)
        "market_share": lambda: get("sql_market_share").builder(spark, t),
        "kept_waiting": lambda: get("sql_suppliers_kept_waiting").builder(spark, t),
        "ngram_novelty": lambda: get("corpus_ngram_novelty").builder(spark, t),
        "degree_dist": lambda: get("graph_degree_distribution").builder(spark, t),
        # r3 wave: the remaining heaviest r2 shapes whose scale claims
        # were argued from plan shape only (VERDICT r2 task 6). Spearman:
        # the price rank map is value-cardinality-sized and ships through
        # a shuffle join + two-phase cumsum (expect ~linear in distinct
        # values). Item-item CF / basket affinity: pair space bounded by
        # |brands|² with candidate join on the order key (expect linear
        # in facts, constant pair space).
        "spearman_corr": lambda: get("agg_spearman_corr").builder(spark, t),
        "item_item_cf": lambda: get("rec_item_item_cf").builder(spark, t),
        "basket_affinity": lambda: get("basket_brand_affinity").builder(spark, t),
        # r4 wave. substring_spans: the gram stream grows K× and — since
        # copies repeat the same text — every gram goes cross-doc
        # duplicated, so the dup-side join carries maximal traffic (a
        # deliberate worst case). deletion_vectors / row_lineage: table
        # WRITES grow K× (v0 build + DV / two full rewrites) — these
        # probe the commit path, not just the read. bfs: the graph stays
        # |brands|-bounded, growth comes only from the fact-reduction
        # scan. pii_scrub: one linear regex pass, the null hypothesis.
        "substring_spans": lambda: get("dedup_substring_spans").builder(spark, t),
        "pii_scrub": lambda: get("corpus_pii_scrub").builder(spark, t),
        "bfs_shortest_path": lambda: get("graph_bfs_shortest_path").builder(spark, t),
        "deletion_vectors": lambda: get("lake_deletion_vectors").builder(spark, t),
        "row_lineage": lambda: get("lake_row_lineage").builder(spark, t),
        # r4 second wave. pattern_match: per-user sequence strings grow
        # K× long (collect+sort depth stress, like scd2). heavy_hitters:
        # sketch state is 256 counters/window whatever K does to users —
        # growth comes only from the scan and window count. binary_ann:
        # word packing is linear, the popcount compare is 2 ALU ops per
        # vector. importance_resampling: one map-side filter + fold.
        "pattern_match": lambda: get("path_regex_match").builder(spark, t),
        "heavy_hitters": lambda: get("stream_heavy_hitters").builder(spark, t),
        "binary_ann": lambda: get("vec_binary_quantize_hamming").builder(spark, t),
        "importance_resampling": lambda: get("corpus_importance_resampling").builder(spark, t),
        # r5 wave. span_removal: the ×8 position fan-out applies only to
        # duplicated-gram occurrences — on the replicated probe corpus
        # that's EVERY occurrence (worst case, like substring_spans).
        # leakage_check: distinct train-gram probe set is
        # gram-vocabulary-sized; test-side stream grows K×. pq_encode:
        # |vectors|·M·16 distance partials, map-side-combined; codebook
        # broadcast fixed. mmr: distributed shortlist scan grows K×, the
        # greedy phase is constant (20 vectors, 5 picks). readability /
        # code_detect: single-pass scan-bound regex counters, the null
        # hypothesis.
        "span_removal": lambda: get("corpus_span_removal").builder(spark, t),
        "leakage_check": lambda: get("ml_train_test_leakage_check").builder(spark, t),
        "pq_encode": lambda: get("vec_pq_encode").builder(spark, t),
        "mmr_diversify": lambda: get("sim_mmr_diversify").builder(spark, t),
        "readability": lambda: get("text_readability_score").builder(spark, t),
        "code_detect": lambda: get("text_code_detect").builder(spark, t),
        # r6 wave: the real compressed codecs. K multiplies the FILE
        # COUNT (the fixture tables don't feed these), asset corpora
        # regenerated per K via the un-memoized writers; the decode
        # stage is per-file-independent mapInPandas, so wall should be
        # ~linear in K until the 32 cores saturate, then flat per-file.
        "decode_png": lambda: _png_probe(spark, k),
        "decode_gif": lambda: _gif_probe(spark, k),
        # r6 second wave. range_search: fixed 9-probe query matrix,
        # one B×9 matmul per Arrow batch, no shuffle — expect
        # scan-linear. kcore_peel: edge build is the dominant self-join
        # (order-bounded blow-up), then three shrinking checkpointed
        # rounds — expect ~linear in edges. audio_frames: K multiplies
        # the FILE COUNT like the codec probes (fan-out per file is
        # audio-length-bounded). csv_multiline: multiLine parse is
        # one-task-per-file — growth tracks file count × file size.
        "range_search": lambda: get("sim_range_search").builder(spark, t),
        "kcore_peel": lambda: get("graph_kcore_peel").builder(spark, t),
        "audio_frames": lambda: _wav_frames_probe(spark, k),
        "csv_multiline": lambda: get("scan_csv_multiline_quoted").builder(
            spark, t
        ),
        # r6 third wave. hist_quantile: (shard, group, bin)-keyed count,
        # the hourly_buckets profile with a 64-value key — expect
        # linear. ivm_join_delta: 3 delta joins at 1/3 scale each —
        # expect the orders⋈lineitem linear shape. knn_label_eval: the
        # range-search kernel + a 9-partition bounded window. band_sweep:
        # signature pass linear; candidate volume grows with the square
        # of bucket occupancy on the replicated corpus (dup docs share
        # buckets) — the probe shows the verify bill growing, which is
        # the phenomenon the op exists to price.
        "hist_quantile": lambda: get("agg_histogram_quantile_merge").builder(
            spark, t
        ),
        "ivm_join_delta": lambda: get("etl_ivm_join_delta").builder(spark, t),
        "knn_label_eval": lambda: get("ml_knn_label_eval").builder(spark, t),
        "band_sweep": lambda: get("dedup_lsh_band_sweep").builder(spark, t),
        # r7 wave. jpeg/jpeg420: K multiplies the FILE COUNT like the
        # other codec probes (per-file decode cost is corpus-constant).
        # cdc_chunking: per-doc explode is length-bounded, docs grow K×
        # — expect linear. cuped: events grow K× over a FIXED user set
        # (copies shift ts, not user_id) — the per-user pre-aggregation
        # is the only data-proportional stage. label_prop: edge-BUILD
        # input grows K× while the distinct co-purchase graph is
        # K-invariant (copies reuse part keys) — probes the build, like
        # kcore. pca_gram: the (vec, 64²) moment fan-out grows K×; the
        # driver-side 64×64 iteration is K-invariant by design. holt:
        # monthly fold grows K×, recursion depth fixed. avro_rt:
        # container write+read both K×. late_dim: fact scans K×, dim
        # fixed — anti/equi joins broadcast.
        "jpeg_decode": lambda: _jpg_probe(spark, k),
        "jpeg420_decode": lambda: _jpg420_probe(spark, k),
        "cdc_chunking": lambda: get("corpus_cdc_chunk_dedup").builder(spark, t),
        "cuped": lambda: get("agg_cuped_adjusted").builder(spark, t),
        "label_prop": lambda: get("graph_label_propagation").builder(spark, t),
        "pca_gram": lambda: get("ml_pca_power_iteration").builder(spark, t),
        "holt": lambda: get("ts_holt_linear_forecast").builder(spark, t),
        "avro_rt": lambda: get("scan_avro_roundtrip").builder(spark, t),
        "late_dim": lambda: get("etl_late_arriving_dimension").builder(spark, t),
        # r7 second/third wave. bloom: build-side distinct + 3 semi
        # joins against a <=64Ki-row bit set — probe side K×, filter
        # constant. data_vault: hash-key loads are per-row md5 over K×
        # facts, one dedup per artifact. stream_hll: register table is
        # windowed MAX — K× events fold into the same <=256-row state
        # per window. rules: ONE compiled projection over K× facts.
        # url_canon: regex chain in the scan projection + one keyed agg.
        "bloom_audit": lambda: get("agg_bloom_filter_membership").builder(spark, t),
        "data_vault": lambda: get("etl_data_vault_load").builder(spark, t),
        "stream_hll": lambda: get("stream_hll_distinct").builder(spark, t),
        "rules_engine": lambda: get("dq_rules_engine").builder(spark, t),
        "url_canon": lambda: get("dedup_url_canonical").builder(spark, t),
        # r8 (VERDICT r7 #7): the production near-dup rung itself —
        # signature build is linear in gram mass, band buckets keep
        # candidate pairs collision-local, verify is per-candidate
        "near_minhash": lambda: get("dedup_near_minhash").builder(spark, t),
        # r8 additions. chi2/naive_bayes/contamination ride the token
        # stream (linear); gbm/perm_importance/lcurve are scan-rate CASE
        # ladders + conditional folds; range_bucketed is a 60-row
        # broadcast + day-bucket hash join; bitemporal is two per-user
        # windows; seq_patterns one lead window into a 25-row rule
        # table; markov_removal's matrix/walk stages are state-bounded
        # (only the journey scan scales); record_linkage pair fan-out is
        # block-local; mh_error's slot join is 64 int rows/candidate.
        "chi2_select": lambda: get("ml_chi2_feature_selection").builder(spark, t),
        "naive_bayes": lambda: get("ml_naive_bayes_classifier").builder(spark, t),
        "gbm_infer": lambda: get("ml_gbm_stump_inference").builder(spark, t),
        "lcurve": lambda: get("ml_learning_curve_subsets").builder(spark, t),
        "perm_importance": lambda: get("ml_permutation_importance").builder(spark, t),
        "contamination": lambda: get("corpus_contamination_ngram").builder(spark, t),
        "mh_error": lambda: get("dedup_minhash_error_curve").builder(spark, t),
        "range_bucketed": lambda: get("join_range_bucketed").builder(spark, t),
        "bitemporal": lambda: get("etl_bitemporal_snapshot").builder(spark, t),
        "seq_patterns": lambda: get("agg_sequential_patterns").builder(spark, t),
        "markov_removal": lambda: get("attribution_markov_removal").builder(spark, t),
        "record_linkage": lambda: get("dq_record_linkage_fs").builder(spark, t),
    }


def _wav_frames_probe(spark, k: int):
    from splio_etl_aggregations_spark.operators.multimodal import (
        _wav_frames_frame,
        _write_wavs_impl,
    )

    return _wav_frames_frame(spark, _write_wavs_impl(16 * k))


def _png_probe(spark, k: int):
    from splio_etl_aggregations_spark.operators.multimodal import (
        _png_features_frame,
        _write_pngs_impl,
    )

    return _png_features_frame(spark, _write_pngs_impl(20 * k))


def _jpg_probe(spark, k: int):
    from splio_etl_aggregations_spark.operators.multimodal import (
        _jpg_features_frame,
        _write_jpgs_impl,
    )

    return _jpg_features_frame(spark, _write_jpgs_impl(16 * k))


def _jpg420_probe(spark, k: int):
    from splio_etl_aggregations_spark.operators.multimodal import (
        _jpg420_features_frame,
        _write_jpg420s_impl,
    )

    return _jpg420_features_frame(spark, _write_jpg420s_impl(12 * k))


def _gif_probe(spark, k: int):
    from splio_etl_aggregations_spark.operators.multimodal import (
        _gif_features_frame,
        _write_gifs_impl,
    )

    return _gif_features_frame(spark, _write_gifs_impl(12 * k))


EAGER_BUILD_SHAPES = {
    "kcore_peel", "csv_multiline", "band_sweep",
    # r7: label_prop checkpoints per round; pca_gram collects the 64×64
    # matrix during build; avro_rt materializes the container write
    "label_prop", "pca_gram", "avro_rt",
    # r8: mh_error checkpoints the signature table during build;
    # markov_removal checkpoints the transition matrix + pconv
    "mh_error", "markov_removal",
}


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    # SCALING_ONLY=a,b,c probes a named subset (per-wave re-measures
    # without re-running the whole battery)
    only = {s for s in os.environ.get("SCALING_ONLY", "").split(",") if s}
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {}
    rows: dict[str, dict[int, int]] = {}
    for k in ks:
        t = scaled_tables(spark, k)
        for name, build in shapes(spark, t, k).items():
            if only and name not in only:
                continue
            best = None
            for _ in range(2):  # warm: second run (plan + JIT amortized)
                # Shapes whose BUILDER executes eager jobs (localCheckpoint
                # rounds, sink writes) do their real work before the hash
                # action — start the clock before build() for those, or the
                # probe times only the final cheap scan (caught on
                # kcore_peel: 0.12 s "timed" vs ~6 s of checkpointed peel
                # work done during build).
                if name in EAGER_BUILD_SHAPES:
                    t0 = time.perf_counter()
                    df = build()
                else:
                    df = build()
                    t0 = time.perf_counter()
                # hash-sum over every output column: unlike count(), this
                # action prevents Catalyst from pruning the computed
                # columns (a count() of a windowed projection silently
                # drops the window — measured)
                row = df.select(
                    F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
                    F.count(F.lit(1)).alias("n"),
                ).collect()[0]
                n = row["n"]
                best = time.perf_counter() - t0
            results.setdefault(name, {})[k] = best
            rows.setdefault(name, {})[k] = n
            print(f"[probe] K={k} {name}: {best:.2f}s rows={n}", file=sys.stderr)
    hdr = " | ".join(f"K={k}" for k in ks)
    print(f"| shape | {hdr} | growth {ks[0]}→{ks[-1]} |")
    print("|---" * (len(ks) + 2) + "|")
    for name, per_k in results.items():
        cells = " | ".join(f"{per_k[k]:.2f}s" for k in ks)
        growth = per_k[ks[-1]] / per_k[ks[0]]
        print(f"| {name} | {cells} | {growth:.1f}× |")


if __name__ == "__main__":
    main()
