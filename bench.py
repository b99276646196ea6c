"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collection cost distorting the numbers).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prac_data_pipelines_spark.queries import all_queries  # noqa: E402
from prac_data_pipelines_spark.session import get_spark  # noqa: E402

# Headline set: the heavy/representative queries (join assembly, wide agg,
# windows, sessionization, balances). Cheap point-lookups are excluded so the
# benchmark tracks real operator cost.
HEADLINE = [
    "pricing_summary",
    "master_denorm",
    "order_balance",
    "order_last_ship",
    "customer_metrics",
    "running_balance",
    "aging_pivot",
    "pareto_abc",
    "dual_sort",
    "events_sessionize",
    "events_hourly",
    "scalar_suite",
    "cxc_saldo_factura",
    "cxc_kpis",
    "cxc_concentracion",
    "doc_minhash_pairs",
    "doc_simhash",
    "doc_curation",
    "knn_brute",
    "multimodal_features",
    "customer_order_distribution",
    "large_quantity_orders",
    "asof_latest_order",
    "volume_shipping",
    "market_share",
    "waiting_suppliers",
    "knn_lsh",
    "doc_dup_clusters",
    "cxc_antiguedad_cliente",
    "doc_decontaminate",
    "doc_repetition",
    "tfidf_top_terms",
    "doc_pack_sequences",
    "events_funnel",
    "events_retention",
    "cube_summary",
    # Heavy families (round 4): iterative k-means, IVF probe, all-pairs
    # hamming/near-dup buckets, multimodal Pandas-UDF stages, and the
    # sharded time-range window — their cost must be visible round-over-
    # round, not just the cheap relational core.
    "kmeans_embeddings",
    "knn_ivf",
    "doc_simhash_pairs",
    "emb_near_dup",
    "multimodal_resize",
    "multimodal_frames",
    # events_rolling_sharded intentionally absent: at sf0.1 the routed
    # events_rolling below takes the identical sharded plan, so benching
    # both double-counted ~5 s of the headline (VERDICT r5).  The
    # definition (single-key) path stays covered by the oracle gate at
    # sf0.01 and by tests/test_physical_plans.py.
    # Round-4 operators:
    "doc_dedup_keep_best",
    "vocab_top_terms",
    "source_mix",
    "events_anomaly",
    "doc_quality_quantiles",
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    # Round-4 second batch: the remaining decision-support shapes and the
    # semantic/passage dedup members of the dedup family.
    "product_profit",
    "small_qty_revenue",
    "dominant_part_suppliers",
    "emb_semantic_dedup",
    "doc_passage_dedup",
    "events_gapfill",
    "events_asof_attribution",
    "sketch_profile",
    "doc_train_split",
    # Round-4 third batch: the temporal-join family (bucketed range join
    # and its range-frame window twin).
    "events_conversion_pairs",
    "events_conversion_window",
    "doc_chunks",
    "events_hopping",
    "events_transitions",
    "events_ohlc",
    # Round-5: the training-shard manifest (portable-hash assignment +
    # N-row rollup over the documents table) and the volume-routed
    # rolling window now exercising the sharded path at sf0.1.
    "shard_manifest",
    "events_rolling",
    # Round-6: the writer round-trip (write shards + loader-side verify),
    # the int8 quantization audit, and the duplicated-n-gram audit.
    "shard_verify",
    "emb_quantize",
    "doc_dup_ngrams",
    "source_cross_dup",
    "doc_token_budget",
    "doc_lm_quality",
    "doc_pack_fold",
    "bpe_merge_pairs",
    "emb_label_centroids",
    "doc_lang_confusion",
    "events_dau_wau",
    # Round-6 (late batch): DSIR importance weights, exact-substring
    # dedup coverage, and the LSH recall audit vs brute-force.
    "doc_dsir_weights",
    "doc_substring_dedup",
    "ann_recall_audit",
    "doc_winnowing",
    "doc_minhash_est_error",
    "doc_gopher_quality",
    "bpe_encode_curve",
    "ivf_recall_audit",
    "emb_anisotropy_audit",
    "doc_ccnet_buckets",
    "bpe_train_steps",
    "events_heavy_hitters",
    "emb_pq_audit",
    "emb_drift_audit",
    # Round-6 (this session): the broadcast-Bloom decontamination audit
    # and the per-language tokenizer fertility gate.
    "doc_bloom_decontaminate",
    "bpe_fertility",
    "doc_length_buckets",
    "events_uniques_sketch",
    "emb_dedup_curve",
    "corpus_snapshot_diff",
    "doc_signal_corr",
    "doc_mixture_sample",
    # Round-6 (session 5): the C4 rule battery, readability scoring, the
    # hashed-bigram classifier gate, semantic decontamination, the
    # compaction planner, BM25 retrieval, and the watermark-lateness
    # audit (the global prefix-max operator's first consumer).
    "doc_c4_filters",
    "doc_readability",
    "doc_hash_classifier",
    "emb_decontaminate",
    "corpus_compaction_audit",
    "doc_bm25_topk",
    "events_watermark_audit",
    # Round-6 (session 6): first-occurrence novelty attribution, label-
    # filtered hard-negative mining, rate-based bot filtering, the data-
    # recipe epochs table, and chunk-level code-switching detection.
    "doc_ngram_novelty",
    "ann_hard_negatives",
    "events_bot_detection",
    "training_mix_epochs",
    "doc_langmix_detect",
    "vocab_growth_curve",
    "events_cohort_value",
    "simhash_recall_audit",
    # Round-7: span-granularity exact-substring dedup, perceptual-hash
    # image dedup + its recall audit, streaming curation-gate twin.
    "doc_dup_spans",
    "multimodal_phash_pairs",
    "multimodal_phash_recall",
    "multimodal_phash_clusters",
    "multimodal_phash_keep_best",
    "doc_minhash_containment",
    "doc_dedup_weights",
    "events_quantile_sketch",
    "doc_normalized_dedup",
    # Round-8: actionable span-dedup rewrite (Lee et al. keep-first),
    # cross-modal eval-set decontamination.
    "doc_strip_dup_spans",
    "multimodal_decontaminate",
    "events_quantile_daily",
    "multimodal_phash_weights",
    # Round-8 (session 2): the Q16 catalog rollup (count-distinct
    # suppliers at part-attribute grain over the pair-grain distinct),
    # the per-dimension embedding health audit, the nearer-other-centroid
    # mislabel queue, and the LSH hot-bucket/pair-cost audit.
    "part_supplier_counts",
    "emb_dim_stats",
    "emb_label_outliers",
    "lsh_bucket_skew",
    # Round-8 (session 2, continued): the inter-arrival traffic-shape
    # histogram and frame-level video dedup (hashed Arrow fan-out).
    "events_interarrival",
    "multimodal_frame_dedup",
    # Round-8 (session 2, final batch): the mutual-kNN graph and the
    # curation retention funnel.
    "knn_mutual_pairs",
    "corpus_dedup_funnel",
    "doc_clf_calibration",
    "doc_eval_contamination",
]


# Host-speed calibration anchor (VERDICT-r9 item #3).  A fixed,
# data-independent JVM-side workload timed once per bench pass; its
# min-of-N seconds land in the artifacts so a round-over-round wall swing
# on byte-identical code is attributable by ONE division (r9 burned four
# quiet windows proving a 20% regression was CPU steal).  The workload is
# pinned: spark.range over 32 partitions -> xxhash64 mix -> modular
# bucket -> groupBy agg, i.e. codegen + partial agg + one tiny exchange,
# the same machinery the headline queries spend their time in.  DO NOT
# change N / partition count / expressions without re-pinning
# CALIBRATION_REF_SEC — comparability across rounds is the entire point.
CALIBRATION_N = 1_200_000_000
# Reference host speed, pinned at the commit that introduced the anchor
# (r10 open, 2026-08-16: min 2.195 over 6 warm runs; spread 2.20-2.49).
# NOTE the r10-open host ran ~1.33x slower than the r8 quiet window
# (judge-measured, VERDICT-r9), so "1.0x normalized" means r10-open
# speed, not r8 speed.  normalized = raw * (ref/cal).
CALIBRATION_REF_SEC = 2.20


def run_calibration(spark) -> float:
    t0 = time.time()
    (
        spark.range(0, CALIBRATION_N, 1, 32)
        .selectExpr(
            "pmod(xxhash64(id, id * 2654435761), 1024) AS b",
            # modular-reduce before summing: ANSI mode (session default)
            # raises on long overflow, and 1.2e9 full-range hashes overflow
            "pmod(xxhash64(id, 1099511628211), 1000003) AS h",
        )
        .groupBy("b")
        .agg({"h": "sum"})
        .write.format("noop").mode("overwrite").save()
    )
    return time.time() - t0


def run_queries(spark, queries, names, sf_dir: str, reps: int,
                pass_hook=None) -> tuple[dict[str, float], dict[str, str]]:
    """Time each query min-of-``reps`` with per-query fault isolation: one
    broken query is ONE ``errors`` entry, never an aborted run (round 3
    lost its whole bench to a single analysis error).

    Reps are INTERLEAVED (full passes over the query list, ``reps``
    times) rather than back-to-back: the host's sporadic multi-second
    stalls span several consecutive seconds, so three consecutive reps
    of a short query can ALL land inside one stall and min-of-N keeps
    the inflated number. With passes minutes apart, a stall can poison
    at most one rep of any query (r9: two quiet windows showed an
    across-the-board ~1.17x on untouched sub-second queries — exactly
    this failure mode).

    ``pass_hook`` (if given) runs at the start of every pass — the
    calibration anchor uses it so the host-speed sample shares the
    passes' stall-isolation.

    The DataFrame cache is CLEARED before every timed run (r10): the
    engine's ``.cache()`` sites key on canonicalized plans, so without
    the clear, rep 2+ of a cache-building query (and any LATER query
    sharing a cached frame, e.g. the minhash-signature family) reuses
    rep 1's blocks and min-of-N reports the incremental re-run cost,
    not the query's cost (measured: doc_minhash_pairs 1.25 s cache-warm
    vs 2.02 s cache-cold). Intra-query cache reuse — a frame built and
    consumed within ONE timed run — is untouched; that is the plan
    being measured."""
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(reps):
        if pass_hook is not None:
            pass_hook()
        for name in names:
            if name in errors:
                continue
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - record and keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                continue
            dt = time.time() - t0
            if dt < timings.get(name, float("inf")):
                timings[name] = dt
    return ({n: round(t, 3) for n, t in timings.items()
             if n not in errors}, errors)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the JVM + parquet footers once (excluded from timings).
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # The host shows sporadic multi-second stalls unrelated to the workload;
    # min-of-N isolates actual engine cost from environment noise.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    calibrations: list[float] = []

    def _calibrate() -> None:
        # a broken anchor must cost the calibration fields, never the
        # bench (same fault-isolation rule as per-query errors)
        try:
            calibrations.append(run_calibration(spark))
        except Exception:  # noqa: BLE001
            pass

    timings, errors = run_queries(spark, queries, names, sf_dir, reps,
                                  pass_hook=_calibrate)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cal = round(min(calibrations), 3) if calibrations else None
    # The calibration workload has a FIXED 32-partition layout, so the
    # anchor separates host speed from workload cost only at the default
    # 32 cores; at other core counts the "normalized" number would
    # conflate host speed with core count (VERDICT-r10: the c8 probe's
    # 54.9 s "normalized" value was meaningless).  Emit it only at 32.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    normalizable = cpus in ("32", "*")
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": dict(timings, **{n: {"err": e} for n, e in errors.items()}),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Host-speed anchor: seconds for the pinned data-independent
        # workload (min over passes), its quiet-host reference, and the
        # host-normalized total.  Compare value_normalized across rounds;
        # raw `value` swings with CPU steal (see VERDICT-r9).
        "calibration_sec": cal,
        "calibration_ref_sec": CALIBRATION_REF_SEC,
        "value_normalized": (
            round(total * CALIBRATION_REF_SEC / cal, 3)
            if cal and normalizable else None),
    }
    if errors:
        out["errors"] = len(errors)

    # Per-query timings always land in a sibling artifact; the driver only
    # captures the last ~2000 chars of stdout, and at 70+ queries the full
    # line exceeds that (BENCH_r05.json recorded parsed: null).  The FINAL
    # stdout line must stay parseable at the driver, so when the full line
    # would blow the tail budget we degrade it to a compact headline that
    # references the detail artifact instead of embedding it.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
        # Also write a round-stamped copy so driver runs stop overwriting
        # each other and round-over-round per-query deltas stay separable
        # from quiet-host builder numbers (VERDICT-r6 item #4).  The round
        # is the driver's: BENCH_r{N}.json lands after this bench runs, so
        # the current run belongs to max(existing)+1.
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is None:
            here = os.path.dirname(os.path.abspath(__file__))
            prior = [
                int(m.group(1))
                for f in os.listdir(here)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            rnd = str(max(prior) + 1 if prior else 1)
        stem, ext = os.path.splitext(detail_path)
        # Non-default core counts get their own suffix so a low-core
        # probe can never collide with (or be mistaken for) the round's
        # main 32-core artifact — the r10 c8 probe inferred round
        # max+1=11 because BENCH_r10.json already existed and landed as
        # a mis-stamped "BENCH_DETAIL_r11.json" (VERDICT-r10 item #7).
        core_tag = "" if normalizable else f"_c{cpus}"
        versioned = f"{stem}_r{int(rnd):02d}{core_tag}{ext}"
        with open(versioned, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError:
        detail_path = None  # read-only cwd: the stdout line is the record
    line = json.dumps(out)
    if len(line) > 1800:
        compact = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": "sec",
            "sf": out["sf"],
            "n_queries": len(timings),
            "calibration_sec": out["calibration_sec"],
            "value_normalized": out["value_normalized"],
            "detail": detail_path,
        }
        if errors:
            compact["errors"] = len(errors)
        # Only the compact line goes to stdout: a truncated full line in
        # the driver's captured tail could still defeat a whole-tail JSON
        # parse.  Humans read the detail artifact.
        line = json.dumps(compact)
    print(line)
    # The JSON line above is the record either way; fail the process only
    # when the bench is broadly broken, not for an isolated regression.
    if len(errors) > max(2, len(names) // 4):
        sys.exit(1)


if __name__ == "__main__":
    main()
