"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB SQL oracle (``None`` for genuinely non-SQL-expressible ops,
which the driver checks rows-only). Column names/aliases are identical on both
sides; computed doubles are rounded at the same sites so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# The driver's correctness gate checks queries in dict order and stops after a
# fixed budget (50 rows emitted in round 1).  Surface the families that have
# not yet received a driver-green row first so every operator accumulates a
# driver verdict across rounds; the remainder keeps registration order.
_PRIORITY: tuple[str, ...] = (
    # Round-8 rotation (VERDICT-r7 item #1).  Head-50 layout, enforced by
    # tests/test_freshness.py + tools/freshness.py:
    #   1. the 36 r4-era must-runs (verdict >3 rounds old at r8),
    #   2. new/modified r8 ops (never-verified => must-run),
    #   3. r5-era fill to exactly 50 (verdict-age order).
    # New r8 ops may only displace fill rows, never the must-run block
    # (VERDICT-r7 item #3 caps new ops at 14 = 50 - 36).
    #
    # r4-era must-run (36):
    "doc_simhash_pairs", "doc_chunks", "knn_lsh", "kmeans_embeddings",
    "knn_ivf", "emb_semantic_dedup",
    "events_hourly", "events_sessionize", "events_json", "events_funnel",
    "events_segment_value", "events_rolling_sharded",
    "events_anomaly", "events_retention", "events_gapfill",
    "events_asof_attribution", "events_conversion_pairs",
    "events_conversion_window", "events_hopping", "events_ohlc",
    "sql_lateral_topk", "grouping_sets_summary", "shipping_priority",
    "local_supplier_volume", "returned_items", "promo_revenue_share",
    "discounted_bulk_revenue", "revenue_change", "product_profit",
    "line_priority_mix", "small_qty_revenue", "dominant_part_suppliers",
    "vocab_top_terms", "source_mix", "doc_passage_dedup",
    "doc_train_split",
    # New in r8 (below the must-run block, per VERDICT-r7 item #3;
    # each displaces one r5-era fill row):
    "doc_strip_dup_spans", "multimodal_decontaminate",
    "events_quantile_daily", "multimodal_phash_weights",
    "part_supplier_counts", "emb_dim_stats", "emb_label_outliers",
    "lsh_bucket_skew", "events_interarrival", "multimodal_frame_dedup",
    "knn_mutual_pairs", "corpus_dedup_funnel", "doc_clf_calibration",
    "doc_eval_contamination",
    # (the 14-op budget is now exactly spent: head-50 = 36 must-run +
    # 14 new, zero r5-era fill rows left)
    # --- 50-row budget boundary ---
    # r5-era remainder (stages the r9 rotation, verdict-age order;
    # head-fill rows displaced by r8 ops rejoin here first):
    "master_denorm",
    "order_balance", "order_last_ship", "open_order_lines",
    "flag_full_outer", "customer_first_order",
    "aging_buckets", "aging_pivot", "customer_metrics",
    "running_balance",
    "zscore_outliers", "dual_sort", "top_customers", "doc_lang_confusion",
    "emb_near_dup", "emb_label_centroids", "events_dau_wau",
    "multimodal_features", "multimodal_resize", "multimodal_frames",
    "sql_text", "distinct_values", "quantiles", "window_suite",
    "rollup_summary", "set_ops", "asof_latest_order",
    "distribution_windows", "cube_summary", "priority_late_lines",
    "customer_order_distribution", "large_quantity_orders",
    "volume_shipping", "market_share", "waiting_suppliers",
    "important_stock", "top_supplier", "doc_decontaminate",
    "doc_pii_scrub", "doc_pack_sequences", "tfidf_top_terms",
    "doc_repetition", "doc_stratified_sample", "shard_manifest",
    "doc_lm_quality", "bpe_merge_pairs",
)


def _ordered(mapping: dict[str, object]) -> list[str]:
    head = [n for n in _PRIORITY if n in mapping]
    return head + [n for n in mapping if n not in _PRIORITY]


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: _QUERIES[n] for n in _ordered(_QUERIES)}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: _ORACLES[n] for n in _ordered(_ORACLES)}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401  (self-registering)
        core, cxc, text, vector, events, media, sqltext, extras, tpch,
        corpus,
    )
    _LOADED = True
