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
    "knn_ivf", "events_hourly", "events_sessionize", "events_json",
    "multimodal_features", "sql_text", "distinct_values", "quantiles",
    "window_suite", "rollup_summary", "set_ops", "asof_latest_order",
    "order_vs_customer_avg", "distribution_windows",
    "priority_late_lines", "customer_order_distribution",
    "large_quantity_orders", "parts_never_ordered", "rich_inactive_customers",
    # re-implemented in round 2 — needs a fresh driver verdict:
    "doc_ngram_jaccard", "doc_dup_clusters", "doc_minhash_pairs",
    "doc_curation", "fuzzy_name_blocks", "dual_sort", "zscore_outliers",
    # new in round 2:
    "cxc_antiguedad_cliente", "volume_shipping", "market_share",
    "waiting_suppliers", "kmeans_embeddings", "knn_lsh",
    "doc_simhash_pairs", "emb_near_dup", "knn_ivf",
    "multimodal_resize", "multimodal_frames", "events_funnel",
    "events_segment_value", "doc_decontaminate", "doc_pii_scrub",
    "doc_pack_sequences", "tfidf_top_terms", "min_cost_supplier",
    "important_stock", "top_supplier", "doc_repetition",
    "events_rolling", "cube_summary", "events_retention",
    "doc_stratified_sample",
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
