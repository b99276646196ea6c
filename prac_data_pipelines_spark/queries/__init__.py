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
    # Round-7 rotation (VERDICT-r6 item #1: drain the r3-era backlog and
    # do NOT let new ops displace it).  Head-50 layout, enforced by
    # tests/test_freshness.py + tools/freshness.py:
    #   1. the 28 r3-era stale verdicts (must-run: >3 rounds old at r7),
    #   2. new/modified r7 ops (never-verified => must-run),
    #   3. r4-era fill to exactly 50 (registration order).
    # The remaining r4-era re-verdicts are staged after the boundary and
    # lead the r8 rotation.
    #
    # r3-era stale (28):
    "cxc_cartera", "cxc_resumen_concepto", "cxc_cancelados",
    "cxc_ajustes", "cxc_auditoria_nulos", "cxc_kpis",
    "cxc_limite_credito", "cxc_morosidad_cliente", "cxc_saldo_cliente",
    "cxc_movimientos_abiertos", "doc_exact_dedup", "doc_token_stats",
    "doc_bpe_tokens", "doc_quality", "doc_lang_id", "knn_brute",
    "fuzzy_name_blocks", "band_groups", "scalar_suite",
    "cancelled_filter", "union_views", "column_profile",
    "distinct_counts", "doc_simhash", "embedding_norms",
    "doc_fingerprint", "doc_sample", "fuzzy_block_stats",
    # New in r7 (below the stale re-verdicts, per VERDICT-r6):
    # (inserted as they land; each displaces one r4-era fill row)
    "doc_dup_spans", "multimodal_phash_pairs", "multimodal_phash_recall",
    "multimodal_phash_clusters", "multimodal_phash_keep_best",
    "doc_minhash_containment", "doc_dedup_weights",
    "events_quantile_sketch", "doc_normalized_dedup",
    # r4-era fill to 50:
    "events_rolling", "events_transitions", "pricing_summary",
    "parts_never_ordered", "rich_inactive_customers",
    "min_cost_supplier", "order_vs_customer_avg", "doc_curation",
    "doc_minhash_pairs", "doc_ngram_jaccard", "doc_quality_quantiles",
    "doc_dup_clusters", "doc_dedup_keep_best",
    # --- 50-row budget boundary ---
    # r4-era remainder (leads the r8 rotation; kmeans_embeddings no
    # longer needs a priority slot — the r6 +43% bench question was
    # cleared by the committed quiet detail, not a verdict):
    "doc_simhash_pairs",
    "doc_chunks", "knn_lsh", "kmeans_embeddings", "knn_ivf",
    "emb_semantic_dedup",
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
