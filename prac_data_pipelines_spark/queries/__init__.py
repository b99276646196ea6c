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
    # Round-6 rotation (completes the freshness plan from
    # docs/ROUND5_NOTES.md: after this head runs, every registered
    # query's driver verdict is <= 2 rounds old). Head = 21 new + 4
    # modified this round + 21 of the 26 r3-era stale + 4 of the 6 that
    # slipped past r5's 50-row budget — exactly 50. (shard_manifest, also
    # r6-modified, sits first past the boundary: the new shard_verify
    # in-head pins the same writer contract more strictly.)
    #
    # New in r6:
    "shard_verify", "emb_quantize", "doc_dup_ngrams", "source_cross_dup",
    "doc_token_budget", "doc_dsir_weights", "doc_substring_dedup",
    "ann_recall_audit", "doc_winnowing", "doc_minhash_est_error",
    "doc_gopher_quality", "bpe_encode_curve", "ivf_recall_audit",
    "emb_anisotropy_audit", "doc_ccnet_buckets", "bpe_train_steps",
    "events_heavy_hitters", "emb_pq_audit", "emb_drift_audit",
    "doc_bloom_decontaminate", "bpe_fertility", "doc_length_buckets",
    "events_uniques_sketch", "emb_dedup_curve", "corpus_snapshot_diff",
    "doc_signal_corr", "doc_mixture_sample",
    # Session-5 additions (newest first-class ops):
    "doc_c4_filters", "doc_readability", "doc_hash_classifier",
    "emb_decontaminate", "corpus_compaction_audit", "doc_bm25_topk",
    "events_watermark_audit",
    # Session-6 additions:
    "doc_ngram_novelty", "ann_hard_negatives", "events_bot_detection",
    "training_mix_epochs", "doc_langmix_detect", "vocab_growth_curve",
    "events_cohort_value", "simhash_recall_audit",
    # Modified in r6 (grouped-positions pack fold, pinned Pareto tail,
    # rank-space sketch check, byte-true shard manifest):
    "doc_pack_fold", "pareto_abc", "cxc_concentracion", "sketch_profile",
    # Last driver verdict r3 (26):
    "cxc_master_summary", "cxc_saldo_factura", "cxc_antiguedad",
    "cxc_antiguedad_cliente",
    # Slipped past r5's 50-row budget (r3-era verdicts):
    # --- 50-row budget boundary ---
    # (cxc_cartera ... cxc_morosidad_cliente displaced past the
    # boundary by the session-6 additions (doc_ngram_novelty ...
    # simhash_recall_audit); cxc_saldo_cliente ... doc_lang_id by the
    # session-5 additions (doc_c4_filters ... events_watermark_audit);
    # together with knn_brute ... distinct_counts — displaced by the
    # session-4 batch — they lead the r7 rotation)
    "cxc_cartera", "cxc_resumen_concepto", "cxc_cancelados",
    "cxc_ajustes", "cxc_auditoria_nulos", "cxc_kpis",
    "cxc_limite_credito", "cxc_morosidad_cliente",
    "cxc_saldo_cliente", "cxc_movimientos_abiertos", "doc_exact_dedup",
    "doc_token_stats", "doc_bpe_tokens", "doc_quality", "doc_lang_id",
    "knn_brute", "fuzzy_name_blocks", "band_groups", "scalar_suite",
    "cancelled_filter", "union_views", "column_profile",
    "distinct_counts",
    # (r4-era re-verdicts lead the r7 rotation; shard_manifest and
    # events_rolling were r6-modified and head that list;
    # doc_simhash, embedding_norms, doc_fingerprint, fuzzy_block_stats
    # and doc_sample are the r3-era verdicts displaced by the
    # late-batch ops)
    "doc_simhash", "embedding_norms", "doc_fingerprint", "doc_sample",
    "fuzzy_block_stats", "shard_manifest", "events_rolling",
    "events_transitions", "pricing_summary", "parts_never_ordered", "rich_inactive_customers",
    "min_cost_supplier", "order_vs_customer_avg", "doc_curation",
    "doc_minhash_pairs", "doc_ngram_jaccard",
    # r5-verdict queries (freshest; next rotation re-verdicts the r4-era
    # remainder first):
    "doc_lm_quality", "bpe_merge_pairs", "emb_label_centroids",
    "doc_lang_confusion", "events_dau_wau", "emb_near_dup",
    "multimodal_features", "multimodal_resize", "multimodal_frames",
    "doc_decontaminate", "doc_pii_scrub", "doc_pack_sequences",
    "tfidf_top_terms", "doc_repetition", "doc_stratified_sample",
    "priority_late_lines", "customer_order_distribution",
    "large_quantity_orders", "volume_shipping", "market_share",
    "waiting_suppliers", "important_stock", "top_supplier", "sql_text",
    "distinct_values", "quantiles", "window_suite", "rollup_summary",
    "set_ops", "asof_latest_order", "distribution_windows",
    "cube_summary", "master_denorm", "order_balance", "order_last_ship",
    "open_order_lines", "flag_full_outer", "customer_first_order",
    "aging_buckets", "aging_pivot", "customer_metrics", "running_balance",
    "zscore_outliers", "dual_sort", "top_customers",
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
