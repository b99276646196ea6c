"""Physical-plan regressions: the scale-critical plan properties must not
silently degrade — filters/projections reaching the scan, dimensions
broadcast, whole-stage codegen covering the hot path."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown(spark, sf_dir):
    from prac_data_pipelines_spark.queries.core import q_pricing_summary

    df = q_pricing_summary(spark, sf_dir)
    explained = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in explained
    # projection pruned to the 7 needed columns
    assert "l_orderkey" not in explained.split("ReadSchema")[1].split("\n")[0]


def test_order_balance_broadcasts_orders_side(spark, sf_dir):
    from prac_data_pipelines_spark.queries.core import q_order_balance

    plan = _plan(q_order_balance(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_master_denorm_broadcasts_all_dims(spark, sf_dir):
    from prac_data_pipelines_spark.queries.core import q_master_denorm

    plan = _plan(q_master_denorm(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5


def test_scalar_suite_single_codegen_stage(spark, sf_dir):
    from prac_data_pipelines_spark.queries.core import q_scalar_suite

    df = q_scalar_suite(spark, sf_dir)
    codegen = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in codegen


def test_dual_sort_has_no_single_partition_exchange(spark, sf_dir):
    """dual_sort assigns global positions over a raw table that grows with
    the data — the whole plan must stay parallel (range partition + local
    rank + broadcast offsets), never an unpartitioned window's
    Exchange SinglePartition funnel."""
    from prac_data_pipelines_spark.queries.core import q_dual_sort

    plan = _plan(q_dual_sort(spark, sf_dir))
    assert "SinglePartition" not in plan


def test_pareto_abc_has_no_single_partition_exchange(spark, sf_dir):
    """pareto_abc's cumulative share runs over one row per customer —
    unbounded at scale — so the cumsum must be two-level (range partition
    + local window + triangular broadcast offsets), never a global
    window's Exchange SinglePartition funnel."""
    from prac_data_pipelines_spark.queries.core import q_pareto_abc

    plan = _plan(q_pareto_abc(spark, sf_dir))
    assert "SinglePartition" not in plan


def test_zscore_attaches_stats_by_broadcast(spark, sf_dir):
    """zscore_columns must broadcast the one-row aggregate, not funnel the
    frame through an unpartitioned window."""
    from prac_data_pipelines_spark.queries.core import q_zscore_outliers

    plan = _plan(q_zscore_outliers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_trade_flow_chains_broadcast_dims(spark, sf_dir):
    """Q7/Q8 shapes: every dimension (nation x2, region, part filter) must
    broadcast; only the fact-side joins may shuffle."""
    from prac_data_pipelines_spark.queries.tpch import (
        q_market_share,
        q_volume_shipping,
    )

    assert _plan(q_volume_shipping(spark, sf_dir)).count("BroadcastHashJoin") >= 2
    assert _plan(q_market_share(spark, sf_dir)).count("BroadcastHashJoin") >= 3


def test_no_python_udfs_in_relational_queries(spark, sf_dir):
    """UDF policy: no Python evaluation nodes anywhere in the relational,
    text, or vector query surface (multimodal mapInPandas is the one
    sanctioned exception)."""
    from prac_data_pipelines_spark.queries import all_queries

    for name, fn in all_queries().items():
        if name.startswith("multimodal_"):
            continue
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark n-gram set must broadcast — the corpus side must not
    shuffle for the contamination semi-join."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_decontaminate

    plan = _plan(q_doc_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_scalar_threshold_queries_broadcast_the_scalar(spark, sf_dir):
    """Q11/Q15 shapes: the global scalar attaches via a broadcast one-row
    aggregate, never an unpartitioned window funnel."""
    from prac_data_pipelines_spark.queries.tpch import (
        q_important_stock,
        q_top_supplier,
    )

    for q in (q_important_stock, q_top_supplier):
        plan = _plan(q(spark, sf_dir))
        # the threshold filter plans as BNLJ; the equality form collapses
        # to a broadcast hash join — either way the scalar broadcasts
        assert ("BroadcastNestedLoopJoin" in plan
                or "BroadcastHashJoin" in plan)
        assert "Window" not in plan


def test_knn_lsh_buckets_join_broadcast(spark, sf_dir):
    """The query batch (bucket keys and embeddings) broadcasts; the corpus
    bucket frame and corpus embeddings never shuffle for the joins."""
    from prac_data_pipelines_spark.queries.vector import q_knn_lsh

    plan = _plan(q_knn_lsh(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_events_retention_two_keyed_shuffles(spark, sf_dir):
    """The retention matrix must keep its round-4 plan: ONE keyed shuffle
    on user_id (collect_set partial-aggregated map-side), one rollup
    shuffle, plus the output sort — the old distinct→agg→self-join chain
    cost 4 keyed shuffles and a join for the same result."""
    import re

    from prac_data_pipelines_spark.queries.events import q_events_retention

    plan = _plan(q_events_retention(spark, sf_dir))
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash <= 2, plan
    assert "Join" not in plan
    # partial collect_set before the exchange = map-side dedup of weeks
    assert "partial_collect_set" in plan or "ObjectHashAggregate" in plan


def test_vocab_top_terms_distributed_topk(spark, sf_dir):
    """The top-V selection must plan as TakeOrdered (per-partition heads,
    driver merge) with the one-row corpus total broadcast back; the only
    windows allowed are over the V returned rows, AFTER the limit — never
    an unpartitioned window/sort over the full vocabulary."""
    from prac_data_pipelines_spark.queries.corpus import q_vocab_top_terms

    plan = _plan(q_vocab_top_terms(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert ("BroadcastNestedLoopJoin" in plan
            or "BroadcastHashJoin" in plan)
    # the window must consume the limited frame, not the raw counts:
    # below the Window node there must be no Aggregate (the wordcount),
    # only the take-ordered result
    win_at = plan.find("Window [")
    assert win_at != -1
    assert "TakeOrderedAndProject" in plan[win_at:]


def test_events_rolling_sharded_window_keys_include_time_bucket(spark, sf_dir):
    """The deployment-shape rolling window must partition its Window by
    (event_type, time bucket) — never by the low-cardinality type alone —
    so parallelism grows with time at fixed type count."""
    from prac_data_pipelines_spark.queries.events import q_events_rolling_sharded

    plan = _plan(q_events_rolling_sharded(spark, sf_dir))
    window_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert window_lines, plan
    assert all("_bucket" in ln for ln in window_lines), window_lines


def test_events_rolling_routes_to_sharded_at_volume(spark):
    """The REGISTERED rolling query must protect itself at scale: above
    the row threshold it routes through sharded_range_window, so at sf0.1
    volume its window keys include the time bucket; at tiny sf it keeps
    the single-key definition plan."""
    import os

    from prac_data_pipelines_spark.queries.events import (
        ROLLING_SHARD_ROWS,
        q_events_rolling,
    )

    big_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(big_dir):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    plan = _plan(q_events_rolling(spark, big_dir))
    window_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert window_lines, plan
    assert all("_bucket" in ln for ln in window_lines), window_lines

    small = _plan(q_events_rolling(spark, "/root/testdata/sf0.001"))
    small_windows = [ln for ln in small.split("\n") if "Window [" in ln]
    assert small_windows and all(
        "_bucket" not in ln for ln in small_windows), small_windows
    # sanity: the threshold actually separates the two scales
    assert ROLLING_SHARD_ROWS > 0


def test_revenue_change_all_predicates_pushed(spark, sf_dir):
    """Q6 form is the pure scan-side aggregate: every predicate must reach
    the parquet scan and the plan must have no join and no shuffle other
    than the final single-row aggregation exchange."""
    from prac_data_pipelines_spark.queries.tpch import q_revenue_change

    df = q_revenue_change(spark, sf_dir)
    explained = df._jdf.queryExecution().toString()
    pushed = explained.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed \
        and "l_quantity" in pushed
    plan = _plan(df)
    assert "Join" not in plan


def test_product_profit_one_fact_shuffle_join(spark, sf_dir):
    """Q9 form: part/supplier/nation broadcast; lineitem ⋈ orders is the
    only non-broadcast join."""
    from prac_data_pipelines_spark.queries.tpch import q_product_profit

    plan = _plan(q_product_profit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_small_qty_revenue_scans_lineitem_once(spark, sf_dir):
    """Q17 form: the correlated per-part average is a window over the
    brand subset — lineitem must appear ONCE in the plan (never the
    scan-twice/self-join shape)."""
    from prac_data_pipelines_spark.queries.tpch import q_small_qty_revenue

    plan = _plan(q_small_qty_revenue(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1


def test_gapfill_grid_is_broadcast_sized(spark, sf_dir):
    """The hour grid builds from a broadcast one-row bounds aggregate and
    a broadcast distinct-type set — the events fact must never be on the
    build side of a nested loop."""
    from prac_data_pipelines_spark.queries.events import q_events_gapfill

    plan = _plan(q_events_gapfill(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan


def test_doc_repetition_no_gram_shuffle(spark, sf_dir):
    """The metrics-driven rewrite: repetition folds per-row, so the plan
    must contain no explode/Generate and only the per-source rollup
    exchange pair (partial + final)."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_repetition

    plan = _plan(q_doc_repetition(spark, sf_dir))
    assert "Generate" not in plan  # no explode
    assert plan.count("Exchange") <= 2


def test_conversion_pairs_is_bucketed_equi_join(spark, sf_dir):
    """The range join must plan as a shuffled EQUI-join on (user, time
    bucket) — never a nested-loop/cartesian pair filter, and never a
    per-key join whose tasks do quadratic hot-key work without the
    time-bucket in the shuffle key."""
    from prac_data_pipelines_spark.queries.events import q_events_conversion_pairs

    plan = _plan(q_events_conversion_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    join_line = next(l for l in plan.splitlines()
                     if "Join" in l and "user_id" in l)
    assert "_bkt" in join_line


def test_conversion_window_single_keyed_shuffle(spark, sf_dir):
    """The aggregate twin is ONE per-user range-frame window: exactly one
    keyed exchange over the type-filtered projection, no join."""
    from prac_data_pipelines_spark.queries.events import q_events_conversion_window

    plan = _plan(q_events_conversion_window(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_doc_lm_quality_vocab_broadcast_no_cartesian(spark, sf_dir):
    """The LM scorer's vocabulary scalar must attach by broadcast (1-row
    agg), never a CartesianProduct, and the count joins must stay keyed
    (no unpartitioned window anywhere in the plan)."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_lm_quality

    plan = _plan(q_doc_lm_quality(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    window_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert not window_lines, window_lines


def test_doc_pack_fold_windows_partition_by_source(spark, sf_dir):
    """Fold packing's ranking windows must partition by source — the
    pairing is per-source, so no global-order funnel exists."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_pack_fold

    plan = _plan(q_doc_pack_fold(spark, sf_dir))
    window_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert window_lines
    assert all("source" in ln for ln in window_lines), window_lines


def test_doc_pack_fold_has_no_per_source_window(spark, sf_dir):
    """doc_pack_fold's ranking must not bound parallelism at |sources|:
    every Window in the plan partitions by (range-partition id, source) —
    never by source alone — and nothing funnels through SinglePartition
    (grouped_positions two-level rank, VERDICT r5 weak item)."""
    import re

    from prac_data_pipelines_spark.queries.corpus import q_doc_pack_fold

    plan = _plan(q_doc_pack_fold(spark, sf_dir))
    assert "SinglePartition" not in plan
    for spec in re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)",
                           plan):
        # partition spec = everything before the first sort-order arg
        assert "_pid" in spec, spec


def test_emb_quantize_broadcasts_params_only(spark, sf_dir):
    """emb_quantize's per-dim parameter table must reach the corpus as a
    ONE-row broadcast (the kmeans fold idiom) — never a corpus-sized
    join or a window; the only shuffles are the |dims|-row partial
    aggregate and the per-label rollup."""
    from prac_data_pipelines_spark.queries.vector import q_emb_quantize

    plan = _plan(q_emb_quantize(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan   # 1-row params x corpus
    assert "Window" not in plan
    assert "SinglePartition" not in plan or plan.count("SinglePartition") <= 1


def test_doc_dup_ngrams_windows_on_hashed_grams(spark, sf_dir):
    """doc_dup_ngrams must shuffle HASHED grams (bigints), never the
    n-gram strings, and attach the gram frequency via ONE
    gram-partitioned window (gram cardinality scales with the corpus, so
    parallelism is unbounded) — not a groupBy + self-join that scans and
    re-hashes the exploded gram set twice."""
    from prac_data_pipelines_spark.queries.text import q_doc_dup_ngrams

    df = q_doc_dup_ngrams(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    # exactly one window, partitioned by the hashed gram column g
    assert plan.count("Window [") == 1
    import re

    spec = re.search(r"Window \[count\(1\) windowspecdefinition\((\w+)#",
                     plan)
    assert spec and spec.group(1) == "g", plan[:2000]
    assert dict(df.select("ngramas").dtypes)["ngramas"] == "bigint"


def test_doc_token_budget_has_no_per_source_window(spark, sf_dir):
    """doc_token_budget's quality ranking + running token sum must use
    the grouped two-level machinery: every Window partitions by
    (range-partition id, source), never source alone, and nothing
    funnels through SinglePartition."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_token_budget

    plan = _plan(q_doc_token_budget(spark, sf_dir))
    assert "SinglePartition" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_doc_dsir_weights_one_broadcast_no_window(spark, sf_dir):
    """doc_dsir_weights' two bucket-count maps must reach the corpus as a
    ONE-row broadcast (the kmeans/quantize fold idiom); the per-document
    ratio fold is embarrassingly parallel, so the plan has NO window and
    the only SinglePartition is the DSIR_B-bounded map_from_entries
    aggregate (<= 1024 rows by construction, corpus-size independent)."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_dsir_weights

    plan = _plan(q_doc_dsir_weights(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats x corpus
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("SinglePartition") <= 1


def test_doc_substring_dedup_windows_on_doc_id(spark, sf_dir):
    """doc_substring_dedup's interval-union lag window must partition by
    doc_id (cardinality = corpus size, never a funnel), and the repeated
    -window flagging must join on the hashed window key — no all-pairs
    comparison, no single-partition stage anywhere."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_substring_dedup

    plan = _plan(q_doc_substring_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Window [") == 1
    spec = re.search(r"windowspecdefinition\((\w+)#", plan)
    assert spec and spec.group(1) == "doc_id", plan[:2000]


def test_doc_dup_spans_windows_on_doc_id(spark, sf_dir):
    """doc_dup_spans chains flagged windows with doc_id-partitioned lag /
    running-sum / row_number passes — every windowspec must partition by
    doc_id (corpus-cardinality key), and the duplicate flagging must stay
    a hashed-key join: no all-pairs, no single-partition stage."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_dup_spans

    plan = _plan(q_doc_dup_spans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "doc_id" for s in specs), plan[:2000]


def test_doc_minhash_containment_banded_join(spark, sf_dir):
    """Containment verification must run only on banded LSH candidates —
    the join keys on the band string, never all-pairs, no single-
    partition stage."""
    from prac_data_pipelines_spark.queries.text import (
        q_doc_minhash_containment,
    )

    plan = _plan(q_doc_minhash_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert "banda" in plan


def test_multimodal_phash_pairs_banded_join(spark, sf_dir):
    """Perceptual-hash dedup must stay a banded LSH self-join — the
    candidate join keys on the short band string, never all-pairs."""
    from prac_data_pipelines_spark.queries.media import q_multimodal_phash_pairs

    plan = _plan(q_multimodal_phash_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "banda" in plan


def test_multimodal_phash_recall_broadcasts_audit_slice(spark, sf_dir):
    """The exact-Hamming ground truth is a broadcast cross of the FIXED
    audit slice (bounded |A|^2) — a BroadcastNestedLoopJoin, never a
    CartesianProduct over the corpus."""
    from prac_data_pipelines_spark.queries.media import q_multimodal_phash_recall

    plan = _plan(q_multimodal_phash_recall(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_recall_audit_broadcasts_queries(spark, sf_dir):
    """ann_recall_audit's exact baseline must broadcast the (small) query
    batch against the corpus — exactly one corpus-wide nested-loop pass —
    and every ranking window must partition by qid (|Q| partitions of
    top-k work, never a global sort)."""
    import re

    from prac_data_pipelines_spark.queries.vector import q_ann_recall_audit

    plan = _plan(q_ann_recall_audit(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    for spec in re.findall(r"windowspecdefinition\((\w+)#", plan):
        assert spec == "qid", spec


def test_doc_winnowing_no_single_partition_no_cartesian(spark, sf_dir):
    """Winnowing selection is a per-row array op; the only shuffles are
    the fingerprint-hash groupBy and the hash-keyed join back — never a
    global window, never an all-pairs join."""
    from prac_data_pipelines_spark.queries.text import q_doc_winnowing

    plan = _plan(q_doc_winnowing(spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_doc_minhash_est_error_banded_not_all_pairs(spark, sf_dir):
    """The audit must score only the banded LSH candidates — the corpus
    is never cross-joined, and the band-guard window partitions by the
    banda key, not a global sort."""
    from prac_data_pipelines_spark.queries.text import q_doc_minhash_est_error

    plan = _plan(q_doc_minhash_est_error(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_doc_gopher_quality_no_window_no_join(spark, sf_dir):
    """Every Gopher rule is a per-row fold: the whole audit is one scan
    into a map-side-combined per-source aggregate — no window, no join,
    no shuffle beyond the groupBy/sort."""
    from prac_data_pipelines_spark.queries.text import q_doc_gopher_quality

    plan = _plan(q_doc_gopher_quality(spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_bpe_encode_curve_broadcasts_merge_list(spark, sf_dir):
    """The ranked merge list must reach the vocab as a ONE-row broadcast
    (the kmeans/DSIR fold idiom); the only SinglePartition aggregate is
    the BPE_PAIRS-bounded collect (<= 20 rows by construction)."""
    from prac_data_pipelines_spark.queries.corpus import q_bpe_encode_curve

    plan = _plan(q_bpe_encode_curve(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_emb_anisotropy_covariance_is_map_side_combined(spark, sf_dir):
    """The covariance groupBy(idx) must partial-aggregate before its
    exchange (shuffle carries partitions x D^2 rows, corpus-size-free),
    and the iteration math runs on 1-row frames — no corpus self-join,
    no global window."""
    from prac_data_pipelines_spark.queries.vector import (
        q_emb_anisotropy_audit,
    )

    plan = _plan(q_emb_anisotropy_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # map-side combine on the idx agg
    assert "Window" not in plan


def test_doc_ccnet_buckets_no_per_source_window(spark, sf_dir):
    """The per-source ranking must run on grouped_positions (windows
    keyed by (_pid, source)), never a Window.partitionBy(source) whose
    parallelism caps at |sources|."""
    import re

    from prac_data_pipelines_spark.queries.corpus import q_doc_ccnet_buckets

    plan = _plan(q_doc_ccnet_buckets(spark, sf_dir))
    # (the vocab countDistinct scalar legitimately reduces through a
    # bounded SinglePartition exchange — windows are what must scale)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_bloom_decontaminate_is_map_only_on_the_probe_side(spark, sf_dir):
    """Every Bloom membership test is an int-keyed broadcast HASH join
    against the set-bit frame (the O(1)-per-probe bitmap equivalent),
    and the exact twin a broadcast semi-join — the probe side must not
    shuffle text; the only gram shuffles are the (source, gram)
    distinct and the doc_id rollup."""
    from prac_data_pipelines_spark.queries.corpus import (
        BLOOM_K,
        q_doc_bloom_decontaminate,
    )

    plan = _plan(q_doc_bloom_decontaminate(spark, sf_dir))
    # K position joins + the bench-gram join, each broadcast (twice:
    # the gram frame feeds both the doc rollup and the gram distinct)
    assert plan.count("BroadcastHashJoin") >= BLOOM_K + 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bpe_fertility_broadcasts_merge_list(spark, sf_dir):
    """Same contract as bpe_encode_curve: the globally-trained merge
    list is ONE broadcast row; the per-language vocab never shuffles
    for the encode fold."""
    from prac_data_pipelines_spark.queries.corpus import q_bpe_fertility

    plan = _plan(q_bpe_fertility(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_doc_length_buckets_has_no_per_source_window(spark, sf_dir):
    """Both batching rankings must ride grouped_positions: every Window
    partitions by (range-partition id, source) — parallelism is never
    capped at |sources| — and nothing funnels through SinglePartition."""
    import re

    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_length_buckets,
    )

    plan = _plan(q_doc_length_buckets(spark, sf_dir))
    assert "SinglePartition" not in plan
    specs = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for spec in specs:
        assert "_pid" in spec, spec


def test_doc_c4_filters_is_map_side_fold(spark, sf_dir):
    """The C4 rule battery is closed-form integer arithmetic per
    document: the plan must be scan -> fold -> per-source aggregate —
    no window, no join, no SinglePartition funnel anywhere."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_c4_filters

    plan = _plan(q_doc_c4_filters(spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_doc_readability_is_map_side_fold(spark, sf_dir):
    """Readability sums are per-row integer folds + one per-source
    rollup — same no-window/no-join/no-funnel contract as the C4
    battery."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_readability

    plan = _plan(q_doc_readability(spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_doc_hash_classifier_has_no_weight_join(spark, sf_dir):
    """The hashed-bigram gate's weight 'lookup' is arithmetic over the
    gram hash — the plan must contain NO join at all (no weight table,
    no explode-regroup), no window, and no SinglePartition."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_hash_classifier,
    )

    plan = _plan(q_doc_hash_classifier(spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_corpus_compaction_audit_grouped_window(spark, sf_dir):
    """The per-source running byte total must ride grouped_positions:
    every window partitions by (range-partition id, source) — one
    dominant source never collapses to a single task — and nothing
    funnels through SinglePartition."""
    import re

    from prac_data_pipelines_spark.queries.corpus import (
        q_corpus_compaction_audit,
    )

    plan = _plan(q_corpus_compaction_audit(spark, sf_dir))
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for spec in specs:
        assert "_pid" in spec, spec


def test_doc_bm25_topk_broadcasts_probe_and_takeordered(spark, sf_dir):
    """BM25's query-term probe must be a broadcast hash join against the
    term-keyed tf table, the global top-k must be a TakeOrdered (never a
    full sort), and the only SinglePartition is the 1-row corpus-stats
    aggregate."""
    from prac_data_pipelines_spark.queries.corpus import q_doc_bm25_topk

    plan = _plan(q_doc_bm25_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SinglePartition") <= 1


def test_events_watermark_audit_two_level_prefix_max(spark, sf_dir):
    """The arrival-order running max must be the two-level prefix max:
    every window partitions by the range-partition id (never a global
    unpartitioned window), the prefix combine is a broadcast join, and
    the only SinglePartition is the bounded total-count aggregate."""
    import re

    from prac_data_pipelines_spark.queries.events import (
        q_events_watermark_audit,
    )

    plan = _plan(q_events_watermark_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("SinglePartition") <= 1
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    # every COLUMN-partitioned window rides the range-partition id; the
    # one unpartitioned window is the total over the <=5-row bucket
    # rollup (its spec starts with the frame, not a column reference).
    col_specs = [s for s in specs if not s.startswith("specifiedwindowframe")]
    assert col_specs
    for spec in col_specs:
        assert "_pid" in spec, spec


def test_emb_decontaminate_broadcasts_bench_set(spark, sf_dir):
    """The benchmark embeddings must reach the corpus as a broadcast
    (eval-set-sized), the corpus itself never shuffling before the
    per-vector rollup: broadcast nested-loop probe, no CartesianProduct,
    no window, no SinglePartition."""
    from prac_data_pipelines_spark.queries.vector import (
        q_emb_decontaminate,
    )

    plan = _plan(q_emb_decontaminate(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_doc_ngram_novelty_windows_on_hashed_grams(spark, sf_dir):
    """doc_ngram_novelty must shuffle HASHED grams and attach the
    first-occurrence doc via ONE gram-partitioned window min (unbounded
    parallelism — gram cardinality scales with the corpus), never a
    groupBy + self-join and never a single-partition stage."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_ngram_novelty

    plan = _plan(q_doc_ngram_novelty(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Window [") == 1
    spec = re.search(r"Window \[min\(doc_id[^\]]*windowspecdefinition\((\w+)#",
                     plan)
    assert spec and spec.group(1) == "g", plan[:2000]


def test_ann_hard_negatives_broadcasts_query_batch(spark, sf_dir):
    """The query batch must be broadcast against the corpus (one corpus
    scan, no shuffle before the per-query rank); the label filter prunes
    before ranking, so the plan has no CartesianProduct and no
    SinglePartition."""
    from prac_data_pipelines_spark.queries.vector import (
        q_ann_hard_negatives,
    )

    plan = _plan(q_ann_hard_negatives(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_events_bot_detection_windows_on_user(spark, sf_dir):
    """The sliding peak-rate window must partition by user_id
    (cardinality grows with the data — never a low-card funnel); the
    only SinglePartition is the bounded bucket-total aggregate."""
    import re

    from prac_data_pipelines_spark.queries.events import (
        q_events_bot_detection,
    )

    plan = _plan(q_events_bot_detection(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("SinglePartition") <= 1
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs
    for spec in specs:
        assert spec == "user_id", plan[:2000]


def test_training_mix_epochs_is_broadcast_arithmetic(spark, sf_dir):
    """The recipe table is one wordcount aggregate + a 1-row broadcast
    of the totals + closed-form arithmetic: no window, no
    CartesianProduct, and the only SinglePartition is the 1-row totals
    aggregate."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_training_mix_epochs,
    )

    plan = _plan(q_training_mix_epochs(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("SinglePartition") <= 1


def test_doc_langmix_detect_is_map_side_fold(spark, sf_dir):
    """Chunk votes are positional slices over the staged word array —
    per-row folds only: no window, no join, no SinglePartition before
    the |langs|-row rollup."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_langmix_detect,
    )

    plan = _plan(q_doc_langmix_detect(spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_simhash_recall_audit_joins_pairs_not_corpus(spark, sf_dir):
    """The only corpus-scale work is the banded LSH join (same contract
    as doc_ngram_jaccard); the SimHash lookups join the thresholded PAIR
    set, the distance is a JVM bit_count, and the only unpartitioned
    windows run over the <= SIMHASH_BITS+1-row histogram."""
    from prac_data_pipelines_spark.queries.text import (
        q_simhash_recall_audit,
    )

    plan = _plan(q_simhash_recall_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "bit_count" in plan
    assert plan.count("SinglePartition") <= 2  # bounded histogram windows


def test_vocab_growth_curve_rank_is_two_level(spark, sf_dir):
    """The doc ranking must be global_positions (windows partition by
    the range-partition id, never an unpartitioned global row_number);
    the only unpartitioned window is the running total over the
    4-row quartile rollup, and the only SinglePartition feeds it or the
    1-row doc count."""
    import re

    from prac_data_pipelines_spark.queries.corpus import (
        q_vocab_growth_curve,
    )

    plan = _plan(q_vocab_growth_curve(spark, sf_dir))
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    unpart = [s for s in specs if "_pid" not in s and "cuartil" in s]
    corpus_scale = [s for s in specs if "_pid" not in s
                    and "cuartil" not in s]
    assert not corpus_scale, corpus_scale  # no global window over docs
    assert len(unpart) <= 1  # the bounded 4-row running total


def test_events_cohort_value_windows_on_keys(spark, sf_dir):
    """The cohort attach must window on user_id (cardinality grows with
    data); the cumulative must window on the aggregated cohort frame —
    no window over raw events without a grown key, no SinglePartition,
    no CartesianProduct."""
    import re

    from prac_data_pipelines_spark.queries.events import (
        q_events_cohort_value,
    )

    plan = _plan(q_events_cohort_value(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs
    for spec in specs:
        assert spec in ("user_id", "_cohorte"), plan[:2000]


def test_no_per_element_resplit_in_any_query(spark, sf_dir):
    """Regression guard for the doc_signal_corr lesson: an expression
    like element_at(split(trim(text)...), i) inside a lambda re-splits
    the document once PER ELEMENT access (measured 6.5 s vs 0.4 s on a
    single-task sf0.1 scan) — tokenized arrays must be staged as
    multiply-referenced columns before any positional access."""
    from prac_data_pipelines_spark.queries import all_queries

    for name, fn in all_queries().items():
        if name.startswith("multimodal_"):
            continue
        plan = _plan(fn(spark, sf_dir))
        assert "element_at(split(" not in plan, name


def test_doc_strip_dup_spans_windows_on_doc_id_and_jvm_rewrite(spark, sf_dir):
    """The strip stage must keep the dup_spans plan discipline — every
    windowspec doc_id-partitioned, flagging a hashed-key join, no
    all-pairs, no single-partition stage — and the text rewrite must be
    a JVM higher-order filter: no Python evaluation node anywhere."""
    import re

    from prac_data_pipelines_spark.queries.text import q_doc_strip_dup_spans

    plan = _plan(q_doc_strip_dup_spans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "doc_id" for s in specs), plan[:2000]


def test_multimodal_decontaminate_broadcasts_both_eval_sides(spark, sf_dir):
    """Cross-modal decontamination must broadcast BOTH fixed eval sides:
    the n-gram set as a broadcast hash join and the eval phashes as a
    broadcast nested-loop SEMI join — the corpus itself is never
    self-joined (no CartesianProduct) and never hits a single-partition
    stage on the flagging path."""
    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_decontaminate,
    )

    plan = _plan(q_multimodal_decontaminate(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan and "LeftSemi" in plan


def test_events_quantile_daily_windows_on_day_type(spark, sf_dir):
    """The daily quantile read path must window over the aggregated
    histogram partitioned by (dia, event_type) — a key space growing
    with history — never a single-partition or per-event window."""
    import re

    from prac_data_pipelines_spark.queries.events import (
        q_events_quantile_daily,
    )

    plan = _plan(q_events_quantile_daily(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#\d+L?, (\w+)#", plan)
    assert specs and all(s == ("dia", "event_type") for s in specs), \
        plan[:2000]


def test_part_supplier_counts_broadcasts_dims_and_anti(spark, sf_dir):
    """Q16 shape: the filtered part dimension and the tiny complainer
    exclusion must both broadcast (hash join + anti), the part filters
    must reach the parquet scan, and the only fact-sized exchange is the
    (partkey, suppkey) pair-grain distinct — no CartesianProduct, no
    single-partition stage."""
    from prac_data_pipelines_spark.queries.tpch import (
        q_part_supplier_counts,
    )

    df = q_part_supplier_counts(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    explained = df._jdf.queryExecution().toString()
    assert "PushedFilters" in explained and "Brand#1" in explained


def test_emb_dim_stats_key_space_is_dim_bounded(spark, sf_dir):
    """The per-dimension audit is one posexplode + a 64-key aggregate:
    partial aggregation must be map-side combined (HashAggregate pair),
    with no join and no window anywhere."""
    from prac_data_pipelines_spark.queries.vector import q_emb_dim_stats

    plan = _plan(q_emb_dim_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_emb_label_outliers_broadcasts_centroids_no_window(spark, sf_dir):
    """The mislabel queue must fold the centroid set into broadcast
    sides (hash join on label + 1-row nested-loop for the array) and
    rank via TakeOrdered — never a per-label window (labels are
    low-cardinality) and never a corpus self-join."""
    from prac_data_pipelines_spark.queries.vector import (
        q_emb_label_outliers,
    )

    plan = _plan(q_emb_label_outliers(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_lsh_bucket_skew_is_joinless_bounded_aggregate(spark, sf_dir):
    """The bucket audit is pure aggregation over the exploded bucket
    frame — (table, bucket) then table grain, both bounded by index
    parameters: no join of any kind, map-side combined partials."""
    from prac_data_pipelines_spark.queries.vector import q_lsh_bucket_skew

    plan = _plan(q_lsh_bucket_skew(spark, sf_dir))
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan
    assert plan.count("HashAggregate") >= 2


def test_events_interarrival_windows_on_user_totals_broadcast(spark, sf_dir):
    """The gap lag must window on user_id only (high-cardinality), the
    histogram key space is (type, bucket), and the per-type total joins
    back as a broadcast — never a low-cardinality window over raw
    events."""
    import re

    from prac_data_pipelines_spark.queries.events import (
        q_events_interarrival,
    )

    plan = _plan(q_events_interarrival(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "user_id" for s in specs), plan[:2000]


def test_multimodal_frame_dedup_windows_on_frame_hash(spark, sf_dir):
    """Frame dedup must rank first-occurrence under a frame_hash-keyed
    window (corpus-cardinality key) and roll up by doc_id — one Arrow
    fan-out stage, no join, no single-partition stage."""
    import re

    from prac_data_pipelines_spark.queries.media import (
        q_multimodal_frame_dedup,
    )

    plan = _plan(q_multimodal_frame_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("ArrowEvalPython") <= 0  # mapInPandas, not UDF eval
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "frame_hash" for s in specs), plan[:2000]


def test_knn_mutual_pairs_bucketed_never_all_pairs(spark, sf_dir):
    """The mutual graph must form candidates through the guarded LSH
    bucket join (SortMergeJoin/ShuffledHashJoin on the band key, no
    CartesianProduct); windows key on cubo (guard) and src (top-k) —
    both corpus-cardinality."""
    import re

    from prac_data_pipelines_spark.queries.vector import (
        q_knn_mutual_pairs,
    )

    plan = _plan(q_knn_mutual_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    specs = set(re.findall(r"windowspecdefinition\((\w+)#", plan))
    assert specs <= {"cubo", "src"}, specs


def test_corpus_dedup_funnel_windows_on_digest_keys(spark, sf_dir):
    """Every funnel window must key on a corpus-cardinality digest/band
    key (exact/normalized md5 partitions, the band guard) — never a
    low-cardinality key; the near-dup stage joins on the band key, no
    CartesianProduct. The five stage rollups are the legitimate bounded
    single-row aggregates."""
    import re

    from prac_data_pipelines_spark.queries.text import (
        q_corpus_dedup_funnel,
    )

    plan = _plan(q_corpus_dedup_funnel(spark, sf_dir))
    assert "CartesianProduct" not in plan
    specs = set(re.findall(r"windowspecdefinition\((\w+)#", plan))
    # _w0/_w1 are Catalyst's aliases for the two unnamed md5 partition
    # expressions (exact digest, normalized digest); the numbering shifts
    # with surrounding projections, so assert the KEYS are digests below
    # rather than pinning alias numbers here
    assert specs <= {"_w0", "_w1", "banda", "md5"}, specs
    digest_aliases = set(re.findall(r"md5\([^\n]*?\bAS (_w\d+)#", plan))
    assert {s for s in specs if s.startswith("_w")} <= digest_aliases, (
        specs, digest_aliases)


def test_doc_clf_calibration_single_scan_bounded_keys(spark, sf_dir):
    """The calibration curve must compute classifier AND quality signals
    in ONE corpus scan (no join, no window), fan out only into the
    9-key threshold aggregate (map-side combined HashAggregate pair)."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_clf_calibration,
    )

    plan = _plan(q_doc_clf_calibration(spark, sf_dir))
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_doc_eval_contamination_broadcast_semi_filters_train(spark, sf_dir):
    """The eval-side contamination audit must keep every corpus-sized
    stage map-side: the train gram stream is filtered by a broadcast
    LeftSemi against the (bounded) eval vocabulary BEFORE any exchange,
    the matched-gram set is broadcast back for the per-doc join, the
    eval scans carry the doc_id pushdown of the fixed slice, and no
    sort-merge join, cartesian product, or window appears anywhere."""
    from prac_data_pipelines_spark.queries.corpus import (
        q_doc_eval_contamination,
    )

    plan = _plan(q_doc_eval_contamination(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan
    assert "LeftSemi" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LessThan(doc_id,2000)" in plan  # fixed-slice pushdown
