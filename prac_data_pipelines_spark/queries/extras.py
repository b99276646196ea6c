"""Engine-completeness queries beyond the reference's own surface:
exact percentiles, the full ranking-window family, ROLLUP grouping sets,
and INTERSECT/EXCEPT set operations. A user switching from any SQL
analytics stack gets these from the same registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rounding import money, r2, r4, r6
from ..sources import load_table
from . import register


# --------------------------------------------------------------------------
# quantiles — exact continuous percentiles per group (distributed exact
# percentile: sort-based within groups; use approx_percentile at 100 TB
# when exactness is not contractual).
# --------------------------------------------------------------------------

def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            r2(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50_precio"),
            r2(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90_precio"),
            r2(F.expr("percentile(l_quantity, 0.5)")).alias("p50_cantidad"),
        )
        .orderBy("l_returnflag")
    )


SQL_QUANTILES = """
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50_precio,
       floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100 AS p90_precio,
       floor(quantile_cont(l_quantity, 0.5) * 100 + 0.5) / 100 AS p50_cantidad
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

register("quantiles", q_quantiles, SQL_QUANTILES)


# --------------------------------------------------------------------------
# window_suite — rank / dense_rank / lag / lead / ntile in one partitioned
# pass (one shuffle on the partition key serves all five functions).
# --------------------------------------------------------------------------

def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey", "o_orderkey",
        r2(F.col("o_totalprice")).alias("precio"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.lag("o_orderkey").over(w).cast("long").alias("ant"),
        F.lead("o_orderkey").over(w).cast("long").alias("sig"),
        F.ntile(4).over(w).cast("long").alias("cuartil"),
    )


SQL_WINDOW_SUITE = """
SELECT o_custkey, o_orderkey,
       floor(o_totalprice * 100 + 0.5) / 100 AS precio,
       rank() OVER w::BIGINT AS rnk,
       dense_rank() OVER w::BIGINT AS drnk,
       lag(o_orderkey) OVER w::BIGINT AS ant,
       lead(o_orderkey) OVER w::BIGINT AS sig,
       ntile(4) OVER w::BIGINT AS cuartil
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""

register("window_suite", q_window_suite, SQL_WINDOW_SUITE)


# --------------------------------------------------------------------------
# rollup_summary — hierarchical grouping sets (status ⊃ priority ⊃ total)
# in ONE pass instead of three unioned aggregations.
# --------------------------------------------------------------------------

def q_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             r2(F.sum("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(todos)")).alias("estatus"),
            F.coalesce("o_orderpriority", F.lit("(todas)")).alias("prioridad"),
            "n", "total",
        )
        .orderBy("estatus", "prioridad")
    )


SQL_ROLLUP_SUMMARY = """
SELECT coalesce(o_orderstatus, '(todos)') AS estatus,
       coalesce(o_orderpriority, '(todas)') AS prioridad,
       count(*)::BIGINT AS n,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY estatus, prioridad
"""

register("rollup_summary", q_rollup_summary, SQL_ROLLUP_SUMMARY)


# --------------------------------------------------------------------------
# set_ops — INTERSECT / EXCEPT over customer key sets (customers with both
# open and finished orders; customers with only open orders).
# --------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter("o_orderstatus = 'O'").select("o_custkey")
    done_c = o.filter("o_orderstatus = 'F'").select("o_custkey")
    both = (open_c.intersect(done_c)
            .select("o_custkey", F.lit("AMBOS").alias("grupo")))
    only_open = (open_c.subtract(done_c)  # set-semantics EXCEPT
                 .select("o_custkey", F.lit("SOLO_ABIERTAS").alias("grupo")))
    return both.unionByName(only_open).orderBy("grupo", "o_custkey")


SQL_SET_OPS = """
SELECT o_custkey, 'AMBOS' AS grupo FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT o_custkey, 'SOLO_ABIERTAS' FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
ORDER BY grupo, o_custkey
"""

register("set_ops", q_set_ops, SQL_SET_OPS)


# --------------------------------------------------------------------------
# asof_latest_order — as-of join: each event matched to the user's most
# recent order at-or-before the event time. Implemented as the one-shuffle
# union+window composition (operators/asof.py); the oracle uses DuckDB's
# native ASOF JOIN — a genuinely independent implementation of the
# semantics. Right side deduplicated per (key, time) for determinism.
# --------------------------------------------------------------------------

def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    events = (load_table(spark, sf_dir, "events")
              .select("event_id", "user_id", "ts"))
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    orders = (
        load_table(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .selectExpr("o_custkey AS user_id", "o_orderdate", "o_orderkey")
    )
    out = asof_join(events, orders, key="user_id",
                    left_time="ts", right_time="o_orderdate",
                    payload_cols=["o_orderkey"])
    return out.select("event_id", "user_id",
                      F.col("o_orderkey").cast("long").alias("ultima_orden"))


SQL_ASOF_LATEST_ORDER = """
WITH dedup_orders AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT event_id, user_id, o_orderkey::BIGINT AS ultima_orden
FROM events ASOF JOIN dedup_orders
  ON user_id = o_custkey AND ts >= o_orderdate
"""

register("asof_latest_order", q_asof_latest_order, SQL_ASOF_LATEST_ORDER)


# --------------------------------------------------------------------------
# order_vs_customer_avg — correlated per-row aggregate: each order compared
# to its customer's average order value. Spark-first: a window aggregate
# over the customer key (one shuffle), not a correlated re-scan per row.
# --------------------------------------------------------------------------

def q_order_vs_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    # customer average through an exact decimal window sum: float window
    # avgs accumulate in partition row order (shuffle-dependent), and both
    # the rounded output AND the ratio>=1.5 membership filter sit on
    # boundaries of cent-structured money (operators/rounding.py caveat)
    avg_cust = (F.sum(money(F.col("o_totalprice"))).over(w)
                .cast("double")
                / F.count("o_totalprice").over(w))
    return (
        o.select(
            "o_orderkey", "o_custkey",
            r2(F.col("o_totalprice")).alias("total"),
            r2(avg_cust).alias("media_cliente"),
            r4(F.col("o_totalprice") / avg_cust).alias("ratio"),
        )
        .filter(F.col("ratio") >= 1.5)
    )


SQL_ORDER_VS_CUSTOMER_AVG = """
WITH enriched AS (
  SELECT o_orderkey, o_custkey,
         floor(o_totalprice * 100 + 0.5) / 100 AS total,
         floor(sum(o_totalprice::DECIMAL(18,2)) OVER cw::DOUBLE
               / count(o_totalprice) OVER cw * 100 + 0.5) / 100
           AS media_cliente,
         floor(o_totalprice / (sum(o_totalprice::DECIMAL(18,2)) OVER cw::DOUBLE
                               / count(o_totalprice) OVER cw)
               * 10000 + 0.5) / 10000 AS ratio
  FROM orders
  WINDOW cw AS (PARTITION BY o_custkey)
)
SELECT * FROM enriched WHERE ratio >= 1.5
"""

register("order_vs_customer_avg", q_order_vs_customer_avg, SQL_ORDER_VS_CUSTOMER_AVG)


# --------------------------------------------------------------------------
# distribution_windows — percent_rank / cume_dist / first & last value in
# one partitioned pass (the distribution-analytics window family).
# --------------------------------------------------------------------------

def q_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey", "c_mktsegment",
        r2(F.col("c_acctbal")).alias("saldo"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("dist_acum"),
        F.first("c_custkey").over(wf).cast("long").alias("menor_saldo"),
        F.last("c_custkey").over(wf).cast("long").alias("mayor_saldo"),
    )


SQL_DISTRIBUTION_WINDOWS = """
SELECT c_custkey, c_mktsegment,
       floor(c_acctbal * 100 + 0.5) / 100 AS saldo,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS dist_acum,
       first_value(c_custkey) OVER wf::BIGINT AS menor_saldo,
       last_value(c_custkey) OVER wf::BIGINT AS mayor_saldo
FROM customer WHERE c_custkey < 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC),
       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

register("distribution_windows", q_distribution_windows, SQL_DISTRIBUTION_WINDOWS)


# --------------------------------------------------------------------------
# fuzzy_name_blocks — entity resolution: blocked pairwise Levenshtein over
# customer names. Blocking bounds the quadratic comparison (the same
# structure as LSH for text): pairs only form within a block key.
#
# The block key is SEMANTIC — derived from the name itself, not from a
# row id: normalize (lowercase, strip non-alphanumerics), then key on the
# trailing k characters (the discriminative end of the string; the
# reference corpus shares a constant boilerplate prefix, the same shape
# as real client catalogs sharing "S.A. de C.V."-style heads).
# Near-identical names normalize to the same suffix and land in the same
# block.
#
# Scale posture (round-3 fix): the suffix length k is DERIVED FROM THE
# CORPUS SIZE, not a constant — the smallest k with
# ``base^k * _BLOCK_TARGET >= N`` (≈ log_base(N / target_block)),
# computed as a lazy one-row aggregate cross-joined back (broadcast), so
# block count grows with the data and expected block size stays
# ~_BLOCK_TARGET at any N. ``base`` is the CONSERVATIVE alphabet floor
# 10, not 36: catalog identifiers overwhelmingly end in digits
# (folio/“Customer#000…” tails), and under-estimating the alphabet only
# over-shards (harmless — verify cost is within-block), while
# over-estimating starves k and caps recall (measured: base 36 at 32×
# replication dropped 58% of rows past the cap; base 10 drops 0%). The
# derivation is an integer CASE ladder, identical on both engines (no
# float log to disagree on). A deterministic per-block cap
# (`_BLOCK_CAP`, row_number by key) still bounds the worst-case O(cap^2)
# under a skewed suffix; rows dropped by the cap are now OBSERVABLE via
# `fuzzy_block_stats` (blocks, max size, dropped rows, drop rate) so the
# recall loss is a reported number, not a silent cliff. Reference
# anchor: client-name matching is the core dimension join of
# /root/reference/src/data_transformer.py:100-131.
# --------------------------------------------------------------------------

_BLOCK_TARGET = 64     # desired expected block size; k grows to hold it
_BLOCK_BASE = 10       # conservative alphabet floor (digit-tailed ids)
_BLOCK_K_MAX = 12      # base^12 keys ≫ any corpus; caps the CASE ladder
_BLOCK_CAP = 200       # deterministic per-block bound on the O(n^2) verify

_NORM = "regexp_replace(lower(c_name), '[^a-z0-9]', '')"
_NORM_DUCK = "regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')"


def _k_column(n):
    """Smallest k in [1, _BLOCK_K_MAX] with base^k * target >= n (integer
    comparisons only — engine-portable, no transcendental boundary risk)."""
    out = None
    for i in range(1, _BLOCK_K_MAX):
        cond = n <= F.lit(_BLOCK_TARGET * _BLOCK_BASE ** i)
        out = F.when(cond, i) if out is None else out.when(cond, i)
    return out.otherwise(_BLOCK_K_MAX)


def _k_sql() -> str:
    whens = " ".join(
        f"WHEN count(*) <= {_BLOCK_TARGET * _BLOCK_BASE ** i} THEN {i}"
        for i in range(1, _BLOCK_K_MAX))
    return f"CASE {whens} ELSE {_BLOCK_K_MAX} END"


def _keyed_names(c: DataFrame) -> DataFrame:
    """(c_custkey, c_name, bloque) with the size-adaptive block key."""
    base = c.select("c_custkey", "c_name", F.expr(_NORM).alias("_norm"))
    params = base.agg(_k_column(F.count(F.lit(1))).alias("_k"))
    return (base.crossJoin(F.broadcast(params))
            .withColumn("bloque", F.expr("right(_norm, _k)"))
            .drop("_norm", "_k"))


_SQL_KEYED = f"""
  base AS (
    SELECT c_custkey, c_name, {_NORM_DUCK} AS norm
    FROM customer WHERE c_custkey < 500
  ), params AS (
    SELECT {_k_sql()} AS k FROM base
  ), keyed AS (
    SELECT b.c_custkey, b.c_name, right(b.norm, p.k) AS bloque
    FROM base b CROSS JOIN params p
  )"""


def q_fuzzy_name_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    blocked = (
        _keyed_names(c)
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("bloque").orderBy("c_custkey")))
        .filter(F.col("_rn") <= _BLOCK_CAP)
        .drop("_rn")
    )
    left = blocked.selectExpr("bloque", "c_custkey AS k1", "c_name AS n1")
    right = blocked.selectExpr("bloque", "c_custkey AS k2", "c_name AS n2")
    pairs = (left.join(right, "bloque")
             .filter(F.col("k1") < F.col("k2"))
             .withColumn("distancia", F.levenshtein("n1", "n2")))
    return (
        pairs.filter(F.col("distancia") <= 2)
        .groupBy("bloque")
        .agg(F.count(F.lit(1)).cast("long").alias("pares_similares"),
             F.min("distancia").cast("long").alias("distancia_min"))
        .orderBy("bloque")
    )


SQL_FUZZY_NAME_BLOCKS = f"""
WITH {_SQL_KEYED}, blocked AS (
  SELECT c_custkey, c_name, bloque
  FROM (SELECT *, row_number() OVER (PARTITION BY bloque ORDER BY c_custkey)
               AS _rn FROM keyed)
  WHERE _rn <= {_BLOCK_CAP}
)
SELECT l.bloque, count(*)::BIGINT AS pares_similares,
       min(levenshtein(l.c_name, r.c_name))::BIGINT AS distancia_min
FROM blocked l JOIN blocked r ON l.bloque = r.bloque AND l.c_custkey < r.c_custkey
WHERE levenshtein(l.c_name, r.c_name) <= 2
GROUP BY l.bloque ORDER BY l.bloque
"""

register("fuzzy_name_blocks", q_fuzzy_name_blocks, SQL_FUZZY_NAME_BLOCKS)


# --------------------------------------------------------------------------
# fuzzy_block_stats — observability for the blocking above: how many
# blocks formed, how big the worst one is, and exactly how many rows the
# per-block cap excludes from comparison (the recall loss, as a number).
# --------------------------------------------------------------------------

def q_fuzzy_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    sizes = (_keyed_names(c)
             .groupBy("bloque")
             .agg(F.count(F.lit(1)).alias("_n")))
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_bloques"),
        F.max("_n").cast("long").alias("bloque_max"),
        F.sum("_n").cast("long").alias("filas"),
        F.sum(F.greatest(F.col("_n") - _BLOCK_CAP, F.lit(0)))
        .cast("long").alias("descartadas"),
    ).select(
        "n_bloques", "bloque_max", "filas", "descartadas",
        r6(F.col("descartadas") / F.col("filas")).alias("tasa_descarte"),
    )


SQL_FUZZY_BLOCK_STATS = f"""
WITH {_SQL_KEYED}, sizes AS (
  SELECT bloque, count(*) AS n FROM keyed GROUP BY bloque
)
SELECT count(*)::BIGINT AS n_bloques,
       max(n)::BIGINT AS bloque_max,
       sum(n)::BIGINT AS filas,
       sum(greatest(n - {_BLOCK_CAP}, 0))::BIGINT AS descartadas,
       floor((sum(greatest(n - {_BLOCK_CAP}, 0)) / sum(n)::DOUBLE) * 1000000
             + 0.5) / 1000000 AS tasa_descarte
FROM sizes
"""

register("fuzzy_block_stats", q_fuzzy_block_stats, SQL_FUZZY_BLOCK_STATS)


# --------------------------------------------------------------------------
# cube_summary — CUBE grouping sets (rollup_summary covers ROLLUP; CUBE
# adds the cross-dimensional subtotals). One shuffled aggregation computes
# all four grouping sets; nulls from the cube are labelled explicitly so
# the cross-engine hash is stable.
# --------------------------------------------------------------------------

def q_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (cust.join(F.broadcast(nation),
                      cust.c_nationkey == nation.n_nationkey)
            .select("n_name", "c_mktsegment", "c_acctbal"))
    return (
        base.cube("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clientes"),
             r2(F.sum("c_acctbal")).alias("saldo_total"))
        .select(F.coalesce("n_name", F.lit("(todas)")).alias("nacion"),
                F.coalesce("c_mktsegment", F.lit("(todos)")).alias("segmento"),
                "n_clientes", "saldo_total")
        .orderBy("nacion", "segmento")
    )


SQL_CUBE_SUMMARY = """
SELECT coalesce(n_name, '(todas)') AS nacion,
       coalesce(c_mktsegment, '(todos)') AS segmento,
       count(*)::BIGINT AS n_clientes,
       floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS saldo_total
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, c_mktsegment)
ORDER BY nacion, segmento
"""

register("cube_summary", q_cube_summary, SQL_CUBE_SUMMARY)


# --------------------------------------------------------------------------
# sketch_profile — the APPROXIMATE twins of distinct_counts and quantiles:
# HyperLogLog++ distinct estimates (approx_count_distinct, rsd=0.01) and
# KLL/GK quantile estimates (approx_percentile, accuracy 10000). These are
# the 100 TB scale path: exact countDistinct re-shuffles the full key set
# per column and exact percentile materializes sorted groups, while both
# sketches are fixed-size mergeable state with map-side partial
# aggregation — one narrow shuffle regardless of cardinality.
#
# Approximate results are engine-specific, so raw sketch outputs can't be
# value-hashed against DuckDB. To make the query DRIVER-checkable anyway,
# it emits the EXACT values plus in-query ``*_ok`` booleans (sketch vs
# exact compared inside the same aggregate pass, within the documented
# error bounds); the oracle computes the same exact values and literal
# TRUEs — the hash matches iff the accuracy bound holds. Bounds match
# the guarantees each sketch actually makes (ADVICE r5): HLL's bound is
# RELATIVE-VALUE (rsd=0.01 -> 5% = 5 sigma; catches wiring bugs, not
# noise), but approx_percentile guarantees RANK error <= N/accuracy —
# on heavy-tailed values a valid sketch can exceed any fixed value
# tolerance, so the percentile check counts the rows that actually lie
# between the approx and the exact value (its realized rank error) and
# bounds THAT by 5 * N/accuracy (+2 for interpolation/tie slack).
# --------------------------------------------------------------------------

_SKETCH_TOL = 0.05      # HLL: relative-value, 5x rsd
_KLL_RANK_SLACK = 5.0   # approx_percentile: multiples of N/accuracy
_KLL_ACCURACY = 10000


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def ok(approx, exact):
        return (F.abs(approx - exact)
                / F.greatest(exact, F.lit(1.0)) < F.lit(_SKETCH_TOL))

    # Plan shape: exact-distinct + sketch must NOT share one aggregate
    # with other functions — a mixed distinct/typed agg plans through
    # Expand -> SortAggregate (measured 5.5 s vs 1.1 s at sf0.1). HLL is
    # duplicate-insensitive, so running it over the DISTINCT keys gives
    # the identical estimate while sharing the exact count's scan; the
    # percentile pair (exact array + KLL array) gets its own agg. Three
    # 1-row frames crossJoined.
    def distinct_pair(df, key, exact_name, approx_name):
        return (df.select(key).distinct()
                .agg(F.count(F.lit(1)).cast("long").alias(exact_name),
                     F.expr(f"approx_count_distinct({key}, 0.01)")
                     .cast("double").alias(approx_name)))

    a = distinct_pair(o, "o_custkey", "clientes_activos", "_ca")
    b1 = distinct_pair(li, "l_partkey", "partes_vendidas", "_pa")
    b2 = li.agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_p"),
        F.expr(f"approx_percentile(l_extendedprice, array(0.5, 0.9), "
               f"{_KLL_ACCURACY})").alias("_px"))

    # Realized rank error of each percentile sketch: rows strictly between
    # the approx value and the exact value. One extra narrow scan of the
    # fact column against the broadcast 1-row bounds frame — the check a
    # validation job would genuinely run, and the only check that matches
    # approx_percentile's actual (rank-space) guarantee.
    def _between(k: int):
        ap = F.element_at("_px", k).cast("double")
        ex = F.element_at("_p", k)
        v = F.col("l_extendedprice")
        return ((v > F.least(ap, ex)) & (v < F.greatest(ap, ex)))

    rank = (li.select("l_extendedprice").crossJoin(F.broadcast(b2))
            .agg(F.sum(_between(1).cast("long")).alias("_r50"),
                 F.sum(_between(2).cast("long")).alias("_r90"),
                 F.count(F.lit(1)).cast("long").alias("_n"),
                 F.first("_p").alias("_p"),
                 F.first("_px").alias("_px")))
    rank_tol = F.greatest(
        F.col("_n") / _KLL_ACCURACY * _KLL_RANK_SLACK, F.lit(2.0))
    return (a.crossJoin(b1).crossJoin(rank)  # 1-row x 1-row merges
            .select(
        "clientes_activos", "partes_vendidas",
        r2(F.element_at("_p", 1)).alias("p50_precio"),
        r2(F.element_at("_p", 2)).alias("p90_precio"),
        ok(F.col("_ca"), F.col("clientes_activos").cast("double"))
        .alias("clientes_hll_ok"),
        ok(F.col("_pa"), F.col("partes_vendidas").cast("double"))
        .alias("partes_hll_ok"),
        (F.col("_r50") <= rank_tol).alias("p50_kll_ok"),
        (F.col("_r90") <= rank_tol).alias("p90_kll_ok")))


SQL_SKETCH_PROFILE = """
SELECT (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT
         AS clientes_activos,
       count(DISTINCT l_partkey)::BIGINT AS partes_vendidas,
       floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100
         AS p50_precio,
       floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100
         AS p90_precio,
       TRUE AS clientes_hll_ok,
       TRUE AS partes_hll_ok,
       TRUE AS p50_kll_ok,
       TRUE AS p90_kll_ok
FROM lineitem
"""

register("sketch_profile", q_sketch_profile, SQL_SKETCH_PROFILE)


# --------------------------------------------------------------------------
# grouping_sets_summary — the general GROUPING SETS form (rollup and cube
# above are its special cases): revenue by return flag, by line status,
# and the grand total, in ONE pass over the fact — the Expand node feeds
# a single partial-aggregated shuffle instead of three scans + union.
# Set labels via coalesce sentinels (both grouping columns are non-null
# in the data, so the sentinel is unambiguous and engine-portable —
# no grouping_id() bit-order coupling).
# --------------------------------------------------------------------------

def q_grouping_sets_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupingSets([["l_returnflag"], ["l_linestatus"], []],
                        "l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineas"),
             r2(F.sum(revenue)).alias("ingreso"))
        .select(F.coalesce("l_returnflag", F.lit("TODAS")).alias("bandera"),
                F.coalesce("l_linestatus", F.lit("TODOS")).alias("estado"),
                "n_lineas", "ingreso")
        .orderBy("bandera", "estado")
    )


SQL_GROUPING_SETS_SUMMARY = """
SELECT coalesce(l_returnflag, 'TODAS') AS bandera,
       coalesce(l_linestatus, 'TODOS') AS estado,
       count(*)::BIGINT AS n_lineas,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
         AS ingreso
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY bandera, estado
"""

register("grouping_sets_summary", q_grouping_sets_summary,
         SQL_GROUPING_SETS_SUMMARY)
