"""Structured Streaming surface over event streams.

The reference is strictly batch (SURVEY §2.9); this module gives the engine
the incremental path for the same rollups the batch layer computes, so the
KPI sinks can be fed continuously at scale:

- ``stream_hourly_rollup`` — watermarked tumbling-window aggregation
  (micro-batch incremental; late events beyond the watermark dropped
  deterministically).
- ``stream_sessionize`` — built-in ``session_window`` (gap-based) stateful
  aggregation, the streaming twin of the batch gaps-and-islands query.

Both read any file source (parquet dirs in tests; Kafka/Kinesis in
production via a different ``format`` — the plan is source-agnostic).
State scales horizontally: both aggregations are keyed, so state shards
across executors by (window/session, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw-feed schema for sources that ship ts as int64 epoch-NANOseconds
# (e.g. a Kafka topic of fixed-width records). File sources instead take
# their schema from the files themselves in ``read_event_stream`` — the
# harness's parquet has shipped both int64-nanos and timestamp[us], and a
# hard-coded schema silently corrupts whichever one it doesn't match.
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"


def read_event_stream(spark: SparkSession, source_dir: str,
                      fmt: str = "parquet") -> DataFrame:
    """File-source event stream normalized to the engine's UTC TIMESTAMP
    contract. Structured Streaming requires an explicit schema, so it is
    taken from the existing files' footers (one driver-side metadata read —
    no data scan) rather than hard-coded; the same ``normalize_ts`` seam as
    the batch loader (``sources/registry.load_table``) then handles whatever
    physical ts representation the files use."""
    from ..operators.timeops import normalize_ts
    from ..sources.registry import ensure_session_confs

    ensure_session_confs(spark)
    schema = spark.read.format(fmt).load(source_dir).schema
    raw = (spark.readStream.format(fmt)
           .schema(schema)
           .option("path", source_dir)
           .load())
    return normalize_ts(raw, "ts")


def stream_hourly_rollup(events: DataFrame) -> DataFrame:
    """Incremental hourly rollup per event type (append-mode capable)."""
    win = F.window("ts", "1 hour")
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.sum("value").alias("valor_total"),
            F.approx_count_distinct("user_id").alias("usuarios_aprox"),
        )
        .select(
            F.col("window.start").alias("hora"),
            "event_type", "n_eventos", "valor_total", "usuarios_aprox",
        )
    )


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization via the built-in session_window state store."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.sum("value").alias("valor"),
        )
        .select(
            F.col("session_window.start").alias("inicio"),
            F.col("session_window.end").alias("fin"),
            "user_id", "n_eventos", "valor",
        )
    )


def stream_purchase_error_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to error events by
    the same user within the following 6 hours (did a purchase precede a
    failure?). Both sides watermarked so the join state is bounded — rows
    older than the watermark+interval are evicted from the state store.
    """
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .withWatermark("ts", WATERMARK)
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("p_event")))
    errors = (events.filter(F.col("event_type") == "error")
              .withWatermark("ts", WATERMARK)
              .select(F.col("user_id").alias("e_user"),
                      F.col("ts").alias("e_ts"),
                      F.col("event_id").alias("e_event")))
    cond = (
        (purchases.p_user == errors.e_user)
        & (errors.e_ts >= purchases.p_ts)
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 6 HOURS"))
    )
    return purchases.join(errors, cond).select(
        "p_user", "p_event", "e_event", "p_ts", "e_ts")


def stream_conversion_pairs(events: DataFrame) -> DataFrame:
    """Stream-stream conversion attribution: every purchase within 30
    minutes strictly after a click by the same user — the streaming face
    of ``queries.events.q_events_conversion_pairs``. The batch plan gets
    its scale from the (user, time-bucket) range join; here Spark's
    interval-join state eviction plays that role: both sides watermarked,
    and the join interval bounds how long a click stays in the state
    store (watermark + 30 min), so state is O(recent events), not
    O(stream).

    Event time is truncated to SECONDS before watermarking so the window
    membership arithmetic is identical to the batch/epoch_sec convention
    (a sub-second difference must not flip a pair in or out)."""
    from ..queries.events import CONVERSION_WINDOW_SEC

    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.date_trunc("second", "ts").alias("c_ts"))
              .withWatermark("c_ts", WATERMARK))
    compras = (events.filter(F.col("event_type") == "purchase")
               .select(F.col("event_id").alias("compra_id"),
                       F.col("user_id").alias("p_user"),
                       F.col("value"),
                       F.date_trunc("second", "ts").alias("p_ts"))
               .withWatermark("p_ts", WATERMARK))
    cond = (
        (clicks.c_user == compras.p_user)
        & (compras.p_ts > clicks.c_ts)
        & (compras.p_ts <= clicks.c_ts
           + F.expr(f"INTERVAL {CONVERSION_WINDOW_SEC} SECONDS"))
    )
    return clicks.join(compras, cond).select(
        "click_id", "compra_id", F.col("c_user").alias("user_id"),
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long"))
        .alias("retraso_seg"),
        F.col("value").alias("monto"))


def stream_enrich_segments(events: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: each micro-batch broadcast-joins the static
    customer dimension (re-read per batch, so a refreshed dim parquet is
    picked up without restarting the query) and rolls up value by market
    segment. Batch twin: ``queries.events.q_events_segment_value``. The dim
    is the broadcast side at any scale where it fits an executor; the
    stream side never shuffles for the join itself."""
    dim = customer_dim.select(F.col("c_custkey").alias("user_id"),
                              "c_mktsegment")
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_eventos"),
             F.sum("value").alias("valor_total"))
    )


def stream_exact_dedup(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on the event id — the streaming face of the
    batch dedup family: state holds one entry per id and the watermark
    bounds it (ids older than the watermark are evicted, so state is
    O(ids-per-watermark-window), not O(stream)). The at-scale contract
    for exactly-once event ingestion."""
    return (events.withWatermark("ts", WATERMARK)
            .dropDuplicatesWithinWatermark(["event_id"]))


def run_to_memory(stream_df: DataFrame, table_name: str,
                  output_mode: str = "complete") -> None:
    """Drain all available input into an in-memory sink (test/dev helper)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(table_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
                   output_mode: str = "complete") -> None:
    """Drain available input into parquet via foreachBatch — the pattern for
    feeding the batch view/report layer from a stream: each micro-batch
    overwrite-publishes the current rollup snapshot (readers always see a
    complete, consistent table)."""

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (stream_df.writeStream.foreachBatch(publish)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_ohlc(events: DataFrame) -> DataFrame:
    """Hourly OHLC bars per event type, incrementally — the streaming
    twin of ``queries.events.q_events_ohlc``. Open/close come from the
    same struct-ordered MIN/MAX the batch query uses ((sec, event_id,
    value) lexicographic), which are plain mergeable aggregates — so the
    bar state is fixed-size per (window, type) and combines across
    micro-batches exactly like map-side partials do in batch."""
    sec = F.col("ts").cast("long")
    first_s = F.min(F.struct(sec.alias("s"), "event_id", "value"))
    last_s = F.max(F.struct(sec.alias("s"), "event_id", "value"))
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(first_s["value"].alias("apertura"),
             F.max("value").alias("maximo"),
             F.min("value").alias("minimo"),
             last_s["value"].alias("cierre"),
             F.count(F.lit(1)).alias("n_eventos"))
        .select(F.col("w.start").alias("hora"), "event_type", "apertura",
                "maximo", "minimo", "cierre", "n_eventos")
    )


def stream_dau(events: DataFrame) -> DataFrame:
    """Streaming daily-active-users — the incremental twin of the DAU
    half of ``queries.events.q_events_dau_wau``. Streaming aggregations
    cannot run ``countDistinct``, so distinctness is its OWN stateful
    stage: ``dropDuplicatesWithinWatermark`` on (user_id, day) keeps one
    row per active user-day (state = active user-days inside the
    watermark horizon, evicted as the watermark passes), chained into an
    epoch-aligned 1-day tumbling count — two keyed stateful operators,
    both sharding by their key at any scale. Day identity is
    ``sec // 86400`` exactly like the batch query (``F.window`` '1 day'
    windows are epoch-anchored), so emitted rows equal the batch DAU for
    every watermark-closed day."""
    ev = (events.withWatermark("ts", WATERMARK)
          .withColumn("dia", F.floor(F.col("ts").cast("long") / 86400))
          .dropDuplicatesWithinWatermark(["user_id", "dia"]))
    return (ev.groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("long").alias("dau"))
            .select(F.floor(F.col("w.start").cast("long") / 86400)
                    .cast("long").alias("dia"), "dau"))


def stream_hopping_rollup(events: DataFrame) -> DataFrame:
    """Hopping-window (1 h window / 15 min slide) incremental rollup — the
    streaming twin of ``queries.events.q_events_hopping``. Each event lands
    in window/slide = 4 state rows; the watermark bounds how long any
    window stays open."""
    win = F.window("ts", "60 minutes", "15 minutes")
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n_eventos"),
             F.sum("value").alias("valor_total"))
        .select(F.col("window.start").alias("inicio"),
                "event_type", "n_eventos", "valor_total")
    )


def stream_cm_sketch(events: DataFrame) -> DataFrame:
    """Per-day Count-Min sketch cells, incrementally — the streaming
    form of ``queries.events.q_events_heavy_hitters``'s sketch. CM
    counters are plain mergeable SUMs, which is exactly why the sketch
    is the canonical streaming frequency structure: cells accumulate
    across micro-batches like map-side partials, state is bounded at
    D x W rows per open day regardless of event volume, and a day's
    cells close with the watermark ready to serve heavy-hitter
    estimates (min over the D row cells of a key's buckets)."""
    from ..queries.events import CM_D, _cm_h

    cells = events.selectExpr(
        "ts",
        f"explode(transform(sequence(0, {CM_D - 1}), "
        f"d -> struct(d AS d, {_cm_h('d', 'user_id')} AS b))) AS c")
    return (cells.withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", "1 day").alias("w"),
                     F.col("c.d").alias("d"), F.col("c.b").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.floor(F.col("w.start").cast("long") / 86400)
                    .cast("long").alias("dia"), "d", "b", "n"))


def stream_quantile_sketch(events: DataFrame) -> DataFrame:
    """Per-day fixed-bucket value histogram, incrementally — the
    streaming twin of ``queries.events.q_events_quantile_sketch``'s
    sketch half (VERDICT-r7 item #6), completing the sketch-family
    batch/stream symmetry (CM = frequency, DAU/HLL = cardinality, this
    = distribution). The per-(day, type, bucket) counts are exact
    integer sums — mergeable by construction, which the batch
    shard-merge property test pins (merged == one-shot) — so
    micro-batch partials accumulate exactly like map-side combine.
    State is bounded by the VALUE DOMAIN (buckets per open (day, type),
    ~50 on this corpus), never by event volume; a day's histogram
    closes with the watermark and answers any quantile afterwards by a
    cumulative sum over its bucket rows — the persisted partial
    aggregate at 100 TB."""
    from ..queries.events import QS_BUCKET_CENTS

    return (events.withWatermark("ts", WATERMARK)
            .selectExpr("ts", "event_type",
                        f"cast(floor(value * 100 + 0.5) as bigint) "
                        f"div {QS_BUCKET_CENTS} AS b")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.floor(F.col("w.start").cast("long") / 86400)
                    .cast("long").alias("dia"), "event_type",
                    F.col("b").alias("bucket"), "n"))
