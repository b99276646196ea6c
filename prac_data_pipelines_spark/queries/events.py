"""Event-stream queries (batch form; the streaming twin lives in
``prac_data_pipelines_spark.streaming``).

The reference is strictly batch (SURVEY §2.9); these extend the engine with
the time-series surface a pipeline at scale needs: tumbling-window rollups,
sessionization (gaps-and-islands), and semi-structured JSON extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rounding import r2
from ..sources import load_table
from . import register

SESSION_GAP_MIN = 30


# --------------------------------------------------------------------------
# events_hourly — tumbling-window aggregation. In streaming this is the
# watermarked windowed agg; in batch it is a date_trunc groupBy. Partial
# aggregation makes it one shuffle at any scale.
# --------------------------------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.start.alias("hora"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eventos"),
            r2(F.sum("value")).alias("valor_total"),
            F.countDistinct("user_id").cast("long").alias("usuarios"),
        )
        .select(F.date_format("hora", "yyyy-MM-dd HH:mm:ss").alias("hora"),
                "event_type", "n_eventos", "valor_total", "usuarios")
        .orderBy("hora", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hora,
       event_type,
       count(*)::BIGINT AS n_eventos,
       floor((sum(value)) * 100 + 0.5) / 100 AS valor_total,
       count(DISTINCT user_id)::BIGINT AS usuarios
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""

register("events_hourly", q_events_hourly, SQL_EVENTS_HOURLY)


# --------------------------------------------------------------------------
# events_sessionize — gaps-and-islands sessionization: a new session starts
# after a >30 min silence per user. Partitioned windows → fully parallel.
# --------------------------------------------------------------------------

def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_sec = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = (gap_sec.isNull() | (gap_sec > SESSION_GAP_MIN * 60)).cast("int")
    sessioned = ev.withColumn("session_id", F.sum(new_session).over(wc).cast("long"))
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eventos"),
            r2(F.sum("value")).alias("valor"),
            ((F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))))
            .cast("long").alias("duracion_seg"),
        )
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR (epoch_us(ts) // 1000000) - (epoch_us(lag(ts) OVER w) // 1000000) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS nueva
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessioned AS (
  SELECT *, sum(nueva) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*)::BIGINT AS n_eventos, floor((sum(value)) * 100 + 0.5) / 100 AS valor,
       ((epoch_us(max(ts)) // 1000000) - (epoch_us(min(ts)) // 1000000))::BIGINT AS duracion_seg
FROM sessioned GROUP BY user_id, session_id
"""

register("events_sessionize", q_events_sessionize, SQL_EVENTS_SESSIONIZE)


# --------------------------------------------------------------------------
# events_json — semi-structured extraction from the JSON props column,
# JVM-side (get_json_object), no Python in the row path.
# --------------------------------------------------------------------------

def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("suma_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_JSON = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS suma_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""

register("events_json", q_events_json, SQL_EVENTS_JSON)
