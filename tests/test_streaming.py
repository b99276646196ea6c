"""Structured Streaming surface: the incremental rollup must agree with the
batch query over the same input, and sessionization must produce sane
sessions through the state store."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="module")
def stream_dir(sf_dir):
    """Copy the events parquet into a directory source."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_hourly_matches_batch(spark, stream_dir, sf_dir):
    from prac_data_pipelines_spark.queries.events import q_events_hourly
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_hourly_rollup,
    )

    stream = stream_hourly_rollup(read_event_stream(spark, stream_dir))
    run_to_memory(stream, "rollup_test", output_mode="complete")
    got = {
        (r["hora"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]):
            (r["n_eventos"], round(r["valor_total"], 2))
        for r in spark.table("rollup_test").collect()
    }
    want = {
        (r["hora"], r["event_type"]): (r["n_eventos"], round(r["valor_total"], 2))
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_stream_interval_join(spark, stream_dir, sf_dir):
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_purchase_error_join,
    )

    joined = stream_purchase_error_join(read_event_stream(spark, stream_dir))
    run_to_memory(joined, "ssjoin_test", output_mode="append")
    got = spark.table("ssjoin_test").count()

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id pu", "ts pts", "event_id pe")
    e = ev.filter("event_type = 'error'").selectExpr(
        "user_id eu", "ts ets", "event_id ee")
    import pyspark.sql.functions as F
    want = p.join(e, (p.pu == e.eu) & (e.ets >= p.pts)
                  & (e.ets <= p.pts + F.expr("INTERVAL 6 HOURS"))).count()
    assert got == want and got > 0


def test_stream_to_parquet_publish(spark, stream_dir, sf_dir):
    import tempfile

    from prac_data_pipelines_spark.queries.events import q_events_hourly
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_parquet,
        stream_hourly_rollup,
    )

    out = tempfile.mkdtemp(prefix="pub_out_")
    ckpt = tempfile.mkdtemp(prefix="pub_ckpt_")
    try:
        run_to_parquet(stream_hourly_rollup(read_event_stream(spark, stream_dir)),
                       out, ckpt)
        published = spark.read.parquet(out)
        want = q_events_hourly(spark, sf_dir).count()
        assert published.count() == want
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_sessionize_matches_batch(spark, stream_dir, sf_dir):
    """The built-in session_window state store must produce the SAME
    session multiset as the batch gaps-and-islands query: same session
    count, same (user, n_events, value) triples. (The two definitions
    could diverge only on a gap of exactly the 30-min boundary —
    session_window's half-open [start, start+gap) vs the batch strict
    `gap > 30min` — which the microsecond-grain testdata never hits.)"""
    from prac_data_pipelines_spark.queries.events import q_events_sessionize
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_sessionize,
    )

    stream = stream_sessionize(read_event_stream(spark, stream_dir))
    run_to_memory(stream, "sessions_test", output_mode="complete")
    rows = spark.table("sessions_test").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["fin"] >= r["inicio"]
        assert r["n_eventos"] >= 1

    got = sorted((r["user_id"], r["n_eventos"], round(r["valor"], 2))
                 for r in rows)
    want = sorted((r["user_id"], r["n_eventos"], round(r["valor"], 2))
                  for r in q_events_sessionize(spark, sf_dir).collect())
    assert got == want


def test_stream_exact_dedup_matches_batch_distinct(spark, stream_dir, sf_dir):
    """A source with every event duplicated must come out with each
    event_id exactly once, agreeing with the batch distinct count."""
    import shutil as _sh

    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_exact_dedup,
    )

    dup_dir = tempfile.mkdtemp(prefix="events_dup_")
    try:
        _sh.copy(f"{stream_dir}/part-0.parquet", f"{dup_dir}/part-0.parquet")
        _sh.copy(f"{stream_dir}/part-0.parquet", f"{dup_dir}/part-1.parquet")
        deduped = stream_exact_dedup(read_event_stream(spark, dup_dir))
        run_to_memory(deduped, "dedup_out", output_mode="append")
        got = spark.table("dedup_out")
        n_batch = load_table(spark, sf_dir, "events") \
            .select("event_id").distinct().count()
        assert got.count() == n_batch
        assert got.select("event_id").distinct().count() == n_batch
    finally:
        _sh.rmtree(dup_dir, ignore_errors=True)


def test_stream_static_enrichment_matches_batch(spark, stream_dir, sf_dir):
    from prac_data_pipelines_spark.queries.events import q_events_segment_value
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_enrich_segments,
    )

    dim = load_table(spark, sf_dir, "customer")
    stream = stream_enrich_segments(read_event_stream(spark, stream_dir), dim)
    run_to_memory(stream, "enrich_test", output_mode="complete")
    got = {
        r["c_mktsegment"]: (r["n_eventos"], round(r["valor_total"], 2))
        for r in spark.table("enrich_test").collect()
    }
    want = {
        r["c_mktsegment"]: (r["n_eventos"], round(r["valor_total"], 2))
        for r in q_events_segment_value(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_hopping_matches_batch(spark, stream_dir, sf_dir):
    from prac_data_pipelines_spark.queries.events import q_events_hopping
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_hopping_rollup,
    )

    stream = stream_hopping_rollup(read_event_stream(spark, stream_dir))
    run_to_memory(stream, "hopping_test", output_mode="complete")
    got = {
        (r["inicio"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]):
            (r["n_eventos"], round(r["valor_total"], 2))
        for r in spark.table("hopping_test").collect()
    }
    want = {
        (r["inicio"], r["event_type"]): (r["n_eventos"], round(r["valor_total"], 2))
        for r in q_events_hopping(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_conversion_pairs_matches_batch(spark, stream_dir, sf_dir):
    """The watermarked click->purchase interval join must produce exactly
    the batch range-join's (click, purchase) pair set."""
    from prac_data_pipelines_spark.queries.events import (
        q_events_conversion_pairs,
    )
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_conversion_pairs,
    )

    joined = stream_conversion_pairs(read_event_stream(spark, stream_dir))
    run_to_memory(joined, "conv_pairs_test", output_mode="append")
    got = {
        (r["click_id"], r["compra_id"], r["user_id"], r["retraso_seg"],
         round(r["monto"], 2))
        for r in spark.table("conv_pairs_test").collect()
    }
    want = {
        (r["click_id"], r["compra_id"], r["user_id"], r["retraso_seg"],
         round(r["monto"], 2))
        for r in q_events_conversion_pairs(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_content_dedup_matches_batch_distinct(spark, tmp_path):
    """Watermarked content dedup: one survivor per distinct text, clones
    dropped — same distinct-content set the batch hash-group computes."""
    from prac_data_pipelines_spark.streaming.corpus import (
        stream_content_dedup,
    )
    from prac_data_pipelines_spark.streaming.events import run_to_memory

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [(i, f"document body number {i % 7}",  # 7 distinct texts, 3x each
             f"2024-01-01 00:{i:02d}:00") for i in range(21)]
    (spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
     .selectExpr("doc_id", "text", "cast(ts_s as timestamp) AS ts")
     .coalesce(1).write.parquet(str(src / "f1.parquet")))

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_content_dedup(stream), "content_dedup_test",
                  output_mode="append")
    kept = spark.table("content_dedup_test").collect()
    assert len(kept) == 7
    assert {r["text"] for r in kept} == {f"document body number {i}"
                                         for i in range(7)}


def test_stream_ohlc_matches_batch(spark, stream_dir, sf_dir):
    """Incremental OHLC bars must equal the batch bar rollup: open/close
    from the same struct-ordered min/max, merged across micro-batches."""
    from prac_data_pipelines_spark.queries.events import q_events_ohlc
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_ohlc,
    )

    stream = stream_ohlc(read_event_stream(spark, stream_dir))
    run_to_memory(stream, "ohlc_test", output_mode="complete")
    got = {
        (int(r["hora"].timestamp()), r["event_type"]):
            (round(r["apertura"], 2), round(r["maximo"], 2),
             round(r["minimo"], 2), round(r["cierre"], 2), r["n_eventos"])
        for r in spark.table("ohlc_test").collect()
    }
    want = {
        (r["hora_epoch"], r["event_type"]):
            (r["apertura"], r["maximo"], r["minimo"], r["cierre"],
             r["n_eventos"])
        for r in q_events_ohlc(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 100


def test_stream_dau_matches_batch(spark, stream_dir, sf_dir):
    """Chained stateful DAU (per-(user, day) dedup -> day-window count)
    must equal the batch countDistinct for every watermark-closed day;
    append mode holds back only the trailing horizon."""
    import pyspark.sql.functions as F

    from prac_data_pipelines_spark.operators.timeops import epoch_sec
    from prac_data_pipelines_spark.queries.events import q_events_dau_wau
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_dau,
    )

    run_to_memory(stream_dau(read_event_stream(spark, stream_dir)),
                  "dau_test", output_mode="append")
    got = {(r["dia"], r["dau"]) for r in spark.table("dau_test").collect()}
    batch = {(r["dia"], r["dau"])
             for r in q_events_dau_wau(spark, sf_dir).collect()}
    max_sec = (load_table(spark, sf_dir, "events")
               .agg(F.max(epoch_sec("ts"))).collect()[0][0])
    # days whose window end is strictly past the final watermark MUST
    # have emitted; nothing may emit that disagrees with batch
    closed = {(d, n) for d, n in batch if (d + 1) * 86400 < max_sec - 7200}
    assert closed and closed <= got <= batch


def test_stream_cm_sketch_matches_batch(spark, stream_dir, sf_dir):
    """The incremental per-day Count-Min cells must equal the batch
    sketch for every watermark-closed day — counter state merges across
    micro-batches exactly like map-side partials."""
    import pyspark.sql.functions as F

    from prac_data_pipelines_spark.operators.timeops import epoch_sec
    from prac_data_pipelines_spark.queries.events import CM_D, _cm_h
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        stream_cm_sketch,
    )

    run_to_memory(stream_cm_sketch(read_event_stream(spark, stream_dir)),
                  "cm_test", output_mode="append")
    got = {(r["dia"], r["d"], r["b"], r["n"])
           for r in spark.table("cm_test").collect()}

    ev = load_table(spark, sf_dir, "events")
    batch = {(r["dia"], r["d"], r["b"], r["n"]) for r in (
        ev.selectExpr(
            "ts",
            f"explode(transform(sequence(0, {CM_D - 1}), "
            f"d -> struct(d AS d, {_cm_h('d', 'user_id')} AS b))) AS c")
        .select(F.floor(epoch_sec("ts") / 86400).cast("long").alias("dia"),
                F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .groupBy("dia", "d", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect())}
    max_sec = ev.agg(F.max(epoch_sec("ts"))).collect()[0][0]
    closed = {(dia, d, b, n) for dia, d, b, n in batch
              if (dia + 1) * 86400 < max_sec - 7200}
    assert closed and closed <= got <= batch


def test_stream_curation_gate_matches_batch_pipeline(spark, tmp_path):
    """Batch<->streaming symmetry for the curation path (VERDICT-r6 #7):
    the classifier gate + exact dedup streamed over a 3-micro-batch
    replay must keep exactly the batch pipeline's set — score-gated
    (same with_clf_score expression as --min-clf-score) then one
    survivor per distinct text, with clones planted within AND across
    micro-batches."""
    from prac_data_pipelines_spark.queries.corpus import with_clf_score
    from prac_data_pipelines_spark.streaming.corpus import (
        stream_curation_gate,
    )
    from prac_data_pipelines_spark.streaming.events import run_to_memory
    from pyspark.sql import functions as F

    texts = [f"training corpus document number {i} body {'hm ' * (i % 5)}"
             for i in range(12)]
    rows = []
    for b in range(3):                      # 3 files -> 3 micro-batches
        for j in range(12):
            # batch b carries texts [4b..4b+8): 4-text overlap with the
            # next batch = cross-batch clones; j spread also duplicates
            # within a batch
            t = texts[(4 * b + j) % 12]
            rows.append((b * 100 + j, t, f"2024-01-01 0{b}:{j:02d}:00", b))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts_s string, b int")
    src = tmp_path / "gate_src"
    src.mkdir()
    for b in range(3):
        (df.filter(F.col("b") == b)
         .selectExpr("doc_id", "text", "cast(ts_s as timestamp) AS ts")
         .coalesce(1).write.parquet(str(src / f"f{b}.parquet")))

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_curation_gate(stream, min_clf_score=0.0),
                  "curation_gate_test", output_mode="append")
    got = {r["text"] for r in spark.table("curation_gate_test").collect()}

    batch = (with_clf_score(
        df.selectExpr("doc_id", "text", "cast(ts_s as timestamp) AS ts"))
        .filter(F.col("_score") >= 0.0))
    want = {r["text"] for r in batch.select("text").distinct().collect()}
    assert got == want
    # the gate must actually drop something and keep something
    assert 0 < len(want) < 12


def test_stream_phash_dedup_matches_batch_distinct(spark, tmp_path):
    """Streaming perceptual dedup over a 3-micro-batch replay must keep
    exactly one survivor per distinct dHash — the same distinct set the
    batch Arrow stage computes — with hash-identical payloads planted
    within and across micro-batches."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.operators.multimodal import (
        attach_payload,
        dhash_images,
    )
    from prac_data_pipelines_spark.streaming.corpus import (
        stream_phash_dedup,
    )
    from prac_data_pipelines_spark.streaming.events import run_to_memory

    texts = [f"image payload stand in {i} " + "pix " * (i % 6)
             for i in range(9)]
    rows = []
    for b in range(3):
        for j in range(9):
            rows.append((b * 100 + j, texts[(3 * b + j) % 9],
                         f"2024-01-01 0{b}:{j:02d}:00", b))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts_s string, b int")
    src = tmp_path / "phash_src"
    src.mkdir()
    for b in range(3):
        (df.filter(F.col("b") == b)
         .selectExpr("doc_id", "text", "cast(ts_s as timestamp) AS ts")
         .coalesce(1).write.parquet(str(src / f"f{b}.parquet")))

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_phash_dedup(stream), "phash_dedup_test",
                  output_mode="append")
    kept = spark.table("phash_dedup_test").collect()

    batch_hashes = {
        r["phash"]
        for r in dhash_images(attach_payload(
            df.selectExpr("doc_id", "text"))).collect()
    }
    assert {r["phash"] for r in kept} == batch_hashes
    assert len(kept) == len(batch_hashes)  # one survivor per hash
    assert len(kept) < len(rows)           # clones actually dropped


def test_stream_quantile_sketch_matches_batch(spark, sf_dir, tmp_path):
    """Streaming per-day bucket histogram over a 3-micro-batch replay
    must equal the batch histogram over the same events, key for key and
    count for count — bucket counts are exact integer sums, so
    cross-micro-batch accumulation is the same arithmetic as map-side
    combine (the batch shard-merge property test's guarantee, here
    exercised through the state store)."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.operators.timeops import epoch_sec
    from prac_data_pipelines_spark.queries.events import QS_BUCKET_CENTS
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import (
        run_to_memory,
        stream_quantile_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    src = tmp_path / "qs_src"
    src.mkdir()
    # 3 deterministic slices -> 3 micro-batches; slicing by event_id
    # spreads every (day, type, bucket) key across batches, so equality
    # requires real cross-batch state merges
    for b in range(3):
        (ev.filter(F.col("event_id") % 3 == b).coalesce(1)
         .write.parquet(str(src / f"f{b}.parquet")))
    stream = (spark.readStream
              .schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_quantile_sketch(stream), "qs_stream_test",
                  output_mode="complete")
    got = {(r["dia"], r["event_type"], r["bucket"]): r["n"]
           for r in spark.table("qs_stream_test").collect()}

    batch = (ev.select(
        F.floor(epoch_sec("ts") / 86400).cast("long").alias("dia"),
        "event_type",
        F.expr(f"cast(floor(value * 100 + 0.5) as bigint) "
               f"div {QS_BUCKET_CENTS}").alias("bucket"))
        .groupBy("dia", "event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))
    want = {(r["dia"], r["event_type"], r["bucket"]): r["n"]
            for r in batch.collect()}
    assert got == want and len(want) > 10
    # the merge was real: at least one key's total exceeds what any
    # single micro-batch contributed
    one = (ev.filter(F.col("event_id") % 3 == 0).select(
        F.floor(epoch_sec("ts") / 86400).cast("long").alias("dia"),
        "event_type",
        F.expr(f"cast(floor(value * 100 + 0.5) as bigint) "
               f"div {QS_BUCKET_CENTS}").alias("bucket"))
        .groupBy("dia", "event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))
    slice0 = {(r["dia"], r["event_type"], r["bucket"]): r["n"]
              for r in one.collect()}
    assert any(got[k] > n for k, n in slice0.items())


def test_stream_interarrival_matches_batch(spark, sf_dir, tmp_path):
    """Streaming per-user gap histogram over a 3-micro-batch time-ordered
    replay must equal the batch lag histogram key for key: the first
    event of each later batch forms its gap against state from the
    previous batch, so the total gap count (n_events - n_users) can only
    be reached with real cross-batch state (batch-local lag would lose
    one gap per user per batch boundary)."""
    from collections import defaultdict

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.queries.events import (
        q_events_interarrival,
    )
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.events import run_to_memory
    from prac_data_pipelines_spark.streaming.stateful import (
        stream_interarrival,
    )

    ev = load_table(spark, sf_dir, "events")
    src = tmp_path / "ia_src"
    src.mkdir()
    # contiguous time-thirds (global (ts, event_id) rank) -> per-user
    # event-time order is preserved across micro-batches
    ranked = ev.withColumn(
        "_rn", F.row_number().over(
            Window.orderBy("ts", "event_id")) - 1)
    n = ranked.count()
    for b in range(3):
        (ranked.filter(F.floor(F.col("_rn") * 3 / n) == b)
         .drop("_rn").coalesce(1)
         .write.parquet(str(src / f"f{b}.parquet")))
    stream = (spark.readStream
              .schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_interarrival(stream), "ia_stream_test",
                  output_mode="update")
    got = defaultdict(int)
    for r in spark.table("ia_stream_test").collect():
        got[(r["event_type"], r["cubo"])] += r["n"]

    want = {(r["event_type"], r["cubo"]): r["n"]
            for r in q_events_interarrival(spark, sf_dir).collect()}
    assert dict(got) == want and len(want) > 3
    n_users = ev.select("user_id").distinct().count()
    assert sum(want.values()) == n - n_users  # every boundary gap formed


def test_stream_eval_contamination_matches_batch(spark, sf_dir, tmp_path):
    """3-micro-batch replay of the train corpus must accumulate, per
    eval doc, exactly the batch audit's matched-gram count: a gram
    reaching an eval doc from train docs in DIFFERENT micro-batches may
    only count once, so equality is reachable only through the
    cross-batch matched-set state (batch-local distinct would
    over-count; batch-local forgetting would under-count)."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.queries.corpus import (
        eval_contamination_per_doc,
        eval_slice_grams,
    )
    from prac_data_pipelines_spark.sources import load_table
    from prac_data_pipelines_spark.streaming.corpus import (
        stream_eval_contamination,
    )
    from prac_data_pipelines_spark.streaming.events import run_to_memory

    docs = load_table(spark, sf_dir, "documents")
    eval_static = eval_slice_grams(docs).cache()

    src = tmp_path / "ec_src"
    src.mkdir()
    for b in range(3):
        (docs.filter(F.col("doc_id") % 3 == b).coalesce(1)
         .write.parquet(str(src / f"f{b}.parquet")))
    stream = (spark.readStream
              .schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_eval_contamination(stream, eval_static),
                  "ec_stream_test", output_mode="update")
    # update mode emits one row per touched doc per batch; matched is
    # monotone, so the doc's final state is its max
    got = {r["eval_doc"]: r["matched"]
           for r in (spark.table("ec_stream_test")
                     .groupBy("eval_doc")
                     .agg(F.max("matched").alias("matched"))
                     .collect())}

    want = {r["eval_doc"]: r["matched"]
            for r in eval_contamination_per_doc(docs).collect()
            if r["matched"] > 0}  # untouched docs never reach the state
    assert got == want and len(want) >= 3
    # (whether THIS corpus exhibits cross-batch duplicate grams is a
    # property of the generator; the guaranteed cross-batch case lives in
    # test_stream_eval_contamination_cross_batch_state below — ADVICE-r8)


def test_stream_eval_contamination_cross_batch_state(spark, tmp_path):
    """Synthetic corpus that GUARANTEES the cross-batch cases (ADVICE-r8:
    the sf corpus only probably exhibits them): the same eval gram arrives
    from train docs in two different micro-batches (must count once), and
    the eval doc's full matched count is reachable only by accumulating
    across batches. Also pins the no-news optimization: the duplicate-only
    batch must NOT re-emit."""
    from pyspark.sql import functions as F

    from prac_data_pipelines_spark.queries.corpus import eval_slice_grams
    from prac_data_pipelines_spark.streaming.corpus import (
        stream_eval_contamination,
    )
    from prac_data_pipelines_spark.streaming.events import run_to_memory

    # doc 0: eval (0 % 11 == 0, < 2000) with grams {g1, g2};
    # train docs (never % 11 == 0): 3 -> batch 0 carries g2,
    # 1 -> batch 1 carries g1, 2 -> batch 2 carries g1 AGAIN (duplicate).
    docs = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5"),     # eval: g1="w1 w2 w3 w4", g2="w2 w3 w4 w5"
         (3, "w2 w3 w4 w5"),        # batch 0: g2
         (1, "w1 w2 w3 w4"),        # batch 1: g1
         (2, "w1 w2 w3 w4 x")],     # batch 2: g1 (dup) + one non-eval gram
        "doc_id long, text string")
    eval_static = eval_slice_grams(docs).cache()
    assert eval_static.count() == 2

    src = tmp_path / "ec_synth_src"
    src.mkdir()
    for b in range(3):
        (docs.filter(F.col("doc_id") % 3 == b).coalesce(1)
         .write.parquet(str(src / f"f{b}.parquet")))
    stream = (spark.readStream
              .schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*.parquet"))
    run_to_memory(stream_eval_contamination(stream, eval_static),
                  "ec_synth_test", output_mode="update")

    rows = spark.table("ec_synth_test").collect()
    assert all(r["eval_doc"] == 0 for r in rows)
    emitted = sorted(r["matched"] for r in rows)
    # batch 0 -> matched 1 (g2); batch 1 -> matched 2 (g1 accumulates:
    # needs more than any single batch); batch 2 -> g1 is a cross-batch
    # DUPLICATE: counted once (not 3) and the no-news batch is suppressed
    assert emitted == [1, 2]
