"""Structured Streaming parity tests (ST1–ST6): incremental ingest is
exactly-once across restarts, windows match their batch twins."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hocr_de_noising_spark.operators.pipeline import denoise_fused
from hocr_de_noising_spark.streaming import (
    incremental_denoise_stream,
    windowed_events_stream,
)


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    for v in d.values():
        os.makedirs(v, exist_ok=True)
    return d


def test_incremental_denoise_exactly_once(spark, unit_dir, stream_dirs):
    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet"))
    lexicon = spark.read.parquet(os.path.join(unit_dir, "lexicon.parquet"))
    tokens = [r.token for r in lexicon.select("token").collect()]

    first = docs.filter(F.col("doc_id") < "d00000100")
    second = docs.filter(F.col("doc_id") >= "d00000100")

    # batch 1 arrives
    first.write.mode("append").parquet(stream_dirs["in"])
    incremental_denoise_stream(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"], tokens
    )
    n1 = spark.read.parquet(stream_dirs["out"]).count()
    assert n1 == first.count()

    # restart with batch 2 added: only NEW files are processed
    second.write.mode("append").parquet(stream_dirs["in"])
    incremental_denoise_stream(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"], tokens
    )
    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == docs.count()  # no duplicates: exactly-once
    assert out.select("doc_id").distinct().count() == docs.count()

    # stream result equals the batch pipeline on the same input
    batch = denoise_fused(docs, tokens)
    j = out.alias("o").join(batch.alias("b"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("b.spans"))).count() == 0


def test_windowed_stream_matches_batch_window(spark, sf001_dir, stream_dirs):
    events = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    events.write.mode("append").parquet(stream_dirs["in"])
    windowed_events_stream(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"]
    )
    streamed = spark.read.parquet(stream_dirs["out"])
    batch = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
        )
    )
    # watermark may hold back the final (unclosed) windows: everything
    # the stream emitted must match the batch result exactly
    assert streamed.exceptAll(batch).count() == 0
    missing = batch.exceptAll(streamed)
    max_ts = events.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    # only windows near the end of the stream (inside the watermark
    # horizon) may be missing
    assert missing.filter(F.col("w_start") < max_ts - 900).count() == 0


def test_stateful_streaming_dedup(spark, sf001_dir, stream_dirs):
    """ST5: dropDuplicatesWithinWatermark drops re-delivered events."""
    events = spark.read.parquet(os.path.join(sf001_dir, "events.parquet")).filter(
        F.col("event_id") < 500
    )
    # write the same events twice: at-least-once delivery simulation
    events.write.mode("append").parquet(stream_dirs["in"])
    events.write.mode("append").parquet(stream_dirs["in"])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(stream_dirs["in"])
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", stream_dirs["out"])
        .option("checkpointLocation", stream_dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == events.count()  # exactly one copy per event_id
    assert out.select("event_id").distinct().count() == events.count()


def test_sink_retry_is_idempotent(spark, unit_dir, stream_dirs):
    """A micro-batch re-delivered with the same batch_id (foreachBatch
    retry after partial failure) must overwrite, not duplicate."""
    from hocr_de_noising_spark.params import Params
    from hocr_de_noising_spark.streaming.incremental import make_denoise_sink

    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet")).limit(20)
    lexicon = spark.read.parquet(os.path.join(unit_dir, "lexicon.parquet"))
    tokens = [r.token for r in lexicon.select("token").collect()]
    sink = make_denoise_sink(stream_dirs["out"], tokens, Params())
    sink(docs, 0)
    sink(docs, 0)  # retry of the same batch
    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == 20
    assert out.select("doc_id").distinct().count() == 20
    sink(docs, 1)  # a new batch appends alongside
    assert spark.read.parquet(stream_dirs["out"]).count() == 40


def test_custom_stateful_operator_matches_batch(spark, sf001_dir, stream_dirs):
    """applyInPandasWithState custom operator: per-user running totals
    across TWO restarts must end exactly at the batch groupBy answer,
    with state carried between micro-batches (n_batches > 1 for users
    seen in both halves)."""
    from hocr_de_noising_spark.streaming.stateful import stateful_user_totals_stream

    events = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    first.write.mode("append").parquet(stream_dirs["in"])
    stateful_user_totals_stream(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"]
    )
    second.write.mode("append").parquet(stream_dirs["in"])
    stateful_user_totals_stream(
        spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"]
    )

    # last emission per user = final running totals
    out = spark.read.parquet(stream_dirs["out"])
    w = Window.partitionBy("user_id").orderBy(F.col("n_batches").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "total_value", "n_batches")
    )
    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("total_value"),
    )
    j = final.alias("s").join(batch.alias("b"), "user_id", "full_outer")
    assert j.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
    ).count() == 0
    # state really persisted across the restart
    assert final.filter("n_batches >= 2").count() > 0


def test_streaming_gate_stage_matches_batch(spark, stream_dirs):
    """r7: the trainprep gate expressions (scrub/quality/lang) are pure
    Columns, so the SAME gate_stage composes onto a readStream source
    unmodified — incremental corpus curation. The streamed gate output
    must equal the batch gate output row-for-row."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from run_trainprep import gate_stage

    rows = [
        (0, "the keeper recorded seventeen evening measurements beside the pier", "en", "s", 60),
        (1, "zzz qqq xxx", "xx", "s", 11),  # fails the e-ratio lang gate
        (2, "every clever weaver sewed seven green sleeves here today", "en", "s", 50),
        (3, "a1 22 333 4444 55555 666666", "en", "s", 27),  # digit-heavy
    ]
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.createDataFrame(rows, ddl)
    docs.write.mode("overwrite").parquet(stream_dirs["in"])

    batch = gate_stage(docs, 0.2, ("en",))
    stream_src = spark.readStream.schema(ddl).parquet(stream_dirs["in"])
    q = (
        gate_stage(stream_src, 0.2, ("en",))
        .writeStream.format("parquet")
        .option("path", stream_dirs["out"])
        .option("checkpointLocation", stream_dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(stream_dirs["out"])
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_streaming_dsir_score_matches_batch(spark, stream_dirs):
    """r7: DSIR as incremental selection — the importance model
    (dsir_bucket_log_ratios) is trained ONCE on a batch sample, frozen
    to a plain table, and applied to a readStream source inside
    foreachBatch via dsir_score (static broadcast, no streaming
    state). Streamed scores must equal batch scores row-for-row."""
    from hocr_de_noising_spark.queries.corpus_stats import (
        dsir_bucket_log_ratios,
        dsir_score,
    )

    ddl = "doc_id long, text string"
    seed = spark.createDataFrame(
        [(100, "the keeper recorded evening measurements beside the pier"),
         (101, "seventeen letters reached the evening ferry before dusk")],
        ddl,
    )
    target = spark.createDataFrame(
        [(200, "evening measurements of the keeper beside the pier"),
         (201, "the evening ferry delivered letters to the keeper")],
        ddl,
    )
    # freeze the model (materialized, as a production run would persist it)
    lr_path = os.path.join(stream_dirs["in"], "..", "lr.parquet")
    dsir_bucket_log_ratios(seed, target).write.parquet(lr_path)
    lr = spark.read.parquet(lr_path)

    arriving = spark.createDataFrame(
        [(0, "the keeper measured the evening tide beside the pier"),
         (1, "discount voucher codes expire before midnight closing"),
         (2, "letters for the keeper reached the ferry that evening")],
        ddl,
    )
    arriving.write.mode("overwrite").parquet(stream_dirs["in"])
    batch = dsir_score(arriving, lr)

    stream_src = spark.readStream.schema(ddl).parquet(stream_dirs["in"])
    q = (
        stream_src.writeStream.foreachBatch(
            lambda b, _: dsir_score(b, lr)
            .write.mode("append")
            .parquet(stream_dirs["out"])
        )
        .option("checkpointLocation", stream_dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(stream_dirs["out"])
    assert streamed.count() == batch.count() == 3
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()
