"""Multimodal plumbing: binary Arrow transfer, decode stub, features,
frame sampling, and the media_ref join back into span docs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hocr_de_noising_spark.operators.multimodal import (
    decode_media,
    encode_fake_media,
    enrich_spans_with_media,
    extract_features,
    resize_image_stub,
    sample_frames,
    FEATURES_DIM,
)


@pytest.fixture(scope="module")
def media_df(spark, unit_dir):
    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet"))
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
        .distinct()
        .collect()
    )
    rows = [
        (
            r.media_ref,
            "video" if r.kind == "figure" else "image",
            encode_fake_media(r.media_ref, "video" if r.kind == "figure" else "image"),
        )
        for r in refs
    ]
    return spark.createDataFrame(rows, "media_ref string, media_type string, content binary"), len(rows)


def test_decode_fake_media(spark, media_df):
    df, n = media_df
    out = decode_media(df)
    rows = out.collect()
    assert len(rows) == n
    assert all(r.decode_ok for r in rows)
    assert all(16 <= r.width < 80 and 16 <= r.height < 80 for r in rows)
    # deterministic: same ref → same sha
    again = {r.media_ref: r.sha256 for r in decode_media(df).collect()}
    assert all(again[r.media_ref] == r.sha256 for r in rows)


def test_decode_strict_is_stubbed(spark, media_df):
    df, _ = media_df
    with pytest.raises(NotImplementedError):
        decode_media(df, decode_strict=True)


def test_corrupt_binary_flagged_not_crashed(spark):
    df = spark.createDataFrame(
        [("m1", "image", b"NOTAFORMAT"), ("m2", "image", None), ("m3", "image", b"")],
        "media_ref string, media_type string, content binary",
    )
    rows = {r.media_ref: r for r in decode_media(df).collect()}
    assert not any(r.decode_ok for r in rows.values())
    assert rows["m2"].sha256 is None and rows["m2"].n_bytes == 0


def test_features_shape_and_determinism(spark, media_df):
    df, n = media_df
    out = extract_features(df).collect()
    assert len(out) == n
    assert all(len(r.feature) == FEATURES_DIM for r in out)
    assert all(0.0 <= x <= 1.0 for r in out for x in r.feature)


def test_resize_plan(spark, media_df):
    df, _ = media_df
    out = resize_image_stub(decode_media(df), max_side=32).collect()
    assert all(max(r.target_width, r.target_height) <= 32 for r in out)
    assert all(r.target_width >= 1 and r.target_height >= 1 for r in out)


def test_sample_frames_only_video(spark, media_df):
    df, _ = media_df
    frames = sample_frames(df)
    kinds = df.filter(F.col("media_type") == "video").count()
    got = frames.select("media_ref").distinct().count()
    assert got == kinds
    assert frames.filter(F.length("frame_bytes") == 0).count() == 0


def test_enrich_spans_preserves_doc_count(spark, unit_dir, media_df):
    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet"))
    df, _ = media_df
    enriched = enrich_spans_with_media(docs, decode_media(df))
    assert enriched.count() == docs.count()
    s = enriched.select(F.explode("spans").alias("s"))
    media = s.filter(F.col("s.media_ref").isNotNull())
    assert media.filter(~F.col("s.decode_ok")).count() == 0
    assert s.filter(F.col("s.media_ref").isNull() & F.col("s.width").isNotNull()).count() == 0


def test_arrow_batch_bounds_binary_heavy_rows(spark):
    """The 100 TB risk for media columns is an Arrow batch whose BYTES
    blow executor memory even when its row count looks small. Evidence:
    with maxRecordsPerBatch=8, 64 rows of 256 KiB binary payload arrive
    in batches of <= 8 rows (<= ~2 MiB each) — the knob that sizes
    worker memory for binary-heavy row groups."""
    import pandas as pd
    from pyspark.sql import functions as F

    payload = b"\xab" * (256 * 1024)
    rows = [(f"m{i:04d}", "image", payload) for i in range(64)]
    df = spark.createDataFrame(rows, "media_ref string, media_type string, content binary")

    def shapes(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "rows": [len(pdf)],
                    "batch_bytes": [int(pdf["content"].map(len).sum())],
                }
            )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", 8)
    try:
        got = df.repartition(2).mapInPandas(shapes, "rows int, batch_bytes long").collect()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert sum(r.rows for r in got) == 64
    assert max(r.rows for r in got) <= 8
    assert max(r.batch_bytes for r in got) <= 8 * 256 * 1024
    # decode path handles the same binary-heavy batches
    from hocr_de_noising_spark.operators.multimodal import decode_media

    dec = decode_media(df).collect()
    assert len(dec) == 64 and all(not r.decode_ok for r in dec)  # not FAKE containers
