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


def test_psig_reencode_within_threshold():
    """VERDICT r4 item 3: a re-encoded copy (different bytes, different
    container dims) must land within PSIG_L1_MAX of the original's
    perceptual signature while its sha256 differs; distinct-content
    items must not be near by construction of the fixture set."""
    import hashlib

    from hocr_de_noising_spark.operators.multimodal import (
        _psig_bytes,
        encode_fake_media_reencode,
    )
    from hocr_de_noising_spark.queries.media_near import PSIG_L1_MAX

    orig = encode_fake_media("m2")
    re_enc = encode_fake_media_reencode("m2")
    assert re_enc != orig
    assert hashlib.sha256(re_enc).digest() != hashlib.sha256(orig).digest()
    sa, sb = _psig_bytes(orig[13:]), _psig_bytes(re_enc[13:])
    assert len(sa) == len(sb)
    l1 = sum(abs(x - y) for x, y in zip(sa, sb))
    assert l1 <= PSIG_L1_MAX, (sa, sb)


def test_media_stage_near_dedup_collapses_reencodes(spark, tmp_path):
    """The exact (sha256) stage must MISS a re-encoded copy; the opt-in
    near stage must collapse it onto the original's canonical ref, and
    ref_map must compose exact ∘ near (an exact dup of the re-encode
    follows it to the near-canonical)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from run_trainprep import media_stage

    from hocr_de_noising_spark.operators.multimodal import (
        encode_fake_media_reencode,
    )

    re2 = encode_fake_media_reencode("m2")
    media = spark.createDataFrame(
        [
            ("m1", "image", encode_fake_media("m1")),  # distinct content
            ("m2", "image", encode_fake_media("m2")),  # original
            ("m3", "image", encode_fake_media("m2")),  # exact dup of m2
            ("m6", "image", re2),  # re-encode of m2 (bytes differ)
            ("m7", "image", re2),  # exact dup of the re-encode
            ("m9", "image", b"NOTAFAKECONTAINER"),  # undecodable
        ],
        "media_ref string, media_type string, content binary",
    )

    # exact-only: the re-encode survives as its own canonical
    s_exact = media_stage(spark, media, str(tmp_path / "exact"))
    exact_map = {
        r.media_ref: r.canonical_ref
        for r in spark.read.parquet(str(tmp_path / "exact" / "ref_map")).collect()
    }
    assert exact_map["m3"] == "m2" and exact_map["m6"] == "m6"
    assert s_exact["media_kept"] == 4  # m1, m2, m6, m9

    # near: m6 (and its exact dup m7) collapse onto m2
    s_near = media_stage(spark, media, str(tmp_path / "near"), near_dedup=True)
    near_map = {
        r.media_ref: r.canonical_ref
        for r in spark.read.parquet(str(tmp_path / "near" / "ref_map")).collect()
    }
    assert near_map["m6"] == "m2" and near_map["m7"] == "m2"
    assert near_map["m3"] == "m2" and near_map["m2"] == "m2"
    assert near_map["m1"] == "m1" and near_map["m9"] == "m9"
    assert s_near["media_kept"] == 3  # m1, m2, m9
    kept = {
        r.media_ref
        for r in spark.read.parquet(str(tmp_path / "near" / "meta"))
        .select("media_ref")
        .collect()
    }
    assert kept == {"m1", "m2", "m9"}


def test_media_verify_bytes_blocks_planted_collision(spark, tmp_path):
    """VERDICT r5 item 4: a planted coarse-signature COLLISION between
    unrelated payloads (the density-dependent false-merge floor) must
    be blocked by verify_bytes=True while a genuine re-encode still
    collapses; without the verify gate the collision false-merges."""
    import struct
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from run_trainprep import media_stage

    from hocr_de_noising_spark.operators.multimodal import (
        _MAGIC,
        _psig_bytes,
        _vsig_bytes,
    )

    def container(payload: bytes) -> bytes:
        return _MAGIC + b"I" + struct.pack(">ii", 10, 10) + payload

    # A: 4096 bytes of constant 100. B: per 32-byte psig band, 16 bytes
    # of 50 then 16 bytes of 150 — SAME 32-byte band means (psig
    # collides) but 16-byte band sums differ by 800 (vsig catches it).
    # A': true re-encode of A — every 16th byte +1 (vsig drifts by 1
    # per band, within tolerance; psig unchanged).
    a = bytes([100]) * 4096
    b = (bytes([50]) * 16 + bytes([150]) * 16) * 128
    a2 = bytearray(a)
    for i in range(0, len(a2), 16):
        a2[i] += 1
    a2 = bytes(a2)
    assert _psig_bytes(a) == _psig_bytes(b) == _psig_bytes(a2)
    assert _vsig_bytes(a) != _vsig_bytes(b)

    media = spark.createDataFrame(
        [
            ("ma", "image", container(a)),
            ("mb", "image", container(b)),  # planted collision vs ma
            ("mc", "image", container(a2)),  # true re-encode of ma
        ],
        "media_ref string, media_type string, content binary",
    )

    # without the verify gate: the collision false-merges everything
    s_no = media_stage(
        spark, media, str(tmp_path / "noverify"), near_dedup=True
    )
    no_map = {
        r.media_ref: r.canonical_ref
        for r in spark.read.parquet(
            str(tmp_path / "noverify" / "ref_map")
        ).collect()
    }
    assert no_map["mb"] == "ma"  # the false merge the gate must block
    assert s_no["media_kept"] == 1

    # with verify_bytes: re-encode still collapses, collision blocked
    s_v = media_stage(
        spark,
        media,
        str(tmp_path / "verify"),
        near_dedup=True,
        verify_bytes=True,
    )
    v_map = {
        r.media_ref: r.canonical_ref
        for r in spark.read.parquet(
            str(tmp_path / "verify" / "ref_map")
        ).collect()
    }
    assert v_map["mc"] == "ma"  # genuine re-encode collapses
    assert v_map["mb"] == "mb"  # planted collision survives
    assert s_v["media_kept"] == 2


def test_trainprep_media_near_dedup_end_to_end(spark, tmp_path):
    """--media-near-dedup through the composed job: a doc referencing a
    re-encoded copy ends up referencing the original's canonical ref in
    the final corpus."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from run_trainprep import run_trainprep_job

    from hocr_de_noising_spark.operators.multimodal import (
        encode_fake_media_reencode,
    )

    corpus_dir = tmp_path / "in"
    corpus_dir.mkdir()
    docs = spark.createDataFrame(
        [
            (1, "the merchant entered the green levels near the old trees "
                "and the herd settled while seven geese crossed the meadow",
             "en", "src", ["m2"]),
            (2, "every evening the lighthouse keeper records the weather "
                "then sweeps the lenses before the tide recedes below",
             "en", "src", ["m6", "m1"]),
        ],
        "doc_id long, text string, lang string, source string, "
        "media_refs array<string>",
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.parquet(str(corpus_dir / "documents.parquet"))
    media = spark.createDataFrame(
        [
            ("m1", "image", encode_fake_media("m1")),
            ("m2", "image", encode_fake_media("m2")),
            ("m6", "image", encode_fake_media_reencode("m2")),
        ],
        "media_ref string, media_type string, content binary",
    )
    media.write.parquet(str(corpus_dir / "media.parquet"))

    out = str(tmp_path / "prep")
    s = run_trainprep_job(
        spark, str(corpus_dir), out, min_quality=0.2, langs=("en",),
        media_near_dedup=True,
    )
    assert s["media_in"] == 3 and s["media_kept"] == 2  # m6 -> m2
    refs = {
        r.doc_id: r.media_refs
        for r in spark.read.parquet(os.path.join(out, "corpus")).collect()
    }
    assert refs[1] == ["m2"]
    assert refs[2] == ["m2", "m1"]  # m6 remapped, order preserved
