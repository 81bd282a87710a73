"""S5/S7 — resumable manifest job: kill, restart, identical output
(SURVEY.md §5.5; BASELINE.md resume-overhead target).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hocr_de_noising_spark.checkpoint import ManifestCheckpoint, run_denoise_job
from hocr_de_noising_spark.params import Params, params_hash


@pytest.fixture()
def loaded(spark, unit_dir):
    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet"))
    lexicon = spark.read.parquet(os.path.join(unit_dir, "lexicon.parquet"))
    golden = spark.read.parquet(os.path.join(unit_dir, "golden.parquet"))
    return docs, lexicon, golden


def _read_all(spark, out_dir):
    return spark.read.parquet(out_dir).drop("bucket", "group")


def test_job_writes_manifest_and_matches_golden(spark, loaded, tmp_path):
    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    summary = run_denoise_job(
        spark, docs, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4,
        input_lineage="tests/fixtures/cache/unit/docs.parquet",
    )
    assert summary["groups_run"] == 4
    out = _read_all(spark, str(tmp_path / "out"))
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0

    m = ManifestCheckpoint(str(tmp_path / "m")).read(spark)
    rows = m.collect()
    assert len(rows) == 16  # one row per bucket
    assert all(r.status == "done" and r.params_hash == params_hash(p) for r in rows)
    assert sum(r.n_docs for r in rows) == docs.count()
    assert all(r.n_noise_dropped == r.n_spans_in - r.n_spans_out for r in rows)
    rates = [r.denoise_rate for r in rows if r.n_spans_in]
    assert all(0.0 <= x <= 1.0 for x in rates) and any(x > 0 for x in rates)


def test_kill_and_resume_skips_done_buckets(spark, loaded, tmp_path):
    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    out_dir, m_dir = str(tmp_path / "out"), str(tmp_path / "m")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_denoise_job(
            spark, docs, lexicon, out_dir, m_dir,
            params=p, run_id="r1", n_groups=4, fail_after_group=1,
        )
    done_before = ManifestCheckpoint(m_dir).completed_buckets(spark, "r1", params_hash(p))
    assert 0 < len(done_before) < 16

    summary = run_denoise_job(
        spark, docs, lexicon, out_dir, m_dir, params=p, run_id="r1", n_groups=4
    )
    assert summary["groups_skipped"] == 2  # groups 0 and 1 committed pre-crash
    assert summary["groups_run"] == 2

    out = _read_all(spark, out_dir)
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0


def test_params_change_invalidates_resume(spark, loaded, tmp_path):
    docs, lexicon, _ = loaded
    out_dir, m_dir = str(tmp_path / "out"), str(tmp_path / "m")
    p1 = Params(n_buckets=16)
    run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p1, run_id="r1", n_groups=4)
    # different params hash → nothing is considered done
    p2 = Params(n_buckets=16, tau_wconf=50)
    done = ManifestCheckpoint(m_dir).completed_buckets(spark, "r1", params_hash(p2))
    assert done == set()


def test_sparse_input_empty_groups_do_not_crash(spark, loaded, tmp_path):
    """ADVICE r1: a bucket group with zero docs used to crash the
    metrics read-back (UNABLE_TO_INFER_SCHEMA). With observe-based
    metrics the group commits zero rows instead."""
    docs, lexicon, _ = loaded
    one = docs.limit(1)
    p = Params(n_buckets=16)
    summary = run_denoise_job(
        spark, one, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4,
    )
    assert summary["groups_run"] == 4 and summary["n_docs"] == 1
    m = ManifestCheckpoint(str(tmp_path / "m")).read(spark).collect()
    assert len(m) == 16
    assert sum(r.n_docs for r in m) == 1
    assert all(r.n_spans_out <= r.n_spans_in for r in m)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1


def test_regroup_resume_is_idempotent(spark, loaded, tmp_path):
    """ADVICE r1: output is keyed by bucket only, so resuming the same
    run with a DIFFERENT n_groups must not leave stale duplicates."""
    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    out_dir, m_dir = str(tmp_path / "out"), str(tmp_path / "m")
    run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p,
                    run_id="r1", n_groups=4)
    # same lineage, different grouping: all buckets done → all skipped
    s2 = run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p,
                         run_id="r1", n_groups=2)
    assert s2["groups_skipped"] == 2 and s2["groups_run"] == 0
    # force re-run under the new grouping (fresh run id): buckets are
    # dynamically overwritten in place, never duplicated
    run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p,
                    run_id="r2", n_groups=2)
    out = _read_all(spark, out_dir)
    assert out.count() == docs.count()
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0


def test_partial_group_resume_appends_no_duplicate_rows(spark, loaded, tmp_path):
    """ADVICE r2: resuming with a DIFFERENT n_groups used to re-run a
    group's already-committed buckets and append duplicate 'done' rows
    — manifest consumers summing n_docs would double-count. Now only
    pending buckets are processed and committed."""
    docs, lexicon, _ = loaded
    p = Params(n_buckets=16)
    out_dir, m_dir = str(tmp_path / "out"), str(tmp_path / "m")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p,
                        run_id="r1", n_groups=4, fail_after_group=1)
    done = ManifestCheckpoint(m_dir).completed_buckets(spark, "r1", params_hash(p))
    assert len(done) == 8  # groups 0 and 1 of 4
    # resume with n_groups=2: BOTH new groups contain a mix of
    # committed and pending buckets
    run_denoise_job(spark, docs, lexicon, out_dir, m_dir, params=p,
                    run_id="r1", n_groups=2)
    m = ManifestCheckpoint(m_dir).read(spark).collect()
    assert len(m) == 16  # exactly one row per bucket — no duplicates
    assert len({r.bucket for r in m}) == 16
    assert sum(r.n_docs for r in m) == docs.count()


def test_hybrid_probe_skips_exploded_branch_without_giants(spark, loaded, tmp_path):
    """VERDICT r2 item 1: hybrid probes job-level for giant-bearing
    groups; a giant-free corpus plans zero exploded branches and the
    output still matches the golden."""
    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    summary = run_denoise_job(
        spark, docs, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4, variant="hybrid",
    )
    assert summary["giant_groups"] == 0 and summary["groups_run"] == 4
    out = _read_all(spark, str(tmp_path / "out"))
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0


def test_hybrid_probe_routes_giant_groups(spark, loaded, tmp_path):
    """With a low giant threshold the probe finds giant-bearing groups
    and the hybrid output equals the pure-fused output byte-for-byte."""
    from hocr_de_noising_spark.operators.pipeline import denoise_fused

    docs, lexicon, _ = loaded
    lex_tokens = [r.token for r in lexicon.select("token").distinct().collect()]
    p = Params(n_buckets=16, max_spans_per_doc=30)
    summary = run_denoise_job(
        spark, docs, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4, variant="hybrid",
    )
    assert 1 <= summary["giant_groups"] <= 4
    out = _read_all(spark, str(tmp_path / "out"))
    ref = denoise_fused(docs, lex_tokens, p)
    j = out.alias("o").join(ref.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0


def test_mismatched_bucket_column_is_recomputed(spark, loaded, tmp_path):
    """ADVICE r2: a pre-existing bucket column bucketed under a
    different scheme must not be trusted — the job probes a sample and
    recomputes, so no bucket directory is overwritten with another
    bucket's rows and no docs are lost."""
    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    wrong = docs.withColumn("bucket", F.lit(0))  # all docs claim bucket 0
    summary = run_denoise_job(
        spark, wrong, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4,
    )
    assert summary["groups_run"] == 4
    out = _read_all(spark, str(tmp_path / "out"))
    assert out.count() == docs.count()
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0
    m = ManifestCheckpoint(str(tmp_path / "m")).read(spark).collect()
    assert sum(r.n_docs for r in m) == docs.count()
    assert len({r.bucket for r in m if r.n_docs > 0}) > 1


def test_bucketed_input_prunes_at_scan(spark, loaded, tmp_path):
    """Input bucketed at rest (bucket partition column) → the per-group
    filter reaches the parquet scan as a PartitionFilter instead of
    rescanning the full corpus once per group."""
    from hocr_de_noising_spark.checkpoint import bucket_col

    docs, lexicon, golden = loaded
    p = Params(n_buckets=16)
    at_rest = str(tmp_path / "bucketed")
    docs.withColumn("bucket", bucket_col("doc_id", p)).write.partitionBy(
        "bucket"
    ).parquet(at_rest)
    bucketed = spark.read.parquet(at_rest)

    part = bucketed.filter(F.col("bucket") % 4 == 1)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "% 4" in plan

    summary = run_denoise_job(
        spark, bucketed, lexicon, str(tmp_path / "out"), str(tmp_path / "m"),
        params=p, run_id="r1", n_groups=4,
    )
    assert summary["groups_run"] == 4
    out = _read_all(spark, str(tmp_path / "out"))
    j = out.alias("o").join(golden.alias("g"), "doc_id", "full_outer")
    assert j.filter(~F.col("o.spans").eqNullSafe(F.col("g.spans"))).count() == 0
