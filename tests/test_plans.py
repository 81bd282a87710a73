"""Physical-plan shape assertions (SURVEY.md §4): pushdown reaches the
parquet scan, small dims broadcast, the exploded pipeline keeps exactly
one wide exchange, and hot stages stay in whole-stage codegen."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from hocr_de_noising_spark.operators.pipeline import denoise_exploded
from hocr_de_noising_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_pushed_to_scan(spark):
    df = QUERIES["scan_lineitem"]["fn"](spark, SF)
    p = formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # column pruning: only the 5 needed columns are read, not all 16
    assert read_cols == {"l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_shipdate"}


def test_small_dims_broadcast(spark):
    df = QUERIES["join_broadcast"]["fn"](spark, SF)
    p = plan_str(df)
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_exploded_pipeline_has_single_wide_exchange(spark, unit_dir):
    docs = spark.read.parquet(os.path.join(unit_dir, "docs.parquet"))
    lexicon = spark.read.parquet(os.path.join(unit_dir, "lexicon.parquet"))
    out = denoise_exploded(docs, lexicon)
    p = plan_str(out)
    # one hash partitioning by doc_id for stats window; every later
    # window/groupBy reuses it. (The tiny OOV-distinct side job adds
    # exchanges on the lexicon/token side, not on the docs path.)
    doc_exchanges = re.findall(r"Exchange hashpartitioning\(doc_id", p)
    assert len(doc_exchanges) == 1, p
    # lexicon reaches the words via broadcast, not shuffle
    assert "BroadcastHashJoin" in p


def test_denoise_patterns_keep_whole_stage_codegen(spark):
    # the flag/filter/project stages compile to whole-stage codegen
    # (windows themselves never codegen; the surrounding stages must)
    df = QUERIES["scan_lineitem"]["fn"](spark, SF)
    p = formatted(df)
    assert "WholeStageCodegen" in p or "codegen id" in p, p


def test_knn_broadcasts_query_side(spark):
    df = QUERIES["knn_bruteforce"]["fn"](spark, SF)
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_topk_uses_take_ordered(spark):
    df = QUERIES["topk_noisy"]["fn"](spark, SF)
    assert "TakeOrderedAndProject" in plan_str(df)


def test_lsh_candidates_need_no_self_join(spark):
    # star pairing: ONE window over (band, bucket), no join at all —
    # linear in bucket size even when a bucket holds 10^6 duplicates
    df = QUERIES["dedup_minhash_lsh"]["fn"](spark, SF)
    p = plan_str(df)
    assert "CartesianProduct" not in p and "Join" not in p
    assert "Window" in p
