"""Training-corpus dedup job: the full candidate → verify → cluster
pipeline over a documents table, composed from the registry operators.

    spark-submit --py-files dist/hocr_de_noising_spark.zip \
        jobs/run_dedup.py --input <sf_dir> --output <dir> \
        [--jaccard-threshold 0.2] [--cores N]

Stages (each also exposed as its own oracle-checked registry key):
  1. exact dedup groups          (dedup_exact     — hash groupBy)
  2. MinHash LSH candidate pairs (dedup_minhash_lsh — star pairing)
  3. exact-jaccard verification  (dedup_ngram_jaccard semantics over
     the candidate pairs, df-capped shingles)
  4. connected components        (dedup_components — min-label
     propagation) → cluster representative per doc
  5. train/val/test assignment   (sample_split) on the deduped keepers

Outputs under --output: exact_groups/, candidate_pairs/, components/,
keepers/ (one doc per cluster + all unclustered docs, with split).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hocr_de_noising_spark.queries.trainprep import (  # noqa: E402
    connected_components,
    dedup_exact,
    dedup_minhash_lsh,
    jaccard_for_pairs,
    sample_split,
)
from hocr_de_noising_spark.session import get_spark  # noqa: E402


def run_dedup_job(
    spark, sf_dir: str, out_dir: str, jaccard_threshold: float = 0.2
) -> dict:
    """Compose the dedup stages; returns summary counts + per-stage
    wall seconds (``stage_secs``)."""
    import time

    stage_secs: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        stage_secs[name] = round(time.time() - t0, 3)
        return out

    timed(
        "exact",
        lambda: dedup_exact(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "exact_groups")),
    )
    timed(
        "lsh_candidates",
        lambda: dedup_minhash_lsh(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "candidate_pairs")),
    )
    timed(
        "jaccard_verify",
        lambda: jaccard_for_pairs(
            spark,
            sf_dir,
            spark.read.parquet(os.path.join(out_dir, "candidate_pairs")),
            threshold=jaccard_threshold,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "verified_pairs")),
    )
    timed(
        "components",
        lambda: connected_components(
            spark.read.parquet(os.path.join(out_dir, "verified_pairs"))
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "components")),
    )

    # keepers: every doc keeps its cluster representative's identity;
    # docs without a near-dup cluster keep themselves. One row per
    # surviving doc, tagged with the leakage-free split.
    def write_keepers():
        split = sample_split(spark, sf_dir)
        comps_df = spark.read.parquet(os.path.join(out_dir, "components"))
        keep = (
            split.join(
                comps_df.withColumn("doc_id", F.col("doc_id").cast("long")),
                "doc_id",
                "left",
            )
            .withColumn(
                "keeper",
                F.coalesce(F.col("component").cast("long"), F.col("doc_id"))
                == F.col("doc_id"),
            )
            .filter("keeper")
            .select("doc_id", "split")
        )
        keep.write.mode("overwrite").parquet(os.path.join(out_dir, "keepers"))

    timed("keepers_split", write_keepers)

    # summary counts come from the WRITTEN outputs (metadata-cheap
    # parquet row counts), never by recomputing a stage
    def n(rel: str) -> int:
        return spark.read.parquet(os.path.join(out_dir, rel)).count()

    return {
        "exact_groups": n("exact_groups"),
        "candidate_pairs": n("candidate_pairs"),
        "verified_pairs": n("verified_pairs"),
        "clustered_docs": n("components"),
        "keepers": n("keepers"),
        "stage_secs": stage_secs,
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--jaccard-threshold", type=float, default=0.2)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    spark = get_spark("hocr-dedup-job", cores=args.cores)
    summary = run_dedup_job(
        spark, args.input, args.output, jaccard_threshold=args.jaccard_threshold
    )
    print(" ".join(f"{k}={v}" for k, v in summary.items()))
    spark.stop()


if __name__ == "__main__":
    main()
