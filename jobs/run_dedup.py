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
    capped_from_hashed,
    capped_shingles,
    connected_components,
    dedup_exact,
    dedup_minhash_lsh,
    jaccard_for_pairs,
    minhash_pairs_from_base,
    raw_shingle_table,
    sample_split,
)
from hocr_de_noising_spark.session import get_spark  # noqa: E402
from hocr_de_noising_spark.stage_manifest import (  # noqa: E402
    StageManifest,
    StageRunner,
    params_hash,
)


def run_dedup_job(
    spark,
    sf_dir: str,
    out_dir: str,
    jaccard_threshold: float = 0.2,
    manifest_dir: str | None = None,
    run_id: str = "run-0",
    fail_after_stage: str | None = None,
    components_algorithm: str = "propagate",
    upstream_hash: str = "",
    materialize_shingles: bool = True,
) -> dict:
    """Compose the dedup stages; returns summary counts + per-stage
    wall seconds (``stage_secs``).

    With ``manifest_dir`` the job is resumable at STAGE granularity
    (VERDICT r3 item 8): each stage's parquet output is committed to a
    ``StageManifest`` row, and a restarted run with the same run_id +
    parameters skips committed stages (their outputs are re-read from
    disk by the stages that follow). ``fail_after_stage`` injects a
    crash for the resume tests.

    ``upstream_hash`` folds the params of whatever PRODUCED sf_dir into
    this job's stage lineage (r4 review: when trainprep re-runs its
    gates with different settings, the filtered dir PATH is unchanged —
    without the upstream hash, a resumed dedup would silently reuse
    keepers computed against the old corpus). ``out_dir`` is hashed for
    the same reason: committed rows must not satisfy a run pointed at a
    different output location. ``components_algorithm`` is NOT hashed —
    both algorithms produce bit-identical components (tested)."""

    def n(rel: str) -> int:
        # metadata-cheap parquet row count of a WRITTEN stage output
        return spark.read.parquet(os.path.join(out_dir, rel)).count()

    sr = StageRunner(
        StageManifest(manifest_dir) if manifest_dir else None,
        run_id,
        "dedup",
        params_hash(
            input=sf_dir,
            output=out_dir,
            jaccard_threshold=jaccard_threshold,
            upstream=upstream_hash,
        ),
        fail_after_stage,
    )

    sr.run(
        "exact",
        lambda: dedup_exact(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "exact_groups")),
        lambda: n("exact_groups"),
    )
    # materialize_shingles=True (default) writes BOTH hash views of
    # every shingle in ONE text scan and feeds the LSH + df-cap stages
    # from the int table — signatures/candidates BIT-IDENTICAL to the
    # direct path (same base hash, same family). Interleaved A/B at 1M
    # docs/local[32] (BENCH r6): materialized 35.8-36.1 s vs direct
    # 43.9-61.5 s total, identical keepers — one shingle explosion
    # instead of two beats the intermediate write cost, and at 100 TB
    # the gap widens (re-reading the text corpus vs a ~7x smaller int
    # table). materialize_shingles=False keeps the scan-twice shape
    # for storage-constrained deployments.
    if materialize_shingles:
        sr.run(
            "raw_shingles",
            lambda: raw_shingle_table(spark, sf_dir, 3)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "raw_shingles")),
            lambda: n("raw_shingles"),
        )
        sr.run(
            "lsh_candidates",
            lambda: minhash_pairs_from_base(
                spark.read.parquet(
                    os.path.join(out_dir, "raw_shingles")
                ).select("doc_id", "hp")
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "candidate_pairs")),
            lambda: n("candidate_pairs"),
        )
    else:
        sr.run(
            "lsh_candidates",
            lambda: dedup_minhash_lsh(spark, sf_dir)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "candidate_pairs")),
            lambda: n("candidate_pairs"),
        )
    # materialize the df-capped shingle table ONCE: jaccard_for_pairs
    # references it four times and Catalyst does not share subtrees —
    # without this the corpus is scanned and the df-cap window shuffled
    # 4x (r4 review). Restricted to docs that actually appear in a
    # candidate pair (left-semi): jaccard only ever reads those, and
    # most of a real corpus has no LSH candidate, so the written table
    # and every downstream reference shrink by that fraction. The df
    # cap itself is still computed over the FULL corpus first —
    # restricting before the window would change document frequencies.
    def write_candidate_shingles():
        pairs = spark.read.parquet(os.path.join(out_dir, "candidate_pairs"))
        ids = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        if materialize_shingles:
            # share=False: raw_shingles is already a materialized
            # parquet table — re-reading it for the hot-count pass is
            # cheaper than duplicating it into local checkpoint blocks
            sh = capped_from_hashed(
                spark.read.parquet(
                    os.path.join(out_dir, "raw_shingles")
                ).select("doc_id", "shingle"),
                share=False,
            )
        else:
            sh = capped_shingles(spark, sf_dir, 3)
        sh.join(ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
            os.path.join(out_dir, "shingles")
        )

    sr.run("shingles", write_candidate_shingles, lambda: n("shingles"))
    sr.run(
        "jaccard_verify",
        lambda: jaccard_for_pairs(
            spark,
            sf_dir,
            spark.read.parquet(os.path.join(out_dir, "candidate_pairs")),
            threshold=jaccard_threshold,
            shingles=spark.read.parquet(os.path.join(out_dir, "shingles")),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "verified_pairs")),
        lambda: n("verified_pairs"),
    )
    # components algorithm: 'propagate' (O(diameter) rounds — a
    # handful for star-shaped LSH graphs) or 'star' (O(log n) rounds
    # at ANY diameter — the deep-chain / 10^12-doc path)
    sr.run(
        "components",
        lambda: connected_components(
            spark.read.parquet(os.path.join(out_dir, "verified_pairs")),
            algorithm=components_algorithm,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "components")),
        lambda: n("components"),
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

    sr.run("keepers_split", write_keepers, lambda: n("keepers"))

    # summary counts come from the WRITTEN outputs (metadata-cheap
    # parquet row counts), never by recomputing a stage
    return {
        "exact_groups": n("exact_groups"),
        "candidate_pairs": n("candidate_pairs"),
        "verified_pairs": n("verified_pairs"),
        "clustered_docs": n("components"),
        "keepers": n("keepers"),
        "stage_secs": sr.stage_secs,
        "stages_run": sr.stages_run,
        "stages_skipped": sr.stages_skipped,
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--jaccard-threshold", type=float, default=0.2)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--manifest", default=None,
                    help="stage-manifest dir (enables stage-granular resume)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--components-algorithm", default="propagate",
                    choices=("propagate", "star"),
                    help="star = O(log n) rounds at any graph diameter")
    args = ap.parse_args(argv)
    spark = get_spark("hocr-dedup-job", cores=args.cores)
    summary = run_dedup_job(
        spark,
        args.input,
        args.output,
        jaccard_threshold=args.jaccard_threshold,
        manifest_dir=args.manifest,
        run_id=args.run_id,
        components_algorithm=args.components_algorithm,
    )
    print(" ".join(f"{k}={v}" for k, v in summary.items()))
    spark.stop()


if __name__ == "__main__":
    main()
