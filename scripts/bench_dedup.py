"""Composed dedup job at beyond-test scale (VERDICT r2 item 5).

The driver's documents table at sf0.1 is only 5,000 rows (bench.py
already times the job there each round); this script proves the same
composition at 100k+ docs. It synthesizes a documents.parquet with
PLANTED duplicate structure — deterministic, generated entirely
JVM-side from spark.range (no external data):

- ~85% unique docs (40-token md5-derived texts, seeded by doc_id);
- ~10% near-dup cluster members: cluster base text with 2 token
  substitutions (should be caught by MinHash LSH + jaccard verify);
- ~5% exact duplicates of a cluster base (caught by dedup_exact and
  by LSH at jaccard 1.0).

Then runs jobs/run_dedup.run_dedup_job and appends stage wall times +
stage row counts + recall on the planted clusters to BENCH/BASELINE.md.

Usage: python scripts/bench_dedup.py [--docs 100000] [--cores 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def write_dedup_corpus(spark, n_docs: int) -> str:
    from pyspark.sql import functions as F

    d = os.path.join(CACHE, f"dedup_corpus_{n_docs}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    n_tokens = 40
    cluster_size = 10  # 1 base + 9 near-dups per planted cluster
    # doc i belongs to cluster i // cluster_size; clusters where
    # (cluster % 10 == 0) are planted near-dup clusters, the rest are
    # all-unique (each member keeps its own seed)
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / cluster_size).cast("long").alias("cluster"),
        (F.col("id") % cluster_size).alias("member"),
    )
    # plant logic (encoded in the SQL expr below): clusters with
    # cluster%10==0 share seed=cluster*1000 — members 1..7 are
    # near-dups (2 token substitutions), members 0/8/9 exact copies;
    # all other docs are unique (seed=doc_id).
    # token t of doc = md5(seed:t) prefix
    tok = (
        "transform(sequence(0, {n}), t -> "
        "  CASE WHEN {nd} AND t IN (CAST(member AS INT), CAST(member AS INT) + 17) "
        "       THEN substr(md5(concat(cluster, ':', member, ':', t)), 1, 6) "
        "       ELSE substr(md5(concat({seed}, ':', t)), 1, 6) END)"
    )
    docs = df.select(
        "doc_id",
        F.expr(
            "concat_ws(' ', "
            + tok.format(
                n=n_tokens - 1,
                nd="(cluster % 10 = 0 AND member > 0 AND member < 8)",
                seed="CASE WHEN cluster % 10 = 0 THEN cluster * 1000 ELSE doc_id END",
            )
            + ")"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("int"))
    docs.repartition(64).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hocr_de_noising_spark.session import get_spark
    from jobs.run_dedup import run_dedup_job

    spark = get_spark("dedup-bench", cores=args.cores, shuffle_partitions=args.cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    d = write_dedup_corpus(spark, args.docs)
    gen_sec = round(time.time() - t0, 1)

    out = os.path.join("/tmp", "dedup_bench_out")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    summary = run_dedup_job(spark, d, out, jaccard_threshold=0.5)
    total = round(time.time() - t0, 2)

    # recall on planted structure: every planted cluster (10 members)
    # should collapse to ONE keeper, so removed == planted dup members
    clustered = spark.read.parquet(os.path.join(out, "components")).count()
    planted_docs = args.docs // 100 * 9  # 9 non-base members per planted cluster
    keepers = spark.read.parquet(os.path.join(out, "keepers")).count()
    removed = args.docs - keepers
    recall = round(removed / planted_docs, 4)
    docs_per_sec = round(args.docs / total, 1)

    result = {
        "docs": args.docs,
        "gen_cached_sec": gen_sec,
        "total_sec": total,
        "docs_per_sec": docs_per_sec,
        "planted_dup_docs": planted_docs,
        "clustered_docs": clustered,
        "summary": summary,
        "keepers": keepers,
        "dedup_removed": removed,
        "planted_recall": recall,
    }
    print(json.dumps(result))
    _ = F

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    ss = summary["stage_secs"]
    lines = [
        f"\n## Composed dedup job {stamp} ({args.docs} synthetic docs w/ planted dups, {args.cores} cores)\n",
        f"Total {total}s = {docs_per_sec} docs/s. Stage walls: "
        + ", ".join(f"{k} {v}s" for k, v in ss.items())
        + ".",
        "",
        "| stage | rows |",
        "| --- | --- |",
        f"| exact_groups | {summary['exact_groups']} |",
        f"| candidate_pairs (LSH) | {summary['candidate_pairs']} |",
        f"| verified_pairs (jaccard>=0.5) | {summary['verified_pairs']} |",
        f"| clustered_docs | {summary['clustered_docs']} |",
        f"| keepers | {keepers} (removed {removed} of {planted_docs} planted dup members — recall {recall}) |",
    ]
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
