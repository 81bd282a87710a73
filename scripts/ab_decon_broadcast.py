"""Interleaved A/B at 1M docs: broadcast vs shuffle keeper join in the
decontaminate stage (VERDICT r5 item 6 — decon was 42.1 s of the
156.6 s 1M trainprep run; the keeper membership join re-exchanged the
whole exploded shingle table twice).

Keepers are a deterministic ~93% subset of the corpus (md5-nibble rule)
standing in for the dedup stage's survivors — same cardinality class,
same join shape. Legs run interleaved in ONE session; row counts must
match between legs (broadcast is a physical-plan change only).

Usage: python scripts/ab_decon_broadcast.py [--cores 32] [--reps 3]
       [--corpus tests/fixtures/cache/dedup_corpus_1000000]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--corpus",
        default=os.path.join(REPO, "tests", "fixtures", "cache", "dedup_corpus_1000000"),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hocr_de_noising_spark.queries.trainprep import decon_overlap
    from hocr_de_noising_spark.session import get_spark

    spark = get_spark("ab-decon-bc", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.corpus, "documents.parquet"))
    keep = docs.select("doc_id").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) != "f"
    )

    legs = {
        "A_broadcast": lambda: decon_overlap(spark, args.corpus, keep=keep, broadcast_keep=True),
        "B_shuffle": lambda: decon_overlap(spark, args.corpus, keep=keep, broadcast_keep=False),
    }
    times: dict[str, list[float]] = {k: [] for k in legs}
    rows: dict[str, set] = {k: set() for k in legs}
    for fn in legs.values():  # warmup both plans once, unmeasured
        fn().count()
    for _ in range(args.reps):
        for name, fn in legs.items():
            t0 = time.monotonic()
            rows[name].add(fn().count())
            times[name].append(round(time.monotonic() - t0, 3))

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {
        "ab": "decon_broadcast_keep",
        "corpus": args.corpus,
        "cores": args.cores,
        "median": med,
        "all": times,
        "rows": {k: sorted(v) for k, v in rows.items()},
    }
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} ab_decon_broadcast cores={args.cores} "
            f"corpus={os.path.basename(args.corpus)} median={json.dumps(med)} "
            f"all={json.dumps(times)} rows={json.dumps({k: sorted(v) for k, v in rows.items()})}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
