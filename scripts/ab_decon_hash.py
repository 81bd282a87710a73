"""Interleaved A/B: int64-md5-hashed vs raw-string shingle keys in
decontaminate_overlap at sf0.1 (VERDICT r5 item 2 — attribute the
2.67 s -> 3.56 s r4 -> r5 driver-bench reading that coincided with the
capped_shingles int64-hash change).

Both legs run interleaved inside ONE session (same JVM heat, same page
cache) with dedup_simhash as the untouched control: C A B A B A B ...
Leg A is the current production path (capped_shingles: md5+conv int64
before the df window); leg B reconstructs the pre-r5 shape (raw string
shingles through the window + groupBy, no hash at all).

Prints one JSON line and appends the verdict to BENCH/BASELINE.md.

Usage: python scripts/ab_decon_hash.py [--cores 32] [--reps 4]
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


def decon_string_leg(spark, sf):
    """Pre-r5 decon shape: identical plan, raw string shingle keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hocr_de_noising_spark.queries.trainprep import (
        JACCARD_DF_CAP,
        _shingles,
    )

    sh = _shingles(spark, sf, 5)
    w = Window.partitionBy("shingle")
    sh = (
        sh.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= JACCARD_DF_CAP)
        .drop("df")
    )
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    sp = sh.withColumn(
        "split",
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test"),
    )
    per_shingle = (
        sp.groupBy("shingle")
        .agg(
            F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                "has_train"
            ),
            F.collect_list(
                F.when(
                    F.col("split") != "train", F.struct("doc_id", "split")
                )
            ).alias("evals"),
        )
        .filter("has_train = 1")
    )
    return (
        per_shingle.select(F.explode("evals").alias("e"))
        .select("e.doc_id", "e.split")
        .groupBy("doc_id", "split")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cores",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from hocr_de_noising_spark.queries.trainprep import (
        decon_overlap,
        dedup_simhash,
    )
    from hocr_de_noising_spark.session import get_spark

    spark = get_spark(
        "ab-decon-hash", cores=args.cores, shuffle_partitions=args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    legs = {
        "control_simhash": lambda: dedup_simhash(spark, args.sf),
        "A_int64_hash": lambda: decon_overlap(spark, args.sf),
        "B_string": lambda: decon_string_leg(spark, args.sf),
    }
    times: dict[str, list[float]] = {k: [] for k in legs}
    counts: dict[str, set] = {k: set() for k in legs}

    # warmup both data paths once (JIT + page cache), unmeasured
    for fn in legs.values():
        fn().count()

    order = ["control_simhash", "A_int64_hash", "B_string"]
    for _ in range(args.reps):
        for name in order:
            t0 = time.monotonic()
            counts[name].add(legs[name]().count())
            times[name].append(round(time.monotonic() - t0, 3))

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {
        "ab": "decon_hash",
        "sf": args.sf,
        "cores": args.cores,
        "median": med,
        "all": times,
        "rows": {k: sorted(v) for k, v in counts.items()},
    }
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} ab_decon_hash cores={args.cores} sf={args.sf} "
            f"median={json.dumps(med)} all={json.dumps(times)} "
            f"rows={json.dumps({k: sorted(v) for k, v in counts.items()})}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
