"""Interleaved A/B at 1M docs: r7 skew-proof decon (combiner-friendly
per-shingle stats aggregate + eval-only semi-join, window-free) vs the
r6 fused-window form (df + has_train in one unbounded (shingle)
window). VERDICT r6 item 2's "done" bound: the r7 form must keep the
1M composed-job stage within 1.15x of r6, rows bit-identical.

Leg B inlines the r6 implementation verbatim so both legs run
interleaved in ONE session (the only sanctioned comparison protocol —
cross-session readings on this shared box have swung 1.5x on untouched
code).

Usage: python scripts/ab_decon_skewfix.py [--cores 32] [--reps 3]
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
    ap.add_argument(
        "--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--corpus",
        default=os.path.join(
            REPO, "tests", "fixtures", "cache", "dedup_corpus_1000000"
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hocr_de_noising_spark.queries.trainprep import (
        JACCARD_DF_CAP,
        _shingles,
        decon_overlap,
    )
    from hocr_de_noising_spark.session import get_spark

    spark = get_spark(
        "ab-decon-skewfix", cores=args.cores, shuffle_partitions=2 * args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.corpus, "documents.parquet"))
    keep = docs.select("doc_id").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) != "f"
    )

    def r6_window_form():
        # the r6 fused-window implementation, verbatim (broadcast keep)
        sh = _shingles(spark, args.corpus, 5).select(
            "doc_id", F.xxhash64("shingle").alias("shingle")
        )
        nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        sh = sh.withColumn(
            "split",
            F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test"),
        )
        keep_side = F.broadcast(
            keep.select("doc_id").withColumn("kept", F.lit(True))
        )
        sh = sh.join(keep_side, "doc_id", "left").withColumn(
            "kept", F.coalesce("kept", F.lit(False))
        )
        w = Window.partitionBy("shingle")
        ann = sh.select(
            "doc_id",
            "split",
            "kept",
            F.count(F.lit(1)).over(w).alias("df"),
            F.max(
                F.when(F.col("kept") & (F.col("split") == "train"), 1).otherwise(0)
            ).over(w).alias("has_train"),
        )
        return (
            ann.filter(
                (F.col("df") <= JACCARD_DF_CAP)
                & (F.col("has_train") == 1)
                & F.col("kept")
                & (F.col("split") != "train")
            )
            .groupBy("doc_id", "split")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )

    legs = {
        "A_r7_skewproof": lambda: decon_overlap(spark, args.corpus, keep=keep),
        "B_r6_window": r6_window_form,
    }
    # bit-parity check once, before timing
    a, b = legs["A_r7_skewproof"](), legs["B_r6_window"]()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "rows differ"

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
        "ab": "decon_skewfix_r7",
        "corpus": args.corpus,
        "cores": args.cores,
        "median": med,
        "all": times,
        "rows": {k: sorted(v) for k, v in rows.items()},
        "bit_identical": True,
        "ratio_r7_over_r6": round(
            med["A_r7_skewproof"] / med["B_r6_window"], 3
        ),
    }
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"- {stamp} ab_decon_skewfix cores={args.cores} "
            f"corpus={os.path.basename(args.corpus)} "
            f"median={json.dumps(med)} all={json.dumps(times)} "
            f"ratio_r7_over_r6={out['ratio_r7_over_r6']} "
            f"rows={json.dumps(out['rows'])} bit_identical=True\n"
        )


if __name__ == "__main__":
    main()
