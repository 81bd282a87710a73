"""Interleaved A/B: fixed vs core-proportional maxPartitionBytes on the
denoise variants at one parallelism level (VERDICT r3 item 3 — explain
the denoise_exploded 2x driver-bench regression r2 -> r3).

``spark.sql.files.maxPartitionBytes`` is read at planning time, so both
legs run interleaved inside ONE session (same JVM heat, same page
cache): A(4m) B(prop) A B A B ... per variant. Prints one JSON line and
appends the verdict to BENCH/BASELINE.md.

Usage: python scripts/ab_exploded_split.py [--cores 32] [--reps 3]
       [--variants exploded fused]
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

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", nargs="+", default=["exploded", "fused"])
    args = ap.parse_args()

    from hocr_de_noising_spark.fixtures.spans import write_corpus
    from hocr_de_noising_spark.operators.pipeline import denoise_exploded, denoise_fused
    from hocr_de_noising_spark.session import get_spark

    bench_dir = write_corpus(CACHE, "bench")
    corpus_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(bench_dir, "docs.parquet"))
        for f in fs
    )
    prop = max(2 * 1024 * 1024, int(corpus_bytes / (1.75 * args.cores)))
    legs = {"fixed4m": str(4 * 1024 * 1024), "proportional": str(prop)}

    spark = get_spark(
        "ab-split",
        cores=args.cores,
        shuffle_partitions=max(args.cores * 2, 16),
        extra_conf={"spark.sql.files.openCostInBytes": "512k"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(bench_dir, "docs.parquet"))
    lexicon = spark.read.parquet(os.path.join(bench_dir, "lexicon.parquet"))
    lex_tokens = [r.token for r in lexicon.select("token").collect()]

    def run(variant: str):
        df = (
            denoise_exploded(docs, lexicon)
            if variant == "exploded"
            else denoise_fused(docs, lex_tokens)
        )
        df.write.format("noop").mode("overwrite").save()

    # warmup both variants (codegen + python workers + page cache)
    warm = docs.limit(max(args.cores * 200, 2000)).repartition(args.cores)
    denoise_fused(warm, lex_tokens).write.format("noop").mode("overwrite").save()
    denoise_exploded(warm, lexicon).write.format("noop").mode("overwrite").save()
    docs.count()

    results: dict = {v: {leg: [] for leg in legs} for v in args.variants}
    for rep in range(args.reps):
        for variant in args.variants:
            for leg, mpb in legs.items():
                spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
                t0 = time.time()
                run(variant)
                results[variant][leg].append(round(time.time() - t0, 3))
    with open("/proc/loadavg") as f:
        load = f.read().split()[0]

    medians = {
        v: {leg: round(statistics.median(ts), 3) for leg, ts in r.items()}
        for v, r in results.items()
    }
    out = {
        "metric": "split-size A/B (interleaved, one session)",
        "cores": args.cores,
        "proportional_mpb_mb": round(prop / 1e6, 2),
        "reps": args.reps,
        "medians": medians,
        "raw": results,
        "external_loadavg_after": load,
    }
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} split-size A/B local[{args.cores}] "
            f"(interleaved, {args.reps} reps, prop={out['proportional_mpb_mb']} MB): "
            f"medians {medians}; loadavg after {load}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
