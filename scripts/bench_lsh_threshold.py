"""LSH collision-curve measurement near the jaccard threshold
(ADVICE r5): empirical candidate probability per jaccard level for the
r6 multiply-shift minhash family vs the r5 xor-mix family, against the
analytic independent-hash curve 1 - (1 - s^2)^8 (8 bands x 2 rows).

Corpus: isolated planted pairs with CONTROLLED jaccard — doc B shares
a token prefix with doc A (shared 3-grams = prefix - 2) and gets a
fresh unique tail, all tokens globally unique per pair so cross-pair
bucket collisions cannot contaminate the measurement. Detection = the
planted (a, b) appears in the candidate output.

Usage: python scripts/bench_lsh_threshold.py [--pairs 400] [--m 50]
           [--cores 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")

# target shared-prefix lengths for m 3-grams/doc; actual jaccard is
# computed exactly per level below
LEVELS = (0.10, 0.15, 0.20, 0.25, 0.30, 0.40, 0.50)


def xor_family_candidates(spark, sf):
    """The r5 xor-mix family, preserved verbatim for the A/B leg."""
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hocr_de_noising_spark.queries.trainprep import (
        BAND_ROWS,
        N_SEEDS,
        _shingles,
    )

    seeds = [
        int(hashlib.md5(f"seed:{i}".encode()).hexdigest()[:15], 16)
        for i in range(N_SEEDS)
    ]
    sh = _shingles(spark, sf, 3)
    base = F.expr("cast(conv(substr(md5(shingle), 1, 15), 16, 10) as bigint)")
    sig = sh.select(
        "doc_id",
        *[base.bitwiseXOR(F.lit(c)).alias(f"h{i}") for i, c in enumerate(seeds)],
    ).groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(N_SEEDS)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                    )
                ).alias("bucket"),
            )
            for b in range(N_SEEDS // BAND_ROWS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )
    w = Window.partitionBy("band", "bucket")
    return (
        bands.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=400, help="pairs per jaccard level")
    ap.add_argument("--m", type=int, default=50, help="3-grams per doc")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from hocr_de_noising_spark.queries.trainprep import dedup_minhash_lsh
    from hocr_de_noising_spark.session import get_spark

    spark = get_spark("lsh-thr", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    m = args.m
    rows, planted = [], {}
    doc_id = 0
    for li, s in enumerate(LEVELS):
        # shared prefix p tokens -> shared 3-grams k = p - 2;
        # jaccard = k / (2m - k); solve k for the target s, then record
        # the EXACT jaccard of the integer k actually used
        k = round(2 * m * s / (1 + s))
        k = max(1, min(k, m))
        p = k + 2
        actual = k / (2 * m - k)
        for j in range(args.pairs):
            tag = f"L{li}P{j}"
            shared = [f"{tag}s{i}" for i in range(p)]
            a_toks = shared + [f"{tag}a{i}" for i in range(m + 2 - p)]
            b_toks = shared + [f"{tag}b{i}" for i in range(m + 2 - p)]
            a_id, b_id = doc_id, doc_id + 1
            doc_id += 2
            rows.append((a_id, " ".join(a_toks)))
            rows.append((b_id, " ".join(b_toks)))
            planted[(a_id, b_id)] = (li, actual)

    d = os.path.join(CACHE, "lsh_threshold_corpus")
    if os.path.exists(d):
        shutil.rmtree(d)
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        args.cores
    ).write.parquet(os.path.join(d, "documents.parquet"))

    out = {"bench": "lsh_threshold", "pairs_per_level": args.pairs, "m": m,
           "levels": {}}
    for fam, fn in (("ms", dedup_minhash_lsh), ("xor", xor_family_candidates)):
        cands = {
            (r.doc_a, r.doc_b) for r in fn(spark, d).collect()
        }
        for (a, b), (li, actual) in planted.items():
            lv = out["levels"].setdefault(
                round(actual, 4),
                {"analytic": round(1 - (1 - actual**2) ** 8, 4), "ms": 0, "xor": 0},
            )
            if (a, b) in cands or (b, a) in cands:
                lv[fam] += 1
    for lv in out["levels"].values():
        lv["ms"] = round(lv["ms"] / args.pairs, 4)
        lv["xor"] = round(lv["xor"] / args.pairs, 4)
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} lsh_threshold_curve ({args.pairs} pairs/level, "
            f"m={m}): jaccard -> (analytic, multiply-shift, xor) "
            + "; ".join(
                f"{j}: ({v['analytic']}, {v['ms']}, {v['xor']})"
                for j, v in sorted(out["levels"].items())
            )
            + "\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
