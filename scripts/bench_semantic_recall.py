"""Semantic-dedup recall at scale (VERDICT r5 item 8): planted
cosine-near duplicate pairs at 100k x 64-dim vectors through
``semantic_prune`` (fixed-centroid cells -> EMBED_BLOCK_CAP-capped
in-cell cosine -> star components).

Corpus: clustered base vectors (bench_ivf_recall's geometry) with
``--dup-frac`` of them duplicated as ``v + N(0, 0.02)`` — cosine to the
source >= ~0.99, well above the 0.9 prune threshold. nlist is sized so
cells stay under EMBED_BLOCK_CAP (SemDeDup's own rule: cluster count
grows with corpus size); an undersized nlist would sub-block-split
true pairs and the measured recall quantifies exactly that trade.

Reports: wall seconds, recall on planted pairs (dup pruned into its
source's component), false prunes (non-planted vectors pruned).

Usage: python scripts/bench_semantic_recall.py [--n 100000] [--dim 64]
           [--nlist 512] [--dup-frac 0.1] [--cores 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--centers", type=int, default=2048)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--n-assign", type=int, default=2)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    n_dup = int(args.n * args.dup_frac)
    n_base = args.n - n_dup
    centers = rng.normal(0, 1.0, size=(args.centers, args.dim))
    base = (
        centers[rng.integers(0, args.centers, size=n_base)]
        + rng.normal(0, 0.25, size=(n_base, args.dim))
    ).astype(np.float32)
    src_idx = rng.integers(0, n_base, size=n_dup)
    dups = (base[src_idx] + rng.normal(0, 0.02, size=(n_dup, args.dim))).astype(
        np.float32
    )
    vecs = np.vstack([base, dups])
    planted = {n_base + i: int(src_idx[i]) for i in range(n_dup)}

    from hocr_de_noising_spark.queries.similarity_ml import semantic_prune
    from hocr_de_noising_spark.session import get_spark

    spark = get_spark("sem-recall", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    path = os.path.join(CACHE, f"sem_corpus_{args.n}_{args.dim}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pdf = pd.DataFrame(
            {"vec_id": range(args.n), "embedding": [v.tolist() for v in vecs]}
        )
        spark.createDataFrame(pdf).repartition(args.cores).write.mode(
            "overwrite"
        ).parquet(path)
    emb = spark.read.parquet(path)
    emb.count()  # page-cache warm

    t0 = time.time()
    prune = semantic_prune(emb, threshold=args.threshold, nlist=args.nlist,
                           n_assign=args.n_assign)
    rows = prune.collect()
    wall = round(time.time() - t0, 2)

    comp = {r.vec_id: r.sem_rep for r in rows}
    # recall: planted dup ends in the SAME component as its source
    hits = sum(
        1
        for d, s in planted.items()
        if comp.get(d, d) == comp.get(s, s)
    )
    pruned = {v for v, rep in comp.items() if rep != v}
    # false prunes: pruned vectors that are neither planted dups nor
    # sources absorbed into a planted component (organically-near base
    # vectors can legitimately prune; report them separately)
    organic = len(pruned - set(planted))
    out = {
        "bench": "semantic_recall",
        "n": args.n,
        "dim": args.dim,
        "nlist": args.nlist,
        "n_assign": args.n_assign,
        "threshold": args.threshold,
        "planted": n_dup,
        "wall_sec": wall,
        "vectors_per_sec": round(args.n / wall, 1),
        "recall": round(hits / max(n_dup, 1), 4),
        "pruned_total": len(pruned),
        "pruned_organic": organic,
    }
    print(json.dumps(out))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} semantic_recall n={args.n} nlist={args.nlist} "
            f"n_assign={args.n_assign} "
            f"thr={args.threshold} cores={args.cores}: wall {wall} s "
            f"({out['vectors_per_sec']} vec/s), recall {out['recall']} on "
            f"{n_dup} planted dups, pruned {len(pruned)} "
            f"({organic} organic non-planted)\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
