"""ann_ivf recall at scale (VERDICT r4 item 6): recall@10 vs exact
brute-force on a >=100k-vector corpus, nprobe swept 1/4/8.

The corpus is synthesized deterministically (seeded numpy): 100k
64-dim vectors drawn around 256 cluster centers with Gaussian spread —
the clustered geometry IVF's coarse quantizer exists for (uniform
random vectors have no cell structure and every ANN method degrades to
brute force on them). Ground truth is exact cosine top-10 per query
computed in numpy (the oracle side, driver-local by design); the
measured system is the Spark ``ivf_build_and_search`` path (KMeans
coarse quantizer, centroid broadcast, equi-join candidate pruning).

Usage: python scripts/bench_ivf_recall.py [--n 100000] [--dim 64]
           [--nlist 256] [--queries 50] [--cores 32]

Appends nothing; prints one JSON line per nprobe level — copy the
table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hocr_de_noising_spark.queries.similarity_ml import ivf_build_and_search  # noqa: E402
from hocr_de_noising_spark.session import get_spark  # noqa: E402

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "cache",
)


def make_corpus(n: int, dim: int, n_centers: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, size=(n_centers, dim))
    idx = rng.integers(0, n_centers, size=n)
    return (centers[idx] + rng.normal(0, 0.25, size=(n, dim))).astype(np.float32)


def exact_topk(vecs: np.ndarray, n_queries: int, k: int) -> list[set[int]]:
    """Exact cosine top-k neighbor ids (self excluded) per query."""
    norms = np.linalg.norm(vecs, axis=1)
    q = vecs[:n_queries] / norms[:n_queries, None]
    sims = q @ (vecs / norms[:, None]).T  # (n_queries, n)
    out = []
    for i in range(n_queries):
        sims[i, i] = -np.inf
        out.append(set(np.argpartition(-sims[i], k)[:k].tolist()))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    vecs = make_corpus(args.n, args.dim, args.centers)
    truth = exact_topk(vecs, args.queries, args.k)

    spark = get_spark("ivf-recall", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(CACHE, f"ivf_corpus_{args.n}_{args.dim}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import pandas as pd

        pdf = pd.DataFrame(
            {"vec_id": np.arange(args.n, dtype=np.int64), "embedding": list(vecs)}
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    emb.count()  # page-cache warm

    for nprobe in (1, 4, 8):
        t0 = time.time()
        res = ivf_build_and_search(
            emb, nlist=args.nlist, nprobe=nprobe, k=args.k,
            n_queries=args.queries,
        ).collect()
        wall = time.time() - t0
        got: dict[int, set[int]] = {}
        for r in res:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recall = float(
            np.mean([
                len(got.get(i, set()) & truth[i]) / args.k
                for i in range(args.queries)
            ])
        )
        print(json.dumps({
            "n_vectors": args.n, "dim": args.dim, "nlist": args.nlist,
            "nprobe": nprobe, "k": args.k, "n_queries": args.queries,
            "recall_at_k": round(recall, 4), "wall_sec": round(wall, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
