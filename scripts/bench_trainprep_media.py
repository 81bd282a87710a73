"""Media-bearing trainprep bench (VERDICT r3 item 4).

Generates a corpus where a fraction of documents carry media_refs and a
media.parquet table with planted exact-duplicate payloads, runs the
full composed jobs/run_trainprep.py (gates -> text dedup -> media
dedup -> remapped corpus), and reports end-to-end docs/s plus the
media stage's own rows/s and dup recall.

Appends one summary line to BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/bench_trainprep_media.py [--docs 20000]
       [--media 8000] [--kb 8] [--dup-frac 0.2] [--cores 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "jobs"))

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def write_corpus(n_docs: int, n_media: int, kb: int, dup_frac: float) -> str:
    """Deterministic media-bearing corpus: every 3rd doc carries 1-2
    media refs; ``dup_frac`` of media items are byte-identical copies
    of earlier items (the planted exact dups the stage must collapse)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hocr_de_noising_spark.operators.multimodal import encode_fake_media

    d = os.path.join(CACHE, f"prep_media_{n_docs}x{n_media}x{kb}kb")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    words = [
        "the", "every", "evening", "keeper", "records", "weather", "sweeps",
        "lenses", "tide", "recedes", "beneath", "pier", "letters", "envoy",
        "sealed", "embers", "engine", "severed", "generator", "eastern",
    ]
    n_unique = max(int(n_media * (1.0 - dup_frac)), 1)
    refs = [f"media://{i:07d}" for i in range(n_media)]
    types = ["image", "audio", "video"]
    # dup items reuse an earlier unique item's payload byte-for-byte
    src = [i if i < n_unique else int(rng.integers(0, n_unique)) for i in range(n_media)]
    target = kb * 1024
    pq.write_table(
        pa.table(
            {
                "media_ref": refs,
                "media_type": [types[s % 3] for s in src],
                "content": [
                    encode_fake_media(refs[s], types[s % 3], target_bytes=target)
                    for s in src
                ],
            }
        ),
        os.path.join(d, "media.parquet"),
    )
    texts = [
        " ".join(rng.choice(words, size=60).tolist()) + f" tail{i}"
        for i in range(n_docs)
    ]
    media_refs: list[list[str] | None] = []
    for i in range(n_docs):
        if i % 3 == 0:
            k = 1 + i % 2
            media_refs.append([refs[int(x)] for x in rng.integers(0, n_media, size=k)])
        else:
            media_refs.append(None)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), type=pa.int64()),
                "text": texts,
                "lang": ["en"] * n_docs,
                "source": ["bench"] * n_docs,
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                "media_refs": media_refs,
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--media", type=int, default=8_000)
    ap.add_argument("--kb", type=int, default=8)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    t0 = time.time()
    d = write_corpus(args.docs, args.media, args.kb, args.dup_frac)
    gen_sec = round(time.time() - t0, 1)

    from hocr_de_noising_spark.session import get_spark
    from run_trainprep import run_trainprep_job

    spark = get_spark("prep-media-bench", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(CACHE, "prep_media_out")
    t0 = time.time()
    s = run_trainprep_job(spark, d, out, min_quality=0.2, langs=("en",))
    wall = time.time() - t0

    expected_dups = args.media - max(int(args.media * (1.0 - args.dup_frac)), 1)
    res = {
        "metric": "trainprep media-bearing corpus wall clock",
        "value": round(wall, 3),
        "unit": "sec",
        "docs": args.docs,
        "media_rows": args.media,
        "kb_per_media": args.kb,
        "cores": args.cores,
        "docs_per_sec": round(args.docs / wall, 1),
        "media_rows_per_sec": round(args.media / s["stage_secs"]["media_dedup"], 1),
        "media_dups_found": s["media_dups"],
        "media_dups_planted": expected_dups,
        "stage_secs": s["stage_secs"],
        "n_final": s["n_final"],
        "gen_cached_sec": gen_sec,
    }
    print(json.dumps(res))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} trainprep media corpus ({args.docs} docs / "
            f"{args.media} media x {args.kb} KB, local[{args.cores}]): "
            f"end-to-end {res['value']} s = {res['docs_per_sec']} docs/s; "
            f"media stage {res['media_rows_per_sec']} rows/s, "
            f"{s['media_dups']}/{expected_dups} planted exact dups collapsed; "
            f"stage_secs={s['stage_secs']}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
