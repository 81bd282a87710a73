"""media_stage near-dedup at MB-scale payloads: exact-vs-near A/B.

The 500k-doc trainprep run exercises near-dedup at 4 KB payloads; this
bench drives the big-binary corner (VERDICT r2 item 6's risk class):
N media rows of --mb each, planted exact dups (--dup-frac) and
re-encoded near-dups (--near-frac), through media_stage twice — exact
only, then near_dedup=True — reporting wall, rows/s, planted-dup
collapse counts and false merges for each mode.

Usage: python scripts/bench_media_near.py [--media 2000] [--mb 1]
           [--cores 32]
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
sys.path.insert(0, os.path.join(REPO, "jobs"))

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def write_media(n_media: int, mb: float, dup_frac: float, near_frac: float) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hocr_de_noising_spark.operators.multimodal import (
        encode_fake_media,
        encode_fake_media_reencode,
    )

    d = os.path.join(CACHE, f"media_near_{n_media}x{mb}mb")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(13)
    n_near = int(n_media * near_frac)
    n_dup = int(n_media * dup_frac)
    n_unique = n_media - n_dup - n_near
    target = int(mb * 1024 * 1024)
    refs = [f"media://{i:07d}" for i in range(n_media)]
    types = ["image", "audio", "video"]
    rows_types, rows_content = [], []
    for i in range(n_media):
        if i < n_unique:
            src, enc = i, encode_fake_media
        elif i < n_unique + n_dup:
            src, enc = int(rng.integers(0, n_unique)), encode_fake_media
        else:
            src, enc = int(rng.integers(0, n_unique)), encode_fake_media_reencode
        rows_types.append(types[src % 3])
        rows_content.append(enc(refs[src], types[src % 3], target_bytes=target))
    pq.write_table(
        pa.table(
            {"media_ref": refs, "media_type": rows_types, "content": rows_content}
        ),
        os.path.join(d, "media.parquet"),
        row_group_size=64,  # big binary rows: keep row groups splittable
    )
    with open(marker, "w") as f:
        f.write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", type=int, default=2_000)
    ap.add_argument("--mb", type=float, default=1.0)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--near-frac", type=float, default=0.05)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    t0 = time.time()
    d = write_media(args.media, args.mb, args.dup_frac, args.near_frac)
    gen_sec = round(time.time() - t0, 1)

    from hocr_de_noising_spark.session import get_spark
    from run_trainprep import media_stage

    spark = get_spark("media-near-bench", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    media = spark.read.parquet(os.path.join(d, "media.parquet"))
    media.count()  # page-cache warm

    n_near = int(args.media * args.near_frac)
    n_dup = int(args.media * args.dup_frac)
    n_unique = args.media - n_dup - n_near
    res = {"media_rows": args.media, "mb_per_row": args.mb,
           "cores": args.cores, "unique_planted": n_unique,
           "exact_dups_planted": n_dup, "near_dups_planted": n_near,
           "gen_cached_sec": gen_sec}
    for mode, near, vb in (
        ("exact", False, False),
        ("near", True, False),
        ("near_verify", True, True),
    ):
        out = os.path.join(CACHE, f"media_near_out_{mode}")
        if os.path.exists(out):
            shutil.rmtree(out)
        t0 = time.time()
        s = media_stage(spark, media, out, near_dedup=near, verify_bytes=vb)
        wall = time.time() - t0
        res[mode] = {
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(args.media / wall, 1),
            "kept": s["media_kept"],
            "dups_found": s["media_dups"],
        }
    # exact should keep unique+near (misses re-encodes); near should
    # keep exactly the uniques (modulo the documented false-merge floor)
    res["near_recall_on_planted"] = round(
        (res["exact"]["kept"] - res["near"]["kept"]) / max(n_near, 1), 4
    )
    print(json.dumps(res))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n- {stamp} media_stage near A/B ({args.media} x {args.mb} MB, "
            f"local[{args.cores}]): exact {res['exact']['wall_sec']} s "
            f"({res['exact']['rows_per_sec']} rows/s, kept {res['exact']['kept']}), "
            f"near {res['near']['wall_sec']} s ({res['near']['rows_per_sec']} rows/s, "
            f"kept {res['near']['kept']}), near+verify_bytes "
            f"{res['near_verify']['wall_sec']} s (kept "
            f"{res['near_verify']['kept']}); planted {n_unique} unique + {n_dup} exact "
            f"+ {n_near} re-encodes\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
