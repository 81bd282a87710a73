"""Binary-heavy multimodal bench (VERDICT r2 item 6).

Generates a media corpus with MB-scale binary rows via the FAKE codec
(operators/multimodal.py), then measures the decode / feature-extract
mapInPandas stages and the Arrow batch shape (rows and bytes per batch)
at several ``spark.sql.execution.arrow.maxRecordsPerBatch`` settings.

The point being demonstrated: Arrow batching is ROW-COUNT based, so
with B-byte rows a batch holds maxRecordsPerBatch x B bytes — for 4 MB
media rows the session default of 128 records/batch would build 512 MB
Arrow buffers per worker. Binary-heavy stages must size the batch by
bytes: maxRecordsPerBatch ~= target_batch_bytes / row_bytes.

Appends a results section to BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/bench_multimodal.py [--rows 256] [--mb 4]
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

CACHE = os.path.join(REPO, "tests", "fixtures", "cache")


def write_media_corpus(n_rows: int, mb_per_row: float) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hocr_de_noising_spark.operators.multimodal import encode_fake_media

    d = os.path.join(CACHE, f"media_{n_rows}x{mb_per_row}mb")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    target = int(mb_per_row * 1024 * 1024)
    types = ["image", "audio", "video"]
    refs = [f"media://{i:06d}" for i in range(n_rows)]
    tbl = pa.table(
        {
            "media_ref": refs,
            "media_type": [types[i % 3] for i in range(n_rows)],
            "content": [
                encode_fake_media(r, types[i % 3], target_bytes=target)
                for i, r in enumerate(refs)
            ],
        }
    )
    # one row per row group: each MB-scale row is its own scan split
    pq.write_table(tbl, os.path.join(d, "media.parquet"), row_group_size=8)
    with open(marker, "w") as f:
        f.write("ok")
    return d


def batch_shape_probe(df):
    """mapInPandas stage that reports (rows, bytes) per Arrow batch it
    actually received — direct evidence of the batch-sizing behavior."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "batch_rows": [len(pdf)],
                    "batch_bytes": [int(sum(len(bytes(c)) for c in pdf["content"]))],
                }
            )

    return df.mapInPandas(run, schema="batch_rows int, batch_bytes long")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    t0 = time.time()
    d = write_media_corpus(args.rows, args.mb)
    gen_sec = round(time.time() - t0, 1)

    from hocr_de_noising_spark.operators.multimodal import (
        decode_media,
        extract_features,
        sample_frames,
    )
    from hocr_de_noising_spark.session import get_spark

    results: dict = {
        "rows": args.rows,
        "mb_per_row": args.mb,
        "gen_cached_sec": gen_sec,
        "per_batch_setting": {},
    }
    total_mb = args.rows * args.mb

    # first three legs disable the byte cap so the ROW-COUNT variable is
    # actually isolated (with the session default 16m byte bound, 16-
    # and 128-record legs would silently measure identical 4-row
    # batches — r3 review); the last leg is the production default
    # showing the byte bound doing its job
    settings = [(2, "1g"), (16, "1g"), (128, "1g"), (128, "16m")]
    for max_rec, max_bytes in settings:
        spark = get_spark(
            f"mmbench-{max_rec}-{max_bytes}",
            cores=args.cores,
            arrow_max_records_per_batch=max_rec,
            arrow_max_bytes_per_batch=max_bytes,
            extra_conf={
                # one scan split per row group so all cores pull rows
                "spark.sql.files.maxPartitionBytes": "8m",
                "spark.sql.files.openCostInBytes": "1m",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        media = spark.read.parquet(os.path.join(d, "media.parquet"))
        media.count()  # page-cache warm

        # observed Arrow batch shape
        shapes = batch_shape_probe(media).toPandas()
        max_batch_mb = round(shapes["batch_bytes"].max() / 1e6, 1)

        t0 = time.time()
        decode_media(media).write.format("noop").mode("overwrite").save()
        dec = time.time() - t0
        t0 = time.time()
        extract_features(media).write.format("noop").mode("overwrite").save()
        feat = time.time() - t0
        t0 = time.time()
        sample_frames(media).write.format("noop").mode("overwrite").save()
        frames = time.time() - t0

        results["per_batch_setting"][f"{max_rec} rec / {max_bytes} bytes"] = {
            "max_batch_mb_observed": max_batch_mb,
            "max_batch_rows_observed": int(shapes["batch_rows"].max()),
            "decode_sec": round(dec, 2),
            "decode_mb_per_sec": round(total_mb / dec, 1),
            "features_sec": round(feat, 2),
            "frames_sec": round(frames, 2),
        }
        spark.stop()

    print(json.dumps(results))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        f"\n## Multimodal binary-heavy bench {stamp} "
        f"({args.rows} rows x {args.mb} MB fake-codec media, {args.cores} cores)\n",
        "| maxRecordsPerBatch / maxBytesPerBatch | max Arrow batch observed | decode | decode MB/s | features | frame-sample |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for k, v in results["per_batch_setting"].items():
        lines.append(
            f"| {k} | {v['max_batch_rows_observed']} rows / {v['max_batch_mb_observed']} MB "
            f"| {v['decode_sec']}s | {v['decode_mb_per_sec']} | {v['features_sec']}s "
            f"| {v['frames_sec']}s |"
        )
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
