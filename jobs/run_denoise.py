"""Production batch entry point (SURVEY.md §3.2).

    spark-submit --py-files dist/hocr_de_noising_spark.zip \
        jobs/run_denoise.py --input <path|table> --output <path|table> \
        --manifest <dir> --lexicon <path> [--buckets 256] [--salt 42] \
        [--groups 8] [--variant fused] [--mode drop] [--catalog parquet]

Resumable: re-running with the same run-id + params skips committed
bucket groups via the manifest (S7).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hocr_de_noising_spark.checkpoint import run_denoise_job  # noqa: E402
from hocr_de_noising_spark.params import Params, params_hash  # noqa: E402
from hocr_de_noising_spark.session import get_spark  # noqa: E402
from hocr_de_noising_spark.sources import Catalog  # noqa: E402


def caption_stage(spark, cleaned_dir: str, captions_dir: str) -> dict:
    """Interleaved-curation tail stage: mine media-caption pairs and
    the per-doc multimodal keep-gate from the CLEANED spans output.
    Runs AFTER denoising by design — noise spans must not leak into
    captions, and the gate's text counts must reflect surviving text.
    One pass over the cleaned corpus: map-side explode + a single
    bounded-frame window (see queries/interleaved.py scale notes)."""
    from pyspark.sql import functions as F  # noqa: E402

    from hocr_de_noising_spark.queries.interleaved import (  # noqa: E402
        caption_pairs,
        media_text_stats,
    )

    cleaned = spark.read.parquet(cleaned_dir)
    if "bucket" in cleaned.columns:
        cleaned = cleaned.drop("bucket")
    caps_path = os.path.join(captions_dir, "captions.parquet")
    stats_path = os.path.join(captions_dir, "media_stats.parquet")
    caption_pairs(cleaned).write.mode("overwrite").parquet(caps_path)
    media_text_stats(cleaned).write.mode("overwrite").parquet(stats_path)
    caps_out = spark.read.parquet(caps_path)
    stats_out = spark.read.parquet(stats_path)
    return {
        "captions": caps_out.count(),
        "paired": caps_out.filter(F.col("caption_src") != "none").count(),
        "multimodal_keep": stats_out.filter("multimodal_keep").count(),
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--lexicon", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--salt", type=int, default=42)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--tau-wconf", type=int, default=35)
    ap.add_argument("--mode", choices=("drop", "rewrite"), default="drop")
    ap.add_argument("--variant", choices=("hybrid", "fused", "exploded"), default="fused")
    ap.add_argument("--catalog", choices=("parquet", "iceberg"), default="parquet")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--captions",
        default=None,
        metavar="DIR",
        help="after denoising, also mine media-caption pairs and the"
        " per-doc multimodal keep-gate from the CLEANED spans (OBELICS"
        "-style interleaved curation) into DIR/{captions,media_stats}"
        ".parquet — one extra pass over the (smaller) cleaned output,"
        " map-side + one bounded-frame window",
    )
    ap.add_argument(
        "--approx-stats",
        action="store_true",
        help="sketch-based page percentiles (X2/X3) — the 100 TB default;"
        " exact interpolation is the golden-exact default here",
    )
    args = ap.parse_args(argv)

    params = Params(
        tau_wconf=args.tau_wconf,
        mode=args.mode,
        n_buckets=args.buckets,
        salt=args.salt,
        approx_stats=args.approx_stats,
    )
    spark = get_spark("hocr-denoise-job", cores=args.cores)
    catalog = Catalog(args.catalog)
    docs = catalog.read_docs(spark, args.input)
    lexicon = catalog.read(spark, args.lexicon)
    run_id = args.run_id or f"run-{params_hash(params)}"

    summary = run_denoise_job(
        spark,
        docs,
        lexicon,
        args.output,
        args.manifest,
        params=params,
        run_id=run_id,
        n_groups=args.groups,
        input_lineage=catalog.lineage(spark, args.input),
        variant=args.variant,
    )
    print(
        f"run_id={run_id} params_hash={params_hash(params)} "
        f"groups_run={summary['groups_run']} groups_skipped={summary['groups_skipped']} "
        f"n_docs={summary['n_docs']}"
    )
    if args.captions:
        cs = caption_stage(spark, args.output, args.captions)
        print(
            f"captions={cs['captions']} paired={cs['paired']} "
            f"multimodal_keep={cs['multimodal_keep']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
