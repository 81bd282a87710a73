"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the flagship de-noising pipeline on the 200k-doc interleaved-spans
bench corpus (FIXTURES.md §2 incl. 3 pathological 100k-span skew
plants) plus headline relational/trainprep queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), on
local[$SPARK_GRAFT_CPUS] (default 32).

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "denoise_docs_per_sec": ...}

Scaling-efficiency evidence across two parallelism levels is produced
by scripts/bench_scaling.py (fresh JVM per level) into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hocr_de_noising_spark.fixtures.hocr import write_hocr_corpus  # noqa: E402
from hocr_de_noising_spark.fixtures.spans import SIZES, write_corpus  # noqa: E402
from hocr_de_noising_spark.operators.hocr import (  # noqa: E402
    hocr_soundness_probe,
    parse_hocr,
    parse_hocr_auto,
)
from hocr_de_noising_spark.operators.pipeline import (  # noqa: E402
    denoise_exploded,
    denoise_fused,
    denoise_hybrid,
)
from hocr_de_noising_spark.queries import QUERIES  # noqa: E402
from hocr_de_noising_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "cache"
)
# representative headline queries across operator families;
# agg_percentile (exact sort-agg) and agg_approx_percentile (sketch)
# run back-to-back as the same-session A/B the r2 VERDICT asked for
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "join_inner",
    "join_asof",
    "agg_percentile",
    "agg_approx_percentile",
    "window_running_sum",
    "geom_outliers",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce",
    "stream_session",
    "quality_repetition",
    "decontaminate_overlap",
    "dedup_media_near",
    "ann_ivf_fixed",
    "dedup_semantic",
    # r7 web/corpus family headline keys (controls list unchanged)
    "html_main_content",
    "dedup_lines",
    # late r7: interleaved caption mining (bounded-frame window)
    "media_caption_pair",
    # late r7: target-aware selection + training-sequence packing
    "dsir_select",
    "pack_sequences",
]
# ingest corpus: realistic Tesseract-scale pages (~300 words / ~26 KB)
HOCR_DOCS = 8_000


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def calibrate_mpb(spark, path: str, cpus: int, waves: int = 2) -> tuple[int, int]:
    """Binary-search ``spark.sql.files.maxPartitionBytes`` until the
    scan of ``path`` plans EXACTLY ``waves * cpus`` partitions, so the
    map stage runs an integer number of task waves (VERDICT r3 item 6).
    Monotone: larger split bytes → fewer partitions. Planning-only
    (getNumPartitions runs no job). Falls back to the nearest achieved
    count if file-packing granularity can't hit the target exactly."""
    target = waves * cpus
    lo, hi = 1 << 16, 1 << 31
    best_mpb, best_n = None, None
    for _ in range(26):
        mid = (lo + hi) // 2
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mid))
        n = spark.read.parquet(path).rdd.getNumPartitions()
        if best_n is None or abs(n - target) < abs(best_n - target):
            best_mpb, best_n = mid, n
        if n == target:
            break
        if n > target:
            lo = mid + 1
        else:
            hi = mid - 1
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(best_mpb))
    return best_mpb, best_n


# Keys whose implementation changes rarely — the in-session noise
# controls (VERDICT r6 item 3): if THESE inflate vs the previous
# recorded BENCH_r{N}.json, the session is slow, not the code. Kept to
# operator families untouched since r2-r4; update only when one is
# deliberately rewritten.
CONTROL_KEYS = [
    "tpch_q1",
    "tpch_q3",
    "join_inner",
    "join_asof",
    "agg_percentile",
    "window_running_sum",
    "geom_outliers",
    "dedup_simhash",
    "knn_bruteforce",
    "stream_session",
]


def _loadavg() -> list[float]:
    try:
        return [float(x) for x in open("/proc/loadavg").read().split()[:3]]
    except OSError:  # pragma: no cover - non-Linux fallback
        return []


def _membw_gbps() -> float | None:
    """One quick Spark-free memory-bandwidth reading (16 pinned procs).
    The box's own ceiling: a low reading here attributes a slow bench
    session to co-tenant load, not to the code under test."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from membw_probe import run_level

        return round(run_level(16, 128, 4), 2)
    except Exception:  # probe failure must never fail the bench
        return None


def _noise_verdict(timings: dict[str, float]) -> dict:
    """Compare this session's CONTROL_KEYS against the newest recorded
    BENCH_r{N}.json so the artifact carries its own inflation verdict
    (VERDICT r6 item 3 — the r6 driver session read 1.46x r5 with no
    way to attribute it from the file alone)."""
    import glob
    import statistics

    repo = os.path.dirname(os.path.abspath(__file__))
    hist = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if not hist:
        return {"inflation_verdict": "no_history"}
    try:
        rec = json.load(open(hist[-1]))
        # the driver wraps bench stdout under "parsed"
        prev = rec.get("parsed", rec)["queries"]
    except Exception:
        return {"inflation_verdict": "no_history"}
    controls = {}
    for k in CONTROL_KEYS:
        if k in prev and k in timings and prev[k] > 0:
            controls[k] = {
                "prev": prev[k],
                "now": timings[k],
                "ratio": round(timings[k] / prev[k], 3),
            }
    if not controls:
        return {"inflation_verdict": "no_history"}
    med = statistics.median(c["ratio"] for c in controls.values())
    verdict = "in_band"
    if med > 1.2:
        verdict = "inflated"
    elif med < 0.8:
        verdict = "deflated"
    return {
        "prev_bench": os.path.basename(hist[-1]),
        "control_keys": controls,
        "control_ratio_median": round(med, 3),
        "inflation_verdict": verdict,
    }


def main() -> None:
    # Spark-free noise baseline FIRST (no JVM competing for the bus)
    loadavg_start = _loadavg()
    membw_start = _membw_gbps()

    t_gen = time.time()
    bench_dir = write_corpus(CACHE_DIR, "bench")  # cached after first run
    hocr_dir = write_hocr_corpus(CACHE_DIR, HOCR_DOCS)
    gen_sec = time.time() - t_gen

    # size input splits to the session's parallelism (~2 waves of map
    # tasks), exactly as a cluster job would set maxPartitionBytes for
    # its executor count — a FIXED split size runs 2.4 ragged waves at
    # one level and 10 at another, and the ragged tail is pure lost
    # efficiency at the higher level (r3 measurement)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(bench_dir, "docs.parquet"))
        for f in fs
    )
    mpb = max(2 * 1024 * 1024, int(corpus_bytes / (1.75 * CPUS)))
    spark = get_spark(
        "bench",
        cores=CPUS,
        shuffle_partitions=max(CPUS * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(mpb),
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # wave parity (VERDICT r3 item 6): calibrate the split size so the
    # corpus scan runs an EXACT integer number of task waves. The ratio
    # rule above lands near 1.75 waves, and the leftover fraction is a
    # ragged tail whose relative cost differs between parallelism
    # levels — the source of the >1.0 efficiency readings r3 documented
    # (split-granularity rounding disadvantaging the small leg).
    mpb, scan_parts = calibrate_mpb(
        spark, os.path.join(bench_dir, "docs.parquet"), CPUS, waves=2
    )

    docs = spark.read.parquet(os.path.join(bench_dir, "docs.parquet"))
    lexicon = spark.read.parquet(os.path.join(bench_dir, "lexicon.parquet"))
    lex_tokens = [r.token for r in lexicon.select("token").collect()]
    n_docs = SIZES["bench"]

    # warmup: JVM codegen AND every Python worker (repartition to one
    # slice per core so ALL workers import pandas/numpy and build the
    # lexicon index before timing starts)
    warm = docs.limit(max(CPUS * 200, 2000)).repartition(CPUS)
    _noop_write(denoise_fused(warm, lex_tokens))
    _noop_write(denoise_exploded(warm, lexicon))
    # page-cache warm: touch every timed input once so the first timed
    # query measures steady-state compute, not cold disk (the corpus is
    # re-read by all three variants anyway; only the first would pay)
    docs.count()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    timings: dict[str, float] = {}

    t0 = time.time()
    _noop_write(denoise_hybrid(docs, lexicon, lex_tokens))
    timings["denoise_hybrid"] = round(time.time() - t0, 3)

    t0 = time.time()
    _noop_write(denoise_fused(docs, lex_tokens))
    timings["denoise_fused"] = round(time.time() - t0, 3)

    t0 = time.time()
    _noop_write(denoise_exploded(docs, lexicon))
    timings["denoise_exploded"] = round(time.time() - t0, 3)

    for name in HEADLINE:
        t0 = time.time()
        _noop_write(QUERIES[name]["fn"](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # S2/X1 ingest A/B (VERDICT r2 item 4): raw hOCR pages → word
    # records, JVM auto-routed vs tolerant-Python, same corpus.
    # Warm both paths first — the JVM plan's regex codegen compile is
    # a one-off that would otherwise dominate a 2s measurement.
    hocr_pages = spark.read.parquet(os.path.join(hocr_dir, "pages.parquet"))
    hocr_pages.count()  # page-cache warm, same as the other inputs
    hocr_warm = hocr_pages.limit(500)
    _noop_write(parse_hocr_auto(hocr_warm, triage="checkpoint"))
    _noop_write(parse_hocr(hocr_warm))
    malformed_frac = hocr_pages.filter(
        ~hocr_soundness_probe("hocr")
    ).count() / float(HOCR_DOCS)
    t0 = time.time()
    # triage="checkpoint": probe once + memory-speed second scan — the
    # right mode when the corpus fits executor storage (parity with the
    # Python path; inline mode pays the probe twice and reads ~1.5x)
    _noop_write(parse_hocr_auto(hocr_pages, triage="checkpoint"))
    timings["hocr_ingest_jvm_auto"] = round(time.time() - t0, 3)
    t0 = time.time()
    _noop_write(parse_hocr(hocr_pages))
    timings["hocr_ingest_python"] = round(time.time() - t0, 3)

    # composed dedup job at SF_DIR (VERDICT r2 item 5): exact → LSH →
    # jaccard-verify → components → keepers, counted from written output
    from jobs.run_dedup import run_dedup_job

    dedup_out = os.path.join(CACHE_DIR, "dedup_bench_out")
    t0 = time.time()
    dedup_counts = run_dedup_job(spark, SF_DIR, dedup_out)
    timings["dedup_job"] = round(time.time() - t0, 3)

    denoise_variants = {k: v for k, v in timings.items() if k.startswith("denoise")}
    best_variant = min(denoise_variants, key=denoise_variants.get)
    best_denoise = denoise_variants[best_variant]
    total = round(sum(timings.values()), 3)
    spark.stop()
    noise = {
        "loadavg_start": loadavg_start,
        "loadavg_end": _loadavg(),
        "membw_gbps_start": membw_start,
        "membw_gbps_end": _membw_gbps(),  # Spark stopped — box-only
        **_noise_verdict(timings),
    }
    print(
        json.dumps(
            {
                "metric": "hocr-denoise+headline-queries wall clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cores": CPUS,
                "max_partition_bytes": mpb,
                "scan_partitions": scan_parts,
                "scan_waves": round(scan_parts / CPUS, 2),
                "denoise_docs_per_sec": round(n_docs / best_denoise, 1),
                "denoise_best_variant": best_variant,
                "bench_corpus_docs": n_docs,
                "corpus_gen_cached_sec": round(gen_sec, 3),
                "hocr_corpus_pages": HOCR_DOCS,
                "hocr_malformed_frac": round(malformed_frac, 5),
                "hocr_ingest_jvm_docs_per_sec": round(
                    HOCR_DOCS / timings["hocr_ingest_jvm_auto"], 1
                ),
                "hocr_ingest_python_docs_per_sec": round(
                    HOCR_DOCS / timings["hocr_ingest_python"], 1
                ),
                "dedup_job_counts": dedup_counts,
                "noise_controls": noise,
            }
        )
    )


if __name__ == "__main__":
    main()
