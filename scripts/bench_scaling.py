"""Two-parallelism-level scaling evidence (north-rule criterion).

No real cluster exists in this sandbox, so — per the driver's
instruction ("N and 4N cores") — the N vs 4N executor comparison is
evidenced by running the identical bench job at local[N] and local[4N]
in fresh JVMs and reporting throughput at both plus scaling efficiency
(= (docs/sec@4N / docs/sec@N) / 4). Appends results to
BENCH/BASELINE.md and prints a JSON summary.

The host is shared (co-tenant load of ~8-12 cores is common — check
/proc/loadavg), so levels default to 4 vs 16 cores (N vs 4N without
oversubscribing the box) and each level runs multiple times interleaved
with the other; the MINIMUM wall time per level (least-contended run)
is reported.

Usage: python scripts/bench_scaling.py [--runs 2] [--levels 4 16]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_bench(cpus: int, pin: bool = False) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if pin:
        # Pin the WHOLE process tree (JVM + python workers, which
        # inherit affinity) to exactly `cpus` cores. Without this the
        # local[N] leg quietly uses ~2N cores — N JVM threads plus N
        # python worker PROCESSES — which deflates the measured N->4N
        # ratio below the true executor-scaling value.
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    load_pre = loadavg()
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    load_post = loadavg()
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            r = json.loads(line)
            # co-tenant load context for load-gating (r2 VERDICT):
            # post-run loadavg minus this bench's own core budget is a
            # (rough) proxy for external steal during the leg
            r["loadavg_pre"] = load_pre
            r["loadavg_post"] = load_post
            r["loadavg_external"] = round(max(0.0, load_post - cpus), 1)
            return r
    raise RuntimeError(f"no JSON from bench.py @ {cpus} cores:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2, help="runs per level (best kept)")
    ap.add_argument("--levels", type=int, nargs=2, default=(4, 16),
                    help="N and 4N core counts")
    ap.add_argument("--pin", action="store_true",
                    help="taskset-pin each leg's process tree to exactly N cores")
    args = ap.parse_args()
    lo, hi = args.levels

    results = {}
    for _ in range(args.runs):
        for cpus in (lo, hi):  # interleaved to decorrelate host-load drift
            r = run_bench(cpus, pin=args.pin)
            best = results.get(cpus)
            if best is None or r["denoise_docs_per_sec"] > best["denoise_docs_per_sec"]:
                results[cpus] = r

    q8, q32 = results[lo]["queries"], results[hi]["queries"]
    n_docs = results[lo]["bench_corpus_docs"]
    # same-variant efficiency (comparing different variants across levels
    # would inflate/deflate the ratio); headline = best variant at 4N
    variants = [k for k in q8 if k.startswith("denoise") and k in q32]
    per_variant = {
        v: round((q8[v] / q32[v]) / (hi / lo), 3) for v in variants
    }
    headline = min(variants, key=lambda v: q32[v])
    thr8 = round(n_docs / q8[headline], 1)
    thr32 = round(n_docs / q32[headline], 1)
    eff = (thr32 / thr8) / (hi / lo)
    # only the sf0.1 relational/trainprep headline queries — denoise
    # variants have their own metric, and the hOCR-ingest / composed
    # dedup-job timings are different corpora whose inclusion would
    # break comparability with earlier rounds' rows (r3 review)
    skip = ("denoise", "hocr_ingest", "dedup_job")
    qtot8 = sum(v for k, v in q8.items() if not k.startswith(skip))
    qtot32 = sum(v for k, v in q32.items() if not k.startswith(skip))

    summary = {
        f"denoise_docs_per_sec_local{lo}": thr8,
        f"denoise_docs_per_sec_local{hi}": thr32,
        "denoise_scaling_efficiency": round(eff, 3),
        "denoise_headline_variant": headline,
        "per_variant_efficiency": per_variant,
        f"headline_queries_sec_local{lo}": round(qtot8, 2),
        f"headline_queries_sec_local{hi}": round(qtot32, 2),
        "loadavg_external": {
            lo: results[lo].get("loadavg_external"),
            hi: results[hi].get("loadavg_external"),
        },
        # wave parity (VERDICT r3 item 6): both legs must run an integer
        # number of scan waves for the ratio to be rounding-free
        "scan_waves": {
            lo: results[lo].get("scan_waves"),
            hi: results[hi].get("scan_waves"),
        },
        "scan_partitions": {
            lo: results[lo].get("scan_partitions"),
            hi: results[hi].get("scan_partitions"),
        },
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    pin_note = ", taskset-pinned" if args.pin else ""
    lines = [
        f"\n## Run {stamp} (levels {lo}/{hi}, best of {args.runs} interleaved runs/level{pin_note})\n",
        f"| metric | local[{lo}] (N) | local[{hi}] (4N) | efficiency |",
        "| --- | --- | --- | --- |",
        f"| de-noise throughput (docs/sec, 200k-doc corpus w/ skew plants; variant={headline}) | {thr8} | {thr32} | **{eff:.3f}** |",
        f"| per-variant efficiency | | | {per_variant} |",
        f"| headline relational queries total (s, sf0.1) | {round(qtot8, 2)} | {round(qtot32, 2)} | |",
        f"| external loadavg after best leg | {results[lo].get('loadavg_external')} | {results[hi].get('loadavg_external')} | |",
        f"| scan waves (partitions) | {results[lo].get('scan_waves')} ({results[lo].get('scan_partitions')}) | {results[hi].get('scan_waves')} ({results[hi].get('scan_partitions')}) | |",
        "",
        "Per-query seconds:",
        "",
        f"| query | local[{lo}] | local[{hi}] |",
        "| --- | --- | --- |",
    ] + [f"| {k} | {q8[k]} | {q32.get(k, '')} |" for k in sorted(q8)]
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
