"""Composed trainprep at scale (VERDICT r4 item 4): one recorded
end-to-end run at >=500k docs with media AND --decontaminate on,
per-stage walls, and stage-granular resume exercised at that scale
(crash after the dedup sub-job completes, resume, corpus bit-identical
to an un-crashed run).

Corpus (deterministic, cached): n_docs random-word texts with an
exact-dup fraction planted; every 3rd doc carries media refs;
media.parquet plants exact byte dups (dup_frac) AND re-encoded
near-dups (near_frac) that only the perceptual stage can collapse.

Three job executions on the same corpus:
  A  fresh full run (the headline numbers)
  B1 same corpus, new run-id, crash injected after the dedup sub-job's
     last stage (keepers_split) commits
  B2 resume of B1 — must skip gates + all six dedup stages, and B2's
     corpus must equal A's exactly (exceptAll both ways empty)

Usage: python scripts/bench_trainprep_scale.py [--docs 500000]
       [--media 50000] [--kb 4] [--cores 32]
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


def write_corpus(
    n_docs: int,
    n_media: int,
    kb: int,
    dup_frac: float,
    near_frac: float,
    n_emb: int = 0,
    line_bp_frac: float = 0.0,
) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hocr_de_noising_spark.operators.multimodal import (
        encode_fake_media,
        encode_fake_media_reencode,
    )

    suffix = f"x{n_emb}e" if n_emb else ""
    if line_bp_frac:
        suffix += f"x{int(line_bp_frac * 100)}bp"
    d = os.path.join(CACHE, f"prep_scale_{n_docs}x{n_media}x{kb}kb{suffix}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(11)
    # glue words rich in 'e' (the lang gate is an e-ratio heuristic);
    # every other token is per-doc UNIQUE (u<doc>q<pos>), so every
    # 3-gram shingle contains a unique token and cross-doc shingle
    # overlap is exactly zero outside planted dup copies — a tiny
    # closed vocabulary instead makes every doc a weak near-dup of
    # every other and the LSH/df stages grind through hot keys (first
    # 500k attempt stalled exactly there)
    words = np.array(
        [
            "the", "every", "evening", "keeper", "records", "weather",
            "sweeps", "lenses", "tide", "recedes", "beneath", "pier",
            "letters", "envoy", "sealed", "embers", "engine", "severed",
            "generator", "eastern", "merchant", "green", "levels", "herd",
            "settled", "geese", "meadow", "temple", "chamber", "verses",
        ]
    )
    # media: [0, n_unique) unique, then exact dups, then re-encodes
    n_near = int(n_media * near_frac)
    n_exact_dup = int(n_media * dup_frac)
    n_unique = n_media - n_exact_dup - n_near
    refs = [f"media://{i:07d}" for i in range(n_media)]
    types = ["image", "audio", "video"]
    target = kb * 1024
    # all items tiled to target_bytes (zero-padding instead would fill
    # the trailing signature bands of EVERY item with the same zeros
    # and manufacture false near merges — measured on the first smoke)
    contents, mtypes = [], []
    for i in range(n_media):
        if i < n_unique:
            src, enc = i, encode_fake_media
        elif i < n_unique + n_exact_dup:
            src, enc = int(rng.integers(0, n_unique)), encode_fake_media
        else:  # re-encode: bytes differ, perceptual signature near
            src, enc = int(rng.integers(0, n_unique)), encode_fake_media_reencode
        mtypes.append(types[src % 3])
        contents.append(enc(refs[src], types[src % 3], target_bytes=target))
    # small row groups so Spark's scan can split the single file into
    # ~core-count partitions (one huge row group caps map parallelism)
    pq.write_table(
        pa.table({"media_ref": refs, "media_type": mtypes, "content": contents}),
        os.path.join(d, "media.parquet"),
        row_group_size=2048,
    )

    # 90% unique, 8% exact dups (dedup's work), 2% partial copies that
    # share a 12-token run with a base doc — jaccard ~0.07, BELOW the
    # 0.2 dedup threshold, so they survive dedup and are exactly the
    # train/eval 5-gram leakage the decontaminate stage exists to flag
    n_unique_docs = int(n_docs * 0.9)
    n_partial = int(n_docs * 0.02)
    word_idx = rng.integers(0, len(words), size=(n_unique_docs, 30))
    # unique tokens are LETTER-ONLY (hex digits translated to letters):
    # the scrub stage masks digit runs to <NUM>, which would collapse
    # digit-bearing "unique" tokens across docs and re-create the
    # cross-doc shingle overlap this corpus design eliminates
    hex2alpha = str.maketrans("0123456789abcdef", "bcdfghjklmnprstv")
    uid = [f"{i:x}".translate(hex2alpha) for i in range(n_unique_docs)]
    pos = [f"{j:x}".translate(hex2alpha) for j in range(64)]
    base = [
        " ".join(
            t for j, w in enumerate(words[r]) for t in (w, f"u{uid[i]}q{pos[j]}")
        )
        for i, r in enumerate(word_idx)
    ]
    partial_src = rng.integers(0, n_unique_docs, size=n_partial)
    partials = [
        " ".join(
            base[int(s)].split(" ")[:12]
            + [
                t
                for j, w in enumerate(words[rng.integers(0, len(words), size=24)])
                for t in (w, f"p{uid[k]}q{pos[j]}")
            ]
        )
        for k, s in enumerate(partial_src)
    ]
    texts = (
        base
        + [
            base[int(x)]
            for x in rng.integers(
                0, n_unique_docs, size=n_docs - n_unique_docs - n_partial
            )
        ]
        + partials
    )
    if line_bp_frac:
        # planted cross-doc boilerplate LINES (the line_dedup stage's
        # ground truth): every stride-th doc gets one of two site-wide
        # footer lines appended on its own line. Deliberately violates
        # the no-cross-doc-shingle corpus design — these lines MUST be
        # stripped by line_dedup before the shingle stages, or the LSH
        # df caps grind on them; note a dup copy may gain a bp line its
        # source lacks, so byte-exact dedup only re-aligns them AFTER
        # the strip (the CCNet ordering argument, measured).
        bp_lines = [
            "subscribe to the evening newsletter delivered every week",
            "the weather telegraph renders every evening report here",
        ]
        stride = max(1, int(round(1.0 / line_bp_frac)))
        texts = [
            t + "\n" + bp_lines[i % 2] if i % stride == 0 else t
            for i, t in enumerate(texts)
        ]
    media_refs: list[list[str] | None] = [
        [refs[int(x)] for x in rng.integers(0, n_media, size=1 + i % 2)]
        if i % 3 == 0
        else None
        for i in range(n_docs)
    ]
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
        row_group_size=8192,
    )
    if n_emb:
        # SemDeDup input: embeddings for a subset of the UNIQUE-text
        # docs (the semantic stage only sees dedup keepers, and the
        # unique range is keeper-by-construction). 5% of embedding
        # holders are near-copies (cosine >= ~0.999 >> SEM_COS_MIN 0.9)
        # of an earlier holder — the planted semantic-dup ground truth;
        # everyone else gets an independent gaussian (64-dim random
        # pairs concentrate near cosine 0, far below threshold).
        from hocr_de_noising_spark.queries.trainprep import ANN_DIM

        n_unique_for_emb = int(n_docs * 0.9)
        emb_ids = np.sort(
            rng.choice(n_unique_for_emb, size=n_emb, replace=False)
        )
        n_sem_dup = int(n_emb * 0.05)
        vecs = rng.standard_normal((n_emb, ANN_DIM))
        dup_pos = rng.choice(
            np.arange(n_emb // 2, n_emb), size=n_sem_dup, replace=False
        )
        src_pos = rng.integers(0, n_emb // 2, size=n_sem_dup)
        vecs[dup_pos] = vecs[src_pos] + 0.02 * rng.standard_normal(
            (n_sem_dup, ANN_DIM)
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(emb_ids, type=pa.int64()),
                    "embedding": pa.array(
                        [row for row in vecs.astype(np.float32)],
                        type=pa.list_(pa.float32()),
                    ),
                }
            ),
            os.path.join(d, "embeddings.parquet"),
            row_group_size=8192,
        )
    with open(marker, "w") as f:
        f.write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--media", type=int, default=50_000)
    ap.add_argument("--kb", type=int, default=4)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--near-frac", type=float, default=0.05)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--emb", type=int, default=0,
        help="embeddings for N docs; enables the semantic_dedup stage",
    )
    ap.add_argument(
        "--shard-budget", type=int, default=None,
        help="stamp equal-token shards onto the final corpus",
    )
    ap.add_argument(
        "--line-bp-frac", type=float, default=0.0,
        help="plant a site-wide boilerplate line on this fraction of "
             "docs and enable the line_dedup stage",
    )
    ap.add_argument(
        "--semantic-nlist", type=int, default=None,
        help="cells for the semantic quantizer (default emb/24, min 8)",
    )
    args = ap.parse_args()

    t0 = time.time()
    d = write_corpus(
        args.docs, args.media, args.kb, args.dup_frac, args.near_frac,
        n_emb=args.emb, line_bp_frac=args.line_bp_frac,
    )
    gen_sec = round(time.time() - t0, 1)

    from hocr_de_noising_spark.session import get_spark
    from run_trainprep import run_trainprep_job

    spark = get_spark("prep-scale-bench", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    kwargs = dict(
        min_quality=0.2,
        langs=("en",),
        jaccard_threshold=0.2,
        decontaminate=True,
        media_near_dedup=True,
    )
    if args.shard_budget:
        kwargs["shard_budget"] = args.shard_budget
    if args.line_bp_frac:
        kwargs["line_dedup"] = True
    if args.emb:
        kwargs["semantic_dedup"] = True
        # SemDeDup's k-grows-with-n rule: cells must stay under
        # EMBED_BLOCK_CAP or sub-block splits start costing recall
        kwargs["semantic_nlist"] = args.semantic_nlist or max(
            8, args.emb // 24
        )

    # A: headline full run
    out_a = os.path.join(CACHE, "prep_scale_out_a")
    man_a = os.path.join(CACHE, "prep_scale_man_a")
    for p in (out_a, man_a):
        if os.path.exists(p):
            import shutil

            shutil.rmtree(p)
    t0 = time.time()
    s_a = run_trainprep_job(
        spark, d, out_a, manifest_dir=man_a, run_id="scaleA", **kwargs
    )
    wall_a = time.time() - t0

    # B1: crash after the dedup sub-job's final stage commits
    out_b = os.path.join(CACHE, "prep_scale_out_b")
    man_b = os.path.join(CACHE, "prep_scale_man_b")
    for p in (out_b, man_b):
        if os.path.exists(p):
            import shutil

            shutil.rmtree(p)
    crashed = False
    t0 = time.time()
    try:
        run_trainprep_job(
            spark, d, out_b, manifest_dir=man_b, run_id="scaleB",
            fail_after_stage="keepers_split", **kwargs,
        )
    except RuntimeError as e:
        crashed = "injected crash" in str(e)
    wall_b1 = time.time() - t0

    # B2: resume — gates + all six dedup stages must be skipped
    t0 = time.time()
    s_b = run_trainprep_job(
        spark, d, out_b, manifest_dir=man_b, run_id="scaleB", **kwargs
    )
    wall_b2 = time.time() - t0

    a = spark.read.parquet(os.path.join(out_a, "corpus"))
    b = spark.read.parquet(os.path.join(out_b, "corpus"))
    identical = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    res = {
        "metric": "trainprep at-scale wall clock (media+decon+near)",
        "value": round(wall_a, 1),
        "unit": "sec",
        "docs": args.docs,
        "media_rows": args.media,
        "cores": args.cores,
        "docs_per_sec": round(args.docs / wall_a, 1),
        "stage_secs": s_a["stage_secs"],
        "dedup_stage_secs": s_a["dedup"]["stage_secs"],
        "n_final": s_a["n_final"],
        "n_contaminated": s_a.get("n_contaminated"),
        "media_kept": s_a.get("media_kept"),
        "media_dups": s_a.get("media_dups"),
        # planted ground truth: perfect near+exact dedup keeps exactly
        # the unique items; kept < unique means false near merges,
        # kept > unique means missed dups
        "media_unique_planted": args.media
        - int(args.media * args.dup_frac)
        - int(args.media * args.near_frac),
        "shard_budget": args.shard_budget,
        "line_bp_frac": args.line_bp_frac,
        "n_after_line_dedup": s_a.get("n_after_line_dedup"),
        "lines_removed": s_a.get("lines_removed"),
        "emb_rows": args.emb,
        "semantic_nlist": kwargs.get("semantic_nlist"),
        "semantic_pruned": s_a.get("semantic_pruned"),
        # planted ground truth: 5% of embedding holders are
        # near-copies; perfect pruning removes exactly those
        "semantic_dups_planted": int(args.emb * 0.05) if args.emb else 0,
        "crash_injected": crashed,
        "resume_skipped": s_b["stages_skipped"],
        "resume_dedup_skipped": s_b["dedup"]["stages_skipped"],
        "resume_wall_sec": round(wall_b2, 1),
        "crashed_run_wall_sec": round(wall_b1, 1),
        "resumed_corpus_identical": identical,
        "gen_cached_sec": gen_sec,
    }
    print(json.dumps(res))
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        sem = (
            f" / {args.emb} emb (semantic nlist="
            f"{kwargs.get('semantic_nlist')}, pruned="
            f"{res['semantic_pruned']} of {res['semantic_dups_planted']} planted)"
            if args.emb
            else ""
        )
        f.write(
            f"\n- {stamp} trainprep SCALE run ({args.docs} docs / "
            f"{args.media} media{sem}, media_near+decon"
            f"{'+semantic' if args.emb else ''} ON, local[{args.cores}]): "
            f"end-to-end {res['value']} s = {res['docs_per_sec']} docs/s; "
            f"n_final={res['n_final']}, contaminated={res['n_contaminated']}, "
            f"media_kept={res['media_kept']}; crash-after-dedup resume skipped "
            f"{res['resume_skipped']}+{res['resume_dedup_skipped']} in "
            f"{res['resume_wall_sec']} s, corpus identical: {identical}; "
            f"stage_secs={res['stage_secs']} dedup={res['dedup_stage_secs']}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
