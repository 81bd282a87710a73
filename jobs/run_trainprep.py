"""End-to-end training-data preparation job — the full LLM-corpus
shape the brief's pipeline operators exist for, composed from the
oracle-checked registry stages:

  1. scrub          (text_scrub     — PII-shape masking, whitespace)
  2. quality gate   (quality_score  — length/alpha/stopword heuristics)
  3. language gate  (lang_id        — n-gram heuristic)
  4. line dedup     (--line-dedup   — CCNet repeated-line strip)
  5. dedup          (jobs/run_dedup — exact → LSH → verify → components)
  6. decontaminate  (--decontaminate — train/eval 5-gram leakage report)
  7. media dedup    (auto on media.parquet — exact + optional near-dup)
  8. semantic dedup (--semantic-dedup — SemDeDup; --semantic-imi takes
                     the O(sqrt(nlist)) product-quantizer assignment)
  9. DSIR selection (--dsir-target/--dsir-keep — importance top-k
                     toward a target corpus; --dsir-fast-hash)
 10. split + shard  (sample_split; --shard-budget equal-token shards)
 11. pack manifest  (--pack-seq-len — fixed-length training-sequence
                     layout over the written corpus)

Stage 1-3 output is MATERIALIZED to parquet (documents.parquet layout)
and the dedup job runs against that directory — the same staging a
100 TB run would use (each gate is a cheap map-side pass; dedup is the
expensive multi-join stage and should only ever see surviving docs).

    spark-submit --py-files dist/hocr_de_noising_spark.zip \
        jobs/run_trainprep.py --input <sf_dir> --output <dir> \
        [--min-quality 0.5] [--langs en] [--jaccard-threshold 0.2]

Outputs under --output: filtered/ (scrubbed+gated documents.parquet),
dedup/ (the dedup job's stage outputs), corpus/ (final rows:
doc_id, text, lang, split — one row per kept doc).

Media (VERDICT r3 item 4): when the input dir carries a
``media.parquet`` table (media_ref, media_type, content binary) and
documents carry a ``media_refs array<string>`` column, the job also
runs a media stage — fake-codec decode → sha256 fingerprint → exact
media dedup (min media_ref per digest is canonical) — writes
media/meta (kept items' metadata) + media/ref_map (every ref →
canonical), and the final corpus carries each doc's ``media_refs``
REMAPPED to canonical refs, order preserved. Binary payloads never
flow through the text dedup joins; only refs and digests shuffle.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hocr_de_noising_spark.operators.multimodal import decode_media  # noqa: E402
from hocr_de_noising_spark.queries.trainprep import (  # noqa: E402
    decon_overlap,
    lang_exprs,
    quality_exprs,
    scrub_exprs,
)
from hocr_de_noising_spark.queries.util import load  # noqa: E402
from hocr_de_noising_spark.session import get_spark  # noqa: E402
from hocr_de_noising_spark.stage_manifest import (  # noqa: E402
    StageManifest,
    StageRunner,
    params_hash,
)
from jobs.run_dedup import run_dedup_job  # noqa: E402


def gate_stage(docs, min_quality: float, langs: tuple[str, ...]):
    """Stages 1-3 as ONE map-side projection of a single documents
    scan: every gate expression (scrub/quality/lang) is a pure Column
    over ``text``, stacked via select — zero joins, zero shuffles
    (VERDICT r3 item 1: composing the three registry DataFrames via
    doc_id equi-joins planned 3 full-corpus shuffle joins, because
    Catalyst does not collapse self-equi-joins of the same table).
    Output is the documents.parquet layout the dedup job consumes."""
    ex = {**scrub_exprs(), **quality_exprs(), **lang_exprs()}
    media_cols = ["media_refs"] if "media_refs" in docs.columns else []
    return (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            "source",
            ex["scrubbed"].alias("text"),
            ex["quality"].alias("quality"),
            ex["pred_lang"].alias("lang"),
            *media_cols,
        )
        .filter(
            (F.col("quality") >= min_quality) & F.col("lang").isin(list(langs))
        )
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.length("text").cast("int").alias("n_chars"),
            *media_cols,
        )
    )


def media_stage(spark, media, media_out_dir: str, near_dedup: bool = False,
                verify_bytes: bool = False) -> dict:
    """Media dedup over opaque binary content: fake-codec decode
    (``operators/multimodal.decode_media`` — the Arrow-batched stage a
    real codec would replace) → sha256 digest → canonical ref = min
    media_ref per digest. Writes

      media_out_dir/meta     kept items' metadata (one row per unique
                             digest; undecodable items kept as-is)
      media_out_dir/ref_map  (media_ref, canonical_ref) for EVERY input
                             ref — the join key for remapping documents

    ``near_dedup=True`` (VERDICT r4 item 3) additionally collapses
    NEAR-duplicates the byte hash misses (re-encoded/resized copies):
    the decode pass's perceptual band signature (``psig``) feeds the
    same banded-LSH cap/salt core as ``dedup_media_near``; verified
    pairs (full-signature L1 ≤ threshold) among the exact-dedup
    survivors are clustered with O(log n) star connected components,
    and each exact canonical is re-pointed at its cluster minimum, so
    ref_map composes exact ∘ near in one map.

    Binary payloads stay in the decode mapInPandas stage; only refs +
    digests + ≤8-int signatures reach any shuffle, so the stage holds
    at media volumes where content is TBs. Returns counts."""
    from hocr_de_noising_spark.queries.media_near import psig_near_pairs
    from hocr_de_noising_spark.queries.trainprep import connected_components

    # materialize the decode ONCE: the mapInPandas pass scans every
    # binary payload and hashes it — the dominant cost at TB media
    # volumes — and the derivations below reference it from four plan
    # branches Catalyst will NOT collapse (r4 review). The decoded
    # metadata table is tiny (no binary column), so parquet it first
    # and build canon/ref_map/meta from the written table.
    decoded_path = os.path.join(media_out_dir, "decoded")
    decode_media(media).write.mode("overwrite").parquet(decoded_path)
    decoded = spark.read.parquet(decoded_path)
    canon = (
        decoded.filter("decode_ok")
        .groupBy("sha256")
        .agg(F.min("media_ref").alias("canonical_ref"))
    )
    ref_map = (
        decoded.filter("decode_ok")
        .select("media_ref", "sha256")
        .join(canon, "sha256")
        .select("media_ref", "canonical_ref")
        # undecodable media cannot be fingerprinted — map to itself
        .unionByName(
            decoded.filter(~F.col("decode_ok")).select(
                "media_ref", F.col("media_ref").alias("canonical_ref")
            )
        )
    )
    if near_dedup:
        # near clusters over the EXACT-dedup survivors only (every
        # exact dup already maps to its canonical, so clustering the
        # survivors covers the whole input at 1/dup-factor the size)
        sigs = (
            decoded.filter("decode_ok")
            .join(canon.select(F.col("canonical_ref").alias("media_ref")), "media_ref")
            .filter(F.size("psig") > 0)
            # verify_bytes (VERDICT r5 item 4): carry the fine
            # unquantized band-sum signature so psig_near_pairs gates
            # every candidate pair on the byte-derived verify chain —
            # planted psig collisions between unrelated payloads are
            # blocked instead of false-merged
            .select("media_ref", "psig", *(["vsig"] if verify_bytes else []))
        )
        pairs = psig_near_pairs(sigs).select(
            F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
        )
        comps = connected_components(pairs, algorithm="star")
        near_map = comps.filter(F.col("doc_id") != F.col("component")).select(
            F.col("doc_id").alias("canonical_ref"),
            F.col("component").alias("near_ref"),
        )
        ref_map = ref_map.join(near_map, "canonical_ref", "left").select(
            "media_ref",
            F.coalesce("near_ref", "canonical_ref").alias("canonical_ref"),
        )
    ref_map.write.mode("overwrite").parquet(os.path.join(media_out_dir, "ref_map"))
    ref_map = spark.read.parquet(os.path.join(media_out_dir, "ref_map"))
    meta = decoded.join(
        ref_map.filter(F.col("media_ref") == F.col("canonical_ref")).select("media_ref"),
        "media_ref",
    )
    meta.write.mode("overwrite").parquet(os.path.join(media_out_dir, "meta"))
    n_in = decoded.count()
    n_kept = spark.read.parquet(os.path.join(media_out_dir, "meta")).count()
    return {"media_in": n_in, "media_kept": n_kept, "media_dups": n_in - n_kept}


def remap_media_refs(docs, ref_map):
    """Rewrite each doc's ``media_refs`` array to canonical refs, order
    preserved: posexplode → equi join on media_ref → re-collect by
    position. Docs with no media pass through unchanged (null/empty
    arrays preserved). The ref map is joined, not broadcast — at
    10^12-doc scale the media dimension is itself huge."""
    with_media = docs.filter(F.size("media_refs") > 0)
    no_media = docs.filter(
        F.col("media_refs").isNull() | (F.size("media_refs") <= 0)
    )
    ex = with_media.select(
        "doc_id", F.posexplode("media_refs").alias("pos", "media_ref")
    )
    remapped = (
        ex.join(ref_map, "media_ref", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce("canonical_ref", "media_ref").alias("ref"),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, ref))), x -> x.ref)"
            ).alias("media_refs")
        )
    )
    return (
        with_media.drop("media_refs")
        .join(remapped, "doc_id", "left")
        .unionByName(no_media)
    )


def run_trainprep_job(
    spark,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.2,
    manifest_dir: str | None = None,
    run_id: str = "run-0",
    fail_after_stage: str | None = None,
    decontaminate: bool = False,
    components_algorithm: str = "propagate",
    media_near_dedup: bool = False,
    media_verify_bytes: bool = False,
    semantic_dedup: bool = False,
    semantic_nlist: int | None = None,
    semantic_imi: bool = False,
    line_dedup: bool = False,
    line_df_cap: int = 4,
    shard_budget: int | None = None,
    dsir_target_dir: str | None = None,
    dsir_keep: int | None = None,
    dsir_fast_hash: bool = False,
    pack_seq_len: int | None = None,
) -> dict:
    """Compose scrub → gates → dedup → split; returns summary counts
    and per-stage wall seconds.

    With ``manifest_dir`` the job is resumable at STAGE granularity
    (VERDICT r3 item 8): the gate/media/corpus stages commit rows to a
    ``StageManifest``, the dedup sub-job commits its own five stages to
    the SAME manifest under job='dedup', and a restart with the same
    run_id + parameters skips everything already committed. All summary
    counts come from the written outputs, so they are correct on
    resumed runs too."""
    docs = load(spark, sf_dir, "documents")
    n_in = docs.count()

    # media presence decided UP FRONT and folded into the param lineage
    # (ADVICE r4): if media.parquet appears between resumed runs of the
    # same run_id, every committed stage is invalidated — otherwise a
    # skipped final_corpus stage would silently lack remapped
    # media_refs while the summary reports media counts. Ditto the
    # decontaminate flag (its report feeds the summary).
    media_path = os.path.join(sf_dir, "media.parquet")
    has_media = os.path.exists(media_path) and "media_refs" in docs.columns
    # same up-front-presence rule for the semantic stage (VERDICT r5
    # item 8): the flag AND the table's existence are both lineage
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    has_embeddings = semantic_dedup and os.path.exists(emb_path)
    if semantic_dedup and not has_embeddings:
        # unlike media (auto-detected), this stage was explicitly
        # requested — a silent no-op would look like a successful
        # SemDeDup run that pruned nothing
        print(
            f"WARNING: --semantic-dedup requested but {emb_path} does not "
            f"exist; the semantic stage is SKIPPED and the corpus is "
            f"unpruned",
            file=sys.stderr,
        )

    # DSIR selection follows the semantic rule: explicitly requested,
    # so a missing target table must be loud, never a silent no-op
    has_dsir = bool(dsir_target_dir) and bool(dsir_keep)
    if bool(dsir_target_dir) != bool(dsir_keep):
        # half-specified request (ADVICE r7): --dsir-target without
        # --dsir-keep (or keep=0) silently skipped the stage while the
        # warning below only covered the missing-directory case
        print(
            "WARNING: DSIR selection needs BOTH --dsir-target and a "
            "positive --dsir-keep; only one was provided, so the DSIR "
            "stage is SKIPPED and the corpus is unselected",
            file=sys.stderr,
        )
    if dsir_target_dir and not os.path.exists(dsir_target_dir):
        print(
            f"WARNING: --dsir-target {dsir_target_dir} does not exist; "
            f"the DSIR selection stage is SKIPPED and the corpus is "
            f"unselected",
            file=sys.stderr,
        )
        has_dsir = False

    p_hash = params_hash(
        input=sf_dir,
        output=out_dir,
        min_quality=min_quality,
        langs=tuple(langs),
        jaccard_threshold=jaccard_threshold,
        has_media=has_media,
        decontaminate=decontaminate,
        media_near_dedup=media_near_dedup,
        media_verify_bytes=media_verify_bytes,
        semantic_dedup=has_embeddings,
        semantic_nlist=semantic_nlist,
        semantic_imi=semantic_imi if has_embeddings else None,
        line_dedup=line_dedup,
        line_df_cap=line_df_cap if line_dedup else None,
        shard_budget=shard_budget,
        dsir_target=dsir_target_dir if has_dsir else None,
        dsir_keep=dsir_keep if has_dsir else None,
        dsir_fast_hash=dsir_fast_hash if has_dsir else None,
        pack_seq_len=pack_seq_len,
    )
    sr = StageRunner(
        StageManifest(manifest_dir) if manifest_dir else None,
        run_id,
        "trainprep",
        p_hash,
        fail_after_stage,
    )

    # stages 1-3: ONE map-side projection over a single scan
    filtered_dir = os.path.join(out_dir, "filtered")

    def write_filtered():
        gate_stage(docs, min_quality, langs).write.mode("overwrite").parquet(
            os.path.join(filtered_dir, "documents.parquet")
        )

    def n_of(path: str) -> int:
        return spark.read.parquet(path).count()

    sr.run(
        "scrub_and_gates",
        write_filtered,
        lambda: n_of(os.path.join(filtered_dir, "documents.parquet")),
    )
    n_filtered = n_of(os.path.join(filtered_dir, "documents.parquet"))

    # optional CCNet-style line-level dedup (Wenzek et al.
    # arXiv:1911.00359): strip lines whose corpus document-frequency
    # exceeds line_df_cap BEFORE document-level dedup, so cross-page
    # boilerplate (cookie banners, nav text) neither survives into the
    # corpus nor floods the shingle stages with hot keys. Runs as its
    # own resumable stage; the dedup job consumes its output dir. A doc
    # whose every line was boilerplate is dropped here (its text is
    # empty). line_df_cap must exceed the corpus's expected exact-dup
    # multiplicity — hotter lines are boilerplate by definition; whole-
    # document exact dups below the cap are left for the dedup stage,
    # which keeps one copy instead of deleting all of them.
    line_summary: dict = {}
    if line_dedup:
        from hocr_de_noising_spark.queries.corpus_stats import (
            dedup_repeated_lines,
        )

        line_dir = os.path.join(out_dir, "line_filtered")
        line_docs_path = os.path.join(line_dir, "documents.parquet")

        def write_line_filtered():
            filtered = spark.read.parquet(
                os.path.join(filtered_dir, "documents.parquet")
            )
            cleaned = dedup_repeated_lines(filtered, df_cap=line_df_cap)
            carry = [c for c in filtered.columns if c not in ("text", "n_chars")]
            (
                filtered.select(*carry)
                .join(cleaned.filter(F.col("n_kept") > 0), "doc_id")
                .select(
                    *carry,
                    F.col("clean_text").alias("text"),
                    F.length("clean_text").cast("int").alias("n_chars"),
                    # stats columns stay in the table so resumed runs
                    # report the same counts from the written output
                    "n_lines",
                    "n_kept",
                )
                .write.mode("overwrite")
                .parquet(line_docs_path)
            )

        sr.run(
            "line_dedup",
            write_line_filtered,
            lambda: n_of(line_docs_path),
        )
        stats = (
            spark.read.parquet(line_docs_path)
            .agg(
                F.count("*").alias("n"),
                F.sum("n_lines").alias("nl"),
                F.sum("n_kept").alias("nk"),
            )
            .first()
        )
        line_summary = {
            "n_after_line_dedup": stats["n"],
            "lines_removed": int(stats["nl"] - stats["nk"]),
            "docs_emptied_by_line_dedup": n_filtered - stats["n"],
        }
        dedup_input_dir = line_dir
    else:
        dedup_input_dir = filtered_dir

    dedup_dir = os.path.join(out_dir, "dedup")
    t0 = time.time()
    dedup_summary = run_dedup_job(
        spark,
        dedup_input_dir,
        dedup_dir,
        jaccard_threshold=jaccard_threshold,
        manifest_dir=manifest_dir,
        run_id=run_id,
        fail_after_stage=fail_after_stage,
        components_algorithm=components_algorithm,
        # ties the dedup stages' lineage to THIS job's gate params: a
        # rerun with different min_quality/langs rewrites filtered/ at
        # the same path, and the dedup stages must re-run (r4 review)
        upstream_hash=p_hash,
    )
    sr.stage_secs["dedup"] = round(time.time() - t0, 3)

    # optional decontamination report (VERDICT r3's LLM-pipeline
    # completeness direction): among the SURVIVING docs, flag val/test
    # docs that still share a 5-gram shingle with the train split —
    # partial overlap below the dedup threshold is exactly the
    # benchmark-leakage dedup cannot catch. Report-only by design:
    # whether to drop or re-split contaminated eval docs is a modeling
    # decision, so the job surfaces the list + count and leaves the
    # corpus intact.
    decon_summary: dict = {}
    if decontaminate:

        def write_decon():
            # BOTH sides restricted to the surviving docs: a train doc
            # dedup removed must not raise a false leakage flag
            keepers = spark.read.parquet(os.path.join(dedup_dir, "keepers"))
            rep = decon_overlap(spark, dedup_input_dir, keep=keepers)
            rep.write.mode("overwrite").parquet(os.path.join(out_dir, "decon"))

        sr.run(
            "decontaminate",
            write_decon,
            lambda: n_of(os.path.join(out_dir, "decon")),
        )
        decon_summary = {"n_contaminated": n_of(os.path.join(out_dir, "decon"))}

    # media stage: runs iff the input carries media.parquet AND docs
    # carry media_refs (both shapes optional — text-only corpora skip);
    # has_media was resolved before p_hash so it is part of the lineage
    media_summary: dict = {}
    if has_media:
        media_out = os.path.join(out_dir, "media")
        sr.run(
            "media_dedup",
            lambda: media_stage(
                spark,
                spark.read.parquet(media_path),
                media_out,
                near_dedup=media_near_dedup,
                verify_bytes=media_verify_bytes,
            ),
            lambda: n_of(os.path.join(media_out, "meta")),
        )
        # counts from the WRITTEN outputs — correct whether the stage
        # ran just now or was skipped on resume
        m_in = n_of(os.path.join(media_out, "ref_map"))
        m_kept = n_of(os.path.join(media_out, "meta"))
        media_summary = {
            "media_in": m_in,
            "media_kept": m_kept,
            "media_dups": m_in - m_kept,
        }

    # optional semantic dedup stage (VERDICT r5 item 8, SemDeDup-shape):
    # embeddings for the SURVIVING docs -> fixed-centroid cells ->
    # capped in-cell cosine -> star components; the prune map (doc_id,
    # sem_rep) for non-representative members commits as its own
    # resumable stage and the final corpus excludes those docs. The
    # representative of every component is its minimum doc_id, which is
    # a keeper by construction (the map is computed on keeper-restricted
    # embeddings only).
    sem_summary: dict = {}
    if has_embeddings:
        sem_dir = os.path.join(out_dir, "semantic")

        def write_semantic():
            from hocr_de_noising_spark.queries.similarity_ml import (
                semantic_prune,
            )

            keepers = spark.read.parquet(os.path.join(dedup_dir, "keepers"))
            emb = (
                spark.read.parquet(emb_path)
                .join(keepers.select("doc_id"), "doc_id")
                .select(F.col("doc_id").alias("vec_id"), "embedding")
            )
            # semantic_nlist: None = the 8-cell oracle quantizer (fine
            # for small corpora); at scale size it so cells stay under
            # EMBED_BLOCK_CAP (bench_semantic_recall: recall 0.80 at
            # overflowing cells vs 0.996 at nlist=n/24 with top-2
            # assignment)
            prune = semantic_prune(
                emb,
                nlist=semantic_nlist,
                n_assign=1 if semantic_nlist is None else 2,
                vectorized=True,
                # imi: O(sqrt(nlist)) product-codebook assignment — the
                # cure for the flat matmul's O(n·nlist) term (measured
                # 6x the stage at 200k vectors / nlist=8333, recall
                # equal-or-better on the planted corpus)
                quantizer="imi" if semantic_imi else "flat",
            ).filter(
                F.col("vec_id") != F.col("sem_rep")
            )
            prune.select(
                F.col("vec_id").alias("doc_id"), "sem_rep"
            ).write.mode("overwrite").parquet(
                os.path.join(sem_dir, "prune_map")
            )

        sr.run(
            "semantic_dedup",
            write_semantic,
            lambda: n_of(os.path.join(sem_dir, "prune_map")),
        )
        sem_summary = {
            "semantic_pruned": n_of(os.path.join(sem_dir, "prune_map"))
        }

    # optional DSIR selection stage (Xie et al., arXiv:2302.03169):
    # among the docs that would otherwise reach the corpus (keepers,
    # minus semantic prunes), keep the dsir_keep whose hashed-n-gram
    # log importance weight toward the user-supplied target corpus
    # ranks highest. Runs LAST among the selectors by design — scoring
    # after dedup/pruning means duplicates cannot crowd the selection
    # budget. The stage commits (doc_id, n_feats, score) so resumed
    # runs and downstream audits see WHY each doc was kept.
    dsir_summary: dict = {}
    if has_dsir:
        dsir_sel_path = os.path.join(out_dir, "dsir", "selected")

        def write_dsir():
            from hocr_de_noising_spark.queries.corpus_stats import (
                dsir_importance,
            )

            keepers = spark.read.parquet(os.path.join(dedup_dir, "keepers"))
            pool = keepers.select("doc_id").join(
                spark.read.parquet(
                    os.path.join(dedup_input_dir, "documents.parquet")
                ),
                "doc_id",
            )
            if has_embeddings:
                prune = spark.read.parquet(
                    os.path.join(out_dir, "semantic", "prune_map")
                )
                pool = pool.join(prune.select("doc_id"), "doc_id", "left_anti")
            target = spark.read.parquet(dsir_target_dir)
            # fast_hash: xxhash64 bucketing (~1.15x end-to-end at 1M,
            # 1.6x on the hash stage) — a featurization choice, so it
            # rides the param lineage like --semantic-imi
            dsir_importance(
                pool, target, top_k=dsir_keep, fast_hash=dsir_fast_hash
            ).write.mode("overwrite").parquet(dsir_sel_path)

        sr.run("dsir_select", write_dsir, lambda: n_of(dsir_sel_path))
        dsir_summary = {"dsir_selected": n_of(dsir_sel_path)}

    def write_corpus():
        keepers = spark.read.parquet(os.path.join(dedup_dir, "keepers"))
        filtered = spark.read.parquet(
            os.path.join(dedup_input_dir, "documents.parquet")
        )
        cols = ["doc_id", "text", "lang", "split"]
        final = keepers.join(filtered, "doc_id")
        if has_embeddings:
            prune = spark.read.parquet(os.path.join(out_dir, "semantic", "prune_map"))
            final = final.join(prune.select("doc_id"), "doc_id", "left_anti")
        if has_dsir:
            sel = spark.read.parquet(os.path.join(out_dir, "dsir", "selected"))
            final = final.join(sel.select("doc_id"), "doc_id")
        if has_media:
            # remap_media_refs references its input from three plan
            # branches (with-media / no-media split + the re-join) and
            # Catalyst does not share subtrees — checkpoint the
            # keepers⋈filtered join once instead of executing it 3x
            # (lazy: materializes on the write action; executor-local —
            # the manifest stage re-run is the recovery on node loss)
            final = final.localCheckpoint(eager=False)
            ref_map = spark.read.parquet(os.path.join(out_dir, "media", "ref_map"))
            final = remap_media_refs(final, ref_map)
            cols.append("media_refs")
        if shard_budget:
            # equal-token output sharding (the training-file packing
            # step): the distributed prefix sum over the SURVIVING
            # corpus in doc_id order; shard rides as a column so the
            # writer below (or a downstream repartition('shard'))
            # can pack files without another pass
            from hocr_de_noising_spark.queries.corpus_stats import (
                shard_token_budget,
            )

            final = final.localCheckpoint(eager=False)
            shards = shard_token_budget(final, shard_budget).select(
                "doc_id", "shard"
            )
            final = final.join(shards, "doc_id")
            cols.append("shard")
        final.select(*cols).write.mode("overwrite").parquet(
            os.path.join(out_dir, "corpus")
        )

    sr.run(
        "final_corpus", write_corpus, lambda: n_of(os.path.join(out_dir, "corpus"))
    )
    n_final = spark.read.parquet(os.path.join(out_dir, "corpus")).count()

    # optional training-sequence packing manifest (the concat-and-chunk
    # LM batch layout): one row per (sequence, doc) contribution over
    # the WRITTEN corpus, so a trainer can assemble fixed-length
    # sequences without re-deriving the token cursor. Its own stage
    # AFTER final_corpus: reads the committed output, so resume never
    # recomputes the corpus to re-pack it.
    pack_summary: dict = {}
    if pack_seq_len:
        pack_path = os.path.join(out_dir, "pack", "manifest")

        def write_pack():
            from hocr_de_noising_spark.queries.corpus_stats import (
                pack_sequences,
            )

            corpus = spark.read.parquet(os.path.join(out_dir, "corpus"))
            pack_sequences(corpus, pack_seq_len).write.mode(
                "overwrite"
            ).parquet(pack_path)

        sr.run("pack_manifest", write_pack, lambda: n_of(pack_path))
        pack_summary = {
            "n_sequences": spark.read.parquet(pack_path)
            .agg(F.countDistinct("seq_id"))
            .first()[0]
        }

    return {
        "n_input": n_in,
        "n_after_gates": n_filtered,
        "n_final": n_final,
        "gated_out": n_in - n_filtered,
        # dedup_removed comes from the dedup stage's OWN keeper count
        # (ADVICE r7: the n_final form also absorbed semantic-pruned
        # and DSIR-deselected docs); selection_removed carries those
        "dedup_removed": line_summary.get("n_after_line_dedup", n_filtered)
        - dedup_summary["keepers"],
        "selection_removed": dedup_summary["keepers"] - n_final,
        **line_summary,
        "dedup": dedup_summary,
        **sem_summary,
        **dsir_summary,
        **pack_summary,
        **decon_summary,
        **media_summary,
        "stage_secs": sr.stage_secs,
        "stages_run": sr.stages_run,
        "stages_skipped": sr.stages_skipped,
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", nargs="+", default=["en"])
    ap.add_argument("--jaccard-threshold", type=float, default=0.2)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--manifest", default=None,
                    help="stage-manifest dir (enables stage-granular resume)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--line-dedup", action="store_true",
                    help="CCNet-style line-level dedup stage: strip "
                         "lines whose corpus df exceeds --line-df-cap "
                         "before document dedup")
    ap.add_argument("--line-df-cap", type=int, default=4)
    ap.add_argument("--shard-budget", type=int, default=None,
                    help="assign equal-token output shards to the final "
                         "corpus (floor(exclusive-token-prefix/budget))")
    ap.add_argument("--decontaminate", action="store_true",
                    help="write decon/ report of surviving val/test docs "
                         "sharing 5-gram shingles with the train split")
    ap.add_argument("--components-algorithm", default="propagate",
                    choices=("propagate", "star"),
                    help="star = O(log n) rounds at any graph diameter")
    ap.add_argument("--semantic-nlist", type=int, default=None,
                    help="cells for the semantic stage's fixed coarse "
                         "quantizer (size so cells stay under 256; "
                         "default: the 8-cell oracle quantizer)")
    ap.add_argument("--semantic-imi", action="store_true",
                    help="use the IMI product-codebook coarse quantizer "
                         "for the semantic stage (O(sqrt(nlist)) "
                         "assignment; different cells than flat — a "
                         "quantizer choice, pruned set may differ)")
    ap.add_argument("--semantic-dedup", action="store_true",
                    help="SemDeDup stage: prune cosine-near embedding "
                         "cluster-mates among the dedup keepers (needs "
                         "embeddings.parquet with doc_id in the input dir)")
    ap.add_argument("--media-verify-bytes", action="store_true",
                    help="gate near-dup collapse on the fine band-sum "
                         "verify signature (blocks coarse-psig false merges)")
    ap.add_argument("--media-near-dedup", action="store_true",
                    help="also collapse perceptual near-duplicate media "
                         "(re-encoded copies the byte hash misses)")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of target-domain docs (doc_id, text): "
                         "enables the DSIR importance-selection stage")
    ap.add_argument("--dsir-keep", type=int, default=None,
                    help="number of docs the DSIR stage keeps (top-k by "
                         "hashed-n-gram log importance weight)")
    ap.add_argument("--dsir-fast-hash", action="store_true",
                    help="xxhash64 feature bucketing for the DSIR stage "
                         "(faster; different hash family, selection may "
                         "differ at the margin)")
    ap.add_argument("--pack-seq-len", type=int, default=None,
                    help="emit pack/manifest mapping the final corpus "
                         "onto fixed-length training sequences")
    args = ap.parse_args(argv)
    spark = get_spark("hocr-trainprep-job", cores=args.cores)
    summary = run_trainprep_job(
        spark,
        args.input,
        args.output,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        jaccard_threshold=args.jaccard_threshold,
        manifest_dir=args.manifest,
        run_id=args.run_id,
        decontaminate=args.decontaminate,
        components_algorithm=args.components_algorithm,
        media_near_dedup=args.media_near_dedup,
        media_verify_bytes=args.media_verify_bytes,
        semantic_dedup=args.semantic_dedup,
        semantic_nlist=args.semantic_nlist,
        semantic_imi=args.semantic_imi,
        line_dedup=args.line_dedup,
        line_df_cap=args.line_df_cap,
        shard_budget=args.shard_budget,
        dsir_target_dir=args.dsir_target,
        dsir_keep=args.dsir_keep,
        dsir_fast_hash=args.dsir_fast_hash,
        pack_seq_len=args.pack_seq_len,
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
