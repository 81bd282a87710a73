"""IVF ANN semantic contract: results are a subset of valid neighbors,
ranked by rounded cosine, and recall vs brute force is reasonable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hocr_de_noising_spark.queries import QUERIES
from hocr_de_noising_spark.queries.similarity_ml import ivf_build_and_search
from hocr_de_noising_spark.queries.util import load

SF = "/root/testdata/sf0.001"


def test_ivf_shape_and_ranks(spark):
    out = ivf_build_and_search(load(spark, SF, "embeddings")).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rnk)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_ivf_recall_vs_bruteforce(spark):
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_build_and_search(
            load(spark, SF, "embeddings"), nlist=8, nprobe=4
        ).collect()
    }
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["knn_bruteforce"]["fn"](spark, SF).collect()
    }
    # probing half the cells should recover a decent share of the true
    # top-3 (IVF trades recall for pruning; this bounds the trade)
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_psig_near_pairs_matches_bruteforce_reference(spark):
    """Property (randomized, seeded): on a corpus small enough that no
    bucket hits the salting cap, psig_near_pairs must return EXACTLY
    the pairs a brute-force reference finds — same signature length,
    at least one matching 3-band window (with -1 padding semantics),
    and full-signature L1 <= PSIG_L1_MAX — with the correct L1."""
    import random

    from hocr_de_noising_spark.queries.media_near import (
        PSIG_L1_MAX,
        PSIG_TABLE_STARTS,
        psig_near_pairs,
    )

    rng = random.Random(7)
    sigs = []
    for i in range(120):
        n = rng.choice([1, 2, 4, 7, 8, 8, 8])  # mixed lengths, mostly 8
        base = [rng.randrange(0, 8) for _ in range(n)]
        sigs.append((f"r{i:03d}", base))
        if rng.random() < 0.3:  # plant a near variant
            v = list(base)
            for _ in range(rng.randrange(0, 3)):
                j = rng.randrange(0, n)
                v[j] = max(0, min(7, v[j] + rng.choice([-1, 1])))
            sigs.append((f"r{i:03d}v", v))

    def window(p, s):
        return tuple(p[s + k] if s + k < len(p) else -1 for k in range(3))

    expect = {}
    for (ra, pa), (rb, pb) in (
        (x, y) for x in sigs for y in sigs if x[0] < y[0]
    ):
        if len(pa) != len(pb):
            continue
        if not any(
            s < len(pa) and window(pa, s) == window(pb, s)
            for s in PSIG_TABLE_STARTS
        ):
            continue
        l1 = sum(abs(a - b) for a, b in zip(pa, pb))
        if l1 <= PSIG_L1_MAX:
            expect[(ra, rb)] = l1

    df = spark.createDataFrame(sigs, "media_ref string, psig array<int>")
    got = {
        (r.media_a, r.media_b): r.l1
        for r in psig_near_pairs(df).collect()
    }
    assert got == expect, (
        f"missing={set(expect) - set(got)} extra={set(got) - set(expect)}"
    )
    assert len(expect) > 10  # the fixture actually exercises the operator
