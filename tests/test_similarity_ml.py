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
