"""IVF-style approximate nearest neighbor over the embeddings table.

The scale path beyond the sign-bucket LSH (trainprep.ann_lsh_bucketed):
a coarse quantizer (KMeans, pyspark.ml) partitions vectors into nlist
cells; each query probes its nprobe nearest centroids and ranks
candidates by exact cosine only within those cells — the classic
IVF-Flat trade (recall vs cells probed) with Spark-native pieces:
centroid assignment is a broadcast of nlist small vectors, the
candidate join is an equi join on cell id (never a cross product).

KMeans is iterative and seed-dependent → not DuckDB-expressible → the
registry entry is rows-only; tests/test_similarity_ml.py checks the
semantic contract instead (self-hit recall, candidate containment).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hocr_de_noising_spark.queries.util import load, register

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _cos(a: str, b: str):
    # nullif: a zero-norm (failed-embedding) vector must yield NULL,
    # not an ANSI DIVIDE_BY_ZERO crash (r4 adversarial probe)
    return F.expr(
        f"{_DOT.format(a=a, b=b)} / nullif(sqrt({_DOT.format(a=a, b=a)}) * "
        f"sqrt({_DOT.format(a=b, b=b)}), 0D)"
    )


def ivf_build_and_search(
    embeddings: DataFrame,
    nlist: int = 16,
    nprobe: int = 3,
    k: int = 3,
    n_queries: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Build the IVF index and answer top-k cosine for the query set
    (vec_id < n_queries). Returns (query_id, neighbor_id, cosine, rnk)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    ml = e.withColumn("features", array_to_vector("v"))
    # maxIter=5: the coarse quantizer only needs rough cells — IVF
    # recall comes from nprobe, not from KMeans convergence; a tight
    # fit would just burn driver wall-clock at every scale.
    model = KMeans(k=nlist, seed=seed, maxIter=5, featuresCol="features").fit(ml)

    # cell assignment for every vector (model.transform = broadcast of
    # nlist centroids; no shuffle)
    assigned = model.transform(ml).select(
        "vec_id", "v", F.col("prediction").alias("cell")
    )

    # query → nprobe nearest centroids (tiny cross product: q x nlist)
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cdf = F.broadcast(
        assigned.sparkSession.createDataFrame(
            centroids, "cell int, cv array<double>"
        )
    )
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cdist").desc(), F.col("cell"))
    probes = (
        q.join(cdf)
        .withColumn("cdist", F.round(_cos("qv", "cv"), 6))
        .withColumn("crnk", F.row_number().over(wq))
        .filter(F.col("crnk") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    # candidates: equi join on cell — the IVF pruning step
    cand = probes.join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos("qv", "v"), 4).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
    )


def ann_ivf(spark, sf):
    """IVF-Flat ANN: coarse-quantize, probe 3 of 16 cells, exact cosine
    within candidates.

    Demoted from the driver registry in r7 (VERDICT r6 item 8): KMeans
    is seed/iteration-dependent so the key was permanently rows-only,
    while ann_ivf_fixed hash-checks the same assignment/probe/rerank
    machinery against DuckDB; the recall-vs-bruteforce contract lives
    in tests/test_similarity_ml.py (>=0.5 at nprobe=nlist/2)."""
    return ivf_build_and_search(load(spark, sf, "embeddings"))


# ---------------------------------------------------------------------------
# Fixed-centroid IVF (VERDICT r5 item 7): the seed dependence that
# forces ann_ivf to rows-only vanishes when the coarse quantizer's
# centroids are FIXED LITERALS shared with DuckDB — the same trick as
# ann_lsh_bucketed's literal hyperplanes. Centroids are sparse {+1,-1}
# directions from the LCG (a data-independent random coarse quantizer;
# recall quality still comes from nprobe, and the learned-centroid
# variant remains ann_ivf). Every step is engine-portable: the dot
# products fold left-to-right over identical literals, the argmax cell
# uses >= chains with lowest-index ties, cosines are rounded before
# ranking, and NULL cosines (zero-norm vectors) are filtered before
# the top-k window on both sides.
IVF_NLIST, IVF_NPROBE, IVF_K, IVF_QUERIES = 8, 3, 3, 10


def _ivf_centroids(seed: int = 7654321):
    """Deterministic sparse ±1 centroid directions, one list of
    (1-based dim index, +1/-1) per cell — same LCG family as the ANN
    hyperplanes (public: Achlioptas sparse random projections)."""
    state = seed & 0x7FFFFFFF
    cents = []
    from hocr_de_noising_spark.queries.trainprep import ANN_DIM

    for _c in range(IVF_NLIST):
        terms = []
        for i in range(1, ANN_DIM + 1):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            u = state / 0x7FFFFFFF
            if u < 1 / 6:
                terms.append((i, 1))
            elif u > 5 / 6:
                terms.append((i, -1))
        if not terms:
            terms.append((1, 1))
        cents.append(terms)
    return cents


_IVF_CENTROIDS = _ivf_centroids()


def _ivf_dot_exprs(elem):
    """One dot-product string per centroid with identical left-to-right
    fold order in both engines (trainprep._dot_terms rule)."""
    from hocr_de_noising_spark.queries.trainprep import _dot_terms

    return [_dot_terms(t, elem) for t in _IVF_CENTROIDS]


def _ivf_cell_case() -> str:
    """argmax over d0..d{n-1} with lowest-index tie-break, as a CASE
    chain valid in both engines."""
    n = IVF_NLIST
    arms = []
    for c in range(n - 1):
        conds = " AND ".join(f"d{c} >= d{j}" for j in range(n) if j != c)
        arms.append(f"WHEN {conds} THEN {c}")
    return "CASE " + " ".join(arms) + f" ELSE {n - 1} END"


_IVF_FIXED_SQL = f"""
WITH vv AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dots AS (
    SELECT vec_id, v,
           {", ".join(f"{d} AS d{i}" for i, d in enumerate(_ivf_dot_exprs(lambda i: f"v[{i}]")))}
    FROM vv
),
assigned AS (
    SELECT vec_id, v, {_ivf_cell_case()} AS cell,
           {", ".join(f"d{i}" for i in range(IVF_NLIST))}
    FROM dots
),
probes AS (
    SELECT query_id, qv, cell FROM (
        SELECT vec_id AS query_id, v AS qv, u.cell AS cell, u.d AS d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY u.d DESC, u.cell) AS crnk
        FROM assigned,
             LATERAL (SELECT unnest([{", ".join(str(i) for i in range(IVF_NLIST))}]) AS cell,
                             unnest([{", ".join(f"d{i}" for i in range(IVF_NLIST))}]) AS d) u
        WHERE vec_id < {IVF_QUERIES}
    ) WHERE crnk <= {IVF_NPROBE}
),
candpairs AS (
    SELECT p.query_id, a.vec_id AS neighbor_id, p.qv, a.v
    FROM probes p JOIN assigned a ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
vals AS (
    SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(v) AS y
    FROM candpairs
),
cand AS (
    SELECT query_id, neighbor_id,
           round(sum(x * y) / nullif(sqrt(sum(x * x)) * sqrt(sum(y * y)), 0),
                 4) + 0.0 AS cosine
    FROM vals GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM cand WHERE cosine IS NOT NULL
) WHERE rnk <= {IVF_K}
"""


@register("ann_ivf_fixed", _IVF_FIXED_SQL)
def ann_ivf_fixed(spark, sf):
    """IVF-Flat ANN with the fixed literal coarse quantizer: map-side
    cell assignment (centroids are literals — no join, no shuffle),
    broadcast of the tiny probe side onto the cell-partitioned
    candidates, exact cosine rerank, deterministic top-k. The plan has
    NO join for assignment and a broadcast join for candidates — the
    100 TB shape (assignment scales map-only; candidates are bounded
    by the probed cells)."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    dots = e.select(
        "vec_id",
        "v",
        *[
            F.expr(d).alias(f"d{i}")
            for i, d in enumerate(_ivf_dot_exprs(lambda i: f"element_at(v, {i})"))
        ],
    )
    assigned = dots.select(
        "vec_id", "v", F.expr(_ivf_cell_case()).alias("cell"),
        *[f"d{i}" for i in range(IVF_NLIST)],
    )
    cells_arr = ", ".join(
        f"struct({i} AS cell, d{i} AS d)" for i in range(IVF_NLIST)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("u.d").desc(), F.col("u.cell")
    )
    probes = (
        assigned.filter(F.col("vec_id") < IVF_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(F.expr(f"array({cells_arr})")).alias("u"),
        )
        .withColumn("crnk", F.row_number().over(wq))
        .filter(F.col("crnk") <= IVF_NPROBE)
        .select("query_id", "qv", F.col("u.cell").alias("cell"))
    )
    cand = F.broadcast(probes).join(
        assigned.select("vec_id", "v", "cell"), "cell"
    ).filter(F.col("vec_id") != F.col("query_id"))
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos("qv", "v"), 4).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
        .withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= IVF_K)
    )


# ---------------------------------------------------------------------------
# Semantic dedup (VERDICT r5 item 8 — SemDeDup-shape [Abbas et al.,
# "SemDeDup", arXiv:2303.09540 — public paper]): cluster embeddings
# with the FIXED-centroid coarse quantizer above, compute pairwise
# cosine only within a (cell, sub-block) — the EMBED_BLOCK_CAP rule
# that bounds any cell to O(n * cap) work — and prune every vector
# whose cosine to a lower-id cluster-mate is >= the threshold. The
# keeper is each component's minimum id (same canonicalization as the
# text dedup paths), so the operator composes with the trainprep
# stage machinery unchanged.
SEM_COS_MIN = 0.9  # production threshold: prune near-semantic copies
# registry-key threshold: the synthetic embeddings table has no planted
# semantic dups (max in-cell cosine 0.49 at sf0.01), so the oracle key
# exercises the machinery at a threshold that yields a non-empty,
# hash-checkable component set
SEM_COS_MIN_ORACLE = 0.4


def _dense_centroids(nlist: int, dim: int, seed: int = 7654321):
    """Dense {+1.0, 0.0, -1.0} centroid rows from the same LCG family —
    the scalable form of :func:`_ivf_centroids` for arbitrary nlist
    (the 8-cell literal-CASE form is the oracle-parity path; a 512-arm
    CASE chain would be absurd and unnecessary Spark-side)."""
    state = seed & 0x7FFFFFFF
    cents = []
    for _c in range(nlist):
        row = []
        for _i in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            u = state / 0x7FFFFFFF
            row.append(1.0 if u < 1 / 6 else (-1.0 if u > 5 / 6 else 0.0))
        if not any(row):
            row[0] = 1.0
        cents.append(row)
    return cents


def _assign_cells_array(e, nlist: int, dim: int, n_assign: int = 1):
    """Scale-path cell assignment: one Arrow-batched iterator pandas
    UDF computing the (batch x dim) @ (dim x nlist) matmul + argmax in
    numpy — map-side, zero shuffle, and ~100x the throughput of the
    equivalent per-row interpreted HOF chain at 100k x 512 cells
    (measured: the HOF form put assignment+cosine at 208 s for the
    100k recall bench; dense linear algebra is exactly the sanctioned
    pandas-UDF case). numpy argmax returns the FIRST maximum — the
    same lowest-index tie-break as the literal CASE chain
    (property-tested equal at nlist=8). float64 throughout, so the
    dots match the JVM fold up to summation order."""
    import numpy as _np
    from pyspark.sql.functions import pandas_udf

    cents = _np.array(_dense_centroids(nlist, dim), dtype=_np.float64).T

    if n_assign <= 1:

        @pandas_udf("int")
        def cell_of(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for vs in it:
                m = _np.array(vs.tolist(), dtype=_np.float64)
                yield pd.Series(_np.argmax(m @ cents, axis=1).astype("int32"))

        return e.withColumn("cell", cell_of("v"))

    # OR-amplified multi-assignment (same cure as the LSH tables): a
    # near-identical pair whose argmax flips across a cell boundary
    # still meets in the runner-up cell — measured +4.6 recall points
    # at 100k/nlist=4096 (0.9502 -> 0.9961) for ~1.6x wall
    @pandas_udf("array<int>")
    def cells_of(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vs in it:
            m = _np.array(vs.tolist(), dtype=_np.float64)
            d = m @ cents
            top = _np.argpartition(-d, n_assign - 1, axis=1)[:, :n_assign]
            yield pd.Series([row.astype("int32").tolist() for row in top])

    return e.withColumn("cell", F.explode(cells_of("v")))


def _assign_cells_imi(e, nlist: int, dim: int, n_assign: int = 1):
    """IMI-style product coarse quantizer (Babenko & Lempitsky, "The
    Inverted Multi-Index", CVPR 2012 — public paper): two independent
    deterministic codebooks A (G1 directions) and B (G2), G1·G2 >=
    nlist, cell = argmaxA·G2 + argmaxB. A near-identical pair shares
    BOTH argmaxes, so the SemDeDup collision property is preserved,
    while assignment work drops O(n·nlist·dim) -> O(n·(G1+G2)·dim) —
    under the nlist ∝ n sizing rule that is the difference between
    QUADRATIC total assignment work and n^1.5; at 10^12 docs the flat
    matmul is the semantic stage's first scale-killer (measured: the
    2M capstone's semantic stage grew 3.8x at 2x docs, the nlist term).
    ``n_assign`` OR-amplifies per codebook (top-k in A x top-k in B ->
    k² cells) — the same boundary-flip cure as the flat quantizer."""
    import math as _math

    import numpy as _np
    from pyspark.sql.functions import pandas_udf

    G1 = 1 if nlist <= 1 else _math.isqrt(nlist - 1) + 1  # ceil(sqrt)
    G2 = (nlist + G1 - 1) // G1
    ca = _np.array(_dense_centroids(G1, dim, seed=7654321), dtype=_np.float64).T
    cb = _np.array(_dense_centroids(G2, dim, seed=24680135), dtype=_np.float64).T

    if n_assign <= 1:

        @pandas_udf("int")
        def cell_of(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for vs in it:
                m = _np.array(vs.tolist(), dtype=_np.float64)
                a = _np.argmax(m @ ca, axis=1)
                b = _np.argmax(m @ cb, axis=1)
                yield pd.Series((a * G2 + b).astype("int32"))

        return e.withColumn("cell", cell_of("v"))

    @pandas_udf("array<int>")
    def cells_of(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vs in it:
            m = _np.array(vs.tolist(), dtype=_np.float64)
            da, db = m @ ca, m @ cb
            ta = _np.argpartition(-da, n_assign - 1, axis=1)[:, :n_assign]
            tb = _np.argpartition(-db, n_assign - 1, axis=1)[:, :n_assign]
            cells = (ta[:, :, None] * G2 + tb[:, None, :]).reshape(len(m), -1)
            yield pd.Series([row.astype("int32").tolist() for row in cells])

    return e.withColumn("cell", F.explode(cells_of("v")))


def _assigned_blocks(
    emb, nlist: int | None = None, n_assign: int = 1, quantizer: str = "flat"
):
    """(vec_id, v, cell, sub) — map-side cell assignment plus the
    EMBED_BLOCK_CAP sub-blocking window. Shared by the pair and the
    block-local-components stages so both see identical blocks.
    ``quantizer="imi"`` takes the O(sqrt(nlist)) product-codebook
    assignment (different cell ids than flat — a quantizer choice,
    not an approximation of flat)."""
    from hocr_de_noising_spark.queries.trainprep import EMBED_BLOCK_CAP

    e = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
    )
    if nlist is None:
        dots = e.select(
            "vec_id",
            "v",
            *[
                F.expr(d).alias(f"d{i}")
                for i, d in enumerate(_ivf_dot_exprs(lambda i: f"element_at(v, {i})"))
            ],
        )
        assigned = dots.select(
            "vec_id", "v", F.expr(_ivf_cell_case()).alias("cell")
        )
    else:
        row = e.select(F.size("v").alias("n")).first()
        if row is None:
            # empty embeddings frame: .n on None would crash the whole
            # job (reachable from run_trainprep when the keeper-
            # restricted embeddings join is empty) — any cell id works,
            # the frame has no rows to mis-assign
            assigned = e.withColumn("cell", F.lit(0))
        else:
            assign = (
                _assign_cells_imi if quantizer == "imi" else _assign_cells_array
            )
            assigned = assign(e, nlist, row.n, n_assign).select(
                "vec_id", "v", "cell"
            )
    w = Window.partitionBy("cell").orderBy("vec_id")
    return assigned.withColumn(
        "sub", F.floor((F.row_number().over(w) - 1) / EMBED_BLOCK_CAP)
    )


def semantic_pairs(
    emb,
    threshold: float = SEM_COS_MIN,
    nlist: int | None = None,
    n_assign: int = 1,
    vectorized: bool | None = None,
    quantizer: str = "flat",
):
    """Cosine-near pairs (doc_a, doc_b, cosine) within fixed-centroid
    cells, sub-blocked to EMBED_BLOCK_CAP. ``emb``: (vec_id,
    embedding). Assignment is map-side (literal centroids); the only
    shuffles are the (cell) rank window and the (cell, sub) self-join.

    ``nlist=None`` uses the 8-cell oracle-parity quantizer. At scale,
    pass nlist sized so cells stay under EMBED_BLOCK_CAP (SemDeDup's
    own rule: cluster count grows with corpus size) — otherwise the
    deterministic sub-blocking starts splitting true near-pairs across
    sub-blocks, trading recall for the O(n * cap) bound."""
    s = _assigned_blocks(emb, nlist, n_assign, quantizer=quantizer)
    if vectorized is None:
        vectorized = nlist is not None
    if vectorized:
        # the pair stage is implementation-independent of the oracle
        # (same rows either way, property-tested): the numpy block
        # matmul replaces ~C(block,2) interpreted 64-dim HOF cosines —
        # 35.4 s -> ~4 s for the sf0.1 registry key
        out = _block_pairs_pandas(s, threshold)
        return out.distinct() if n_assign > 1 else out
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            F.round(_cos("a.v", "b.v"), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _round_half_away(x):
    """4-decimal round, half away from zero — Spark's ROUND (HALF_UP on
    the magnitude). floor(x*1e4+0.5)/1e4 rounds half toward +inf, which
    diverges for negative cosines (-0.00005 -> -0.0 vs -0.0001); every
    current caller thresholds positive, but the parity claim should not
    depend on that."""
    import numpy as _np

    return _np.copysign(_np.floor(_np.abs(x) * 1e4 + 0.5), x) / 1e4


def _block_pairs_pandas(s, threshold: float):
    """Scale-path in-block pairwise cosine: one applyInPandas per
    (cell, sub) block computing the whole <=CAP x CAP similarity matrix
    as a numpy matmul over unit-normalized rows — no self-join (which
    would re-execute the assignment subtree twice), no per-pair
    interpreted HOF cosine, and the groupBy reuses the sub-block
    window's (cell) partitioning so the block stage adds NO exchange.
    Zero-norm vectors get NaN rows and never pass the threshold (same
    nullif contract as the HOF path). _round_half_away matches Spark's
    ROUND on either sign so the two paths emit identical cosines."""
    import numpy as _np
    import pandas as _pd

    id_type = dict(zip(s.columns, (f.dataType.simpleString() for f in s.schema)))[
        "vec_id"
    ]
    out_schema = f"doc_a {id_type}, doc_b {id_type}, cosine double"

    def block(pdf: _pd.DataFrame) -> _pd.DataFrame:
        m = _np.array(pdf["v"].tolist(), dtype=_np.float64)
        norms = _np.linalg.norm(m, axis=1)
        with _np.errstate(divide="ignore", invalid="ignore"):
            u = m / norms[:, None]
        sims = u @ u.T
        ids = pdf["vec_id"].to_numpy()
        order = _np.argsort(ids)  # doc_a < doc_b like the join form
        iu, ju = _np.triu_indices(len(ids), k=1)
        ii, jj = order[iu], order[ju]
        cos = _round_half_away(sims[ii, jj])
        keep = ~_np.isnan(cos) & (cos >= threshold)
        return _pd.DataFrame(
            {"doc_a": ids[ii][keep], "doc_b": ids[jj][keep], "cosine": cos[keep]}
        )

    return s.select("vec_id", "v", "cell", "sub").groupBy("cell", "sub").applyInPandas(
        block, schema=out_schema
    )


def _block_components_pandas(s, threshold: float):
    """(vec_id, sem_rep) computed entirely inside the per-(cell, sub)
    block UDF. With single assignment every vector lives in exactly one
    block and pairs only form within a block, so components CANNOT
    cross blocks — a <=CAP-node union-find over the thresholded
    similarity matrix replaces the iterative star rounds and their
    localCheckpoint/count barriers. Same row contract as
    connected_components over the pair stream: only vectors with >=1
    near edge appear, sem_rep = min vec_id of the component."""
    import numpy as _np
    import pandas as _pd

    id_type = dict(zip(s.columns, (f.dataType.simpleString() for f in s.schema)))[
        "vec_id"
    ]
    out_schema = f"vec_id {id_type}, sem_rep {id_type}"

    def block(pdf: _pd.DataFrame) -> _pd.DataFrame:
        m = _np.array(pdf["v"].tolist(), dtype=_np.float64)
        norms = _np.linalg.norm(m, axis=1)
        with _np.errstate(divide="ignore", invalid="ignore"):
            u = m / norms[:, None]
        sims = u @ u.T
        n = len(pdf)
        iu, ju = _np.triu_indices(n, k=1)
        cos = _round_half_away(sims[iu, ju])
        keep = ~_np.isnan(cos) & (cos >= threshold)
        ea, eb = iu[keep], ju[keep]
        if len(ea) == 0:
            return _pd.DataFrame({"vec_id": [], "sem_rep": []}).astype(
                pdf["vec_id"].dtype
            )
        parent = list(range(n))

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(ea.tolist(), eb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        has_edge = _np.zeros(n, dtype=bool)
        has_edge[ea] = True
        has_edge[eb] = True
        ids = pdf["vec_id"].to_numpy()
        roots = _np.fromiter((find(i) for i in range(n)), dtype=_np.int64, count=n)
        out = _pd.DataFrame({"vec_id": ids[has_edge], "root": roots[has_edge]})
        out["sem_rep"] = out.groupby("root")["vec_id"].transform("min")
        return out[["vec_id", "sem_rep"]]

    return s.select("vec_id", "v", "cell", "sub").groupBy("cell", "sub").applyInPandas(
        block, schema=out_schema
    )


def semantic_prune(
    emb,
    threshold: float = SEM_COS_MIN,
    nlist: int | None = None,
    n_assign: int = 1,
    vectorized: bool | None = None,
    quantizer: str = "flat",
):
    """(vec_id, sem_rep) for every vector in a semantic component —
    rows with sem_rep != vec_id are the prune set (SemDeDup keeps one
    representative per cluster of cosine-near embeddings).

    ``n_assign == 1`` (and vectorized not explicitly disabled) takes the
    block-local path: components are confined to one (cell, sub) block
    by construction, so union-find inside the block UDF gives the same
    rows as the general star algorithm without its iterative rounds.
    OR-amplified assignment (n_assign > 1) shares vec_ids across cells,
    so its component graph needs the cross-block star path."""
    from hocr_de_noising_spark.queries.trainprep import connected_components

    if n_assign == 1 and vectorized is not False:
        return _block_components_pandas(
            _assigned_blocks(emb, nlist, 1, quantizer=quantizer), threshold
        )
    comps = connected_components(
        semantic_pairs(
            emb, threshold, nlist=nlist, n_assign=n_assign,
            vectorized=vectorized, quantizer=quantizer,
        ).select("doc_a", "doc_b"),
        algorithm="star",
    )
    return comps.select(
        F.col("doc_id").alias("vec_id"), F.col("component").alias("sem_rep")
    )


def _sem_sql() -> str:
    from hocr_de_noising_spark.queries.trainprep import EMBED_BLOCK_CAP

    dots = ", ".join(
        f"{d} AS d{i}"
        for i, d in enumerate(_ivf_dot_exprs(lambda i: f"v[{i}]"))
    )
    return f"""
WITH RECURSIVE vv AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dots AS (SELECT vec_id, v, {dots} FROM vv),
s AS (
    SELECT vec_id, v, cell,
           (row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1)
               // {EMBED_BLOCK_CAP} AS sub
    FROM (SELECT vec_id, v, {_ivf_cell_case()} AS cell FROM dots)
),
cp AS (
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, a.v AS ea, b.v AS eb
    FROM s a JOIN s b
      ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
),
vals AS (
    SELECT doc_a, doc_b, unnest(ea) AS xa, unnest(eb) AS xb FROM cp
),
pairs AS (
    SELECT doc_a, doc_b
    FROM (SELECT doc_a, doc_b,
                 round(sum(xa * xb) / nullif(sqrt(sum(xa * xa))
                       * sqrt(sum(xb * xb)), 0), 4) + 0.0 AS cosine
          FROM vals GROUP BY doc_a, doc_b)
    WHERE cosine >= {SEM_COS_MIN_ORACLE}
),
e AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
),
walk(a, b) AS (
    SELECT a, b FROM e
    UNION
    SELECT walk.a, e.b FROM walk JOIN e ON walk.b = e.a WHERE e.b <> walk.a
)
SELECT a AS vec_id, least(a, min(b)) AS sem_rep
FROM walk GROUP BY a
"""


@register("dedup_semantic", _sem_sql())
def dedup_semantic(spark, sf):
    """SemDeDup over the embeddings table: fixed-centroid cells →
    capped in-cell pairwise cosine → O(log n) star components →
    (vec_id, sem_rep). Threshold SEM_COS_MIN_ORACLE on the synthetic
    table (no planted semantic dups exist there); the production stage
    and the planted-dup recall bench use SEM_COS_MIN."""
    return semantic_prune(
        load(spark, sf, "embeddings"),
        threshold=SEM_COS_MIN_ORACLE,
        vectorized=True,
    )
