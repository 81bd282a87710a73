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


@register("ann_ivf", None)  # KMeans is seed/iteration-dependent → rows-only
def ann_ivf(spark, sf):
    """IVF-Flat ANN: coarse-quantize, probe 3 of 16 cells, exact cosine
    within candidates."""
    return ivf_build_and_search(load(spark, sf, "embeddings"))
