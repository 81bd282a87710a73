"""De-noising operator patterns (SURVEY.md §2.3) over the driver tables.

The real X-operators run on the spans corpus (goldens in
tests/test_golden.py); these queries exercise the SAME Spark patterns —
page-adaptive robust statistics, outlier predicates, normalization,
ordered reconstruction — on the driver's relational testdata so the
DuckDB oracle can verify each one at sf0.01.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from hocr_de_noising_spark.queries.util import load, register


@register(
    "geom_outliers",
    """SELECT l_orderkey, l_linenumber,
              round(med_qty, 4) AS med_qty,
              (l_quantity > 1.9 * med_qty OR l_quantity < 0.1 * med_qty) AS is_outlier
       FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                    median(l_quantity) OVER (PARTITION BY l_returnflag) AS med_qty
             FROM lineitem)""",
)
def geom_outliers(spark, sf):
    """X2 pattern: per-group median + size-outlier flag (speck/blob rule)."""
    w = Window.partitionBy("l_returnflag")
    med = F.expr("percentile(l_quantity, 0.5)").over(w)
    return (
        load(spark, sf, "lineitem")
        .withColumn("med_qty", med)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("med_qty", 4).alias("med_qty"),
            (
                (F.col("l_quantity") > 1.9 * F.col("med_qty"))
                | (F.col("l_quantity") < 0.1 * F.col("med_qty"))
            ).alias("is_outlier"),
        )
    )


@register(
    "margin_envelope",
    """SELECT l_returnflag,
              round(p_lo, 4) AS p_lo, round(p_hi, 4) AS p_hi,
              CAST(sum(CASE WHEN l_extendedprice < p_lo - 100
                             OR l_extendedprice > p_hi + 100 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_outside
       FROM (SELECT l_returnflag, l_extendedprice,
                    quantile_cont(l_extendedprice, 0.05) OVER (PARTITION BY l_returnflag) AS p_lo,
                    quantile_cont(l_extendedprice, 0.95) OVER (PARTITION BY l_returnflag) AS p_hi
             FROM lineitem)
       GROUP BY l_returnflag, p_lo, p_hi""",
)
def margin_envelope(spark, sf):
    """X3 pattern: p5–p95 envelope + tolerance containment count."""
    w = Window.partitionBy("l_returnflag")
    # ONE window percentile with an array of cut points (r8): two
    # separate percentile() window expressions each buffered and
    # sorted the full per-group value list (the agg_percentile fix)
    df = (
        load(spark, sf, "lineitem")
        .withColumn(
            "ps",
            F.expr("percentile(l_extendedprice, array(0.05D, 0.95D))").over(w),
        )
        .withColumn("p_lo", F.element_at("ps", 1))
        .withColumn("p_hi", F.element_at("ps", 2))
    )
    outside = F.when(
        (F.col("l_extendedprice") < F.col("p_lo") - 100)
        | (F.col("l_extendedprice") > F.col("p_hi") + 100),
        1,
    ).otherwise(0)
    return (
        df.groupBy("l_returnflag", "p_lo", "p_hi")
        .agg(F.sum(outside).alias("n_outside"))
        .select(
            "l_returnflag",
            F.round("p_lo", 4).alias("p_lo"),
            F.round("p_hi", 4).alias("p_hi"),
            "n_outside",
        )
    )


@register(
    "wconf_filter",
    """SELECT doc_id, CAST(n_chars % 100 AS INTEGER) AS conf
       FROM documents WHERE n_chars % 100 < 35""",
)
def wconf_filter(spark, sf):
    """X4 pattern: confidence thresholding (derived pseudo-confidence)."""
    conf = (F.col("n_chars") % 100).cast("int")
    return (
        load(spark, sf, "documents")
        .withColumn("conf", conf)
        .filter(F.col("conf") < 35)
        .select("doc_id", "conf")
    )


@register(
    "garbage_ratio",
    r"""SELECT doc_id,
              round(1.0 - CAST(length(regexp_replace(text, '[^\pL]', '', 'g')) AS DOUBLE)
                          / length(text), 4) AS nonalpha_ratio,
              (1.0 - CAST(length(regexp_replace(text, '[^\pL]', '', 'g')) AS DOUBLE)
                     / length(text)) > 0.5 AS is_garbage
       FROM documents WHERE text IS NOT NULL AND length(text) > 0""",
)
def garbage_ratio(spark, sf):
    """X5 pattern: non-alpha ratio garbage classifier (\\p{L} letters)."""
    letters = F.length(F.regexp_replace("text", r"[^\p{L}]", ""))
    ratio = F.lit(1.0) - letters.cast("double") / F.length("text")
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            F.round(ratio, 4).alias("nonalpha_ratio"),
            (ratio > 0.5).alias("is_garbage"),
        )
    )


@register(
    "longs_normalize",
    """SELECT doc_id,
              replace(replace(replace(replace(text, 'ﬁ', 'fi'), 'ﬂ', 'fl'), 'ﬀ', 'ff'),
                      'ſ', 's') AS norm_text
       FROM documents WHERE text IS NOT NULL""",
)
def longs_normalize(spark, sf):
    """X6 pattern: early-modern normalization as a literal replace chain."""
    out = F.col("text")
    for lig, exp in (("ﬁ", "fi"), ("ﬂ", "fl"), ("ﬀ", "ff"), ("ſ", "s")):
        out = F.replace(out, F.lit(lig), F.lit(exp))
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", out.alias("norm_text"))
    )


@register(
    "reading_order",
    """SELECT l_orderkey, l_linenumber,
              row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_shipdate, l_linenumber) AS read_pos
       FROM lineitem""",
)
def reading_order(spark, sf):
    """X9/W1 pattern: per-document total-order reconstruction index."""
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("read_pos"),
    )


@register(
    "agg_denoise_rate",
    """SELECT lang,
              count(*) AS n_docs,
              round(avg(CASE WHEN n_chars % 100 < 35 THEN 1.0 ELSE 0.0 END), 4)
                  AS denoise_rate
       FROM documents GROUP BY lang""",
)
def agg_denoise_rate(spark, sf):
    """A1 pattern: per-slice noise-rate metrics (manifest S5 payload)."""
    noisy = F.when((F.col("n_chars") % 100) < 35, 1.0).otherwise(0.0)
    return (
        load(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(noisy), 4).alias("denoise_rate"),
        )
    )


@register(
    "udaf_mad",
    """SELECT l_returnflag, round(mad(l_quantity), 4) AS mad_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def udaf_mad(spark, sf):
    """A6: median-absolute-deviation as a vectorized grouped-agg pandas
    UDF (Arrow batch transfer; the custom robust-stat escape hatch)."""
    import numpy as np

    @F.pandas_udf("double")
    def mad(v: pd.Series) -> float:
        x = v.to_numpy(dtype="float64")
        return float(np.percentile(np.abs(x - np.percentile(x, 50.0)), 50.0))

    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(mad("l_quantity"), 4).alias("mad_qty"))
    )
