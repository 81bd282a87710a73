"""X9 + X10 — reading-order reconstruction, media anchoring, reassembly.

All window functions share the doc_id hash partitioning introduced by
the stats window (operators/features.py), so none of them adds a
shuffle — only per-partition sorts. The final groupBy(doc_id) likewise
reuses the partitioning.

Ordering semantics (must mirror rules_np.denoise_doc exactly):

- surviving text spans rank by (col, line, x0, y0, input_pos) — the
  reading order (columns left→right, lines top→bottom, words
  left→right, input position as the final total-order tiebreak);
- each media span anchors to the nearest PRECEDING surviving text span
  in input (array) order and is emitted immediately after it (media
  sharing an anchor keep input order); media before any surviving text
  go first;
- offsets renumber contiguously from 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hocr_de_noising_spark.params import Params

_BIG = 2_147_483_647  # null-ordering sentinel for media rows

OUT_SPAN_DDL = "kind string, text string, media_ref string, offset int"


def with_survival(df: DataFrame, params: Params | None = None) -> DataFrame:
    """Decide keep/drop/rewrite per span (X10 mode flag)."""
    p = params or Params()
    is_text = F.col("kind") == "text"
    if p.mode == "rewrite":
        # rewrite_text (features.with_text_flags) is non-null only when
        # the map-side conditions held (wconf-only garbage flags +
        # dictionary hit); the geometry flags complete the rule here
        rewritten = (
            F.col("rewrite_text").isNotNull()
            & ~F.col("f_geom")
            & ~F.col("f_margin")
        )
    else:
        rewritten = F.lit(False)
    df = df.withColumn("rewritten", F.coalesce(rewritten, F.lit(False)))
    drop = is_text & F.col("is_noise") & ~F.col("rewritten")
    df = df.withColumn(
        "survives", F.col("kind").isNotNull() & ~F.coalesce(drop, F.lit(False))
    )
    emitted = F.when(F.col("rewritten"), F.col("rewrite_text")).otherwise(F.col("text"))
    return df.withColumn("emitted_text", F.when(is_text, emitted))


def with_output_order(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Reading-order rank + media anchor + final contiguous position."""
    is_surv_text = (F.col("kind") == "text") & F.col("survives")

    # 1-based reading-order rank among surviving text spans, via a
    # running conditional count with survivors-first ordering.
    w_read = (
        Window.partitionBy(doc_col)
        .orderBy(
            F.when(is_surv_text, 0).otherwise(1),
            F.coalesce(F.col("col_i"), F.lit(_BIG)),
            F.coalesce(F.col("line_i"), F.lit(_BIG)),
            F.coalesce(F.col("x0"), F.lit(_BIG)),
            F.coalesce(F.col("y0"), F.lit(_BIG)),
            F.col("pos"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "text_rank", F.sum(F.when(is_surv_text, 1).otherwise(0)).over(w_read)
    )

    # nearest preceding surviving text span, in input order
    w_pos = (
        Window.partitionBy(doc_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "anchor_rank",
        F.last(F.when(is_surv_text, F.col("text_rank")), ignorenulls=True).over(w_pos),
    )

    return df


def reassemble(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Collect surviving spans back into the ordered spans array.

    The final output order is (anchor_rank, text-before-media, input
    pos) — assigned INSIDE the array: array_sort on the key prefix of
    the collected structs, then an indexed transform renumbers offsets
    contiguously. This avoids a third per-doc window sort; the groupBy
    is an ObjectHashAggregate that needs no sort at all.
    """
    k1 = F.coalesce(F.col("anchor_rank"), F.lit(-1))
    k2 = F.when(F.col("kind") == "text", 0).otherwise(1)
    span = F.struct(
        F.col("kind").alias("kind"),
        F.col("emitted_text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    keyed = F.when(
        F.col("survives"),
        F.struct(
            k1.alias("k1"), k2.alias("k2"), F.col("pos").alias("k3"), span.alias("s")
        ),
    )
    return (
        df.groupBy(doc_col)
        .agg(F.array_sort(F.collect_list(keyed)).alias("keyed"))
        .select(
            doc_col,
            F.expr(
                "transform(keyed, (x, i) -> "
                "struct(x.s.kind AS kind, x.s.text AS text, "
                "x.s.media_ref AS media_ref, CAST(i AS int) AS offset))"
            ).alias("spans"),
        )
    )
