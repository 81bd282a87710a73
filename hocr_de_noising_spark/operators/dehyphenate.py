"""X11 — line-merge / dehyphenation (SURVEY.md §2.3; optional, off by
default, excluded from the golden invariant).

Early-modern hyphens ('-' or '⸗') at the end of a word joined across
the line break with the following word: the continuation span is merged
into the hyphenated span (payload token rewritten, geometry/metadata of
the first kept) and dropped; offsets renumber contiguously. Operates on
CLEANED documents (output of the de-noise pipeline, spans already in
reading order), purely with lead/lag windows + array reassembly — no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HYPHENS = ("-", "⸗")


def dehyphenate(docs: DataFrame) -> DataFrame:
    """Merge hyphen-broken words across consecutive text spans."""
    ex = docs.select("doc_id", F.posexplode_outer("spans").alias("pos", "s")).select(
        "doc_id", "pos", "s.kind", "s.text", "s.media_ref"
    )
    token = F.substring_index("text", ";", 1)
    rest = F.expr("substr(text, instr(text, ';'))")
    w = Window.partitionBy("doc_id").orderBy("pos")

    is_text = F.col("kind") == "text"
    next_kind = F.lead("kind").over(w)
    next_text = F.lead("text").over(w)
    next_token = F.substring_index(next_text, ";", 1)

    hyphen_end = is_text & (
        F.substring(token, -1, 1).isin(*HYPHENS)
    )
    # stage window columns: merges uses lead(), dropped lags merges —
    # nested window expressions are not allowed in one projection
    # a continuation that itself ends in a hyphen is not merged into —
    # this makes merges provably non-overlapping (two adjacent spans can
    # never both merge), so the lag-based drop marker is exact
    next_hyphen_end = F.substring(next_token, -1, 1).isin(*HYPHENS)
    ex = ex.withColumn("next_token", next_token).withColumn(
        "merges",
        F.coalesce(
            hyphen_end & (next_kind == "text") & ~next_hyphen_end, F.lit(False)
        ),
    )
    ex = ex.withColumn("dropped", F.coalesce(F.lag("merges").over(w), F.lit(False)))

    merged_token = F.concat(F.expr(
        "substr(substring_index(text, ';', 1), 1, length(substring_index(text, ';', 1)) - 1)"
    ), F.col("next_token"))
    new_text = F.when(
        F.col("merges") & ~F.col("dropped"), F.concat(merged_token, rest)
    ).otherwise(F.col("text"))
    dropped = F.col("dropped")

    keyed = F.when(
        F.col("kind").isNotNull() & ~dropped,
        F.struct(
            F.col("pos").alias("k"),
            F.struct(
                F.col("kind").alias("kind"),
                new_text.alias("text"),
                F.col("media_ref").alias("media_ref"),
            ).alias("s"),
        ),
    )
    return (
        ex.withColumn("keyed", keyed)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("keyed")).alias("keyed"))
        .select(
            "doc_id",
            F.expr(
                "transform(keyed, (x, i) -> struct(x.s.kind AS kind, x.s.text AS text,"
                " x.s.media_ref AS media_ref, CAST(i AS int) AS offset))"
            ).alias("spans"),
        )
    )
