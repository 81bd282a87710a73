"""X1 — word-record tokenization as Catalyst expressions.

Parses the flat hOCR word-record serialization carried by text spans
(FIXTURES.md §2):

    "{token};bbox {x0} {y0} {x1} {y1};x_wconf {c};line {li};col {ci}"

Validity is ONE anchored rlike; field extraction is split-based (array
element_at over the ';' segments) — far cheaper than re-running a
capturing regex per field, and exactly equivalent once the payload has
matched the anchored pattern. Everything is JVM-side (whole-stage
codegen; no Python). Unparseable payloads yield null fields — parse
failure is itself noise evidence (malformed-input tolerance).

The raw hOCR XHTML parse path lives in ``operators/hocr.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Anchored full-payload pattern; identical semantics to
# rules_np._PAYLOAD_RE (Java and Python regex agree on this subset).
PAYLOAD_PATTERN = (
    r"^([^;]*);bbox (\d+) (\d+) (\d+) (\d+);x_wconf (\d+);line (\d+);col (\d+)$"
)


def parse_ok(text: Column) -> Column:
    return text.rlike(PAYLOAD_PATTERN)


def with_parsed_fields(df: DataFrame, text_col: str = "text", kind_col: str = "kind") -> DataFrame:
    """Add token/x0/y0/x1/y1/wconf/line_i/col_i/parse_ok columns.

    Fields are null for media spans and unparseable payloads.
    """
    text = F.col(text_col)
    ok = (F.col(kind_col) == "text") & text.isNotNull() & parse_ok(text)
    df = df.withColumn("parse_ok", F.coalesce(ok, F.lit(False)))
    df = df.withColumn("_segs", F.when(F.col("parse_ok"), F.split(text, ";")))
    segs = F.col("_segs")
    bbox = F.split(F.element_at(segs, 2), " ")

    def seg_val(seg_idx: int, part_idx: int) -> Column:
        return F.element_at(F.split(F.element_at(segs, seg_idx), " "), part_idx).cast("int")

    return (
        df.withColumn("token", F.element_at(segs, 1))
        .withColumn("x0", F.element_at(bbox, 2).cast("int"))
        .withColumn("y0", F.element_at(bbox, 3).cast("int"))
        .withColumn("x1", F.element_at(bbox, 4).cast("int"))
        .withColumn("y1", F.element_at(bbox, 5).cast("int"))
        .withColumn("wconf", seg_val(3, 2))
        .withColumn("line_i", seg_val(4, 2))
        .withColumn("col_i", seg_val(5, 2))
        .drop("_segs")
    )
