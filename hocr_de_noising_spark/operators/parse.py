"""X1 — word-record tokenization as Catalyst expressions.

Parses the flat hOCR word-record serialization carried by text spans
(FIXTURES.md §2):

    "{token};bbox {x0} {y0} {x1} {y1};x_wconf {c};line {li};col {ci}"

Everything is JVM-side ``regexp_extract`` (whole-stage codegen; no
Python). Unparseable payloads yield null fields — parse failure is
itself noise evidence (malformed-input tolerance, SURVEY.md §2 X1).

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

_GROUPS = {
    "token": 1,
    "x0": 2,
    "y0": 3,
    "x1": 4,
    "y1": 5,
    "wconf": 6,
    "line_i": 7,
    "col_i": 8,
}


def parse_ok(text: Column) -> Column:
    return text.rlike(PAYLOAD_PATTERN)


def with_parsed_fields(df: DataFrame, text_col: str = "text", kind_col: str = "kind") -> DataFrame:
    """Add token/x0/y0/x1/y1/wconf/line_i/col_i/parse_ok columns.

    Fields are null for media spans and unparseable payloads.
    """
    text = F.col(text_col)
    ok = (F.col(kind_col) == "text") & text.isNotNull() & parse_ok(text)
    df = df.withColumn("parse_ok", F.coalesce(ok, F.lit(False)))
    extract = F.when(F.col("parse_ok"), text)
    df = df.withColumn("token", F.regexp_extract(extract, PAYLOAD_PATTERN, _GROUPS["token"]))
    for name in ("x0", "y0", "x1", "y1", "wconf", "line_i", "col_i"):
        df = df.withColumn(
            name,
            F.when(
                F.col("parse_ok"),
                F.regexp_extract(text, PAYLOAD_PATTERN, _GROUPS[name]).cast("int"),
            ),
        )
    # token must be null (not "") when parse failed, to mirror rules_np
    df = df.withColumn("token", F.when(F.col("parse_ok"), F.col("token")))
    return df
