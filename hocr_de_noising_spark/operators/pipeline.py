"""The flagship de-noising pipeline — two implementations, one semantic.

``denoise_exploded`` (SURVEY.md §4.3 variant b): fully declarative
Catalyst plan — posexplode → parse (regexp, codegen) → one per-doc
window shuffle for page stats → flag columns → broadcast lexicon join →
iterator pandas UDF for the edit-distance tail → three more per-doc
windows (no new shuffle; same hash partitioning) → groupBy reassembly.
Exactly ONE wide shuffle end-to-end; everything else is map-side.

``denoise_fused`` (variant a): a single ``mapInPandas`` pass running
the numpy rule (rules_np.denoise_doc) per document — zero shuffles
(docs are rows; doc-atomicity is free). Arrow-batched, batch size
bounded via spark.sql.execution.arrow.maxRecordsPerBatch so one giant
document cannot blow a batch.

Both must produce byte-identical output and are cross-checked against
the constructive goldens in tests/test_golden.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hocr_de_noising_spark.operators.assemble import (
    reassemble,
    with_output_order,
    with_survival,
)
from hocr_de_noising_spark.operators.features import (
    with_doc_stats,
    with_flags,
    with_noise_decision,
)
from hocr_de_noising_spark.operators.lexicon import with_dictionary_check
from hocr_de_noising_spark.operators.parse import with_parsed_fields
from hocr_de_noising_spark.params import Params
from hocr_de_noising_spark.rules_np import Lexicon, denoise_doc

OUT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def denoise_exploded(
    docs: DataFrame,
    lexicon_df: DataFrame,
    params: Params | None = None,
) -> DataFrame:
    """Declarative Catalyst variant; see module docstring."""
    p = params or Params()
    ex = docs.select(
        "doc_id", F.posexplode_outer("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    ex = with_parsed_fields(ex)
    ex = with_doc_stats(ex, params=p)
    ex = with_flags(ex, params=p)
    ex = with_dictionary_check(ex, lexicon_df, params=p)
    ex = with_noise_decision(ex, params=p)
    ex = with_survival(ex, params=p)
    ex = with_output_order(ex)
    return reassemble(ex)


def denoise_fused(
    docs: DataFrame,
    lexicon_tokens: list[str],
    params: Params | None = None,
) -> DataFrame:
    """Single-pass mapInPandas variant running the frozen numpy rule."""
    p = params or Params()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = Lexicon(lexicon_tokens) if p.use_dictionary else None
        for pdf in batches:
            out_ids, out_spans = [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                spans = list(spans) if spans is not None else []
                out_ids.append(doc_id)
                out_spans.append(denoise_doc(spans, p, lex))
            yield pd.DataFrame({"doc_id": out_ids, "spans": out_spans})

    return docs.mapInPandas(run, schema=OUT_SCHEMA)
