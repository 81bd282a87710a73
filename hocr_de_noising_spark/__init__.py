"""hocr_de_noising_spark — a PySpark-native hOCR de-noising engine.

A brand-new, Spark-first rebuild of the capabilities of the
Early-Modern-OCR/hOCR-De-Noising reference (reference repo unavailable;
all behavior derives from BASELINE.json's north_star/north_rule and the
published eMOP de-noising algorithm [AAAI 2015, JOCCH 2017] — see
SURVEY.md §0 for the provenance convention).

Core abstraction: an interleaved text+media span corpus

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

The engine drops/rewrites noise text spans (low confidence, garbage
strings, geometry outliers, margin noise), preserves media spans in
place, and reconstructs column/line reading order — all as declarative
DataFrame transformations plus vectorized pandas/Arrow UDFs (never
per-row Python UDFs).
"""

from hocr_de_noising_spark.params import Params, params_hash
from hocr_de_noising_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["Params", "params_hash", "get_spark", "__version__"]
