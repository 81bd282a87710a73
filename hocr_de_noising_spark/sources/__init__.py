"""S1/S4 — corpus sources and sinks behind a thin catalog shim."""

from hocr_de_noising_spark.sources.catalog import Catalog

__all__ = ["Catalog"]
