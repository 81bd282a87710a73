"""Structured Streaming parity surface (SURVEY.md §2.9)."""

from hocr_de_noising_spark.streaming.incremental import (
    incremental_denoise_stream,
    sessionized_events_stream,
    windowed_events_stream,
)

__all__ = [
    "incremental_denoise_stream",
    "windowed_events_stream",
    "sessionized_events_stream",
]
