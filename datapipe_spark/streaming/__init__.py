"""Structured Streaming layer (SURVEY §2.8): micro-batch event stream
simulation, validation/DLQ split, streaming MVs, dedup, and stateful
sessionization — each with a bounded deterministic replay that the
DuckDB oracle can check against the batch semantics."""

from datapipe_spark.streaming.jobs import (  # noqa: F401
    streaming_dedup_events,
    streaming_dlq_split,
    streaming_funnel_daily,
    streaming_sessionize,
    streaming_sessionize_stateful,
)
