"""Structured Streaming surfaces: the events analytics of
``rdfind_spark.functions.events`` re-expressed over ``readStream`` with
watermarks, plus a custom stateful sessionizer
(``applyInPandasWithState``).  The reference has no streaming at all
(SURVEY §2.9); this is part of the beyond-reference pipeline surface."""

from rdfind_spark.streaming.windows import (  # noqa: F401
    daily_purchase_totals_stream,
    hourly_counts_stream,
    run_available_now,
    stream_documents,
    stream_error_click_join,
    stream_events,
    stream_to_partitioned_parquet,
    streaming_anomalies,
    streaming_contamination_guard,
    streaming_contamination_oracle_sql,
    streaming_dedup_deliveries,
    streaming_dedup_deliveries_oracle_sql,
    streaming_exact_dedup,
    session_window_stream,
    session_window_stream_oracle_sql,
    streaming_sessionize,
)
