from fintech_lakehouse_spark.streaming.listener import (
    StreamMetricsListener,
)
from fintech_lakehouse_spark.streaming.events import (
    dedup_events_stream,
    foreach_batch_cdf,
    foreach_batch_scd2,
    foreach_batch_upsert,
    purchase_click_stream_join,
    purchase_click_stream_join_outer,
    read_events_stream,
    sessionize_stream,
    sessionize_with_timeout,
    stateful_user_totals,
    table_as_of_batch,
    user_funnel_state,
    user_value_ema,
    user_value_ema_tws,
    windowed_event_counts,
)

__all__ = [
    "StreamMetricsListener",
    "dedup_events_stream",
    "foreach_batch_cdf",
    "foreach_batch_scd2",
    "foreach_batch_upsert",
    "purchase_click_stream_join",
    "purchase_click_stream_join_outer",
    "read_events_stream",
    "sessionize_stream",
    "sessionize_with_timeout",
    "stateful_user_totals",
    "table_as_of_batch",
    "user_funnel_state",
    "user_value_ema",
    "user_value_ema_tws",
    "windowed_event_counts",
]
