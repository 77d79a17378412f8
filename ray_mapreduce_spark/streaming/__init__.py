from .windows import (
    events_stream,
    session_counts,
    sessionize_gap_stream,
    sliding_counts,
    stateful_running_counts,
    stream_dedup,
    stream_stream_purchase_click_join,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "sessionize_gap_stream",
    "stateful_running_counts",
    "stream_dedup",
    "stream_stream_purchase_click_join",
]
