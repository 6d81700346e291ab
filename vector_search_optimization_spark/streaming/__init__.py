from .windows import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts_stream,
    sliding_window_agg,
    tumbling_window_agg,
)
