from .events_stream import hourly_counts_stream, range_bars_stateful  # noqa: F401
