from .events_stream import (  # noqa: F401
    dedup_events_stream,
    hourly_counts_stream,
    range_bars_stateful,
)
from .signal_stream import champion_signals_stateful  # noqa: F401
from .decon_stream import (  # noqa: F401
    bloom_guard_batch,
    decontamination_guard_stateful,
)
