from .pipeline import (
    decode_events,
    run_replay,
    start_pipeline,
    streaming_session_window,
    streaming_sliding_window,
    streaming_tumbling_window,
)
from .sinks import write_batch_fanout

__all__ = [
    "decode_events",
    "run_replay",
    "start_pipeline",
    "streaming_session_window",
    "streaming_sliding_window",
    "streaming_tumbling_window",
    "write_batch_fanout",
]
