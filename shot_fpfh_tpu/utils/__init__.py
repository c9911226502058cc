from .perf import (
    Checkpoint,
    StageMetrics,
    block,
    checkpoint,
    runtime_alert,
    start_profiler_trace,
    stop_profiler_trace,
    timeit,
    trace_annotation,
)

__all__ = [
    "Checkpoint",
    "StageMetrics",
    "block",
    "checkpoint",
    "runtime_alert",
    "start_profiler_trace",
    "stop_profiler_trace",
    "timeit",
    "trace_annotation",
]
