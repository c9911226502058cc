from .perf import Checkpoint, StageMetrics, block, checkpoint, runtime_alert, timeit

__all__ = ["Checkpoint", "StageMetrics", "block", "checkpoint", "runtime_alert", "timeit"]
