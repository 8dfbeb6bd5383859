from genpose2_tpu.utils.profiling import StageTimer, trace_context
from genpose2_tpu.utils.logging import MetricsLogger

__all__ = ["StageTimer", "trace_context", "MetricsLogger"]
