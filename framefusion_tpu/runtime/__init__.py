from .engine import CompressionEngine, PrefillResult, plan_length
from .telemetry import CompressionEvent, PrefillTelemetry
from . import profiling

__all__ = [
    "CompressionEngine",
    "PrefillResult",
    "plan_length",
    "CompressionEvent",
    "PrefillTelemetry",
    "profiling",
]
