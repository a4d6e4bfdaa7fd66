"""Utilities: metrics logging, timers, profiling hooks."""

from zeroshotvideoclassification_tpu.utils.logging import (
    MetricsLogger,
    Timer,
)
