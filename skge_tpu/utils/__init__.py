"""Auxiliary subsystems: checkpointing, metrics, profiling (SURVEY.md §5)."""

from skge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from skge_tpu.utils.debug import (
    assert_finite_state,
    checked_step,
    validate_triples,
)
from skge_tpu.utils.metrics import MetricsLogger, StepTimer, profile_trace

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "StepTimer",
    "profile_trace",
    "checked_step",
    "validate_triples",
    "assert_finite_state",
]
