from .logging import (
    setup_logging,
    AverageMeter,
    DurationMeter,
    MemMeter,
    ProgressMeter,
    TensorBoardLogger,
    trace_span,
    capture_trace,
)

__all__ = [
    "setup_logging",
    "AverageMeter",
    "DurationMeter",
    "MemMeter",
    "ProgressMeter",
    "TensorBoardLogger",
    "trace_span",
    "capture_trace",
]
