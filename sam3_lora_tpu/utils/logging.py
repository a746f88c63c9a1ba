"""Logging + meters (reference ``sam3/train/utils/logger.py`` /
``train_utils.py:155-277`` equivalents, single-controller simplified)."""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional


def setup_logging(
    output_dir: Optional[str] = None,
    level: int = logging.INFO,
    name: str = "sam3_lora_tpu",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s", "%H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class AverageMeter:
    """Running average (reference train_utils.py:155-180)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class DurationMeter:
    def __init__(self):
        self.t0 = time.time()

    def reset(self):
        self.t0 = time.time()

    @property
    def elapsed(self) -> float:
        return time.time() - self.t0


class MemMeter:
    """Peak device-memory meter (reference ``MemMeter``
    train_utils.py:182-220, which resets/reads the CUDA peak allocator).
    On TPU, live/peak bytes come from ``device.memory_stats()``; falls back
    to 0 on backends that do not expose stats (CPU)."""

    def __init__(self, device=None):
        import jax

        self.device = device or jax.devices()[0]
        self.reset()

    def _stats(self) -> dict:
        try:
            return self.device.memory_stats() or {}
        except Exception:
            return {}

    def reset(self):
        self.start_bytes = self._stats().get("bytes_in_use", 0)
        self.peak = 0

    def update(self):
        s = self._stats()
        peak = s.get("peak_bytes_in_use", s.get("bytes_in_use", 0))
        self.peak = max(self.peak, peak)

    @property
    def peak_gb(self) -> float:
        self.update()
        return self.peak / 2**30


class ProgressMeter:
    """Batch-progress pretty printer (reference train_utils.py:242-277)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        n = len(str(num_batches))
        self.fmt = "{:" + str(n) + "d}/" + str(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int, logger=None):
        parts = [self.prefix + self.fmt.format(batch)]
        for m in self.meters:
            if isinstance(m, AverageMeter):
                parts.append(f"{m.name} {m.avg:.4f}")
            elif isinstance(m, MemMeter):
                parts.append(f"mem {m.peak_gb:.2f}GB")
            elif isinstance(m, DurationMeter):
                parts.append(f"t {m.elapsed:.1f}s")
        msg = "  ".join(parts)
        (logger.info if logger else print)(msg)
        return msg


class TensorBoardLogger:
    """Scalar logger -> TensorBoard event files (reference ``Logger`` /
    ``make_tensorboard_logger`` logger.py:22-146). Uses torch's writer when
    the tensorboard package is importable, else buffers to a JSONL file so
    training never depends on the optional package."""

    def __init__(self, log_dir: str, flush_secs: int = 30):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._writer = None
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir, flush_secs=flush_secs)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def log(self, tag: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)
        else:
            import json

            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": int(step)})
                + "\n"
            )

    def log_dict(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            try:
                self.log(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
        elif self._jsonl is not None:
            self._jsonl.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
        elif self._jsonl is not None:
            self._jsonl.close()


class trace_span:
    """Named profiler span (reference ``torch.profiler.record_function``
    ranges around every major stage, sam3_image.py:449-479). Wraps
    ``jax.profiler.TraceAnnotation`` so spans show up in Perfetto traces
    captured with :func:`capture_trace`; zero overhead when not tracing."""

    def __init__(self, name: str):
        self.name = name
        self._ctx = None

    def __enter__(self):
        import jax

        self._ctx = jax.profiler.TraceAnnotation(self.name)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)


def capture_trace(log_dir: str):
    """Context manager: capture a Perfetto/XPlane trace of the enclosed steps
    (reference: torch.profiler; ours: ``jax.profiler.trace``). View with
    tensorboard or ui.perfetto.dev."""
    import jax

    return jax.profiler.trace(log_dir, create_perfetto_trace=True)


def shape_logging_wrapper(fn, name: str = None, logger=None):
    """Log each NOVEL input shape/dtype combination the wrapped callable
    sees (reference ``perflib/compile.py:53-99``): the recompile-debugging
    tool — under jit, every new combination printed here is a new trace.
    """
    import jax

    seen = set()
    label = name or getattr(fn, "__name__", "fn")
    out = logger.info if logger else print

    def describe(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return tuple(
            (tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
            for l in leaves
        )

    def wrapped(*args, **kwargs):
        sig = (describe(args), describe(kwargs))
        if sig not in seen:
            seen.add(sig)
            shapes = [s for s, _ in sig[0]]
            out(
                f"[shapes] {label}: novel input combo #{len(seen)}: "
                f"{shapes}"
            )
        return fn(*args, **kwargs)

    wrapped.seen_shapes = seen
    return wrapped
