"""Tests for meters / TensorBoard logger / trace spans (utils/logging.py)."""

import os

import numpy as np

from sam3_lora_tpu.utils import (
    AverageMeter,
    DurationMeter,
    MemMeter,
    ProgressMeter,
    TensorBoardLogger,
    trace_span,
)


def test_average_meter():
    m = AverageMeter("loss")
    m.update(2.0, n=2)
    m.update(5.0, n=1)
    assert m.avg == (2.0 * 2 + 5.0) / 3
    m.reset()
    assert m.avg == 0.0


def test_mem_meter_runs_on_any_backend():
    m = MemMeter()
    m.update()
    assert m.peak_gb >= 0.0


def test_progress_meter_format():
    loss = AverageMeter("loss")
    loss.update(0.5)
    p = ProgressMeter(120, [loss, DurationMeter()], prefix="train ")
    msg = p.display(7)
    assert "  7/120" in msg
    assert "loss 0.5000" in msg


def test_tensorboard_logger_writes(tmp_path):
    tb = TensorBoardLogger(str(tmp_path))
    tb.log("loss", 1.5, step=0)
    tb.log_dict({"a": 1.0, "b": "skip-me"}, step=1, prefix="val/")
    tb.flush()
    tb.close()
    files = os.listdir(tmp_path)
    assert files, "logger produced no output"
    # either real event files or the JSONL fallback
    assert any("events" in f or f == "scalars.jsonl" for f in files)


def test_trace_span_noop_without_profiler():
    with trace_span("encoder"):
        x = np.ones(4).sum()
    assert x == 4.0


def test_shape_logging_wrapper_detects_novel_shapes(capsys):
    from sam3_lora_tpu.utils.logging import shape_logging_wrapper

    calls = []
    fn = shape_logging_wrapper(lambda x: calls.append(1) or x.sum(), name="f")
    a = np.zeros((2, 3))
    fn(a); fn(a)                      # same shape: logged once
    fn(np.zeros((4, 3)))              # novel: logged again
    out = capsys.readouterr().out
    assert out.count("[shapes] f: novel input combo") == 2
    assert len(fn.seen_shapes) == 2
    assert len(calls) == 3
