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
