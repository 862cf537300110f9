"""Running metrics (reference yolo/util/metric.py:11-27 equivalent)."""

from __future__ import annotations


class AverageMeter:
    """Tracks current value, running sum, count and mean."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Timer:
    """Wall-clock timer with EMA, for step-time / images-per-second logging."""

    def __init__(self, ema: float = 0.9) -> None:
        self._ema = ema
        self.smoothed = None

    def update(self, seconds: float) -> float:
        if self.smoothed is None:
            self.smoothed = seconds
        else:
            self.smoothed = self._ema * self.smoothed + (1 - self._ema) * seconds
        return self.smoothed
