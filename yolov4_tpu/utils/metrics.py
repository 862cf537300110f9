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


class MetricsJSONL:
    """Append-only JSONL scalar sink for dashboards/scripts (the reference
    logs training scalars to stdout only, engine/build.py:85-103; the
    stdout log stays — this is the machine-readable copy).

    One line per record: {"ts": unix_seconds, **record}. Writes flush
    immediately so a tail -f / crash loses nothing. ``enabled=False``
    (non-primary processes) turns every call into a no-op."""

    def __init__(self, path: str, enabled: bool = True):
        import os
        self.path = path
        self.enabled = enabled
        if enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self, record: dict) -> None:
        if not self.enabled:
            return
        import json
        import time as _time
        with open(self.path, "a") as f:
            f.write(json.dumps({"ts": round(_time.time(), 3), **record},
                               default=float) + "\n")
