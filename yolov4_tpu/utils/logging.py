"""Process-aware logging.

Equivalent of the reference's rank-gated logging (yolo/util/logging.py:24-92):
the primary process (``jax.process_index() == 0`` — single-controller JAX's
analogue of rank 0) logs to stdout and ``OUTPUT_DIR/stdout.log``; other
processes get a silent logger. Unlike the reference we never monkeypatch
``builtins.print``.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_FORMATTER = logging.Formatter(
    "[%(asctime)s][%(levelname)s] %(filename)s:%(lineno)3d: %(message)s",
    datefmt="%m/%d %H:%M:%S",
)

_CONFIGURED = False


def setup_logging(process_index: int = 0, output_dir: Optional[str] = None) -> logging.Logger:
    """Configure the root 'yolov4_tpu' logger. Idempotent."""
    global _CONFIGURED
    logger = logging.getLogger("yolov4_tpu")
    logger.handlers = []
    logger.propagate = False

    if process_index != 0:
        logger.addHandler(logging.NullHandler())
        logger.setLevel(logging.CRITICAL)
        _CONFIGURED = True
        return logger

    logger.setLevel(logging.DEBUG)
    stream = logging.StreamHandler(stream=sys.stdout)
    stream.setLevel(logging.DEBUG)
    stream.setFormatter(_FORMATTER)
    logger.addHandler(stream)

    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(_FORMATTER)
        logger.addHandler(fh)

    _CONFIGURED = True
    return logger


def get_logger(name: str) -> logging.Logger:
    """Child logger under the 'yolov4_tpu' root."""
    if not _CONFIGURED:
        setup_logging()
    short = name.split(".")[-1]
    return logging.getLogger(f"yolov4_tpu.{short}")
