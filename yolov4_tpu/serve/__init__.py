"""Production serving runtime: dynamic batching onto static-shape TPU
programs, multi-size buckets, metrics, and an HTTP front end."""

from yolov4_tpu.serve.artifact import ArtifactPredictor
from yolov4_tpu.serve.batcher import DetectionResult, DynamicBatcher
from yolov4_tpu.serve.metrics import ServeMetrics
from yolov4_tpu.serve.server import (ServingRuntime, make_server,
                                     result_to_json, serve_background)

__all__ = [
    "ArtifactPredictor", "DetectionResult", "DynamicBatcher",
    "ServeMetrics", "ServingRuntime", "make_server", "result_to_json",
    "serve_background",
]
