from yolov4_tpu.ops import boxes  # noqa: F401
