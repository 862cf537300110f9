from yolov4_tpu.models.yolov4 import YOLOv4, build_model  # noqa: F401
from yolov4_tpu.models.darknet import CSPDarknet53  # noqa: F401
