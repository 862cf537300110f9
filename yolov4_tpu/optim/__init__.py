from yolov4_tpu.optim.optimizers import build_optimizer  # noqa: F401
from yolov4_tpu.optim.schedules import build_lr_schedule  # noqa: F401
