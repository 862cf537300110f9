from yolov4_tpu.parallel.mesh import create_mesh  # noqa: F401
from yolov4_tpu.parallel.train_step import TrainState, make_train_step, create_train_state  # noqa: F401
