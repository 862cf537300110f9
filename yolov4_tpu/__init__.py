"""yolov4_tpu — a TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of zjykzj/YOLOv4
(PyTorch): CSPDarknet53 + SPP/FPN/PAN + anchor-based YOLO heads, COCO
training with mosaic augmentation, on-device postprocessing/NMS, data
parallelism over a TPU ICI mesh, and a standalone detect/val/train CLI
surface.

Design principles (TPU-first):
  * static shapes everywhere (fixed-K labels, fixed-K detections),
  * NHWC layouts feeding XLA convolutions on the MXU,
  * bfloat16 compute with float32 parameters/statistics,
  * data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with
    XLA collectives (no NCCL-style process groups),
  * host-side work limited to image decode and COCO bookkeeping.
"""

__version__ = "0.1.0"
