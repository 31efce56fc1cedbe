"""Ground-Plane-Polling TPU: a TPU-native (JAX/XLA/Pallas) monocular 3D object
detection framework with the capabilities of arangesh/Ground-Plane-Polling.

The reference pipeline (RetinaNet-style 2D detector + keypoint regression +
joint class-orientation classification + per-class dimension regression +
ground-plane polling + closed-form 6-DoF pose recovery) is re-designed here
TPU-first:

  * one jitted fixed-shape inference function (no dynamic shapes anywhere),
  * mask-based filtering / fixed-size greedy NMS instead of tf dynamic NMS,
  * plane polling as one fused batched tensor program (optionally a Pallas
    kernel streaming the plane database through VMEM),
  * the pose solver as vectorized branch-free math on device,
  * data-parallel training via jax.sharding.Mesh + jit (collectives over ICI).

Subpackages
  ops/        geometry + detection math (anchors, coders, NMS, polling, pose)
  models/     flax backbones (resnet/vgg/densenet/mobilenet), FPN, heads
  training/   losses, train step, schedules, checkpointing
  parallel/   mesh + sharding helpers
  data/       KITTI dataset layer, label prep, augmentation
  utils/      eval (mAP + L1 errors), visualization, KITTI writer
  bin/        CLI entry points (train / convert-model / run-network / debug)
  kernels/    Pallas TPU kernels
"""

__version__ = "0.1.0"
