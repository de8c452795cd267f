"""tinyfaces_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
varunagrawal/tiny-faces-pytorch (Hu & Ramanan, CVPR'17 "Finding Tiny Faces").

Layout:
  ops/        numeric primitives: box algebra, dense IoU overlap, GT assignment,
              NMS, balance sampling, on-device image ops (all jittable, static shapes)
  models/     ResNet-101 FCN backbone + 25-template hybrid-resolution heads (Flax)
  parallel/   device-mesh / data-parallel train & eval step builders
  data/       WIDER Face dataset, host-side decode/augment, device-side GT targets
  clustering/ offline k-medoids template generation
  utils/      visualization helpers

Everything after JPEG decode runs on device; all device code is functional,
statically shaped, and compiled with jax.jit.
"""

__version__ = "0.1.0"
