"""Central configuration for the tiny-faces TPU detector.

Mirrors the hyper-parameter surface of the reference
(tinyfaces/datasets/wider_face.py:24-29,55 and main.py:18-36) as frozen
dataclasses so every jitted function closes over static Python values.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ImageNet statistics used by the reference transforms (main.py:44-46).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)

NUM_TEMPLATES = 25
NUM_OBJECTS = 1


@dataclasses.dataclass(frozen=True)
class ReceptiveField:
    """Receptive-field geometry of the score map.

    Matches the hard-coded dict in the reference (wider_face.py:55,
    detect_image.py:37): size 859, stride 8, offset -1 for a ResNet-101
    truncated after layer3 with the res3-resolution fused score map.
    """

    size: Tuple[int, int] = (859, 859)
    stride: Tuple[int, int] = (8, 8)
    offset: Tuple[int, int] = (-1, -1)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static detector hyper-parameters (reference wider_face.py:24-29)."""

    num_templates: int = NUM_TEMPLATES
    num_objects: int = NUM_OBJECTS
    input_size: Tuple[int, int] = (500, 500)
    heatmap_size: Tuple[int, int] = (63, 63)
    pos_thresh: float = 0.7
    neg_thresh: float = 0.3
    pos_fraction: float = 0.5
    sample_size: int = 256
    hard_neg_loss_thresh: float = 0.03  # loss.py:62 online hard-negative cutoff
    rf: ReceptiveField = ReceptiveField()
    # Static padding bound for the per-crop ground-truth count. WIDER crops of
    # 500x500 rarely exceed ~150 faces; boxes beyond the bound are dropped.
    max_gt: int = 192

    @property
    def out_channels(self) -> int:
        return (self.num_objects + 4) * self.num_templates


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training schedule (reference main.py:25-31,66-83)."""

    lr: float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 5e-4
    batch_size: int = 12
    epochs: int = 50
    start_epoch: int = 0
    save_every: int = 10
    lr_step_epochs: int = 20
    lr_gamma: float = 0.1
    workers: int = 8


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol (reference evaluate_model.py:24-25, evaluation.py:27)."""

    prob_thresh: float = 0.03
    nms_thresh: float = 0.3
    scales: Tuple[int, ...] = (-2, -1, 0, 1)  # pyramid exponents: 2**s
    # Static shape bounds for the on-device decode: detections per scale kept
    # by top-k before cross-scale NMS, and max final detections.
    max_dets_per_scale: int = 1000
    max_total_dets: int = 750
    # Compute the 2x pyramid level's stem at 1x resolution by folding the
    # exact-2.0 bilinear upsample into conv1 (ops/stemfold.py): never
    # materializes the 2x canvas. Border-exact; interior differs from
    # resize+conv only in fp summation order.
    fold_stem: bool = True
    # Pyramid-level resampling kernel. "linear": device
    # scale_and_translate(linear, antialias) on normalized floats (fast
    # default; a known, bounded deviation from the reference's
    # resampling). "pil": PIL-bilinear-matched resize on the uint8 pixel
    # grid (ops/pilresize.py — Pillow's tap windows, fixed-point weight
    # quantization, per-pass 8-bit rounding; the host oracle is
    # byte-exact vs live PIL, the on-device f32 version flips ~1e-4 of
    # bytes by +-1/255), fused in-program — reference resampling without
    # host_resize's one-dispatch-per-scale cost. Requires transfer="rgb"
    # (lossy wires defeat the point) and disables fold_stem on the 2x
    # level.
    resample: str = "linear"
    # Per-scale template pruning. "reference": reproduce models/utils.py:
    # 15-44 exactly, INCLUDING its dead branch — the type-B (natural-scale
    # 2.0, 19-37 px) templates are zeroed at every pyramid scale because
    # every validity test compares their scale column against 1.0, so only
    # ids 4..11 (32-109 px) ever emit. "natural": the branch as written
    # intends (and Hu's MATLAB tiny_face_detector does): type-B templates
    # fire at upsampled scales (scale > 1), where the 2x level's effective
    # resolution supports them — the templates that exist precisely for
    # 10-30 px faces (the r5 synthetic recall plateau band, PERF 5d/5g).
    # All 25 template channels are trained either way (GT assignment uses
    # the full set), so a reference-trained checkpoint works with both.
    template_pruning: str = "reference"
    # Hand-written backbone conv kernels were tried and EXCISED after
    # losing their on-chip A/Bs (docs/PERF.md rounds 3-4): width-packed
    # layer1 5% slower e2e (relayout copies + doubled weights); Pallas
    # fused layer1/2 bottlenecks 606.9 (blocked) / 514 (element) vs XLA's
    # 424.8 ms/batch32. XLA's own conv fusion is the maintained path.
