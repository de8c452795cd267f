"""Tiny-faces detection model: ResNet-101 FCN + 25-template hybrid heads.

Capability parity with DetectionModel (tinyfaces/models/model.py:7-127):
  * score_res3: 1x1 conv 512 -> (1+4)*25 = 125 channels,
  * score_res4: 1x1 conv 1024 -> 125 channels,
  * score_res4 upsampled 2x by a ConvTranspose(k=4, s=2, p=1) whose weights
    are initialized to bilinear interpolation and frozen (model.py:45-65,
    83-85), cropped to res3's spatial size, and added to score_res3.

TPU-first design notes:
  * NHWC; output is (B, H/8, W/8, 125) with channels [0:25) template logits
    and [25:125) regression as four 25-channel blocks (tx|ty|tw|th), the same
    channel ordering as the reference (loss.py:66-67, utils.py:58-61).
  * The reference's 125->125 ConvTranspose is diagonal (zero cross-channel
    weights) by construction and frozen, so we implement it as a *depthwise*
    transposed conv: a (4, 4, C) parameter, one 4x4 bilinear filter per
    channel. 125x less FLOPs/bytes than the dense form, numerically
    identical, and converted reference checkpoints drop in by extracting the
    diagonal.
  * The top-left crop of the upsampled map (model.py:107-124: both the
    train-time slice and the eval-time DagNN crop reduce to `[:h3, :w3]`)
    is a static slice, jit-friendly at any padded input size.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tinyfaces_tpu.models.resnet import RESNET101_STAGES, ResNetBackbone


def bilinear_kernel_1d(k: int) -> np.ndarray:
    """The 1-D bilinear interpolation filter torch's _init_bilinear builds
    (model.py:45-65). k=4 -> [0.25, 0.75, 0.75, 0.25]."""
    factor = np.floor((k + 1) / 2)
    center = factor if k % 2 == 1 else factor + 0.5
    taps = np.arange(1, k + 1)
    return 1.0 - np.abs(taps - center) / factor


def bilinear_upsample_init(key, shape, dtype=jnp.float32):
    """Init for the (k, k, C) depthwise transposed-conv kernel."""
    del key
    k = shape[0]
    vec = bilinear_kernel_1d(k)
    kern = np.outer(vec, vec)[:, :, None]  # (k, k, 1)
    return jnp.asarray(np.broadcast_to(kern, shape), dtype)


class DepthwiseConvTranspose2x(nn.Module):
    """Depthwise ConvTranspose(k=4, s=2, p=1): exact 2x upsampling.

    Equivalent to conv_general_dilated with lhs_dilation=2 and padding
    k-1-p = 2 per side on the dilated input; output is exactly 2H x 2W.
    The 4x4 bilinear filter is symmetric so kernel flipping is a no-op.
    """

    kernel_size: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", bilinear_upsample_init, (k, k, c), jnp.float32
        )
        rhs = kernel[:, :, None, :].astype(x.dtype)  # (k, k, 1, C) HWIO depthwise
        return jax.lax.conv_general_dilated(
            x,
            rhs,
            window_strides=(1, 1),
            padding=((k - 2, k - 2), (k - 2, k - 2)),
            lhs_dilation=(2, 2),
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class TinyFacesDetector(nn.Module):
    """The flagship model: FCN face detector with 25 anchor templates."""

    num_templates: int = 25
    num_objects: int = 1
    stage_sizes: Sequence[int] = RESNET101_STAGES
    dtype: Any = jnp.float32
    remat: bool = False

    @property
    def out_channels(self) -> int:
        return (self.num_objects + 4) * self.num_templates

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stem_precomputed: bool = False) -> jnp.ndarray:
        res3, res4 = ResNetBackbone(
            stage_sizes=self.stage_sizes, dtype=self.dtype, remat=self.remat,
            name="backbone",
        )(x, train, stem_precomputed=stem_precomputed)

        head = lambda name: nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        score3 = head("score_res3")(res3)
        score4 = head("score_res4")(res4)

        score4_up = DepthwiseConvTranspose2x(name="score4_upsample")(score4)
        # Top-left crop to res3's grid (reference model.py:107-124).
        score4_up = score4_up[:, : score3.shape[1], : score3.shape[2], :]

        return (score3 + score4_up).astype(jnp.float32)


def init_model(
    model: TinyFacesDetector,
    key: jax.Array,
    input_size: tuple[int, int] = (500, 500),
):
    """Initialize {params, batch_stats} for the detector."""
    dummy = jnp.zeros((1, *input_size, 3), jnp.float32)
    variables = model.init(key, dummy, train=False)
    return variables["params"], variables["batch_stats"]
