"""ResNet-101 backbone, truncated after layer3, in NHWC for TPU.

Architecturally equivalent to the torchvision `resnet101` the reference
wraps (tinyfaces/models/model.py:13-23: layer4 deleted, forward stops at
layer3), but built TPU-first:

* NHWC layout end-to-end (TPU convs tile the channel axis onto the MXU's
  128 lanes; NCHW would transpose on every conv).
* Explicit (not SAME) padding that reproduces PyTorch's floor-based output
  sizing, so converted torchvision/reference checkpoints are numerically
  exact (same output grid: 500x500 input -> 63x63 res3, 32x32 res4).
* A `dtype` knob for bfloat16 activations with float32 params/statistics
  (mixed precision), and optional per-stage `jax.checkpoint` remat.

Module names are chosen so the torch->JAX converter
(tools/convert_torch_checkpoint.py) is a pure name mapping:
conv1/bn1, layer{1,2,3}_{i} with conv1..3/bn1..3 and downsample_conv/bn.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision resnet101 stage depths (layer4 omitted — the reference deletes it).
RESNET101_STAGES: Tuple[int, ...] = (3, 4, 23)
RESNET50_STAGES: Tuple[int, ...] = (3, 4, 6)

# Named backbones for the CLI `--arch` knob. The reference's DetectionModel
# exposes the same capability as a `base_model` constructor argument
# (tinyfaces/models/model.py:13, default torchvision resnet101); any
# torchvision bottleneck ResNet drops in because only stage depths differ.
ARCH_STAGES: dict = {
    "resnet101": RESNET101_STAGES,
    "resnet50": RESNET50_STAGES,
}


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool with pad 1, matching torch MaxPool2d(3, 2, 1)."""
    # -inf init keeps this the canonical max-pool monoid (autodiff-able for
    # every float dtype, incl. bfloat16).
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class Bottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1(4x), residual."""

    width: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        out_ch = self.width * self.expansion

        identity = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)

        y = conv(self.width, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.width, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """Stem + layer1..layer3; returns (res3, res4) feature maps.

    res3: stride 8, 512 channels. res4: stride 16, 1024 channels.
    """

    stage_sizes: Sequence[int] = RESNET101_STAGES
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 stem_precomputed: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        x = x.astype(self.dtype)
        if not stem_precomputed:
            x = conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                     name="conv1")(x)
        # else: x is already the conv1 output — the fused pyramid's
        # folded-2x stem (ops/stemfold.py) computes it at 1x resolution,
        # composing the exact-2x bilinear upsample with conv1 into one
        # 5x5 stride-1 conv.
        x = nn.relu(norm(name="bn1")(x))
        x = max_pool_3x3_s2(x)

        block_cls = Bottleneck
        if self.remat:
            # static_argnums indexes (module, x, train) — `train` is static.
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))

        feats = {"layer1": x}
        for stage_idx, (n_blocks, width) in enumerate(
            zip(self.stage_sizes, (64, 128, 256)), start=1
        ):
            for block_idx in range(n_blocks):
                stride = 2 if (stage_idx > 1 and block_idx == 0) else 1
                x = block_cls(
                    width=width,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"layer{stage_idx}_{block_idx}",
                )(x, train)
            feats[f"layer{stage_idx}"] = x

        return feats["layer2"], feats["layer3"]
