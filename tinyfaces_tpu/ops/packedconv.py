"""Width-packed layer1: run the 64-channel ResNet stage with 2 pixels
packed into the channel axis.

Why: the MXU's 128 lanes half-fill at C=64 — measured on-chip (docs/
PERF.md round 3), the layer1 3x3 runs at 41 TFLOP/s vs 157 for C=512,
and the 1x1s at 5 TFLOP/s. Packing two horizontally-adjacent pixels into
one 128-channel vector doubles the FLOPs (the packed kernels are block-
structured with zero cross terms) but fills the lanes; the packed 3x3
measured 0.70x the unpacked time at equal pixel count. Only the C=64
stage wins: at C>=128 the lanes are already full and 2x FLOPs loses.

How: with NHWC (C minor), packing is a pure reshape — (B, H, W, C) ->
(B, H, W/2, 2C), phase-major channel layout [q*C + c] for phase q in
{0,1}. Kernel transforms:

  1x1, C->D:  packed (1, 1, 2C, 2D) block-diagonal — phase q maps to
              phase q, zero cross-phase blocks.
  3x3, C->D:  output phase p at packed column w reads original column
              i = 2w + p + kx - 1 = 2(w + t - 1) + q, so the original
              tap kx lands at packed tap t = (s - s%2)/2 + 1, phase
              q = s%2, s = p + kx - 1. Packed kernel (3, 3, 2C, 2D)
              with half its entries zero.

Everything here is evaluation-path only (BatchNorm folds its running
statistics) and operates functionally on the model's existing parameter
tree — the flax module graph and checkpoints are untouched; the backbone
just skips its own stem+layer1 via `layer1_precomputed=True`
(models/resnet.py). Equivalence vs the module path is pinned by
tests/test_packedconv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyfaces_tpu.models.resnet import max_pool_3x3_s2

_EPS = 1e-5


def pack_x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C); W must be even."""
    b, h, w, c = x.shape
    assert w % 2 == 0, w
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W2, 2C) -> (B, H, 2*W2, C)."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def pack_kernel_1x1(w: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, D) -> (1, 1, 2C, 2D) block-diagonal."""
    _, _, c, d = w.shape
    out = jnp.zeros((1, 1, 2 * c, 2 * d), w.dtype)
    out = out.at[:, :, :c, :d].set(w)
    out = out.at[:, :, c:, d:].set(w)
    return out


def pack_kernel_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, D) -> (3, 3, 2C, 2D) per the phase algebra above."""
    _, _, c, d = w.shape
    out = jnp.zeros((3, 3, 2 * c, 2 * d), w.dtype)
    for p in (0, 1):
        for kx in (0, 1, 2):
            s = p + kx - 1
            q = s % 2
            t = (s - q) // 2 + 1
            out = out.at[:, t, q * c:(q + 1) * c, p * d:(p + 1) * d].set(
                w[:, kx])
    return out


def _dup(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector -> packed (phase-major) layout."""
    return jnp.concatenate([v, v])


def _bn_eval(x, bn_params, bn_stats, dtype, packed=True):
    scale = bn_params["scale"]
    bias = bn_params["bias"]
    mean = bn_stats["mean"]
    var = bn_stats["var"]
    if packed:
        scale, bias, mean, var = map(_dup, (scale, bias, mean, var))
    inv = (scale / jnp.sqrt(var + _EPS)).astype(dtype)
    return x * inv + (bias - mean * scale / jnp.sqrt(var + _EPS)).astype(dtype)


def _conv(x, kernel, dtype):
    k = kernel.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _packed_bottleneck(x, params, stats, dtype):
    """One layer1 bottleneck in packed space (stride 1 throughout)."""
    identity = x
    if "downsample_conv" in params:
        identity = _conv(
            x, pack_kernel_1x1(params["downsample_conv"]["kernel"]), dtype)
        identity = _bn_eval(identity, params["downsample_bn"],
                            stats["downsample_bn"], dtype)

    y = _conv(x, pack_kernel_1x1(params["conv1"]["kernel"]), dtype)
    y = jax.nn.relu(_bn_eval(y, params["bn1"], stats["bn1"], dtype))
    y = _conv(y, pack_kernel_3x3(params["conv2"]["kernel"]), dtype)
    y = jax.nn.relu(_bn_eval(y, params["bn2"], stats["bn2"], dtype))
    y = _conv(y, pack_kernel_1x1(params["conv3"]["kernel"]), dtype)
    y = _bn_eval(y, params["bn3"], stats["bn3"], dtype)
    return jax.nn.relu(y + identity)


def stem_tail_packed_layer1(variables, stem_out: jnp.ndarray,
                            n_blocks: int, dtype) -> jnp.ndarray:
    """conv1-output -> bn1/relu/maxpool -> width-packed layer1 -> unpacked
    layer1 output, numerically equivalent (up to fp summation order) to the
    module path's stage 1. Feed the result to the model with
    `layer1_precomputed=True`."""
    bp = variables["params"]["backbone"]
    bs = variables["batch_stats"]["backbone"]

    x = jax.nn.relu(_bn_eval(stem_out, bp["bn1"], bs["bn1"], dtype,
                             packed=False))
    x = max_pool_3x3_s2(x)
    x = pack_x(x)
    for i in range(n_blocks):
        x = _packed_bottleneck(x, bp[f"layer1_{i}"], bs[f"layer1_{i}"],
                               dtype)
    return unpack_x(x)


def conv1_stem(variables, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Functional conv1 (7x7/2, pad 3) matching the module stem."""
    kernel = variables["params"]["backbone"]["conv1"]["kernel"]
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
