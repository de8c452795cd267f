"""Pallas fused-bottleneck equivalence (ops/fused_block.py).

Runs the kernel in interpreter mode on the CPU backend; the same code
path compiles via Mosaic on TPU (verified on-chip, docs/PERF.md round 3).
Reference oracle: the flax module graph (models/resnet.py Bottleneck),
i.e. torchvision bottleneck semantics per tinyfaces/models/model.py:13-23.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.models.resnet import Bottleneck
from tinyfaces_tpu.ops import fused_block


def _bottleneck_vars(key, cin, width, stride=1):
    m = Bottleneck(width=width, stride=stride)
    v = m.init(key, jnp.zeros((1, 16, 16, cin), jnp.float32), False)
    return m, v


def _randomize_bn(v, rng):
    """init leaves BN stats at (0, 1); randomize so folding is exercised."""
    def walk(d):
        out = {}
        for k, val in d.items():
            if isinstance(val, dict):
                out[k] = walk(val)
            elif k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, val.shape).astype(np.float32))
            elif k in ("mean", "scale", "bias"):
                out[k] = jnp.asarray(
                    rng.normal(0.2, 0.5, val.shape).astype(np.float32))
            else:
                out[k] = val
        return out
    return {"params": walk(jax.device_get(v["params"])),
            "batch_stats": walk(jax.device_get(v["batch_stats"]))}


@pytest.mark.parametrize("cin,width,final", [(256, 64, False), (256, 64, True),
                                             (128, 64, False)])
def test_fused_bottleneck_matches_module(cin, width, final):
    rng = np.random.default_rng(0)
    m, v = _bottleneck_vars(jax.random.PRNGKey(0), cin, width)
    v = _randomize_bn(v, rng)
    has_proj = cin != width * 4

    B, H, W = 2, 8, 128
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    ref = m.apply(v, x, False)

    fw = fused_block.fold_block_weights(
        v["params"], v["batch_stats"], jnp.float32)
    assert ("wp" in fw) == has_proj
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # poison the halo rows: kernels must mask them, not rely on zeros
    xp = xp.at[:, 0].set(jnp.nan).at[:, -1].set(jnp.nan)
    got = fused_block.fused_bottleneck(xp, fw, th=4, final=final,
                                       interpret=True, dtype=jnp.float32)
    if not final:
        got = got[:, 1:H + 1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_stage_matches_module_stack():
    """Three chained blocks (proj entry + 2 identity) vs the module stack,
    with garbage halos propagating between fused blocks."""
    rng = np.random.default_rng(1)
    B, H, W, cin, width = 1, 8, 64, 64, 32

    ms, vs = [], []
    for i in range(3):
        m, v = _bottleneck_vars(jax.random.PRNGKey(i), cin if i == 0 else width * 4,
                                width)
        v = _randomize_bn(v, rng)
        ms.append(m)
        vs.append(v)

    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    ref = x
    for m, v in zip(ms, vs):
        ref = m.apply(v, ref, False)

    got = fused_block.fused_stage(
        x, [v["params"] for v in vs], [v["batch_stats"] for v in vs],
        width=width, first_stride=1, dtype=jnp.float32, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_xla_bottleneck_strided_matches_module():
    rng = np.random.default_rng(2)
    m, v = _bottleneck_vars(jax.random.PRNGKey(5), 256, 128, stride=2)
    v = _randomize_bn(v, rng)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 256)).astype(np.float32))
    ref = m.apply(v, x, False)
    got = fused_block.xla_bottleneck(x, v["params"], v["batch_stats"],
                                     stride=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_full_model_fused_layers12_equivalence():
    """stem_and_fused_layers12 + apply(layer2_precomputed=True) equals the
    plain module forward on a small model."""
    model = TinyFacesDetector(stage_sizes=(2, 2, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 64))
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    ref = model.apply(variables, x, train=False)

    res3 = fused_block.stem_and_fused_layers12(
        variables, x, stage_sizes=(2, 2, 1), dtype=jnp.float32,
        interpret=True)
    got = model.apply(variables, res3, train=False, layer2_precomputed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_maxpool_padded_matches_reduce_window():
    from tinyfaces_tpu.models.resnet import max_pool_3x3_s2

    rng = np.random.default_rng(5)
    # post-relu semantics: non-negative inputs
    x = jnp.asarray(rng.uniform(0, 3, size=(2, 32, 48, 128)).astype(np.float32))
    ref = max_pool_3x3_s2(x)
    got = fused_block.maxpool_3x3_s2_padded(x, th=4, interpret=True)
    assert got.shape == (2, 16 + 2, 24, 128)
    np.testing.assert_allclose(np.asarray(got[:, 1:17]), np.asarray(ref),
                               atol=0, rtol=0)


def test_maxpool_padded_feeds_prepadded_stage():
    """pool(padded) -> fused_stage(prepadded=True) == reduce_window -> stage."""
    from tinyfaces_tpu.models.resnet import max_pool_3x3_s2

    rng = np.random.default_rng(6)
    m, v = _bottleneck_vars(jax.random.PRNGKey(11), 64, 16)
    v = _randomize_bn(v, rng)
    x = jnp.asarray(rng.uniform(0, 2, size=(1, 16, 32, 64)).astype(np.float32))

    ref = m.apply(v, max_pool_3x3_s2(x), False)
    xp = fused_block.maxpool_3x3_s2_padded(x, th=4, interpret=True)
    got = fused_block.fused_stage(
        xp, [v["params"]], [v["batch_stats"]], width=16, first_stride=1,
        dtype=jnp.float32, th=4, interpret=True, prepadded=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_stage_xla_fallback_on_untileable_height():
    """H not divisible by TH falls back to XLA bottlenecks, same result."""
    rng = np.random.default_rng(4)
    m, v = _bottleneck_vars(jax.random.PRNGKey(7), 128, 32)
    v = _randomize_bn(v, rng)
    x = jnp.asarray(rng.normal(size=(1, 6, 32, 128)).astype(np.float32))
    ref = m.apply(v, x, False)
    got = fused_block.fused_stage(
        x, [v["params"]], [v["batch_stats"]], width=32, first_stride=1,
        dtype=jnp.float32, th=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cin,width", [(256, 64), (64, 32)])
def test_fused_bottleneck_blocked_matches_module(cin, width):
    """Blocked-spec kernel (side halo tensor) vs the flax module."""
    rng = np.random.default_rng(11)
    m, v = _bottleneck_vars(jax.random.PRNGKey(3), cin, width)
    v = _randomize_bn(v, rng)
    B, H, W = 2, 16, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    ref = m.apply(v, x, False)
    fw = fused_block.fold_block_weights(v["params"], v["batch_stats"],
                                        jnp.float32)
    got = fused_block.fused_bottleneck_blocked(x, fw, th=4, interpret=True,
                                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_fused_stage_blocked_matches_module_stack():
    """impl="blocked" through a 3-block stage equals the module stack
    (border zero-padding semantics across tile boundaries included)."""
    rng = np.random.default_rng(12)
    B, H, W, cin, width = 1, 8, 64, 64, 32

    ms, vs = [], []
    for i in range(3):
        m, v = _bottleneck_vars(jax.random.PRNGKey(i),
                                cin if i == 0 else width * 4, width)
        v = _randomize_bn(v, rng)
        ms.append(m)
        vs.append(v)

    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    ref = x
    for m, v in zip(ms, vs):
        ref = m.apply(v, ref, False)

    got = fused_block.fused_stage(
        x, [v["params"] for v in vs], [v["batch_stats"] for v in vs],
        width=width, first_stride=1, dtype=jnp.float32, th=4,
        interpret=True, impl="blocked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_full_model_fused_layers12_blocked_equivalence():
    """stem_and_fused_layers12(impl="blocked") + layer3/heads == the full
    module forward."""
    model = TinyFacesDetector(stage_sizes=(2, 2, 1), dtype=jnp.float32)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 64))
    variables = {"params": params, "batch_stats": batch_stats}
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    ref = model.apply(variables, x, train=False)
    res3 = fused_block.stem_and_fused_layers12(
        variables, x, stage_sizes=(2, 2, 1), dtype=jnp.float32,
        interpret=True, impl="blocked")
    got = model.apply(variables, res3, train=False, layer2_precomputed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_fused_bottleneck_blocked_im2col_matches():
    """im2col 3x3 formulation (one K=9*cmid matmul) == 9-matmul loop."""
    rng = np.random.default_rng(14)
    m, v = _bottleneck_vars(jax.random.PRNGKey(5), 256, 64)
    v = _randomize_bn(v, rng)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 256)).astype(np.float32))
    fw = fused_block.fold_block_weights(v["params"], v["batch_stats"],
                                        jnp.float32)
    a = fused_block.fused_bottleneck_blocked(x, fw, th=4, interpret=True,
                                             dtype=jnp.float32)
    b = fused_block.fused_bottleneck_blocked(x, fw, th=4, interpret=True,
                                             dtype=jnp.float32, im2col=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-5)
