"""Pallas-fused ResNet bottleneck blocks for the evaluation path.

Why: the per-op device profile of the fused pyramid (docs/PERF.md round 3)
shows layer1/layer2 dominated by HBM traffic, not FLOPs: every bottleneck
materializes its c256/c512 intermediates in HBM (reduce -> 3x3 -> expand
-> residual add is 5 full-tensor round trips), and the conv fusions run at
37-98 TFLOP/s against a 573-713 GB/s memory wall. Fusing one whole
stride-1 bottleneck into a single Pallas kernel cuts the block's HBM
traffic to `read x + write out` — the 1x1s become MXU matmuls over
row-tiles held in VMEM and the 3x3 is nine shifted matmuls on the
VMEM-resident tile.

Capability parity: numerically equivalent (BatchNorm running statistics
folded into conv weights — inference only) to torchvision's Bottleneck,
reference tinyfaces/models/model.py:13-23 via torchvision resnet101.

Halo scheme: Mosaic supports `pl.Element` block dims with *high* padding
only, so a stage's activations travel physically padded by one row on
each side (B, H+2, W, C). Block i reads rows [i*TH, i*TH+TH+2) — always
in-bounds — and writes rows [i*TH+1, i*TH+TH+1). Halo rows of a fused
block's *output* are uninitialized; every kernel masks its input halo
rows to zero by global row index, so garbage never propagates (and the
3x3's zero-padding semantics at the image border come out exactly right).
The final block of a stage writes an unpadded (B, H, W, C) tensor.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


# ---------------------------------------------------------------------------
# BatchNorm folding (inference): conv + BN == conv' + bias
# ---------------------------------------------------------------------------

def fold_conv_bn(kernel: jnp.ndarray, bn_params, bn_stats,
                 eps: float = _EPS) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, ci, co) kernel + BN(scale, bias, mean, var) -> folded
    (kernel', bias') in f32."""
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return kernel * g, bn_params["bias"] - bn_stats["mean"] * g


def fold_block_weights(params, stats, dtype) -> dict:
    """Folded weight dict for one bottleneck block.

    Matmul operands are cast to `dtype` (the model compute dtype); biases
    stay f32 (they are added to the f32 MXU accumulators) with shape
    (1, C) — TPU VMEM wants >= 2-D.
    """
    def fold(conv, bn):
        k, b = fold_conv_bn(params[conv]["kernel"], params[bn], stats[bn])
        return k.astype(dtype), b.astype(jnp.float32)[None, :]

    w1, b1 = fold("conv1", "bn1")      # (1, 1, Cin, w)
    w2, b2 = fold("conv2", "bn2")      # (3, 3, w, w)
    w3, b3 = fold("conv3", "bn3")      # (1, 1, w, Cout)
    out = {
        "w1": w1[0, 0], "b1": b1,
        "w2": w2, "b2": b2,
        "w3": w3[0, 0], "b3": b3,
    }
    if "downsample_conv" in params:
        wp, bp = fold("downsample_conv", "downsample_bn")
        out["wp"] = wp[0, 0]
        out["bp"] = bp
    return out


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------

def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  *rest, th: int, hh: int, wdt: int, cin: int, cmid: int,
                  cout: int, has_proj: bool, dtype):
    """One (1, TH+2, W, Cin) tile -> (1, TH, W, Cout) tile."""
    if has_proj:
        wp_ref, bp_ref, o_ref = rest
    else:
        o_ref = rest[0]

    i = pl.program_id(1)
    x = x_ref[0]  # (TH+2, W, Cin)

    f32 = jnp.float32
    xm = x.reshape((th + 2) * wdt, cin)

    # 1x1 reduce + bias + relu
    t1 = jnp.dot(xm, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    t1 = jnp.maximum(t1, 0.0).astype(dtype).reshape(th + 2, wdt, cmid)
    # Zero the halo rows *after* bias+relu: the 3x3's zero padding applies
    # to its input t1 (a zero x row would give t1 = relu(b1) != 0). This
    # also stops garbage halo content (uninitialized rows from a previous
    # fused block) from entering the 3x3 — rows are independent through
    # the row-wise matmul above, so garbage stays in its own halo row
    # until this select. Real rows are global padded rows 1..H.
    gp = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + i * th
    t1 = jnp.where((gp >= 1) & (gp <= hh), t1, jnp.zeros((), t1.dtype))

    # 3x3 as nine shifted matmuls on the VMEM tile (zero width-halo).
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (0, 0)))
    acc = b2_ref[:].astype(f32) * jnp.ones((th * wdt, 1), f32)
    for dy in range(3):
        for dx in range(3):
            patch = t1p[dy:dy + th, dx:dx + wdt].reshape(th * wdt, cmid)
            acc = acc + jnp.dot(patch, w2_ref[dy, dx],
                                preferred_element_type=f32)
    t2 = jnp.maximum(acc, 0.0).astype(dtype)

    # 1x1 expand + bias; residual add in the compute dtype (the module
    # adds bf16 activations too) — halves the f32 scratch footprint.
    y = (jnp.dot(t2, w3_ref[:], preferred_element_type=f32)
         + b3_ref[:]).astype(dtype)

    x_mid = x[1:th + 1].reshape(th * wdt, cin)
    if has_proj:
        skip = (jnp.dot(x_mid, wp_ref[:], preferred_element_type=f32)
                + bp_ref[:]).astype(dtype)
    else:
        skip = x_mid
    o = jnp.maximum(y + skip, jnp.zeros((), dtype))
    o_ref[0] = o.reshape(th, wdt, cout)


@functools.partial(
    jax.jit,
    static_argnames=("th", "final", "interpret", "dtype"),
)
def fused_bottleneck(xp: jnp.ndarray, fw: dict, *, th: int = 4,
                     final: bool = False, interpret: bool = False,
                     dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """One stride-1 bottleneck on halo-padded activations.

    xp: (B, H+2, W, Cin) — rows 1..H real, rows 0 and H+1 arbitrary.
    Returns (B, H+2, W, Cout) padded (halo rows uninitialized) or, with
    `final=True`, the unpadded (B, H, W, Cout).
    """
    b, hp, wdt, cin = xp.shape
    hh = hp - 2
    assert hh % th == 0, (hh, th)
    cmid = fw["w1"].shape[1]
    cout = fw["w3"].shape[1]
    has_proj = "wp" in fw

    kern = functools.partial(
        _block_kernel, th=th, hh=hh, wdt=wdt, cin=cin, cmid=cmid,
        cout=cout, has_proj=has_proj, dtype=dtype)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2), pl.Element(wdt), pl.Element(cin)),
        lambda bi, i: (bi, i * th, 0, 0), memory_space=pltpu.VMEM)
    if final:
        out_shape = jax.ShapeDtypeStruct((b, hh, wdt, cout), xp.dtype)
        o_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(th), pl.Element(wdt), pl.Element(cout)),
            lambda bi, i: (bi, i * th, 0, 0), memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((b, hp, wdt, cout), xp.dtype)
        o_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(th), pl.Element(wdt), pl.Element(cout)),
            lambda bi, i: (bi, i * th + 1, 0, 0), memory_space=pltpu.VMEM)

    ins = [fw["w1"], fw["b1"], fw["w2"], fw["b2"], fw["w3"], fw["b3"]]
    in_specs = [x_spec] + [vspec] * 6
    if has_proj:
        ins += [fw["wp"], fw["bp"]]
        in_specs += [vspec, vspec]

    flops = 2 * b * hh * wdt * (cin * cmid + 9 * cmid * cmid + cmid * cout
                                + (cin * cout if has_proj else 0))
    bytes_est = xp.dtype.itemsize * b * hh * wdt * (cin + cout)
    return pl.pallas_call(
        kern,
        grid=(b, hh // th),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # worst tile (layer1 at the 2x pyramid level, W=512) sums to
            # ~14 MB of live buffers + double-buffered I/O; give Mosaic
            # headroom over its 16 MB default scoped budget.
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_est, transcendentals=0),
    )(xp, *ins)


# ---------------------------------------------------------------------------
# Blocked-spec variant: standard Blocked tiling + a precomputed 2-row halo
# tensor, so Mosaic's automatic input/output double-buffering applies.
# ---------------------------------------------------------------------------

def _block_kernel_blocked(x_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          w3_ref, b3_ref, *rest, th: int, hh: int, wdt: int,
                          cin: int, cmid: int, cout: int, has_proj: bool,
                          dtype, im2col: bool = False):
    """One (1, TH, W, Cin) Blocked tile + its (2, W, Cin) halo rows ->
    (1, TH, W, Cout) tile. Same math as _block_kernel; the halo travels
    as a second input instead of overlapping Element reads, because
    Element-indexed blocks measured serialized DMA (no double-buffering,
    docs/PERF.md round 3h)."""
    if has_proj:
        wp_ref, bp_ref, o_ref = rest
    else:
        o_ref = rest[0]

    i = pl.program_id(1)
    x = jnp.concatenate(
        [halo_ref[0, 0, :1], x_ref[0], halo_ref[0, 0, 1:]], axis=0)

    f32 = jnp.float32
    xm = x.reshape((th + 2) * wdt, cin)

    t1 = jnp.dot(xm, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    t1 = jnp.maximum(t1, 0.0).astype(dtype).reshape(th + 2, wdt, cmid)
    # The halo rows are real rows from jnp.pad'ed x, so a border halo row
    # is zero — but t1 = relu(0 @ w1 + b1) != 0 there; re-zero t1 outside
    # the image so the 3x3 sees its zero padding (interior halo rows are
    # real and stay).
    gp = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + i * th - 1
    t1 = jnp.where((gp >= 0) & (gp < hh), t1, jnp.zeros((), t1.dtype))

    t1p = jnp.pad(t1, ((0, 0), (1, 1), (0, 0)))
    if im2col:
        # One (TH*W, 9*cmid) @ (9*cmid, cmid) matmul: a K=64 contraction
        # half-fills the MXU at layer1 (cmid=64); gathering the 9 taps
        # into one K=576 contraction trades 9 VMEM copies for full lanes.
        patches = jnp.concatenate(
            [t1p[dy:dy + th, dx:dx + wdt].reshape(th * wdt, cmid)
             for dy in range(3) for dx in range(3)], axis=1)
        w2f = w2_ref[:].reshape(9 * cmid, cmid)
        acc = (jnp.dot(patches, w2f, preferred_element_type=f32)
               + b2_ref[:].astype(f32))
    else:
        acc = b2_ref[:].astype(f32) * jnp.ones((th * wdt, 1), f32)
        for dy in range(3):
            for dx in range(3):
                patch = t1p[dy:dy + th, dx:dx + wdt].reshape(th * wdt, cmid)
                acc = acc + jnp.dot(patch, w2_ref[dy, dx],
                                    preferred_element_type=f32)
    t2 = jnp.maximum(acc, 0.0).astype(dtype)

    y = (jnp.dot(t2, w3_ref[:], preferred_element_type=f32)
         + b3_ref[:]).astype(dtype)

    x_mid = x_ref[0].reshape(th * wdt, cin)
    if has_proj:
        skip = (jnp.dot(x_mid, wp_ref[:], preferred_element_type=f32)
                + bp_ref[:]).astype(dtype)
    else:
        skip = x_mid
    o = jnp.maximum(y + skip, jnp.zeros((), dtype))
    o_ref[0] = o.reshape(th, wdt, cout)


@functools.partial(
    jax.jit,
    static_argnames=("th", "interpret", "dtype", "im2col"),
)
def fused_bottleneck_blocked(x: jnp.ndarray, fw: dict, *, th: int = 8,
                             interpret: bool = False,
                             dtype: Any = jnp.bfloat16,
                             im2col: bool = False) -> jnp.ndarray:
    """One stride-1 bottleneck on UNPADDED activations via Blocked specs.

    x: (B, H, W, Cin) -> (B, H, W, Cout). The 2 halo rows each tile
    needs are gathered into a (B, nH, 2, W, Cin) side tensor by XLA
    strided slices (2/TH extra read traffic) so every pallas operand is
    a standard Blocked block — the layout Mosaic double-buffers
    automatically. The Element-spec variant (fused_bottleneck) measured
    its per-tile DMA serialized with compute (17.9 ms/block at layer1
    where ~6 is roofline, docs/PERF.md round 3h)."""
    b, hh, wdt, cin = x.shape
    assert hh % th == 0, (hh, th)
    nh = hh // th
    cmid = fw["w1"].shape[1]
    cout = fw["w3"].shape[1]
    has_proj = "wp" in fw

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tops = xp[:, 0:nh * th:th]          # row above each tile (padded idx)
    bots = xp[:, th + 1::th]            # row below each tile
    halo = jnp.stack([tops, bots], axis=2)   # (B, nH, 2, W, Cin)

    kern = functools.partial(
        _block_kernel_blocked, th=th, hh=hh, wdt=wdt, cin=cin, cmid=cmid,
        cout=cout, has_proj=has_proj, dtype=dtype, im2col=im2col)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, th, wdt, cin), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, 1, 2, wdt, cin),
                          lambda bi, i: (bi, i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, th, wdt, cout), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)

    ins = [fw["w1"], fw["b1"], fw["w2"], fw["b2"], fw["w3"], fw["b3"]]
    in_specs = [x_spec, h_spec] + [vspec] * 6
    if has_proj:
        ins += [fw["wp"], fw["bp"]]
        in_specs += [vspec, vspec]

    flops = 2 * b * hh * wdt * (cin * cmid + 9 * cmid * cmid + cmid * cout
                                + (cin * cout if has_proj else 0))
    bytes_est = x.dtype.itemsize * b * hh * wdt * (cin + cout)
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, wdt, cout), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_est, transcendentals=0),
    )(x, halo, *ins)


# ---------------------------------------------------------------------------
# Fused 3x3/2 max pool writing the halo-padded layout directly
# ---------------------------------------------------------------------------

def _pool_kernel(x_ref, o_ref, *, th: int, w2: int, cc: int):
    """(1, 2TH+2, 2W, C) stem tile -> (1, TH, W, C) pooled tile.

    Tile i reads stem rows starting at max(2*i*TH-1, 0): the i=0 tile is
    shifted one row relative to the others (row -1 is pool padding), so
    both alignments are computed and selected on the scalar program id —
    two extra VPU max passes, no data movement.
    """
    i = pl.program_id(1)
    x = x_ref[0]  # (2TH+2, W2, C); trailing rows may be Mosaic high-pad
    a = x.reshape(th + 1, 2, w2, cc)
    even = a[:, 0]  # even[t] = x[2t], t = 0..TH
    odd = a[:, 1]   # odd[t]  = x[2t+1]

    # start = 2*i*TH - 1 (i > 0): out r = max over locals 2r, 2r+1, 2r+2
    rm_a = jnp.maximum(jnp.maximum(even[:th], odd[:th]), even[1:th + 1])
    # start = 0 (i == 0): out r = max over locals 2r-1, 2r, 2r+1; row -1 is
    # pool padding — post-relu inputs are >= 0, so a zero row is identity.
    odd_m1 = jnp.concatenate(
        [jnp.zeros((1, w2, cc), odd.dtype), odd[:th - 1]], axis=0)
    rm_b = jnp.maximum(jnp.maximum(odd_m1, even[:th]), odd[:th])
    rm = jnp.where(i == 0, rm_b, rm_a)  # (TH, W2, C)

    # width: out c = max over cols 2c-1, 2c, 2c+1 (zero pad, same argument).
    # The (pairs, 2, C) split tile-pads its (2, C) minor dims to (8, 128)
    # — pure VMEM-capacity cost (hence the raised vmem_limit below; a
    # lane-merging (W2, C) -> (W2/2, 2C) reshape would avoid it but is an
    # unsupported Mosaic shape cast).
    rmp = jnp.pad(rm, ((0, 0), (1, 1), (0, 0)))[:, :w2 + 2]
    w_half = w2 // 2
    b = rmp.reshape(th, w_half + 1, 2, cc)
    evenc = b[:, :, 0]  # rmp[2c] = rm[2c-1]
    oddc = b[:, :, 1]   # rmp[2c+1] = rm[2c]
    out = jnp.maximum(jnp.maximum(evenc[:, :w_half], oddc[:, :w_half]),
                      evenc[:, 1:w_half + 1])
    o_ref[0] = out


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def maxpool_3x3_s2_padded(x: jnp.ndarray, *, th: int = 4,
                          interpret: bool = False) -> jnp.ndarray:
    """3x3/2 max pool (pad 1, torch MaxPool2d(3,2,1) semantics for
    non-negative inputs) that writes the (B, H+2, W, C) halo-padded layout
    the fused bottleneck stage consumes — halo rows uninitialized.

    NOT on the production path: measured 27.6 ms vs reduce_window's 12.0
    at the 2x level (VPU tile-padding on the (2, C) pair split + the
    Element-spec pipelining issue, docs/PERF.md round 3h), so
    stem_and_fused_layers12 uses reduce_window. Kept (with its tests and
    the prepadded fused_stage pathway it feeds) as the measured-negative
    artifact and for future Blocked-spec pool experiments.
    """
    bb, h2, w2, cc = x.shape
    hh = h2 // 2
    assert h2 % 2 == 0 and w2 % 2 == 0 and hh % th == 0, (h2, w2, th)

    kern = functools.partial(_pool_kernel, th=th, w2=w2, cc=cc)
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(2 * th + 2, padding=(0, 3)),
         pl.Element(w2), pl.Element(cc)),
        lambda bi, i: (bi, jnp.maximum(2 * i * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(th), pl.Element(w2 // 2), pl.Element(cc)),
        lambda bi, i: (bi, i * th + 1, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(bb, hh // th),
        in_specs=[x_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bb, hh + 2, w2 // 2, cc), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x)


# ---------------------------------------------------------------------------
# Functional stage / backbone drivers (evaluation path)
# ---------------------------------------------------------------------------

def _conv_bn(x, kernel, bias, *, stride: int = 1, dtype=jnp.bfloat16):
    """Folded conv+BN staying in the compute dtype end-to-end: the bias
    add (and the caller's relu) then fuse into the conv's epilogue the
    same way flax's conv->BN->relu chain does — an f32 accumulator
    output here forced XLA to materialize full-tensor f32 convert passes
    (measured 7-11 ms each at the 2x pyramid level, docs/PERF.md)."""
    kh = kernel.shape[0]
    p = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (stride, stride),
        ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def xla_bottleneck(x, params, stats, *, stride: int = 1, dtype=jnp.bfloat16):
    """Functional (folded-BN) bottleneck via XLA convs — used for the
    strided stage-entry blocks the Pallas kernel doesn't cover."""
    k1, b1 = fold_conv_bn(params["conv1"]["kernel"], params["bn1"], stats["bn1"])
    k2, b2 = fold_conv_bn(params["conv2"]["kernel"], params["bn2"], stats["bn2"])
    k3, b3 = fold_conv_bn(params["conv3"]["kernel"], params["bn3"], stats["bn3"])
    if "downsample_conv" in params:
        kp, bp = fold_conv_bn(params["downsample_conv"]["kernel"],
                              params["downsample_bn"], stats["downsample_bn"])
        identity = _conv_bn(x, kp, bp, stride=stride, dtype=dtype)
    else:
        identity = x.astype(dtype)
    y = jax.nn.relu(_conv_bn(x, k1, b1, dtype=dtype))
    y = jax.nn.relu(_conv_bn(y, k2, b2, stride=stride, dtype=dtype))
    y = _conv_bn(y, k3, b3, dtype=dtype)
    return jax.nn.relu(y + identity)


def fused_stage(x: jnp.ndarray, stage_params: list, stage_stats: list, *,
                width: int, first_stride: int, dtype=jnp.bfloat16,
                th: int = 4, interpret: bool = False,
                prepadded: bool = False, impl: str = "element") -> jnp.ndarray:
    """Run one ResNet stage: strided entry block (if any) via XLA convs,
    every stride-1 block through the fused Pallas kernel.

    x: (B, H, W, Cin) unpadded — or, with `prepadded=True` (stride-1
    stages only, impl="element"), the (B, H+2, W, Cin) halo-padded
    layout (halo rows may be garbage: the kernels mask them). Returns
    (B, H', W', 4*width) unpadded. `impl`: "element" = overlapping
    Element reads on halo-padded activations; "blocked" = Blocked tiles
    + a side halo tensor (Mosaic auto-double-buffered).
    """
    start = 0
    if first_stride != 1:
        assert not prepadded
        x = xla_bottleneck(x, stage_params[0], stage_stats[0],
                           stride=first_stride, dtype=dtype)
        start = 1

    hh = x.shape[1] - 2 if prepadded else x.shape[1]
    if hh % th != 0:  # shape outside the kernel's tiling — XLA fallback
        if prepadded:
            x = x[:, 1:hh + 1]
        for p, s in zip(stage_params[start:], stage_stats[start:]):
            x = xla_bottleneck(x, p, s, stride=1, dtype=dtype)
        return x

    n = len(stage_params)
    if impl == "blocked":
        if prepadded:
            x = x[:, 1:hh + 1]
        for bi in range(start, n):
            fw = fold_block_weights(stage_params[bi], stage_stats[bi], dtype)
            x = fused_bottleneck_blocked(x, fw, th=th, interpret=interpret,
                                         dtype=dtype)
        return x

    xp = x if prepadded else jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    for bi in range(start, n):
        fw = fold_block_weights(stage_params[bi], stage_stats[bi], dtype)
        xp = fused_bottleneck(xp, fw, th=th, final=(bi == n - 1),
                              interpret=interpret, dtype=dtype)
    return xp


def stem_and_fused_layers12(variables, x, *, stage_sizes, dtype=jnp.bfloat16,
                            stem_precomputed: bool = False, th: int = 4,
                            interpret: bool = False,
                            impl: str = "element") -> jnp.ndarray:
    """conv1 stem -> fused layer1 -> fused layer2; returns res3 (layer2 out).

    The caller finishes with model.apply(..., layer2_precomputed=True),
    which runs layer3 + the detection heads (models/resnet.py).
    """
    from tinyfaces_tpu.models.resnet import max_pool_3x3_s2

    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    g = p["bn1"]["scale"] / jnp.sqrt(s["bn1"]["var"] + _EPS)
    bias = (p["bn1"]["bias"] - s["bn1"]["mean"] * g).astype(dtype)
    if not stem_precomputed:
        # bn1 folds into the conv1 weights; bias+relu fuse into the conv
        # epilogue in bf16 (an f32 scale pass here cost 19.6 ms/batch32 at
        # the 2x level — full-tensor convert round trip).
        k1 = (p["conv1"]["kernel"] * g).astype(dtype)
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), k1, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + bias)
    else:
        # x is the raw conv1 output (ops/stemfold.py with the unscaled
        # kernel) — apply the folded scale/bias in the compute dtype.
        x = jax.nn.relu(x.astype(dtype) * g.astype(dtype) + bias)

    # XLA reduce_window consumes the conv's preferred layout natively; a
    # Pallas pool forced a full-tensor relayout copy of the stem output
    # (19.5 ms/batch32 measured) because pallas_call pins default layouts.
    x = max_pool_3x3_s2(x)

    for stage_idx, width in ((1, 64), (2, 128)):
        n_blocks = stage_sizes[stage_idx - 1]
        sp = [p[f"layer{stage_idx}_{i}"] for i in range(n_blocks)]
        ss = [s[f"layer{stage_idx}_{i}"] for i in range(n_blocks)]
        x = fused_stage(x, sp, ss, width=width,
                        first_stride=1 if stage_idx == 1 else 2,
                        dtype=dtype, th=th, interpret=interpret, impl=impl)
    return x
