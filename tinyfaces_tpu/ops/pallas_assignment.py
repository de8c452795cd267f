"""Pallas TPU kernel: fused dense-IoU ground-truth assignment.

The flagship custom kernel (BASELINE.json north star). The XLA reference
path (ops/assignment.py) materializes the perturbed (Y, X, T, G) IoU tensor
(63*63*25*G floats — ~76 MB at G=192) to feed three consumers:

  1. best-over-GT max/argmax per anchor          -> (Y, X, T)
  2. per-GT max/argmax over all anchors          -> (G,)
  3. the 1e-6 uniform IoU tie-break perturbation

This kernel streams over blocks of heatmap rows instead: each grid step
computes an (R*X, T, G) IoU block entirely in VMEM, adds tie-break noise
from the on-core PRNG, and folds it directly into both reductions. HBM
traffic drops from O(Y*X*T*G) to O(Y*X*T + G) — just the output maps. The
row-block size R is chosen to fill VMEM (R=3 at the standard 63x63x25x192
shape -> 21 grid steps instead of 63).

Layout notes (TPU tiling: last dim = lanes, second-to-last = sublanes):
  * G lives in lanes everywhere; T in sublanes; the R*X location axis in
    the outer dim;
  * per-template columns are passed as (T, 1) sublane vectors and per-GT
    columns as (1, G) lane vectors, so every broadcast is layout-natural;
  * both argmaxes avoid cross-layout gathers: the lane-axis argmax is
    native, and the per-GT (outer+sublane) argmax uses the standard
    max + (where == max -> min flat-index) trick, matching NumPy's
    first-occurrence tie behavior.

`assign_targets_fused` applies the identical label rules as
ops/assignment.py on top of the kernel outputs, with the per-location
best-GT stats gathered via a one-hot MXU matmul and the per-GT-best anchor
mask built scatter-free (broadcast compare + any) — both dramatically
cheaper on TPU than dynamic gathers/scatters.

The tie-break noise stream differs from jax.random (pltpu PRNG) — same
distribution; it only decides exact-tie anchors, which is all the
reference's noise is for (processor.py:193-195).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # sentinel for the min-flat-index argmax trick

# Total scoped VMEM is 16 MB and ~4-5 live (R*X, T, G)-sized buffers exist
# per block (IoU, noise, masks); this budget per single-row slab keeps the
# whole working set under the limit (measured: R=3 at 63x63x25x192 OOMs).
_ROW_SLAB_BUDGET_BYTES = 2_500_000


def _rows_per_block(vsy: int, vsx: int, t: int, g: int) -> int:
    slab = max(1, vsx * t * g * 4)
    return max(1, min(vsy, 8, _ROW_SLAB_BUDGET_BYTES // slab))


def _block_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    dx1_ref, dy1_ref, dx2_ref, dy2_ref,  # (T, 1) f32 VMEM
    gx1_ref, gy1_ref, gx2_ref, gy2_ref,  # (1, G) f32 VMEM
    gt_valid_ref,  # (1, G) f32 VMEM (1.0 valid / 0.0 padding)
    best_iou_ref,  # out (R, X, T) f32
    best_gt_ref,  # out (R, X, T) i32
    pgt_max_ref,  # out (1, G) f32
    pgt_idx_ref,  # out (1, G) i32
    acc_max_ref,  # scratch (1, G) f32
    acc_idx_ref,  # scratch (1, G) i32
    *,
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    x_size: int,
    y_size: int,
    rows: int,
    noise_scale: float,
    use_prng: bool,
    use_ragged: bool,
):
    b = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    t = dx1_ref.shape[0]
    g = gx1_ref.shape[1]
    n = rows * x_size  # locations in this block
    y0 = b * rows

    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0] + b)

    # Location grid for the block: outer index o = r * X + x.
    o = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    cx = ofx + (o % x_size).astype(jnp.float32) * stx
    cy = ofy + (y0 + o // x_size).astype(jnp.float32) * sty

    dx1 = dx1_ref[:, :].reshape(1, t, 1)
    dy1 = dy1_ref[:, :].reshape(1, t, 1)
    dx2 = dx2_ref[:, :].reshape(1, t, 1)
    dy2 = dy2_ref[:, :].reshape(1, t, 1)
    gx1 = gx1_ref[:, :].reshape(1, 1, g)
    gy1 = gy1_ref[:, :].reshape(1, 1, g)
    gx2 = gx2_ref[:, :].reshape(1, 1, g)
    gy2 = gy2_ref[:, :].reshape(1, 1, g)

    # Intersection extents with the +1 MATLAB convention (SURVEY.md §2.2).
    iw = jnp.minimum(cx + dx2, gx2) - jnp.maximum(cx + dx1, gx1) + 1.0  # (N,T,G)
    ih = jnp.minimum(cy + dy2, gy2) - jnp.maximum(cy + dy1, gy1) + 1.0  # (N,T,G)

    tarea = (dx2 - dx1 + 1.0) * (dy2 - dy1 + 1.0)  # (1,T,1)
    garea = (gx2 - gx1 + 1.0) * (gy2 - gy1 + 1.0)  # (1,1,G)

    inter = iw * ih
    pos = (iw > 0.0) & (ih > 0.0)
    iou = jnp.where(pos, inter / (tarea + garea - inter), 0.0)

    # Tie-break perturbation from the on-core PRNG: u in [0, 1).
    if use_prng:
        # Mosaic can't cast uint32->f32; mask to 31 bits via int32 instead.
        bits = pltpu.bitcast(pltpu.prng_random_bits((n, t, g)), jnp.int32)
        u31 = jax.lax.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
        pert = iou + noise_scale * (u31.astype(jnp.float32) * (1.0 / 2147483648.0))
    else:  # interpret mode: pltpu PRNG has no CPU lowering; ties break by index
        pert = iou

    # Invalid GT rows must never win any argmax; same for ragged-edge rows
    # past vsy when rows does not divide vsy.
    pert = jnp.where(gt_valid_ref[:, :].reshape(1, 1, g) > 0.0, pert, -1.0)
    if use_ragged:
        pert = jnp.where(y0 + o // x_size < y_size, pert, -1.0)

    # Reduction 1: best GT per anchor (lane-axis reduce).
    best_iou_ref[:, :, :] = jnp.max(pert, axis=2).reshape(rows, x_size, t)
    best_gt_ref[:, :, :] = (
        jnp.argmax(pert, axis=2).astype(jnp.int32).reshape(rows, x_size, t)
    )

    # Reduction 2: best anchor per GT. Flat C-order index over (Y, X, T) is
    # (y0 + r)*X*T + x*T + t = y0*X*T + o*T + t.
    rmax = jnp.max(pert, axis=(0, 1)).reshape(1, g)
    # (N, T, 1) index grid broadcast against the hit mask — avoids a second
    # full-size (N, T, G) int32 buffer in VMEM.
    flat_idx = o * t + jax.lax.broadcasted_iota(jnp.int32, (n, t, 1), 1)
    hit = pert >= rmax.reshape(1, 1, g)
    ridx = jnp.min(jnp.where(hit, flat_idx, _BIG), axis=(0, 1)).reshape(1, g)
    gidx = y0 * (x_size * t) + ridx

    @pl.when(b == 0)
    def _():
        acc_max_ref[:, :] = rmax
        acc_idx_ref[:, :] = gidx

    @pl.when(b > 0)
    def _():
        better = rmax > acc_max_ref[:, :]
        acc_max_ref[:, :] = jnp.where(better, rmax, acc_max_ref[:, :])
        acc_idx_ref[:, :] = jnp.where(better, gidx, acc_idx_ref[:, :])

    @pl.when(b == n_blocks - 1)
    def _():
        pgt_max_ref[:, :] = acc_max_ref[:, :]
        pgt_idx_ref[:, :] = acc_idx_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("vsx", "vsy", "ofx", "ofy", "stx", "sty", "interpret"),
)
def dense_assignment_reductions(
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,) bool
    templates: jnp.ndarray,  # (T, >=4)
    seed: jnp.ndarray,  # () int32
    *,
    vsx: int,
    vsy: int,
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    interpret: bool = False,
):
    """Returns (best_iou (Y,X,T), best_gt (Y,X,T), pgt_max (G,), pgt_idx (G,))
    over the *perturbed* IoU, without materializing (Y,X,T,G) in HBM."""
    t = templates.shape[0]
    g = gt_boxes.shape[0]
    rows = _rows_per_block(vsy, vsx, t, g)

    kernel = functools.partial(
        _block_kernel,
        ofx=float(ofx), ofy=float(ofy), stx=float(stx), sty=float(sty),
        x_size=vsx, y_size=vsy, rows=rows, noise_scale=1e-6,
        use_prng=not interpret, use_ragged=vsy % rows != 0,
    )

    tpl = templates.astype(jnp.float32)
    gt = gt_boxes.astype(jnp.float32)

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = [
        pl.BlockSpec((rows, vsx, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, vsx, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    best_iou, best_gt, pgt_max, pgt_idx = pl.pallas_call(
        kernel,
        grid=(-(-vsy // rows),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *[small() for _ in range(9)],
        ],
        out_specs=outs,
        out_shape=[
            jax.ShapeDtypeStruct((vsy, vsx, t), jnp.float32),
            jax.ShapeDtypeStruct((vsy, vsx, t), jnp.int32),
            jax.ShapeDtypeStruct((1, g), jnp.float32),
            jax.ShapeDtypeStruct((1, g), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, g), jnp.float32),
            pltpu.VMEM((1, g), jnp.int32),
        ],
        interpret=interpret,
    )(
        seed.reshape(1, 1).astype(jnp.int32),
        tpl[:, 0].reshape(t, 1), tpl[:, 1].reshape(t, 1),
        tpl[:, 2].reshape(t, 1), tpl[:, 3].reshape(t, 1),
        gt[:, 0].reshape(1, g), gt[:, 1].reshape(1, g),
        gt[:, 2].reshape(1, g), gt[:, 3].reshape(1, g),
        gt_valid.astype(jnp.float32).reshape(1, g),
    )
    return best_iou, best_gt, pgt_max[0], pgt_idx[0]


def assign_targets_fused(
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,) bool
    pad_mask: jnp.ndarray,  # (Y, X, T) bool
    templates: jnp.ndarray,  # (T, >=4)
    key: jax.Array,
    *,
    ofx: float,
    ofy: float,
    stx: float,
    sty: float,
    pos_thresh: float,
    neg_thresh: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ops.assignment.assign_targets (same label
    rules, Pallas reductions underneath). Returns (class_map, regress_map)."""
    vsy, vsx, nt = pad_mask.shape

    degenerate = (gt_boxes[:, 2] <= gt_boxes[:, 0]) | (gt_boxes[:, 3] <= gt_boxes[:, 1])
    gt_valid = gt_valid & ~degenerate
    any_gt = jnp.any(gt_valid)

    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    best_iou, best_gt, pgt_max, pgt_idx = dense_assignment_reductions(
        gt_boxes, gt_valid, templates, seed,
        vsx=vsx, vsy=vsy, ofx=ofx, ofy=ofy, stx=stx, sty=sty,
        interpret=interpret,
    )

    # --- Classification map (identical rules to ops/assignment.py) ---------
    # Scatter-free per-GT-best mask: broadcast-compare the flat anchor index
    # grid against the (G,) winner indices (TPU scatters serialize; a 99k x
    # 192 compare+any is one fused VPU pass).
    force = (pgt_max > neg_thresh) & gt_valid
    flat_ids = jnp.arange(vsy * vsx * nt, dtype=jnp.int32)
    best_anchor_mask = jnp.any(
        (flat_ids[:, None] == pgt_idx[None, :]) & force[None, :], axis=1
    ).reshape(vsy, vsx, nt)

    class_map = jnp.full((vsy, vsx, nt), -1.0, dtype=jnp.float32)
    class_map = jnp.where(best_anchor_mask, 1.0, class_map)
    class_map = jnp.maximum(class_map, (best_iou >= pos_thresh) * 2.0 - 1.0)
    gray = jnp.where((best_iou >= neg_thresh) & (best_iou < pos_thresh), 0.0, -1.0)
    class_map = jnp.maximum(class_map, gray)
    class_map = jnp.where(any_gt, class_map, -1.0)

    # --- Regression map (per-location best GT, +1 size convention) ----------
    coarse_x = ofx + jnp.arange(vsx, dtype=jnp.float32) * stx
    coarse_y = ofy + jnp.arange(vsy, dtype=jnp.float32) * sty
    dww = templates[:, 2] - templates[:, 0] + 1.0
    dhh = templates[:, 3] - templates[:, 1] + 1.0

    # Gather-free best-GT stats: one-hot(best_gt) @ per-GT table rides the
    # MXU instead of 4 element gathers (which lower to slow dynamic-gathers).
    gt_table = jnp.stack(
        [
            (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2.0,  # fcx
            (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2.0,  # fcy
            gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0,  # fww
            gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0,  # fhh
        ],
        axis=1,
    )  # (G, 4)
    ng = gt_boxes.shape[0]
    onehot = (
        best_gt.reshape(-1, 1) == jnp.arange(ng, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    # HIGHEST precision: default TPU matmul truncates operands to bf16,
    # which loses ~0.04 px on box-coordinate selection (caught by
    # tools/tpu_selftest.py); the one-hot operand is exact either way but
    # the (G, 4) stats table is not.
    sel = jnp.dot(
        onehot, gt_table,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sel = sel.reshape(vsy, vsx, nt, 4)
    sel_cx, sel_cy, sel_w, sel_h = (sel[..., i] for i in range(4))

    tx = (sel_cx - coarse_x[None, :, None]) / dww[None, None, :]
    ty = (sel_cy - coarse_y[:, None, None]) / dhh[None, None, :]
    tw = jnp.log(sel_w / dww[None, None, :])
    th = jnp.log(sel_h / dhh[None, None, :])
    regress_map = jnp.concatenate([tx, ty, tw, th], axis=2)
    regress_map = jnp.where(any_gt, regress_map, 0.0)

    # --- Border handling (tx-block-only zeroing, reference quirk) -----------
    non_neg_border = pad_mask & (class_map != -1.0)
    class_map = jnp.where(non_neg_border, 0.0, class_map)
    tx_block = jnp.where(non_neg_border, 0.0, regress_map[:, :, :nt])
    regress_map = jnp.concatenate([tx_block, regress_map[:, :, nt:]], axis=2)

    return class_map, regress_map
