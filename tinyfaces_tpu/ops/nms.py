"""On-device, fixed-shape non-maximum suppression.

TPU-native replacement for the third-party torchvision.ops.nms C++/CUDA
kernel the reference calls at evaluation.py:84. Greedy NMS is inherently
sequential in the ranking order; we express it as a statically-shaped
`lax.fori_loop` over the score-sorted candidate list with vectorized
suppression per step, so the whole thing lives inside one XLA program (no
host round-trip, no dynamic output shape).

Semantics match torchvision: continuous-coordinate IoU, candidates with
IoU > threshold against an already-kept higher-scoring box are suppressed.
Invalid (padding) entries are handled via a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyfaces_tpu.ops.boxes import pairwise_iou


def _fixpoint_keep(
    upper: jnp.ndarray,  # (S, S) bool: j suppresses i (strict upper triangle)
    valid: jnp.ndarray,  # (S,) bool: carried-in validity / keep state
) -> jnp.ndarray:
    """Greedy NMS over one sorted block as a Jacobi fixpoint: keep[i] =
    valid[i] & no kept j<i suppresses i. Row i stabilizes once every
    overlapping j<i has (depth-k rows are final after k sweeps), so this
    converges to the EXACT greedy result in O(suppression-chain depth)
    sweeps — each sweep one (S,S) VPU op instead of S sequential steps."""

    def cond(state):
        return state[1]

    def body(state):
        keep, _ = state
        suppressed = jnp.any(upper & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return keep


def nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    iou_threshold: float,
    valid: jnp.ndarray | None = None,  # (N,) bool
    block: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set.

    Returns `(order, keep)` where `order` is the (N,) descending-score
    permutation and `keep` is the (N,) bool mask *in that order*. The caller
    recovers kept boxes as `boxes[order][keep]` (or keeps static shape by
    masking). Padding rows must carry `valid=False` (they are never kept).

    Large candidate sets run the BLOCKED exact scheme: a lax.scan over
    score-sorted blocks of `block` rows — fixpoint within the block, then one
    (block, N) suppression of everything ranked below. Identical keep set to
    the single fixpoint over the full (N, N) matrix, but the N^2 IoU matrix
    is never materialized and each pair is touched once instead of
    chain-depth times (the full-matrix fixpoint measured 42.6 ms of the
    256 ms fused batch-16 program at N=4000: ~22 sweeps over a 4000^2 mask;
    blocked form removes ~35 ms of that)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    # Push invalid rows to the end of the ranking.
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    ranked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-ranked_scores)

    boxes_sorted = boxes[order]
    valid_sorted = valid[order]

    if n <= 2 * block:
        iou = pairwise_iou(boxes_sorted, boxes_sorted)
        idx = jnp.arange(n)
        # upper[j, i]: higher-ranked j overlaps lower-ranked i enough.
        upper = (iou > iou_threshold) & (idx[:, None] < idx[None, :])
        return order, _fixpoint_keep(upper, valid_sorted)

    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:  # padding rows: valid=False, zero boxes (IoU 0 vs all)
        boxes_sorted = jnp.pad(boxes_sorted, ((0, n_pad - n), (0, 0)))
        valid_sorted = jnp.pad(valid_sorted, (0, n_pad - n))

    lidx = jnp.arange(block)
    col = jnp.arange(n_pad)

    def body(state):
        i, keep = state
        start = i * block
        blk_boxes = jax.lax.dynamic_slice(boxes_sorted, (start, 0), (block, 4))
        blk_keep = jax.lax.dynamic_slice(keep, (start,), (block,))
        iou_blk = pairwise_iou(blk_boxes, boxes_sorted)  # (block, n_pad)
        # exact greedy within the block, seeded by carried-in suppressions
        iou_ii = jax.lax.dynamic_slice(iou_blk, (0, start), (block, block))
        upper_ii = (iou_ii > iou_threshold) & (lidx[:, None] < lidx[None, :])
        blk_final = _fixpoint_keep(upper_ii, blk_keep)
        # one pass of suppression over everything ranked below this block
        later = col >= start + block
        sup = jnp.any((iou_blk > iou_threshold) & blk_final[:, None], axis=0)
        keep = keep & ~(sup & later)
        keep = jax.lax.dynamic_update_slice(keep, blk_final, (start,))
        return i + 1, keep

    # Score-sorted => every valid candidate lives in the first
    # ceil(n_valid/block) blocks; trailing blocks are all-False and can
    # neither keep nor suppress, so skipping them is exact. Dynamic trip
    # count: typically 1-2 of nb blocks do work (the per-op trace charged
    # 7.3 ms/batch to this scan at nb=8 — most of it empty blocks).
    nb_needed = (jnp.sum(valid_sorted.astype(jnp.int32)) + block - 1) // block
    _, keep = jax.lax.while_loop(
        lambda s: s[0] < nb_needed, body, (jnp.int32(0), valid_sorted))
    return order, keep[:n]


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray,
    max_out: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS returning a fixed-size `(max_out,)` result set.

    Returns `(out_boxes, out_scores, out_valid)` with kept detections packed
    in descending-score order and zero padding past the kept count.
    """
    order, keep = nms(boxes, scores, iou_threshold, valid)
    boxes_sorted = boxes[order]
    scores_sorted = scores[order]

    # Pack kept rows to the front: rank kept rows by (not keep, position).
    rank = jnp.argsort(jnp.where(keep, jnp.arange(keep.shape[0]), keep.shape[0] + jnp.arange(keep.shape[0])))
    packed_boxes = boxes_sorted[rank][:max_out]
    packed_scores = scores_sorted[rank][:max_out]
    packed_valid = keep[rank][:max_out]

    packed_boxes = jnp.where(packed_valid[:, None], packed_boxes, 0.0)
    packed_scores = jnp.where(packed_valid, packed_scores, 0.0)
    return packed_boxes, packed_scores, packed_valid
