"""Spatial partitioning (SP): shard one image's forward over the device mesh.

Data parallelism splits a *batch* across chips; it does nothing for the
latency of a single very large input — the 2x pyramid level of a 768x1024
image is a 1536x2048 canvas whose forward dominates the fused compute
(docs/PERF.md). Spatial partitioning shards the image's H axis over the
mesh instead: every conv runs on an H-slice of the feature maps, and XLA's
SPMD partitioner inserts the halo exchanges (boundary-row ppermutes over
ICI) that 3x3/7x7 receptive fields and stride-2 convs require. BatchNorm in
eval mode is elementwise over running stats, so no cross-device statistics
are involved; the frozen bilinear upsampler is a conv too and partitions
the same way.

This is GSPMD spatial partitioning — the standard TPU recipe for
large-image convnets: annotate the input sharding, keep parameters
replicated, let the partitioner insert the collectives. The reference is
single-GPU and has no counterpart (SURVEY.md §2.9 notes main.py:60-64 pins
one device).

Equivalence (8-device CPU mesh, sharded vs replicated forward bitwise
close) is pinned by tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinyfaces_tpu.parallel.mesh import DATA_AXIS

SPATIAL_AXIS = DATA_AXIS  # one physical axis; its role is per-call


def spatial_sharding(mesh: Mesh, axis: str = SPATIAL_AXIS) -> NamedSharding:
    """(B, H, ...) sharding with the H axis (dim 1) split over the mesh.

    Trailing dims are implicitly replicated, so the same spec covers RGB
    canvases (B, H, W, 3) and planar YUV planes (B, H, W)."""
    return NamedSharding(mesh, P(None, axis))


def spatial_forward_fn(model, mesh: Mesh, axis: str = SPATIAL_AXIS,
                       donate: bool = False):
    """Build a jitted eval forward whose input AND output stay H-sharded.

    Returns `fwd(variables, x) -> (B, H/8, W/8, 5T)` where `x` is the
    normalized image tensor. Parameters are replicated; activations are
    sharded on H end to end, so peak per-chip activation memory and compute
    both scale ~1/n_devices (minus the halo rows). Pass `x` as a host array
    or an on-device array — the in_shardings annotation places it either
    way.
    """
    rep = NamedSharding(mesh, P())
    sp = spatial_sharding(mesh, axis)

    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    return jax.jit(
        fwd,
        in_shardings=(rep, sp),
        out_shardings=sp,
        donate_argnums=(1,) if donate else (),
    )


# Note on divisibility: GSPMD accepts H-shardings that do not divide the
# mesh size — the partitioner pads internally (the 8-device equivalence
# test runs a 96-px canvas whose /8 score grid of 12 rows splits unevenly).
# Rounding canvases to multiples of 8*n_devices would only shave the
# padded-rows overhead, and the bucketing already rounds H to 32.


def choose_eval_sharding(mesh: Optional[Mesh], batch: int,
                         mode: str = "auto") -> Optional[NamedSharding]:
    """Pick the fused-pyramid input sharding for an eval batch.

    mode="batch": shard the batch axis (throughput; batch % mesh == 0).
    mode="spatial": shard H (single-image latency / very large inputs).
    mode="auto": spatial when the batch is smaller than the mesh, else batch.
    """
    if mesh is None:
        return None
    n = mesh.devices.size
    if mode == "auto":
        mode = "spatial" if batch < n else "batch"
    if mode == "batch":
        return NamedSharding(mesh, P(DATA_AXIS))
    if mode == "spatial":
        return spatial_sharding(mesh)
    raise ValueError(f"unknown eval sharding mode {mode!r}")
