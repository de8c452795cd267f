"""Fold the exact-2x bilinear upsample into the ResNet stem conv.

The reference pyramid (reference evaluation.py:42-47) evaluates a 2x
upsampled copy of the image; its first model op is the ResNet stem --
a 7x7 stride-2 convolution (reference models/model.py via torchvision).
Both the bilinear upsample and the conv are linear, translation-invariant
(period-2) operators, so their composition is itself a single convolution
on the ORIGINAL-resolution image:

    stem_s2(upsample_2x(x)) == conv_s1(x, K5)

with a 5x5 stride-1 kernel K5 derived from the 7x7 weights. This removes
the materialized 2x canvas entirely (the largest tensor in the fused
pyramid: (2H, 2W, 3) per image, written by the resize and re-read by the
conv) and halves the stem's MACs (5*5 vs 7*7 taps per output).

Derivation. `jax.image.scale_and_translate` at scale exactly 2.0,
translation 0, maps output pixel m to input coordinate (m+0.5)/2 - 0.5,
i.e. fractional offsets alternating 0.25 / 0.75:

    u[2t]   = 0.25*x[t-1] + 0.75*x[t]
    u[2t+1] = 0.75*x[t]   + 0.25*x[t+1]

The stem conv (kernel 7, stride 2, pad 3) reads u[2n + k - 3] for taps
k = 0..6. Substituting the polyphase expansion above gives the per-tap
contribution G[k, d] of x[n+d], d in [-2, 2]:

    y[n] = sum_k w[k] * u[2n+k-3] = sum_d ( sum_k w[k] G[k, d] ) x[n+d]

The 2-D kernel follows by separability of the upsample:
K5[dy,dx,c,o] = sum_{ky,kx} G[ky,dy] G[kx,dx] w7[ky,kx,c,o].

Borders: `scale_and_translate` renormalizes sample weights at the canvas
edge (row 0 / last row get weight 1.0 on the single in-range pixel, not
0.75), and the composite's x-domain zero padding differs from the conv's
u-domain zero padding within 2 output pixels of each canvas edge. The
outermost TWO output rows/cols on each side are therefore recomputed with
the unfolded op sequence on 6-pixel input bands -- including the edge
renormalization -- and pasted over the composite result. The folded stem
then agrees with resize+conv to fp rounding everywhere: ~1e-6 on the
border strips (identical linear operator; only the band resize's matmul
contraction size differs) and summation-order rounding in the interior
(see tests/test_stemfold.py).

Used by the fused pyramid for the scale-2 level (evaluation.py), where the
resize factor is exactly 2.0 for every image: the short side is an integer
h, so the reference's floor(h * 2) target is 2h exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# G[k, d+2]: coefficient of x[n+d] inside u[2n+k-3], for stem tap k=0..6.
# Verified numerically against jax.image.scale_and_translate in
# tests/test_stemfold.py::test_phase_matrix_matches_scale_and_translate.
PHASE_G = np.zeros((7, 5), np.float64)
for _k in range(7):
    _m = _k - 3  # u offset relative to 2n
    if _m % 2 == 0:  # u[2t], t = n + m//2
        _t = _m // 2
        PHASE_G[_k, _t - 1 + 2] += 0.25
        PHASE_G[_k, _t + 2] += 0.75
    else:  # u[2t+1], t = n + (m-1)//2
        _t = (_m - 1) // 2
        PHASE_G[_k, _t + 2] += 0.75
        PHASE_G[_k, _t + 1 + 2] += 0.25
del _k, _m, _t

_DN = ("NHWC", "HWIO", "NHWC")


def fold_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,O) stride-2 stem kernel -> (5,5,C,O) folded stride-1 kernel."""
    g = jnp.asarray(PHASE_G, jnp.float32)
    return jnp.einsum("ka,lb,klco->abco", g, g, w7.astype(jnp.float32))


def _upsample2x(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Batched exact-2x bilinear upsample, identical to the fused pyramid's
    per-image scale_and_translate call at scale (2.0, 2.0), translation 0."""

    def one(img):
        return jax.image.scale_and_translate(
            img, (*out_hw, x.shape[-1]), (0, 1),
            jnp.asarray([2.0, 2.0], jnp.float32),
            jnp.zeros(2, jnp.float32),
            method="linear", antialias=True,
        )

    return jax.vmap(one)(x)


def folded_stem_2x(x: jnp.ndarray, w7: jnp.ndarray) -> jnp.ndarray:
    """Stem output for the 2x-upsampled canvas, computed at 1x resolution.

    x: (B, H, W, C) normalized canvas in the model compute dtype.
    w7: (7, 7, C, O) stem kernel (any float dtype; folded in fp32).
    Returns (B, H, W, O) == conv7x7_s2(upsample_2x(x)), border-correct
    (edge renormalization reproduced via exact band recomputation).
    """
    dtype = x.dtype
    b, h, w, c = x.shape
    w7d = w7.astype(dtype)
    k5 = fold_stem_kernel(w7).astype(dtype)

    y = jax.lax.conv_general_dilated(
        x, k5, (1, 1), ((2, 2), (2, 2)), dimension_numbers=_DN)

    def band_rows(xb, pad, take):
        """Exact stem on a 6-row input band: upsample then 7x7/2 conv with
        the original vertical zero padding on the outer side only."""
        u = _upsample2x(xb, (12, 2 * w))
        u = u[:, take]
        return jax.lax.conv_general_dilated(
            u, w7d, (2, 2), (pad, (3, 3)), dimension_numbers=_DN)

    def band_cols(xb, pad, take):
        u = _upsample2x(xb, (2 * h, 12))
        u = u[:, :, take]
        return jax.lax.conv_general_dilated(
            u, w7d, (2, 2), ((3, 3), pad), dimension_numbers=_DN)

    # Rows 0..1 need u rows -3..5 (zero pad above); rows H-2..H-1 need
    # u rows 2H-7..2H+1 (zero pad below). 6-row bands cover both with the
    # band-edge renormalization falling only on unused band rows.
    top = band_rows(x[:, :6], (3, 0), slice(0, 6))
    bot = band_rows(x[:, h - 6:], (0, 3), slice(5, 12))
    y = y.at[:, 0:2].set(top)
    y = y.at[:, h - 2:h].set(bot)
    # Full-height column bands are exact everywhere (vertical behavior is
    # the original's), so pasting them last also fixes the four corners.
    left = band_cols(x[:, :, :6], (3, 0), slice(0, 6))
    right = band_cols(x[:, :, w - 6:], (0, 3), slice(5, 12))
    y = y.at[:, :, 0:2].set(left)
    y = y.at[:, :, w - 2:w].set(right)
    return y
