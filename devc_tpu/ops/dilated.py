"""Space-to-batch execution of dilation-2 conv stacks (ColorVidNet 5-6).

The reference's conv5/conv6 stages (models/ColorVidNet.py:52-75) are six
3x3 convs with dilation=2, padding=2 at 512 channels. A dilation-2 SAME
conv never mixes pixel parities: output (i, j) only reads inputs
(i±2, j±2), which stay on the same (i%2, j%2) sub-grid. Splitting the
activation into its four parity sub-grids and stacking them along batch
turns every dilated conv into a REGULAR 3x3 pad-1 conv — the layout the
TPU convolution emitter tiles best — with bit-identical per-output
arithmetic (same 3x3xC window, same weights).

Boundary exactness: SAME padding of the full grid maps to SAME padding of
each sub-grid. For odd H (e.g. the reference's 216-row net input reaches
conv5 at 27x48), the odd-parity sub-grid is one row/col short; it is
zero-padded to the common sub-grid shape, and because a conv's output at
a padded position is garbage that the next conv would read, every conv
output in the s2b domain is re-masked to zero at padded positions
(`mask`), which reproduces the full-grid SAME-pad zeros exactly.

InstanceNorm inside the s2b domain must still normalize over the FULL
spatial plane (reference InstanceNorm2d semantics), not per sub-grid:
`instance_norm_s2b` computes the per-(batch, channel) statistics jointly
across the four sub-grids with the padded positions masked out of both
moments and the true pixel count as the divisor.

Motivation was a perf hypothesis: these six convs are ~0.6 of the
full-res step's 1.6 TFLOP and rhs_dilation>1 lowering was the prime
suspect for the step's ~55 TFLOP/s effective. The round-4 chip A/B
REFUTED it — direct dilated is faster at both resolutions (BASELINE.md
round 4: 2.06 vs 2.28 ms @216x384, 10.44 vs 10.76 ms @432x768) — so the
direct lowering is the default and DEVC_DILATED_S2B=1 opts back in
(models/colorvidnet.py), kept for re-testing on other chip generations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def space_to_batch2(x):
    """[B, H, W, C] -> ([4B, ceil(H/2), ceil(W/2), C], mask, (H, W)).

    Sub-grids are stacked major-order by parity (pi*2+pj), each holding
    x[:, pi::2, pj::2, :]. `mask` is None when H and W are both even,
    else [4, 1, h, w, 1] with zeros at positions that fall outside the
    original grid (broadcasts over batch after a reshape to [4, B, ...]).
    """
    b, h0, w0, c = x.shape
    h, w = -(-h0 // 2), -(-w0 // 2)
    ph, pw = 2 * h - h0, 2 * w - w0
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(2, 4, 0, 1, 3, 5)  # [pi, pj, B, h, w, C]
    x = x.reshape(4 * b, h, w, c)
    mask = None
    if ph or pw:
        pi = jnp.arange(2).reshape(2, 1, 1, 1)
        pj = jnp.arange(2).reshape(1, 2, 1, 1)
        rows = 2 * jnp.arange(h).reshape(1, 1, h, 1) + pi < h0
        cols = 2 * jnp.arange(w).reshape(1, 1, 1, w) + pj < w0
        mask = (rows & cols).reshape(4, 1, h, w, 1).astype(x.dtype)
    return x, mask, (h0, w0)


def batch_to_space2(x, hw):
    """Inverse of space_to_batch2: [4B, h, w, C] -> [B, H, W, C]."""
    h0, w0 = hw
    b4, h, w, c = x.shape
    b = b4 // 4
    x = x.reshape(2, 2, b, h, w, c)
    x = x.transpose(2, 3, 0, 4, 1, 5)  # [B, h, pi, w, pj, C]
    x = x.reshape(b, 2 * h, 2 * w, c)
    return x[:, :h0, :w0, :]


def apply_mask(x, mask):
    """Re-zero padded sub-grid positions after a conv (SAME-pad exactness)."""
    if mask is None:
        return x
    b4, h, w, c = x.shape
    return (x.reshape(4, b4 // 4, h, w, c) * mask).reshape(b4, h, w, c)


def instance_norm_s2b(x, hw, mask, eps: float = 1e-5):
    """InstanceNorm2d(affine=False) over the FULL plane, in s2b layout.

    x: [4B, h, w, C] with padded positions already zero. Statistics are
    fp32 per (batch, channel) across all four sub-grids, dividing by the
    true pixel count H*W (padded zeros are excluded from the centered
    second moment by re-masking). Matches ops/layers.py::instance_norm on
    the interleaved grid to fp32 rounding.
    """
    h0, w0 = hw
    b4, h, w, c = x.shape
    b = b4 // 4
    n = float(h0 * w0)
    xf = x.astype(jnp.float32).reshape(4, b, h, w, c)
    mean = jnp.sum(xf, axis=(0, 2, 3), keepdims=True) / n  # [1,B,1,1,C]
    d = xf - mean
    if mask is not None:
        d = d * mask.astype(jnp.float32)
    var = jnp.sum(jnp.square(d), axis=(0, 2, 3), keepdims=True) / n
    y = d * lax.rsqrt(var + eps)
    return y.reshape(b4, h, w, c).astype(x.dtype)
