"""Exact height-strip batching for full-plane batch-1 conv chains.

Motivation (round 5, probes/cvn_prefix_probe.py): ColorVidNet's stage-1
convs (7->32->64->64 at the full net plane, reference ColorVidNet.py:
10-11,96-99) run ~20x below MXU peak at batch 1 on TPU — the conv chain
keeps the batch dimension in VREG sublanes (layout T(1,128), 1/8 of the
sublanes), the same root cause as the round-5 corr-in-context anomaly
(BASELINE.md "Corr-in-context anomaly" row). XLA has a space-to-batch
pass that rewrites large-spatial batch-1 convs to batch 8, but it does
not fire inside every program (and never across a Mosaic custom call).

This module does the rewrite by hand, exactly: split the height axis
into S contiguous bands with a zero-padded halo wide enough for the
whole conv chain, run every conv VALID in H (SAME in W) at batch S, and
re-zero rows that fall outside the image after each conv — which
reproduces chained SAME-conv zero-pad semantics bit-for-bit in exact
arithmetic (the interior band halos hold the REAL neighbouring rows, so
interior results are untouched; only out-of-image rows are forced to
the zeros SAME padding would have inserted). ReLU commutes with the
mask (relu(0) = 0), so masking after conv+bias+relu is equivalent.

Typical use (ColorVidNet enc1):

    xs = extract_strips(x, n_strips, halo=3)
    h  = relu(conv2d(p["conv1_1a"], xs, padding=(0, 1)))
    h  = h * strip_mask(H, n_strips, halo_rem=2, dtype=h.dtype)
    ...
    c1 = merge_strips(h)          # halo_rem == 0

Constraints: H % n_strips == 0 and the strip height must stay >= halo
(bands must cover their own halo); both hold for every legal input size
(H % 16 == 0, n_strips <= 8, halo <= 3).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def extract_strips(x, n_strips: int, halo: int):
    """[1, H, W, C] -> [S, H/S + 2*halo, W, C] overlapping row bands.

    Rows outside the image (the first band's top halo, the last band's
    bottom halo) are zero — the same zeros SAME padding would insert.
    """
    _, h, w, c = x.shape
    if h % n_strips:
        raise ValueError(f"H={h} not divisible by n_strips={n_strips}")
    hs = h // n_strips
    if hs < halo:
        raise ValueError(f"strip height {hs} < halo {halo}")
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    bands = [
        xp[0, i * hs : i * hs + hs + 2 * halo] for i in range(n_strips)
    ]
    return jnp.stack(bands, axis=0)


def strip_mask(h: int, n_strips: int, halo_rem: int, dtype):
    """[S, H/S + 2*halo_rem, 1, 1] mask: 1 inside the image, 0 outside.

    Host-side numpy constant (tiny; avoids device scatters per
    CLAUDE.md). Apply multiplicatively after each VALID-H conv (+ bias
    + relu) so out-of-image halo rows carry the zeros that the SAME
    padding of the NEXT conv in the reference chain would see.
    """
    hs = h // n_strips
    rows = (np.arange(n_strips)[:, None] * hs - halo_rem
            + np.arange(hs + 2 * halo_rem)[None, :])
    valid = ((rows >= 0) & (rows < h)).astype(np.float32)
    return jnp.asarray(valid, dtype)[:, :, None, None]


def merge_strips(y):
    """[S, H/S, W, C] (halo fully consumed) -> [1, H, W, C]."""
    s, hs, w, c = y.shape
    return y.reshape(1, s * hs, w, c)
