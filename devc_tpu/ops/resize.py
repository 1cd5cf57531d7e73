"""Resize / pooling primitives with exact PyTorch semantics, NHWC layout.

jax.image.resize applies an antialiasing triangle kernel when downsampling,
which does NOT match torch.nn.functional.interpolate(..., mode="bilinear",
align_corners=False). The reference pipeline leans on exact interpolate
behavior (downscale x0.5 before the nets, upscale x2 after —
reference test.py:58,71,101), so we implement the half-pixel gather
directly. Wrong resize semantics silently cost PSNR (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool):
    """Torch-bilinear interpolation matrix as a HOST numpy constant.

    Built with numpy at trace time (sizes are static) so it folds into the
    compiled program as a literal — no device scatters to compile.
    src = (dst + 0.5) * (in/out) - 0.5 clamped (align_corners=False), or
    dst * (in-1)/(out-1) (align_corners=True).
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * ((in_size - 1) / (out_size - 1))
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), (1.0 - w_hi).astype(np.float32))
    np.add.at(m, (rows, hi), w_hi.astype(np.float32))
    return m


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """NHWC bilinear resize matching torch F.interpolate(mode='bilinear').

    Implemented as two 1-D matmuls (H then W) so XLA maps it onto the MXU
    instead of gathers; the interpolation matrices are tiny and folded at
    trace time.
    """
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (h, w):
        return x
    dtype = x.dtype

    mh = jnp.asarray(_interp_matrix_np(h, out_h, align_corners))  # [out_h, h]
    mw = jnp.asarray(_interp_matrix_np(w, out_w, align_corners))  # [out_w, w]
    y = jnp.einsum("oh,nhwc->nowc", mh, x.astype(jnp.float32))
    y = jnp.einsum("pw,nowc->nopc", mw, y)
    return y.astype(dtype)


def upsample_nearest(x, scale: int):
    """NHWC nearest-neighbor integer upsample, matching nn.Upsample(nearest).

    torch nearest picks src = floor(dst * in/out) = dst // scale for integer
    scale, i.e. plain pixel replication.
    """
    n, h, w, c = x.shape
    y = jnp.repeat(x, scale, axis=1)
    y = jnp.repeat(y, scale, axis=2)
    return y


def avg_pool(x, window: int, stride: int | None = None):
    """NHWC average pooling, matching F.avg_pool2d (no padding)."""
    stride = stride or window
    # Python-scalar init so lax recognizes the add monoid (autodiff-able
    # reduce_window_sum instead of the generic primitive)
    out = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return out / (window * window)


def max_pool(x, window: int, stride: int | None = None):
    """NHWC max pooling, matching nn.MaxPool2d (no padding, floor mode)."""
    stride = stride or window
    # init must be a Python scalar so lax recognizes the max monoid and
    # emits reduce_window_max (which has a transpose rule for autodiff)
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -float("inf")
    else:
        init = int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        init,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
