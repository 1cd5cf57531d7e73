"""Device-side CenterPad: the host anti-aliased resize as two MXU matmuls.

The reference preprocesses every frame on the host with an anti-aliased
float64 resize + center crop (CenterPad, reference
utils/util_distortion.py:217-258). That costs ~55 ms/frame on a 1-core
host even with the native C++ kernel (native/resize_aa.cpp) and caps the
end-to-end pipeline at ~18 fps while the device sustains 165 fps.

TPU-first observation: the whole transform — gaussian prefilter (separable,
mirror boundary), half-pixel bilinear resample, and center crop — is LINEAR
per axis. So it composes into ONE sampling matrix per axis, computed on the
host in float64 once per (source, target) shape pair:

    out = crop_h(S_h @ G_h) @ img @ (crop_w(S_w @ G_w))^T
        =        A_h        @ img @        A_w^T

and the per-frame work on device is two small matmuls (e.g. 720p -> 432x768:
~5 GFLOP, well under 0.5 ms on a v5e), fused by XLA into the existing frame
program. The host keeps only JPEG decode (~8 ms/frame).

Parity: the matrices are built with the exact float64 kernels of
transforms.resize_antialiased_np (scipy gaussian_filter columns + the same
half-pixel bilinear), so the only deviation from the host path is the
device's float32 matmul accumulation — measured <=1 uint8 step on a small
fraction of pixels (ties in the truncating cast), see
tests/test_device_resize.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _gaussian_matrix(n: int, sigma: float) -> np.ndarray:
    """[n, n] float64 matrix G with G @ x == scipy.ndimage.gaussian_filter1d(
    x, sigma, mode="mirror") — built by filtering identity columns so the
    kernel (truncate=4, discrete sampled gaussian) and the mirror boundary
    fold match scipy bit-for-bit."""
    if sigma <= 0.0:
        return np.eye(n, dtype=np.float64)
    from scipy.ndimage import gaussian_filter1d

    return gaussian_filter1d(np.eye(n, dtype=np.float64), sigma, axis=0,
                             mode="mirror")


def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] float64 half-pixel bilinear sampling matrix
    (src = (dst + 0.5) * in/out - 0.5, clamped — the same gather as
    transforms.resize_antialiased_np.axis_interp)."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    np.add.at(m, (rows, lo), 1.0 - w_hi)
    np.add.at(m, (rows, hi), w_hi)
    return m


def centerpad_plan(src_hw, out_hw, dtype=np.float32):
    """Per-axis sampling matrices for CenterPad(src -> out) + center crop.

    Replicates transforms.center_pad followed by transforms.center_crop
    (reference CenterPad semantics, utils/util_distortion.py:217-258):
    the aspect-filling branch choice, int()-truncated resize sizes, the
    anti-aliasing sigma = (downscale_factor - 1) / 2 per axis, and the
    centered crop of the overflowing axis.

    Returns (A_h [th, src_h], A_w [tw, src_w]) as `dtype` numpy arrays.
    """
    sh, sw = int(src_hw[0]), int(src_hw[1])
    th, tw = int(out_hw[0]), int(out_hw[1])

    if sh / sw == th / tw and sh == th:
        new_h, new_w = sh, sw  # identity branch (no resize)
    elif sh / sw > th / tw:
        # too tall: match width, crop height (center_pad branch 2)
        new_h, new_w = int(sh * tw / sw), int(sw * tw / sw)
    else:
        # too wide / equal aspect with sh != th: match height, crop width
        new_h, new_w = int(sh * th / sh), int(sw * th / sh)
    if new_h < th or new_w < tw:
        raise ValueError(
            f"CenterPad plan {src_hw}->{out_hw} underflows the target "
            f"(resize gives {(new_h, new_w)}); the host path would crop "
            "out of bounds too"
        )

    # resize_antialiased_np prefilters iff either axis downsamples, with
    # per-axis sigma clamped at 0; the identity branch skips it entirely
    fh, fw = sh / new_h, sw / new_w
    prefilter = (new_h, new_w) != (sh, sw) and (fh > 1 or fw > 1)

    def axis_plan(n_src, n_new, n_target, sigma):
        if n_new == n_src and sigma <= 0.0:
            a = np.eye(n_src, dtype=np.float64)
        else:
            a = _bilinear_matrix(n_src, n_new) @ _gaussian_matrix(n_src, sigma)
        off = (n_new - n_target) // 2
        return a[off : off + n_target]

    a_h = axis_plan(sh, new_h, th, max(0.0, (fh - 1) / 2) if prefilter else 0.0)
    a_w = axis_plan(sw, new_w, tw, max(0.0, (fw - 1) / 2) if prefilter else 0.0)
    return a_h.astype(dtype), a_w.astype(dtype)


def device_centerpad(frames_u8, a_h, a_w):
    """Apply a centerpad_plan on device: uint8 [..., H, W, 3] -> uint8
    [..., th, tw, 3] with the reference's truncating cast."""
    x = frames_u8.astype(jnp.float32)
    # rows: [.., H, W, C] x [th, H] -> [.., th, W, C]
    x = jnp.einsum("ts,...swc->...twc", a_h, x)
    x = jnp.einsum("uw,...twc->...tuc", a_w, x)
    return jnp.floor(jnp.clip(x, 0.0, 255.0)).astype(jnp.uint8)


def centerpad_plan_padded(src_hw, out_hw, max_hw, dtype=np.float32):
    """centerpad_plan with the source axes zero-padded to max_hw.

    For batched serving of mixed-resolution clips (pipeline/scheduler.py):
    each slot's raw frames are zero-padded on the host to a common
    (max_h, max_w) and its plan matrices get matching zero columns, so ONE
    compiled program (with per-slot plan tensors as inputs) serves every
    source size. Semantically exact (padded pixels only ever multiply zero
    coefficients); numerically the larger contraction dim can reassociate
    the f32 sums and flip truncation ties by <=1 uint8 step on a tiny
    pixel fraction — the same bound as device-vs-host resize
    (tests/test_scheduler.py::test_centerpad_plan_padded_matches_unpadded).

    Returns (A_h [th, max_h], A_w [tw, max_w]).
    """
    a_h, a_w = centerpad_plan(src_hw, out_hw, dtype)
    mh, mw = int(max_hw[0]), int(max_hw[1])
    if a_h.shape[1] > mh or a_w.shape[1] > mw:
        raise ValueError(f"max_hw {max_hw} smaller than source {src_hw}")
    pad_h = np.zeros((a_h.shape[0], mh), dtype)
    pad_h[:, : a_h.shape[1]] = a_h
    pad_w = np.zeros((a_w.shape[0], mw), dtype)
    pad_w[:, : a_w.shape[1]] = a_w
    return pad_h, pad_w


def device_centerpad_batched(frames_u8, a_h, a_w):
    """Per-slot plans: frames [B, H, W, 3] x A_h [B, th, H] x A_w [B, tw, W]
    -> uint8 [B, th, tw, 3]. The batched form of device_centerpad, one
    einsum contraction per axis (MXU batched matmuls)."""
    x = frames_u8.astype(jnp.float32)
    x = jnp.einsum("bts,bswc->btwc", a_h, x)
    x = jnp.einsum("buw,btwc->btuc", a_w, x)
    return jnp.floor(jnp.clip(x, 0.0, 255.0)).astype(jnp.uint8)
