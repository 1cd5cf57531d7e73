"""Image/video quality metrics: PSNR, SSIM, temporal warp error.

The reference publishes no quantitative evaluation (SURVEY.md §6) and
ships no metric code; its README shows result images only. This module
makes the repo's own quality targets (BASELINE.md: <0.5 dB PSNR delta vs
reference outputs) measurable: frame-level PSNR/SSIM between two outputs,
and a flow-based temporal-stability score matching how the paper's
temporal consistency loss is formulated (train.py:702-707 masked
warp-MSE, utils/warping.py grid_sample semantics).

Pure numpy on host (evaluation is IO-bound; no reason to burn the chip),
with the same uint8-in/float-internal conventions as skimage.metrics so
values are comparable with the literature.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB. Identical images -> inf."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range * data_range / mse))


def _gaussian_kernel1d(sigma: float, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 2-D gaussian filtering with edge-replicate padding.

    Border handling is the only place SSIM implementations differ; with
    an 11-tap window the windowed statistics diverge on a ~5-pixel rim
    only, so agreement with skimage's gaussian_weights=True variant is
    ~1e-3 on full images."""
    r = len(k) // 2
    pad = ((r, r), (0, 0)) if img.ndim == 2 else ((r, r), (0, 0), (0, 0))
    out = np.pad(img, pad, mode="edge")
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, out)
    pad = ((0, 0), (r, r)) if img.ndim == 2 else ((0, 0), (r, r), (0, 0))
    out = np.pad(out, pad, mode="edge")
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, out)
    return out


def ssim(
    a: np.ndarray,
    b: np.ndarray,
    data_range: float = 255.0,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean SSIM with gaussian windows (Wang et al. 2004).

    Grayscale [H,W] or color [H,W,C] (channel-averaged, the common
    convention). Matches skimage.metrics.structural_similarity with
    gaussian_weights=True to ~1e-3 (border handling differs slightly).
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim == 3:
        return float(
            np.mean([ssim(a[..., c], b[..., c], data_range, sigma, k1, k2)
                     for c in range(a.shape[-1])])
        )
    k = _gaussian_kernel1d(sigma)
    mu_a = _filter2d_sep(a, k)
    mu_b = _filter2d_sep(b, k)
    mu_aa = _filter2d_sep(a * a, k)
    mu_bb = _filter2d_sep(b * b, k)
    mu_ab = _filter2d_sep(a * b, k)
    va = mu_aa - mu_a * mu_a
    vb = mu_bb - mu_b * mu_b
    vab = mu_ab - mu_a * mu_b
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_a * mu_b + c1) * (2 * vab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    return float(np.mean(num / den))


def warp_backward(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Bilinear backward warp: out[y, x] = img[y + v, x + u].

    flow [H,W,2] is (u horizontal, v vertical) in pixels — the repo's
    flow convention (devc_tpu/data/flow.py), matching the reference's
    WarpingLayer sampling (utils/warping.py:16-30) with zero padding
    outside the frame.
    """
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    out = np.zeros_like(np.asarray(img, np.float64))
    img64 = np.asarray(img, np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy))
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = np.clip(xi, 0, w - 1)
            yi_c = np.clip(yi, 0, h - 1)
            contrib = img64[yi_c, xi_c] * np.where(valid, wgt, 0.0)[..., None] \
                if img.ndim == 3 else img64[yi_c, xi_c] * np.where(valid, wgt, 0.0)
            out += contrib
    return out


def temporal_warp_error(
    frames: "list[np.ndarray]",
    flows: "list[np.ndarray] | None" = None,
    masks: "list[np.ndarray] | None" = None,
) -> float:
    """Mean masked RMSE between frame t and frame t+1 warped back to t.

    frames: list of [H,W,C] uint8/float arrays (T >= 2).
    flows: optional list of T-1 forward flows t->t+1 ([H,W,2], (u,v)).
      Without flows, a zero flow is used — then this measures raw
      frame-difference stability (meaningful for near-static content).
    masks: optional occlusion masks (1 = valid), same convention as the
      training consistency loss (train.py:702-707).
    Lower is more temporally stable.
    """
    if len(frames) < 2:
        raise ValueError("need at least two frames")
    errs = []
    for t in range(len(frames) - 1):
        nxt = np.asarray(frames[t + 1], np.float64)
        if flows is not None:
            warped = warp_backward(nxt, np.asarray(flows[t], np.float64))
        else:
            warped = nxt
        diff2 = (warped - np.asarray(frames[t], np.float64)) ** 2
        if masks is not None:
            m = np.asarray(masks[t], np.float64)
            if m.ndim == diff2.ndim - 1:
                m = m[..., None]
            denom = max(float(m.sum()) * diff2.shape[-1], 1.0)
            errs.append(np.sqrt(float((diff2 * m).sum()) / denom))
        else:
            errs.append(np.sqrt(float(diff2.mean())))
    return float(np.mean(errs))
