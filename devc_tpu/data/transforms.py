"""Host-side geometric / color transforms for the feed pipeline.

The reference preprocesses each frame with
CenterPad -> CenterCrop -> RGB2Lab -> ToTensor -> Normalize
(reference test.py:44-46). Here the host only does decode + aspect-correct
resize/crop on uint8 (cheap, PIL) and ships uint8 RGB to the device; the
Lab conversion, x0.5 downscale and normalization happen inside the jitted
device program (devc_tpu.pipeline), minimizing host work and transfer size.

center_pad mirrors the aspect logic of the reference CenterPad
(utils/util_distortion.py:217-258): resize so the target aspect is filled,
center-crop the overflowing axis.
"""

from __future__ import annotations

import re

import numpy as np
from PIL import Image


# video containers accepted as clip input (shared by the CLIs — which
# must not import jax-bearing modules before their --platform switch —
# and by pipeline.video.is_video_file)
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def sort_frames_numerically(names):
    """Sort frame filenames by the integer formed by their digits
    (reference test.py:41)."""

    def key(name):
        digits = "".join(ch for ch in name if ch.isdigit())
        return int(digits) if digits else -1

    return sorted(names, key=key)


def list_clip_frames(clip_dir):
    """Numerically-sorted image frame names in a clip directory.

    Lives here (numpy-only module) so host-side CLIs like cli.evaluate can
    enumerate frames without importing jax-bearing pipeline modules, which
    would initialize the pinned single-process TPU backend."""
    import os

    names = [
        f
        for f in os.listdir(clip_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
    ]
    return sort_frames_numerically(names)


def resize_antialiased_np(img: np.ndarray, out_hw) -> np.ndarray:
    """Anti-aliased float64 resize with the exact semantics of the
    reference's host resize (skimage.transform.resize with
    anti_aliasing=True, mode='reflect', preserve_range=True, clip=False —
    reference utils/util_distortion.py:240,245,252): gaussian prefilter
    with sigma = (downscale_factor - 1)/2 per axis ('reflect' boundary =
    ndimage 'mirror'), then separable half-pixel bilinear
    (src = (dst + 0.5) * in/out - 0.5)."""
    from scipy.ndimage import gaussian_filter

    src = np.asarray(img)
    if src.dtype == np.uint8:
        # hot path: the native C++ kernel (same float64 math, ~5x faster
        # on this host); numpy fallback below when no compiler is available
        from devc_tpu.data.native import resize_aa_native

        out = resize_aa_native(src, out_hw)
        if out is not None:
            return out

    arr = np.asarray(img, dtype=np.float64)
    oh, ow = int(out_hw[0]), int(out_hw[1])
    fh, fw = arr.shape[0] / oh, arr.shape[1] / ow
    if fh > 1 or fw > 1:
        sigma = [max(0.0, (fh - 1) / 2), max(0.0, (fw - 1) / 2)]
        if arr.ndim == 3:
            sigma.append(0.0)
        arr = gaussian_filter(arr, sigma, mode="mirror")

    def axis_interp(a, axis, n_out):
        n_in = a.shape[axis]
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0, n_in - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        wgt = src - lo
        shape = [1] * a.ndim
        shape[axis] = n_out
        wgt = wgt.reshape(shape)
        return np.take(a, lo, axis=axis) * (1 - wgt) + np.take(
            a, hi, axis=axis
        ) * wgt

    arr = axis_interp(arr, 0, oh)
    return axis_interp(arr, 1, ow)


def center_pad(img: Image.Image, size) -> Image.Image:
    """Aspect-preserving resize + center crop to (height, width).

    Bit-matches the reference CenterPad (utils/util_distortion.py:217-258)
    including its quirks: resize sizes from int() truncation of the uniform
    scale factor, anti-aliased float resize, and a truncating (not
    rounding) uint8 cast of the float result.
    """
    th, tw = size
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    target_ratio = th / tw
    if h / w == target_ratio:
        if h == th:
            out = arr
        else:
            new_size = [int(x * th / h) for x in (h, w)]
            out = resize_antialiased_np(arr, new_size)
    elif h / w > target_ratio:
        # too tall: match width, crop height
        new_size = [int(x * tw / w) for x in (h, w)]
        resized = resize_antialiased_np(arr, new_size)
        top = (new_size[0] - th) // 2
        out = resized[top : top + th, :, :]
    else:
        # too wide: match height, crop width
        new_size = [int(x * th / h) for x in (h, w)]
        resized = resize_antialiased_np(arr, new_size)
        left = (new_size[1] - tw) // 2
        out = resized[:, left : left + tw, :]
    out = np.asarray(out).astype(np.uint8)  # truncation, as the reference
    if out.shape[2] == 1:
        out = out[:, :, 0]
    return Image.fromarray(out)


def center_crop(arr: np.ndarray, size):
    """Center crop an HWC / HW numpy array to (height, width)."""
    th, tw = size
    h, w = arr.shape[:2]
    top = (h - th) // 2
    left = (w - tw) // 2
    return arr[top : top + th, left : left + tw]


def centerpad_np(arr_u8: np.ndarray, size) -> np.ndarray:
    """CenterPad + CenterCrop on a decoded uint8 RGB array."""
    img = center_pad(Image.fromarray(arr_u8), size)
    return center_crop(np.asarray(img, dtype=np.uint8), size)


def load_frame_rgb(path: str, size) -> np.ndarray:
    """Decode + CenterPad + CenterCrop -> uint8 RGB [H, W, 3]."""
    img = center_pad(Image.open(path).convert("RGB"), size)
    return center_crop(np.asarray(img, dtype=np.uint8), size)


# --- numpy color helpers (used by the training data path; the inference
#     path converts on device via devc_tpu.colorspace) ---

_XYZ_FROM_RGB = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_WHITE = np.array([0.95047, 1.0, 1.08883])


def rgb_to_lab_np(rgb_uint8: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> float32 raw Lab (same math as skimage rgb2lab)."""
    s = rgb_uint8.astype(np.float64) / 255.0
    lin = np.where(s > 0.04045, ((s + 0.055) / 1.055) ** 2.4, s / 12.92)
    xyz = lin @ _XYZ_FROM_RGB.T / _WHITE
    f = np.where(xyz > 0.008856451679035631, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1).astype(np.float32)


def lab_to_network(lab: np.ndarray) -> np.ndarray:
    """Raw Lab -> network Lab (L centered by -50; reference Normalize)."""
    out = lab.astype(np.float32).copy()
    out[..., 0] -= 50.0
    return out
