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


def sort_frames_numerically(names):
    """Sort frame filenames by the integer formed by their digits
    (reference test.py:41)."""

    def key(name):
        digits = "".join(ch for ch in name if ch.isdigit())
        return int(digits) if digits else -1

    return sorted(names, key=key)


def center_pad(img: Image.Image, size) -> Image.Image:
    """Aspect-preserving resize + center crop to (height, width)."""
    th, tw = size
    w, h = img.size
    target_ratio = th / tw
    if h / w == target_ratio:
        if h == th:
            return img
        return img.resize((tw, th), Image.BILINEAR)
    if h / w > target_ratio:
        # too tall: match width, crop height
        new_w = tw
        new_h = round(h * tw / w)
        img = img.resize((new_w, new_h), Image.BILINEAR)
        top = (new_h - th) // 2
        return img.crop((0, top, tw, top + th))
    # too wide: match height, crop width
    new_h = th
    new_w = round(w * th / h)
    img = img.resize((new_w, new_h), Image.BILINEAR)
    left = (new_w - tw) // 2
    return img.crop((left, 0, left + tw, th))


def center_crop(arr: np.ndarray, size):
    """Center crop an HWC / HW numpy array to (height, width)."""
    th, tw = size
    h, w = arr.shape[:2]
    top = (h - th) // 2
    left = (w - tw) // 2
    return arr[top : top + th, left : left + tw]


def load_frame_rgb(path: str, size) -> np.ndarray:
    """Decode + CenterPad + CenterCrop -> uint8 RGB [H, W, 3]."""
    img = Image.open(path).convert("RGB")
    img = center_pad(img, size)
    arr = np.asarray(img, dtype=np.uint8)
    return center_crop(arr, size)


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
