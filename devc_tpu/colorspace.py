"""Device-side color-space conversions (pure jnp, NHWC layout).

The network operates in a shifted CIELAB space: L is centered by -50 so
L in [-50, 50]; a/b are raw in roughly [-128, 128]. This mirrors the
reference normalization (reference utils/util.py:15-18, 56-69 and the
Normalize transform in utils/util_distortion.py:85-92).

All functions take / return NHWC float arrays. The RGB<->Lab math follows
the standard sRGB / D65 CIELAB definitions (the same ones skimage
implements); lab_to_rgb additionally replicates the clamping behavior of
the reference's on-device converter (utils/util.py:379-414) because its
output feeds the frozen VGG network and parity there matters.
"""

from __future__ import annotations

import jax.numpy as jnp

# Shifted-Lab normalization constants (reference utils/util.py:17-18).
L_MEAN = 50.0
L_NORM = 1.0
AB_MEAN = 0.0
AB_NORM = 1.0

# sRGB <-> XYZ (D65) primaries. Standard colorimetry constants
# (reference utils/util.py:371-377 uses the same matrices).
_XYZ_FROM_RGB = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)
_RGB_FROM_XYZ = jnp.array(
    [
        [3.24048134, -1.53715152, -0.49853633],
        [-0.96925495, 1.87599, 0.04155593],
        [0.05564664, -0.20404134, 1.05731107],
    ],
    dtype=jnp.float32,
)
# D65 reference white.
_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)

# Caffe-VGG BGR channel means (reference utils/util.py:347-352).
_VGG_BGR_MEAN = jnp.array([0.40760392, 0.45795686, 0.48501961], dtype=jnp.float32)


def center_l(l):
    """L in [0,100] -> centered L in [-50, 50]."""
    return (l - L_MEAN) / L_NORM


def uncenter_l(l):
    """Centered L -> L in [0,100]."""
    return l * L_NORM + L_MEAN


def center_lab(lab):
    """Raw Lab (L in [0,100]) -> network Lab (L centered)."""
    return lab - jnp.array([L_MEAN, AB_MEAN, AB_MEAN], dtype=lab.dtype)


def uncenter_lab(lab):
    """Network Lab -> raw Lab (L in [0,100])."""
    return lab + jnp.array([L_MEAN, AB_MEAN, AB_MEAN], dtype=lab.dtype)


def srgb_to_linear(s):
    s = jnp.asarray(s)
    return jnp.where(s > 0.04045, ((s + 0.055) / 1.055) ** 2.4, s / 12.92)


def linear_to_srgb(lin):
    lin = jnp.asarray(lin)
    safe = jnp.maximum(lin, 1e-12)  # grad-safe pow
    return jnp.where(lin > 0.0031308, 1.055 * safe ** (1.0 / 2.4) - 0.055, lin * 12.92)


def _lab_f(t):
    t = jnp.asarray(t)
    safe = jnp.maximum(t, 1e-12)
    return jnp.where(t > 0.008856451679035631, jnp.cbrt(safe), 7.787 * t + 16.0 / 116.0)


def rgb_to_lab(rgb):
    """sRGB NHWC in [0,1] -> raw CIELAB (L in [0,100], ab ~ [-128,128]).

    Matches skimage.color.rgb2lab (the reference host-side transform,
    utils/util_distortion.py:18-23) to float32 precision.
    """
    lin = srgb_to_linear(rgb)
    xyz = lin @ _XYZ_FROM_RGB.T.astype(lin.dtype)
    xyz = xyz / _WHITE.astype(lin.dtype)
    f = _lab_f(xyz)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab):
    """Raw CIELAB NHWC -> sRGB in [0,1], clipped.

    Replicates the reference's differentiable on-device converter
    tensor_lab2rgb (utils/util.py:379-414) exactly, including:
      * z (from b) is clamped at 0 before the cube/linear branch,
      * the cube/linear split at f > 0.2068966,
      * final clipping of RGB into [0,1].
    """
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    y = (L + 16.0) / 116.0
    x = (a / 500.0) + y
    z = y - (b / 200.0)
    z = jnp.maximum(z, 0.0)
    f = jnp.stack([x, y, z], axis=-1)
    f3 = jnp.maximum(f, 1e-12) ** 3.0
    xyz = jnp.where(f > 0.2068966, f3, (f - 16.0 / 116.0) / 7.787)
    xyz = xyz * jnp.array([0.95047, 1.0, 1.08883], dtype=lab.dtype)
    rgb_lin = xyz @ _RGB_FROM_XYZ.T.astype(lab.dtype)
    srgb = jnp.where(
        rgb_lin > 0.0031308,
        1.055 * jnp.maximum(rgb_lin, 1e-12) ** (1.0 / 2.4) - 0.055,
        rgb_lin * 12.92,
    )
    return jnp.clip(srgb, 0.0, 1.0)


def lab_centered_to_rgb(lab_centered):
    """Network Lab (centered L) -> sRGB in [0,1]."""
    return lab_to_rgb(uncenter_lab(lab_centered))


def gray_to_rgb(l_centered):
    """Centered-L NHW1 -> pseudo-RGB NHW3 in [0,1].

    Mirrors gray2rgb_batch (reference utils/util.py:97-101): uncenter to
    [0,100], scale by 1/(2*50), replicate to three channels.
    """
    l01 = uncenter_l(l_centered) / (2.0 * L_MEAN)
    return jnp.concatenate([l01, l01, l01], axis=-1)


def vgg_preprocess(rgb):
    """RGB NHWC in [0,1] -> Caffe-style BGR*255 mean-subtracted.

    Mirrors vgg_preprocess (reference utils/util.py:347-352).
    """
    bgr = rgb[..., ::-1]
    return (bgr - _VGG_BGR_MEAN.astype(rgb.dtype)) * 255.0


def feature_normalize(feat, axis=-1, eps=2.220446049250313e-16):
    """L2-normalize features along `axis`.

    Mirrors feature_normalize (reference utils/util.py:155-158), which adds
    sys.float_info.epsilon to the norm (not under the sqrt).
    """
    norm = (
        jnp.linalg.norm(feat.astype(jnp.float32), ord=2, axis=axis,
                        keepdims=True).astype(feat.dtype) + eps
    )
    return feat / norm
