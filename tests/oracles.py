"""Import the reference PyTorch implementation as a numerical oracle.

The reference at /root/reference is used read-only, at test time only, to
check numerical parity of our from-scratch JAX modules. Several of its
imports are unavailable in this image (skimage, torchvision, numba) and one
module loads a missing checkpoint at import time (models/vgg19_gray.py:128),
so we install lightweight stubs before importing.

Nothing from the reference is vendored or copied into the framework itself.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


# --- functional colorspace stubs (numpy float64, D65/2deg, the standard
# CIE math skimage implements; written independently for test use only) ---

_XYZ_FROM_RGB = [
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
]
_WHITE = (0.95047, 1.0, 1.08883)


def _np_rgb2lab(rgb):
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.float64)
    if rgb.dtype != np.float64 or rgb.max() > 1.0 + 1e-9:
        rgb = rgb / 255.0
    lin = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    xyz = lin @ np.asarray(_XYZ_FROM_RGB).T
    xyz = xyz / np.asarray(_WHITE)
    eps = (6.0 / 29.0) ** 3
    f = np.where(xyz > eps, np.cbrt(xyz), xyz / (3 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lab = np.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], -1)
    return lab


def _np_lab2rgb(lab):
    import numpy as np

    lab = np.asarray(lab, dtype=np.float64)
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    delta = 6.0 / 29.0
    finv = lambda f: np.where(f > delta, f**3, 3 * delta**2 * (f - 4.0 / 29.0))
    xyz = np.stack([finv(fx), finv(fy), finv(fz)], -1) * np.asarray(_WHITE)
    lin = xyz @ np.linalg.inv(np.asarray(_XYZ_FROM_RGB)).T
    srgb = np.where(
        lin > 0.0031308, 1.055 * np.maximum(lin, 1e-12) ** (1 / 2.4) - 0.055,
        12.92 * lin,
    )
    return np.clip(srgb, 0.0, 1.0)


def _np_sk_resize(image, output_shape, anti_aliasing=True, mode="reflect",
                  preserve_range=True, clip=False, order=1, **kw):
    """skimage.transform.resize semantics in numpy float64: optional
    gaussian anti-aliasing prefilter with sigma=(downscale_factor-1)/2
    (skimage 'reflect' boundary = ndimage 'mirror'), then separable
    half-pixel bilinear (src = (dst+0.5)*factor - 0.5)."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    img = np.asarray(image, dtype=np.float64)
    out_shape = tuple(int(s) for s in output_shape)
    spatial = len(out_shape)
    factors = [img.shape[i] / out_shape[i] for i in range(spatial)]
    if anti_aliasing and any(f > 1 for f in factors):
        sigma = [max(0.0, (f - 1) / 2) for f in factors]
        if img.ndim > spatial:
            sigma = sigma + [0.0] * (img.ndim - spatial)
        img = gaussian_filter(img, sigma, mode="mirror")

    def axis_interp(arr, axis, n_out):
        n_in = arr.shape[axis]
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0, n_in - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        w = src - lo
        a = np.take(arr, lo, axis=axis)
        b = np.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return a * (1 - w) + b * w

    out = img
    for ax in range(spatial):
        out = axis_interp(out, ax, out_shape[ax])
    if clip:
        out = np.clip(out, img.min(), img.max())
    return out


_installed = False


def install_reference(path: str = REFERENCE_ROOT):
    """Set up sys.path + dependency stubs so reference modules import."""
    global _installed
    if _installed:
        return
    if path not in sys.path:
        sys.path.insert(0, path)

    import torch

    # --- skimage stub (only the call surfaces the reference touches) ---
    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("skimage stub: not needed for oracle tests")

    sk = _stub_module("skimage")
    sk_color = _stub_module("skimage.color", rgb2lab=_np_rgb2lab, lab2rgb=_np_lab2rgb)
    sk_io = _stub_module("skimage.io", imsave=_unavailable, imread=_unavailable)
    sk_draw = _stub_module("skimage.draw", random_shapes=_unavailable)
    sk_filters = _stub_module("skimage.filters", gaussian=_unavailable)
    sk_transform = _stub_module("skimage.transform", resize=_np_sk_resize)
    sk.color, sk.io, sk.draw, sk.filters, sk.transform = (
        sk_color, sk_io, sk_draw, sk_filters, sk_transform,
    )

    # --- torchvision stub (functional where the live inference path needs
    # it: CenterCrop on PIL images in test.py:44, make_grid on B=1 batches
    # in batch_lab2rgb_transpose_mc) ---
    tv = _stub_module("torchvision")

    def _make_grid(t, nrow=8, **k):
        # torchvision returns single images unchanged (no border)
        if t.dim() == 4 and t.size(0) == 1:
            return t[0]
        raise RuntimeError("make_grid stub: only B=1 supported")

    tv_utils = _stub_module("torchvision.utils", make_grid=_make_grid)

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _CenterCrop:
        """torchvision CenterCrop semantics on PIL images."""

        def __init__(self, size):
            if isinstance(size, int):
                size = (size, size)
            self.size = tuple(size)  # (h, w)

        def __call__(self, img):
            th, tw = self.size
            w, h = img.size
            left = int(round((w - tw) / 2.0))
            top = int(round((h - th) / 2.0))
            return img.crop((left, top, left + tw, top + th))

    tv_transforms = _stub_module(
        "torchvision.transforms",
        Compose=lambda fns: _Identity(),
        Lambda=_Identity,
        Normalize=_Identity,
        ToPILImage=_Identity,
        CenterCrop=_CenterCrop,
        RandomHorizontalFlip=_Identity,
        RandomResizedCrop=_Identity,
    )
    tv_models = _stub_module("torchvision.models", vgg19=_unavailable)
    tv.utils, tv.transforms, tv.models = tv_utils, tv_transforms, tv_models

    # --- numba stub ---
    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]):
            return a[0]
        return lambda f: f

    _stub_module("numba", jit=_jit, u1=lambda x: x, u2=lambda x: x)

    # --- models.vgg19_gray stub (real module loads a missing .pth at import,
    #     reference models/vgg19_gray.py:128-135; it is off the live path) ---
    _stub_module(
        "models.vgg19_gray",
        vgg19_gray=lambda *a, **k: None,
        vgg19_gray_new=lambda *a, **k: None,
    )

    _installed = True


def reference_module(name: str):
    """Import a reference module (e.g. 'models.NonlocalNet') with stubs."""
    install_reference()
    import importlib

    return importlib.import_module(name)


_driver_mod = None


def reference_test_driver():
    """Import the reference's inference CLI module (test.py) so its
    colorize_video driver (test.py:29-125) can run end-to-end on CPU.

    Beyond install_reference() this needs:
    * torch.cuda no-ops (test.py calls set_device at import and .cuda()
      on every tensor/module);
    * a cv2.ximgproc identity stub — cv2 in this image lacks ximgproc, so
      the WLS filter becomes a pass-through (compare against our pipeline
      with wls=False).
    """
    global _driver_mod
    if _driver_mod is not None:
        return _driver_mod
    install_reference()

    import cv2
    import torch

    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.is_available = lambda: False
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if not hasattr(cv2, "ximgproc"):
        class _IdentityFilter:
            def filter(self, x):
                return x

        ximgproc = types.ModuleType("cv2.ximgproc")
        ximgproc.createFastGlobalSmootherFilter = (
            lambda guide, lam, sigma: _IdentityFilter()
        )
        cv2.ximgproc = ximgproc

    import importlib

    _driver_mod = importlib.import_module("test")
    return _driver_mod
