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
    sk_color = _stub_module("skimage.color", rgb2lab=_unavailable, lab2rgb=_unavailable)
    sk_io = _stub_module("skimage.io", imsave=_unavailable, imread=_unavailable)
    sk_draw = _stub_module("skimage.draw", random_shapes=_unavailable)
    sk_filters = _stub_module("skimage.filters", gaussian=_unavailable)
    sk_transform = _stub_module("skimage.transform", resize=_unavailable)
    sk.color, sk.io, sk.draw, sk.filters, sk.transform = (
        sk_color, sk_io, sk_draw, sk_filters, sk_transform,
    )

    # --- torchvision stub (make_grid used by log helpers only) ---
    tv = _stub_module("torchvision")
    tv_utils = _stub_module("torchvision.utils", make_grid=_unavailable)

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv_transforms = _stub_module(
        "torchvision.transforms",
        Compose=lambda fns: _Identity(),
        Lambda=_Identity,
        Normalize=_Identity,
        ToPILImage=_Identity,
        CenterCrop=_Identity,
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
