"""Host-side (numpy) parameter initialization.

Device-side jax.random init dispatches one tiny program per layer — dozens
of remote round-trips on the tunneled TPU of this image. For random-weight
smoke/bench paths we initialize with numpy on the host (same
kaiming-uniform bounds as ops.layers.conv_init) and upload once.
"""

from __future__ import annotations

import math

import numpy as np


def _conv(rng, in_ch, out_ch, ksize, groups=1, bias=True):
    kh = kw = ksize if isinstance(ksize, int) else ksize[0]
    if not isinstance(ksize, int):
        kh, kw = ksize
    fan_in = (in_ch // groups) * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    p = {"w": rng.uniform(-bound, bound,
                          (kh, kw, in_ch // groups, out_ch)).astype(np.float32)}
    if bias:
        p["b"] = rng.uniform(-bound, bound, (out_ch,)).astype(np.float32)
    return p


def host_vgg19_init(seed=0):
    from devc_tpu.models.vgg19 import _CFG

    rng = np.random.RandomState(seed)
    return {n: _conv(rng, ci, co, 3) for n, ci, co in _CFG}


def host_warpnet_init(seed=1):
    rng = np.random.RandomState(seed)

    def pyr(ci, cm):
        return {
            "conv1": _conv(rng, ci, cm, 3),
            "prelu1": {"a": np.full((1,), 0.25, np.float32)},
            "conv2": _conv(rng, cm, 64, 3),
            "prelu2": {"a": np.full((1,), 0.25, np.float32)},
        }

    def res():
        return {
            "conv1": _conv(rng, 256, 256, 3),
            "conv2": _conv(rng, 256, 256, 3),
            "prelu": {"a": np.full((1,), 0.25, np.float32)},
        }

    return {
        "layer2_1": pyr(128, 128),
        "layer3_1": pyr(256, 128),
        "layer4_1": pyr(512, 256),
        "layer5_1": pyr(512, 256),
        "res": [res(), res(), res()],
        "theta": _conv(rng, 256, 256, 1),
        "phi": _conv(rng, 256, 256, 1),
    }


def host_colorvidnet_init(seed=2, in_ch=7):
    from devc_tpu.models.colorvidnet import _CONVS

    rng = np.random.RandomState(seed)
    out = {}
    for name, (ci, co, ks, g, b, _d) in _CONVS.items():
        if name == "conv1_1a":
            ci = in_ch
        out[name] = _conv(rng, ci, co, ks, groups=g, bias=b)
    return out


def host_pipeline_params(seed=0, in_ch=7):
    return {
        "vgg": host_vgg19_init(seed),
        "warpnet": host_warpnet_init(seed + 1),
        "colorvid": host_colorvidnet_init(seed + 2, in_ch),
    }
