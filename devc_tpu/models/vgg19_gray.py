"""VGG19 finetuned-on-grayscale feature extractor.

Functional re-design of the reference models/vgg19_gray.py: a torchvision-
layout VGG19 trunk (weights from data/vgg19_gray.pth) sliced at relu3_1 /
relu4_1 / relu5_1 (plus relu2_1 in the "_new" variant), with ceil-mode max
pooling (reference vgg19_gray.py:86) — unlike the floor-mode pooling of the
main VGG19_pytorch extractor. Input is [LLL] grayscale replicated to RGB in
[0, 255].

Note: the reference loads the checkpoint at module import time
(vgg19_gray.py:128-135), a side effect we deliberately do not copy; loading
here is explicit via devc_tpu.utils.convert.vgg19_gray_from_torch. This
extractor is OFF the live inference path (WarpNet consumes VGG19_pytorch
features, reference models/FrameColor.py:6-10) and is provided for
capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu.ops.layers import conv2d, conv_init

# torchvision vgg19.features indices for the conv layers, in order
TORCHVISION_CONV_INDICES = (
    0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34,
)
_CHANNELS = [
    (3, 64), (64, 64),
    (64, 128), (128, 128),
    (128, 256), (256, 256), (256, 256), (256, 256),
    (256, 512), (512, 512), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512), (512, 512),
]
# conv index (0-based within the 16 convs) after which a pool sits
_POOL_AFTER = {1, 3, 7, 11}
# slice boundaries (reference vgg19_gray.py:145-150, 173-180): the relu
# outputs of conv2_1 (conv #2), conv3_1 (#4), conv4_1 (#8), conv5_1 (#12)


def vgg19_gray_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, 16)
    return {
        f"conv{i}": conv_init(k, ci, co, 3, dtype=dtype)
        for i, (k, (ci, co)) in enumerate(zip(keys, _CHANNELS))
    }


def _ceil_max_pool(x):
    """MaxPool2d(2, 2, ceil_mode=True): pad odd H/W with -inf then pool."""
    from jax import lax

    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return lax.reduce_window(
        x, -float("inf"), lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg19_gray_extract(params, x, include_r21: bool = False):
    """x: NHWC [LLL] in [0, 255]. Returns (relu3_1, relu4_1, relu5_1) or
    (relu2_1, relu3_1, relu4_1, relu5_1) with include_r21 (the reference's
    vgg19_gray vs vgg19_gray_new split, vgg19_gray.py:138-194)."""
    taps = {}
    for i in range(16):
        x = jax.nn.relu(conv2d(params[f"conv{i}"], x, padding=1))
        if i == 2:
            taps["r21"] = x
        if i == 4:
            taps["r31"] = x
        if i == 8:
            taps["r41"] = x
        if i == 12:
            taps["r51"] = x
            break
        if i in _POOL_AFTER:
            x = _ceil_max_pool(x)
    if include_r21:
        return taps["r21"], taps["r31"], taps["r41"], taps["r51"]
    return taps["r31"], taps["r41"], taps["r51"]
