"""VGG19 multi-scale feature extractor (frozen; Caffe-BGR preprocessing).

Functional re-design of the reference's VGG19_pytorch
(models/NonlocalNet.py:192-256): a plain conv stack with named ReLU taps.
Callers request activations by name ("r12", "r22", "r32", "r42", "r52", ...)
and the forward computes only as deep as the deepest requested tap — the
reference always runs all 16 convs and throws most away; we stop at r52.

Layout: NHWC activations, HWIO weights. Input is RGB in [0,1]; with
preprocess=True it is converted to mean-subtracted BGR*255
(reference utils/util.py:347-352) to match the Caffe-trained weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu import colorspace as cs
from devc_tpu.ops.layers import conv2d, conv_init
from devc_tpu.ops.resize import max_pool

# (name, in_ch, out_ch); pools sit between blocks.
_CFG = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256), ("conv3_4", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512), ("conv4_4", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512), ("conv5_4", 512, 512),
]

# tap name ("r<block><idx>") for each conv, in execution order, plus pool taps
_TAP_ORDER = []
for _name, _i, _o in _CFG:
    _TAP_ORDER.append("r" + _name[4] + _name[6])
VGG19_TAPS = tuple(_TAP_ORDER)

# execution schedule: ("conv", name, tap) and ("pool", block)
_SCHEDULE = []
_prev_block = "1"
for _name, _i, _o in _CFG:
    _blk = _name[4]
    if _blk != _prev_block:
        _SCHEDULE.append(("pool", _prev_block))
        _prev_block = _blk
    _SCHEDULE.append(("conv", _name, "r" + _name[4] + _name[6]))
_SCHEDULE.append(("pool", _prev_block))


def vgg19_init(key, dtype=jnp.float32):
    params = {}
    keys = jax.random.split(key, len(_CFG))
    for k, (name, in_ch, out_ch) in zip(keys, _CFG):
        params[name] = conv_init(k, in_ch, out_ch, 3, dtype=dtype)
    return params


def vgg19_extract(params, rgb, out_keys, preprocess: bool = True, pool: str = "max"):
    """Run VGG19 up to the deepest requested tap.

    Args:
      params: vgg19 param dict.
      rgb: NHWC RGB in [0,1] (if preprocess) or pre-processed BGR*255.
      out_keys: sequence of tap names ("r12", "p3", ...).
      pool: "max" (default, what the live path uses) or "avg".

    Returns list of activations in out_keys order.
    """
    x = cs.vgg_preprocess(rgb) if preprocess else rgb

    wanted = set(out_keys)
    # deepest schedule index needed
    last = 0
    for i, step in enumerate(_SCHEDULE):
        tap = step[2] if step[0] == "conv" else "p" + step[1]
        if tap in wanted:
            last = i

    taps = {}
    for i, step in enumerate(_SCHEDULE[: last + 1]):
        if step[0] == "conv":
            _, name, tap = step
            x = jax.nn.relu(conv2d(params[name], x, padding=1))
            taps[tap] = x
        else:
            if pool == "max":
                x = max_pool(x, 2)
            else:
                from devc_tpu.ops.resize import avg_pool

                x = avg_pool(x, 2)
            taps["p" + step[1]] = x
    return [taps[k] for k in out_keys]
