"""ColorVidNet — the recurrent colorization generator.

Functional re-design of the reference ColorVidNet (models/ColorVidNet.py:
6-144): a U-Net-style CNN over a 7-channel input
[L(1), warped_ab(2), similarity(1), prev_frame_lab(3)] producing the ab
channels. Ten conv stages; downsampling is a learned per-channel 1x1
stride-2 conv applied to the InstanceNorm'd activation ("*norm_ss"),
stages 5-6 use dilation-2 convs, upsampling is nearest x2 + conv with
additive skip connections from the norm'd encoder activations, output is
tanh(.) * 128. All norms are InstanceNorm (affine=False).

NHWC activations / HWIO weights; params are a flat dict keyed by the
reference layer names so checkpoint conversion is mechanical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

import os

from devc_tpu.ops.dilated import (
    apply_mask,
    batch_to_space2,
    instance_norm_s2b,
    space_to_batch2,
)
from devc_tpu.ops.layers import conv2d, conv_init, instance_norm, leaky_relu
from devc_tpu.ops.resize import upsample_nearest

# Dilation-2 stages 5-6 lowering. The space-to-batch alternative
# (ops/dilated.py: parity sub-grids stacked along batch so the six dilated
# convs become regular 3x3 convs) is numerically exact, but the round-4
# chip A/B REFUTED the hypothesis that rhs_dilation>1 lowers poorly on
# TPU: direct dilated is faster at both net resolutions, isolated AND
# whole-pipeline (canonical dated record: BASELINE.md round-4 table row
# "Dilated-conv lowering A/B", 2026-08-18). Default is the direct
# lowering; DEVC_DILATED_S2B=1 opts into space-to-batch for re-testing
# on other chip generations.
_DILATED_S2B = os.environ.get("DEVC_DILATED_S2B", "") == "1"

# name -> (in, out, ksize, groups, bias, dilation)
_CONVS = {
    "conv1_1a": (7, 32, 3, 1, True, 1),  # reference conv1_1.0
    "conv1_1b": (32, 64, 3, 1, True, 1),  # reference conv1_1.2
    "conv1_2": (64, 64, 3, 1, True, 1),
    "conv1_2norm_ss": (64, 64, 1, 64, False, 1),
    "conv2_1": (64, 128, 3, 1, True, 1),
    "conv2_2": (128, 128, 3, 1, True, 1),
    "conv2_2norm_ss": (128, 128, 1, 128, False, 1),
    "conv3_1": (128, 256, 3, 1, True, 1),
    "conv3_2": (256, 256, 3, 1, True, 1),
    "conv3_3": (256, 256, 3, 1, True, 1),
    "conv3_3norm_ss": (256, 256, 1, 256, False, 1),
    "conv4_1": (256, 512, 3, 1, True, 1),
    "conv4_2": (512, 512, 3, 1, True, 1),
    "conv4_3": (512, 512, 3, 1, True, 1),
    "conv5_1": (512, 512, 3, 1, True, 2),
    "conv5_2": (512, 512, 3, 1, True, 2),
    "conv5_3": (512, 512, 3, 1, True, 2),
    "conv6_1": (512, 512, 3, 1, True, 2),
    "conv6_2": (512, 512, 3, 1, True, 2),
    "conv6_3": (512, 512, 3, 1, True, 2),
    "conv7_1": (512, 512, 3, 1, True, 1),
    "conv7_2": (512, 512, 3, 1, True, 1),
    "conv7_3": (512, 512, 3, 1, True, 1),
    "conv8_1": (512, 256, 3, 1, True, 1),  # after nearest x2
    "conv3_3_short": (256, 256, 3, 1, True, 1),
    "conv8_2": (256, 256, 3, 1, True, 1),
    "conv8_3": (256, 256, 3, 1, True, 1),
    "conv9_1": (256, 128, 3, 1, True, 1),  # after nearest x2
    "conv2_2_short": (128, 128, 3, 1, True, 1),
    "conv9_2": (128, 128, 3, 1, True, 1),
    "conv10_1": (128, 128, 3, 1, True, 1),  # after nearest x2
    "conv1_2_short": (64, 128, 3, 1, True, 1),
    "conv10_2": (128, 128, 3, 1, True, 1),
    "conv10_ab": (128, 2, 1, 1, True, 1),
}


def colorvidnet_init(key, in_ch: int = 7, dtype=jnp.float32):
    params = {}
    keys = jax.random.split(key, len(_CONVS))
    for k, (name, (ci, co, ks, g, b, _d)) in zip(keys, _CONVS.items()):
        if name == "conv1_1a":
            ci = in_ch
        params[name] = conv_init(k, ci, co, ks, groups=g, bias=b, dtype=dtype)
    return params


def _c(params, name, x, relu=True):
    ci, co, ks, g, b, d = _CONVS[name]
    pad = d if ks == 3 else 0
    y = conv2d(params[name], x, padding=pad, dilation=d, groups=g)
    return jax.nn.relu(y) if relu else y


def _down(params, name, x):
    """Learned per-channel 1x1 stride-2 downsample (the *_ss convs).

    A fully-depthwise 1x1 stride-2 conv IS a strided slice times a
    per-channel scalar — expressed that way directly so XLA fuses it into
    the neighboring elementwise chain instead of lowering a C-group conv
    of 1x1x1 matmuls (identical values: out[b,i,j,c] = w[c]*x[b,2i,2j,c]).
    """
    ci, co, ks, g, b, d = _CONVS[name]
    w = params[name]["w"]  # HWIO [1, 1, 1, C]
    return x[:, ::2, ::2, :] * w.reshape(1, 1, 1, co).astype(x.dtype)


def _down_into(params, ss_name, conv_name, x):
    """Fused *_ss downsample + the following 3x3 conv, as ONE conv.

    The reference encoder boundary is `conv(w_ss[c] * n[:, ::2, ::2, :])`
    (reference ColorVidNet.py:99-101,105-107,111-113 + :96's *_ss convs).
    Over the decimated grid that 3x3 SAME conv taps decimated rows
    {i-1, i, i+1} = full-plane rows {2i-2, 2i, 2i+2}, and its zero padding
    corresponds to full-plane padding 2 (odd offsets are never sampled) —
    i.e. it IS a stride-2, rhs-dilation-2 3x3 conv on the full plane, with
    the per-channel *_ss scale folded into the conv weights. Doing it that
    way skips materializing the decimated plane and the stride-2 slice's
    sublane repack, which probes/ab_enc1_in.py measured at ~2.4 ms/frame
    of enc1's 3.8 ms at net 432x768 (the IN arithmetic itself was only
    ~0.6 ms). Exact up to fp association of the weight scale.
    """
    s = params[ss_name]["w"].reshape(-1)  # depthwise 1x1 HWIO -> [C]
    p = params[conv_name]
    w = p["w"] * s[None, None, :, None]
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(2, 2),
        padding=[(2, 2), (2, 2)],
        rhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + p["b"].astype(y.dtype))


def _enc1_direct(params, x):
    c1 = jax.nn.relu(_c(params, "conv1_1b", _c(params, "conv1_1a", x)))
    return jax.nn.relu(_c(params, "conv1_2", c1, relu=False))


def _enc1_strips(params, x, n_strips: int):
    """Stage-1 conv chain via exact height-strip batching (ops/strips.py).

    Batch-1 full-plane convs keep batch in VREG sublanes on TPU (1/8
    occupancy); running the three stage-1 convs over S row bands at
    batch S restores the sublane packing XLA's space-to-batch pass
    would have provided. Numerically exact vs _enc1_direct (interior
    halos carry real rows; out-of-image rows are re-zeroed per level).
    """
    from devc_tpu.ops.strips import extract_strips, merge_strips, strip_mask

    h = x.shape[1]
    xs = extract_strips(x, n_strips, 3)
    y = jax.nn.relu(conv2d(params["conv1_1a"], xs, padding=(0, 1)))
    y = y * strip_mask(h, n_strips, 2, y.dtype)
    y = jax.nn.relu(conv2d(params["conv1_1b"], y, padding=(0, 1)))
    y = y * strip_mask(h, n_strips, 1, y.dtype)
    y = jax.nn.relu(conv2d(params["conv1_2"], y, padding=(0, 1)))
    return merge_strips(y)


def colorvidnet_apply(params, x, enc1_strips: int = 0,
                      fused_down: bool | None = None):
    """x: [B, H, W, 7] -> ab: [B, H, W, 2] in [-128, 128].

    enc1_strips > 0 runs the stage-1 conv chain height-strip-batched
    (batch-1 inputs only; exact — see _enc1_strips).
    fused_down folds each *_ss strided downsample into the following
    3x3 conv (see _down_into; exact up to fp association). Default:
    on for TPU, off elsewhere — the decimated-plane materialization it
    removes is a TPU sublane-layout cost (probes/ab_enc1_in.py).
    """
    if fused_down is None:
        fused_down = jax.default_backend() == "tpu"
    if enc1_strips and x.shape[0] == 1:
        c1 = _enc1_strips(params, x, enc1_strips)
    else:
        c1 = _enc1_direct(params, x)
    n1 = instance_norm(c1)

    if fused_down:
        c2 = _down_into(params, "conv1_2norm_ss", "conv2_1", n1)
    else:
        c2 = _c(params, "conv2_1", _down(params, "conv1_2norm_ss", n1))
    c2 = jax.nn.relu(_c(params, "conv2_2", c2, relu=False))
    n2 = instance_norm(c2)

    if fused_down:
        c3 = _down_into(params, "conv2_2norm_ss", "conv3_1", n2)
    else:
        c3 = _c(params, "conv3_1", _down(params, "conv2_2norm_ss", n2))
    c3 = _c(params, "conv3_2", c3)
    c3 = _c(params, "conv3_3", c3)
    n3 = instance_norm(c3)

    if fused_down:
        c4 = _down_into(params, "conv3_3norm_ss", "conv4_1", n3)
    else:
        c4 = _c(params, "conv4_1", _down(params, "conv3_3norm_ss", n3))
    c4 = _c(params, "conv4_2", c4)
    c4 = _c(params, "conv4_3", c4)
    h = instance_norm(c4)

    if _DILATED_S2B:
        hs, mask, hw = space_to_batch2(h)
        for stage in ("conv5", "conv6"):
            for layer in ("_1", "_2", "_3"):
                y = conv2d(params[stage + layer], hs, padding=1)
                hs = apply_mask(jax.nn.relu(y), mask)
            hs = instance_norm_s2b(hs, hw, mask)
        h = batch_to_space2(hs, hw)
    else:
        for stage in ("conv5", "conv6"):
            h = _c(params, f"{stage}_1", h)
            h = _c(params, f"{stage}_2", h)
            h = _c(params, f"{stage}_3", h)
            h = instance_norm(h)

    h = _c(params, "conv7_1", h)
    h = _c(params, "conv7_2", h)
    h = _c(params, "conv7_3", h)
    h = instance_norm(h)

    # decoder with additive skips (reference :127-141)
    u8 = _c(params, "conv8_1", upsample_nearest(h, 2), relu=False)
    s8 = _c(params, "conv3_3_short", n3, relu=False)
    h = jax.nn.relu(u8 + s8)
    h = _c(params, "conv8_2", h)
    h = _c(params, "conv8_3", h)
    h = instance_norm(h)

    u9 = _c(params, "conv9_1", upsample_nearest(h, 2), relu=False)
    s9 = _c(params, "conv2_2_short", n2, relu=False)
    h = jax.nn.relu(u9 + s9)
    h = _c(params, "conv9_2", h)
    h = instance_norm(h)

    u10 = _c(params, "conv10_1", upsample_nearest(h, 2), relu=False)
    s10 = _c(params, "conv1_2_short", n1, relu=False)
    h = jax.nn.relu(u10 + s10)
    h = leaky_relu(_c(params, "conv10_2", h, relu=False), 0.2)

    ab = _c(params, "conv10_ab", h, relu=False)
    return jnp.tanh(ab) * 128.0
