"""Core NN primitives (pure functions over param pytrees), NHWC layout.

Parameters are plain nested dicts of jnp arrays; conv weights are stored
HWIO (TPU-friendly). Semantics match the PyTorch layers the reference is
built from: Conv2d (cross-correlation, symmetric integer padding),
InstanceNorm2d(affine=False, eps=1e-5), PReLU (single shared slope),
ReflectionPad2d / replicate pad, LeakyReLU, and F.unfold.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def conv_init(key, in_ch: int, out_ch: int, ksize, groups: int = 1, bias: bool = True,
              dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.Conv2d defaults.

    torch uses kaiming_uniform(a=sqrt(5)) on OIHW weights -> bound =
    sqrt(1/fan_in); bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    if isinstance(ksize, int):
        kh = kw = ksize
    else:
        kh, kw = ksize
    fan_in = (in_ch // groups) * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (kh, kw, in_ch // groups, out_ch), dtype, -bound, bound
    )
    params = {"w": w}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return params


def conv2d(params, x, stride: int = 1, padding=0, dilation: int = 1, groups: int = 1):
    """NHWC conv with HWIO weights; torch Conv2d semantics.

    `padding`: int (symmetric), (ph, pw) tuple, or 'VALID'.
    """
    if padding == "VALID" or padding == 0:
        pad = [(0, 0), (0, 0)]
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        ph, pw = padding
        pad = [(ph, ph), (pw, pw)]
    out = lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False), NHWC: normalize each (n, c) plane.

    torch uses biased variance; eps inside the sqrt. Statistics are
    computed in float32 regardless of the activation dtype (bf16 spatial
    reductions lose too many mantissa bits); the result keeps x's dtype,
    so the bf16 fast path stays bf16 end to end.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def prelu_init(dtype=jnp.float32):
    return {"a": jnp.full((1,), 0.25, dtype)}


def prelu(params, x):
    """PReLU with a single shared learnable slope (torch default)."""
    a = params["a"].astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.maximum(x, 0) + negative_slope * jnp.minimum(x, 0)


def reflect_pad(x, pad: int):
    """ReflectionPad2d(pad) on NHWC spatial dims."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad(x, pad_h=(0, 0), pad_w=(0, 0)):
    """Replicate (edge) padding on NHWC spatial dims."""
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode="edge")


def unfold_patches(x, patch_size: int):
    """F.unfold equivalent: NHWC -> [N, H, W, C*patch*patch] local patches.

    Zero-pads by patch_size//2 so output spatial size equals input
    (matches find_local_patch, reference models/NonlocalNet.py:12-18).
    Channel-major ordering matches torch unfold: index = c*k*k + dy*k + dx.
    """
    pad = patch_size // 2
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # Extract shifted views; k*k is small (9) so this unrolls at trace time.
    views = []
    for dy in range(patch_size):
        for dx in range(patch_size):
            views.append(xp[:, dy : dy + h, dx : dx + w, :])
    # [N,H,W,k*k,C] -> reorder to channel-major [N,H,W,C,k*k]
    stacked = jnp.stack(views, axis=3)
    stacked = jnp.moveaxis(stacked, 3, 4)
    return stacked.reshape(n, h, w, c * patch_size * patch_size)
