"""GAN video critic with spectral normalization and self-attention.

Functional re-design of the reference Discriminator_x64 + Self_Attention +
SpectralNorm (models/GAN_models.py:68-157, models/spectral_normalization.py).
Input is a 6-channel pair [current Lab (uncentered L), last Lab]; six
spectrally-normalized stride-2 conv stages with a self-attention block after
stage 2; a [3,6]-kernel head global-avg-pooled to a logit. Returns
(logit [B,1], stage4 features) like the reference.

Spectral norm is stateful (power-iteration vectors u, v). In functional
style the apply returns (outputs, new_sn_state); training threads the state
through like optimizer state. One power iteration per forward, matching the
reference default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from devc_tpu.ops.layers import conv2d, conv_init, instance_norm, leaky_relu

_EPS = 1e-12

# name -> (in, out, kh, kw, stride, pad)
def _layers(in_size: int, ndf: int):
    return {
        "layer1": (in_size, ndf, 4, 4, 2, 1),
        "layer2": (ndf, ndf, 4, 4, 2, 1),
        "attn_q": (ndf, ndf, 1, 1, 1, 0),
        "attn_k": (ndf, ndf, 1, 1, 1, 0),
        "attn_v": (ndf, ndf, 1, 1, 1, 0),
        "layer3": (ndf, ndf * 2, 4, 4, 2, 1),
        "layer4": (ndf * 2, ndf * 4, 4, 4, 2, 1),
        "layer5": (ndf * 4, ndf * 8, 4, 4, 2, 1),
        "layer6": (ndf * 8, ndf * 16, 4, 4, 2, 1),
        "last": (ndf * 16, 1, 3, 6, 1, 0),
    }


def _l2n(v):
    return v / (jnp.linalg.norm(v) + _EPS)


def discriminator_init(key, in_size: int = 6, ndf: int = 64, dtype=jnp.float32):
    cfg = _layers(in_size, ndf)
    params = {"gamma": jnp.zeros((1,), dtype)}
    sn_state = {}
    keys = jax.random.split(key, 2 * len(cfg))
    for i, (name, (ci, co, kh, kw, s, p)) in enumerate(cfg.items()):
        params[name] = conv_init(keys[2 * i], ci, co, (kh, kw), dtype=dtype)
        width = ci * kh * kw
        ku, kv = jax.random.split(keys[2 * i + 1])
        sn_state[name] = {
            "u": _l2n(jax.random.normal(ku, (co,), dtype)),
            "v": _l2n(jax.random.normal(kv, (width,), dtype)),
        }
    return params, sn_state


def _sn_conv(params, sn, name, x, stride, pad, n_power: int = 1):
    """Spectral-normalized conv; returns (out, new_uv).

    Power iteration on the OIHW-flattened weight matrix (matches
    reference spectral_normalization.py:19-30). u/v updates carry no
    gradient; sigma does (w_bar / sigma with live w_bar).
    """
    w = params[name]["w"]  # HWIO
    kh, kw, ci, co = w.shape
    wmat = jnp.transpose(w, (3, 2, 0, 1)).reshape(co, ci * kh * kw)
    u, v = sn[name]["u"], sn[name]["v"]
    wmat_ng = jax.lax.stop_gradient(wmat)
    for _ in range(n_power):
        v = _l2n(wmat_ng.T @ u)
        u = _l2n(wmat_ng @ v)
    sigma = u @ (wmat @ v)
    p = {"w": w / sigma}
    if "b" in params[name]:
        p["b"] = params[name]["b"]
    out = conv2d(p, x, stride=stride, padding=pad)
    return out, {"u": jax.lax.stop_gradient(u), "v": jax.lax.stop_gradient(v)}


def _self_attention(params, sn, x, new_sn):
    """Self-attention block (reference GAN_models.py:68-101)."""
    b, h, w, c = x.shape
    q, new_sn["attn_q"] = _sn_conv(params, sn, "attn_q", x, 1, 0)
    k, new_sn["attn_k"] = _sn_conv(params, sn, "attn_k", x, 1, 0)
    v, new_sn["attn_v"] = _sn_conv(params, sn, "attn_v", x, 1, 0)
    n = h * w
    q = q.reshape(b, n, c)
    k = k.reshape(b, n, c)
    v = v.reshape(b, n, c)
    energy = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(energy, axis=-1)
    # reference: out = value @ attention^T  (torch bmm(proj_value, attn.permute(0,2,1)))
    out = jnp.einsum("bkc,bqk->bqc", v, attn)
    out = out.reshape(b, h, w, c)
    return params["gamma"] * out + x


def discriminator_apply(params, sn_state, x, n_power: int = 1):
    """x: [B, H, W, 6] -> (logit [B,1], feature4 NHWC, new_sn_state)."""
    new_sn = {}
    h1, new_sn["layer1"] = _sn_conv(params, sn_state, "layer1", x, 2, 1, n_power)
    h1 = leaky_relu(h1, 0.2)
    h2, new_sn["layer2"] = _sn_conv(params, sn_state, "layer2", h1, 2, 1, n_power)
    h2 = leaky_relu(instance_norm(h2), 0.2)
    ha = _self_attention(params, sn_state, h2, new_sn)
    h3, new_sn["layer3"] = _sn_conv(params, sn_state, "layer3", ha, 2, 1, n_power)
    h3 = leaky_relu(instance_norm(h3), 0.2)
    h4, new_sn["layer4"] = _sn_conv(params, sn_state, "layer4", h3, 2, 1, n_power)
    h4 = leaky_relu(instance_norm(h4), 0.2)
    h5, new_sn["layer5"] = _sn_conv(params, sn_state, "layer5", h4, 2, 1, n_power)
    h5 = leaky_relu(instance_norm(h5), 0.2)
    h6, new_sn["layer6"] = _sn_conv(params, sn_state, "layer6", h5, 2, 1, n_power)
    h6 = leaky_relu(instance_norm(h6), 0.2)
    # The [3,6] head matches the 216x384 train resolution exactly (stage-6
    # features are 3x6 there). Zero-pad smaller inputs up to the kernel so
    # the head is size-robust (identity at the canonical resolution).
    kh, kw = params["last"]["w"].shape[0], params["last"]["w"].shape[1]
    ph = max(0, kh - h6.shape[1])
    pw = max(0, kw - h6.shape[2])
    if ph or pw:
        h6 = jnp.pad(h6, ((0, 0), (0, ph), (0, pw), (0, 0)))
    out, new_sn["last"] = _sn_conv(params, sn_state, "last", h6, 1, 0, n_power)
    logit = jnp.mean(out, axis=(1, 2))  # global avg pool -> [B, 1]
    return logit, h4, new_sn
