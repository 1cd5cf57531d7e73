"""Training losses (reference train.py:578-728, models/ContextualLoss.py,
models/NonlocalNet.py:21-111, utils/util.py:154-242, utils/warping.py).

All pure jnp over NHWC tensors. Network-Lab conventions as elsewhere
(L centered by -50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu import colorspace as cs
from devc_tpu.ops.layers import unfold_patches
from devc_tpu.ops.resize import avg_pool, resize_bilinear

_EPS = 2.220446049250313e-16


# ---------------------------------------------------------------- basics
def mse(x, y=0.0):
    return jnp.mean(jnp.square(x - y))


def l1(x, y=0.0):
    return jnp.mean(jnp.abs(x - y))


def weighted_mse(x, y, w):
    """Per-element weighted MSE (reference utils/util.py:212-215)."""
    return jnp.mean(jnp.square(x - y) * w)


def weighted_l1(x, y, w):
    """Per-element weighted L1 (reference utils/util.py:218-221)."""
    return jnp.mean(jnp.abs(x - y) * w)


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def total_variation(x):
    """TV loss (reference utils/util.py:197-200)."""
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    return jnp.mean(jnp.square(dx)) + jnp.mean(jnp.square(dy))


def colorfulness(ab):
    """Hasler-Suesstrunk colourfulness on ab (reference utils/util.py:224-242)."""
    n = ab.shape[0]
    a = ab[..., 0].reshape(n, -1)
    b = ab[..., 1].reshape(n, -1)
    sig = jnp.sqrt(jnp.var(a, axis=-1, ddof=1) + jnp.var(b, axis=-1, ddof=1))
    mu = jnp.sqrt(jnp.mean(a, axis=-1) ** 2 + jnp.mean(b, axis=-1) ** 2)
    return sig + 0.37 * mu


# ---------------------------------------------------------- perceptual
def perceptual_loss(pred_feat, target_feat, domain_invariant: bool = False):
    """MSE between deepest VGG taps (reference train.py:638-647).

    domain_invariant applies instance norm to both sides first
    (with the reference's extra 1e5 * 0.2 weighting folded in by caller).
    """
    target_feat = jax.lax.stop_gradient(target_feat)
    if domain_invariant:
        from devc_tpu.ops.layers import instance_norm

        return mse(instance_norm(pred_feat), instance_norm(target_feat))
    return mse(pred_feat, target_feat)


# ---------------------------------------------------------- contextual
def contextual_loss(
    x_feat, y_feat, h: float = 0.1, direction: str = "forward",
    feature_centering: bool = True,
):
    """Contextual loss between NHWC feature maps
    (reference models/ContextualLoss.py:29-126).

    Cosine-distance affinity matrix between all feature-position pairs,
    row-normalized into a soft assignment; the loss is -log of the mean
    best-match affinity. direction="forward" maxes over y positions for
    each x (ContextualLoss_forward:125), "backward" maxes over x for each
    y (ContextualLoss:75). y (the exemplar) never receives gradient.
    """
    b = x_feat.shape[0]
    c = x_feat.shape[-1]
    x = x_feat.reshape(b, -1, c)
    y = jax.lax.stop_gradient(y_feat).reshape(b, -1, c)

    if feature_centering:
        y_mean = jnp.mean(y, axis=1, keepdims=True)
        x = x - y_mean
        y = y - y_mean

    # channel L2 normalize per position (feature_normalize semantics)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + _EPS)

    d = 1.0 - jnp.einsum("bxc,byc->bxy", x, y,
                         preferred_element_type=jnp.float32)
    # clamp: float error can push cosine similarity past 1, making d (and
    # d_min) slightly negative; d_min + 1e-5 then approaches zero and the
    # affinity exp overflows (a latent bug in the reference that TPU matmul
    # precision exposes at larger batches)
    d = jnp.maximum(d, 0.0)
    d_min = jnp.min(d, axis=-1, keepdims=True)
    d_norm = d / (d_min + 1e-5)
    # softmax form of w/sum(w) with w = exp((1-d_norm)/h): same value,
    # immune to overflow via the row-max subtraction
    a_ij = jax.nn.softmax((1.0 - d_norm) / h, axis=-1)

    if direction == "forward":
        cx = jnp.mean(jnp.max(a_ij, axis=-1), axis=1)
    else:
        cx = jnp.mean(jnp.max(a_ij, axis=1), axis=-1)
    return -jnp.log(cx)


def contextual_loss_multiscale(
    pred_feats, ref_feats, h: float = 0.1, direction: str = "forward"
):
    """The 3-scale contextual total (reference train.py:649-668):
    r52 x8 + r42 x4 + avgpool2(r32) x2.

    pred_feats / ref_feats: (r32, r42, r52) NHWC tuples.
    """
    p32, p42, p52 = pred_feats
    r32, r42, r52 = ref_feats
    c5 = jnp.mean(contextual_loss(p52, r52, h, direction)) * 8.0
    c4 = jnp.mean(contextual_loss(p42, r42, h, direction)) * 4.0
    c3 = jnp.mean(
        contextual_loss(avg_pool(p32, 2), avg_pool(r32, 2), h, direction)
    ) * 2.0
    return c5 + c4 + c3


# ---------------------------------------------------------- smoothness
def weighted_average(lab, patch_size: int = 3, alpha: float = 1.0):
    """Luminance-distance-weighted local average of ab (reference
    WeightedAverage, models/NonlocalNet.py:21-45; instantiated by train.py
    but never invoked — provided for capability parity)."""
    l = lab[..., 0:1]
    local_l = unfold_patches(l, patch_size)
    local_a = unfold_patches(lab[..., 1:2], patch_size)
    local_b = unfold_patches(lab[..., 2:3], patch_size)
    corr = jax.nn.softmax(-jnp.square(local_l - l) / alpha, axis=-1)
    return jnp.concatenate(
        [
            jnp.sum(corr * local_a, axis=-1, keepdims=True),
            jnp.sum(corr * local_b, axis=-1, keepdims=True),
        ],
        axis=-1,
    )


def weighted_average_color(lab_gt, lab_pred, patch_size: int = 3, alpha: float = 1.0):
    """Color-distance-weighted local average of the predicted ab
    (reference WeightedAverage_color, models/NonlocalNet.py:48-83).

    Weights are a softmax over the 3x3 neighborhood of the *ground-truth*
    Lab distance (L uncentered); they average the *predicted* ab.
    Returns [B, H, W, 2].
    """
    l = cs.uncenter_l(lab_gt[..., 0:1])
    a = lab_gt[..., 1:2]
    b = lab_gt[..., 2:3]
    a_p = lab_pred[..., 1:2]
    b_p = lab_pred[..., 2:3]

    k2 = patch_size * patch_size
    local_l = unfold_patches(l, patch_size)
    local_a = unfold_patches(a, patch_size)
    local_b = unfold_patches(b, patch_size)
    local_ap = unfold_patches(a_p, patch_size)
    local_bp = unfold_patches(b_p, patch_size)

    dist = (
        jnp.square(local_l - l)
        + jnp.square(local_a - a)
        + jnp.square(local_b - b)
    )
    corr = jax.nn.softmax(-dist / alpha, axis=-1)
    out_a = jnp.sum(corr * local_ap, axis=-1, keepdims=True)
    out_b = jnp.sum(corr * local_bp, axis=-1, keepdims=True)
    return jnp.concatenate([out_a, out_b], axis=-1)


def smoothness_loss(lab_gt, pred_ab, alpha: float = 10.0):
    """Pull prediction toward its color-weighted local average
    (reference train.py:670-680)."""
    lab_pred = jnp.concatenate([lab_gt[..., 0:1], pred_ab], axis=-1)
    target = weighted_average_color(lab_gt, lab_pred, 3, alpha)
    return mse(pred_ab, target)


def nonlocal_weighted_average(
    lab_pred, feature, patch_size: int = 3, alpha: float = 0.1, scale_factor=0.25
):
    """Nonlocal feature-correlation weighted average of predicted ab
    (reference NonlocalWeightedAverage, models/NonlocalNet.py:86-111)."""
    b, h, w, _ = lab_pred.shape
    oh, ow = int(h * scale_factor), int(w * scale_factor)
    lab_s = resize_bilinear(lab_pred, (oh, ow))
    feat_s = resize_bilinear(feature, (oh, ow))

    ab = lab_s[..., 1:3].reshape(b, oh * ow, 2)
    local_feat = unfold_patches(feat_s, patch_size).reshape(b, oh * ow, -1)
    corr = jnp.einsum("bxc,byc->bxy", local_feat, local_feat,
                      preferred_element_type=jnp.float32)
    corr = jax.nn.softmax(corr / alpha, axis=-1)
    weighted = jnp.einsum("bxy,byv->bxv", corr, ab)
    return weighted.reshape(b, oh, ow, 2), lab_s


def nonlocal_smoothness_loss(lab_pred, feature, alpha: float = 0.5,
                             scale_factor=0.25):
    """reference train.py:682-700 (weight 0 by default, kept for parity)."""
    weighted, lab_s = nonlocal_weighted_average(
        lab_pred, jax.lax.stop_gradient(feature), 3, alpha, scale_factor
    )
    return mse(lab_s[..., 1:3], weighted)


# ---------------------------------------------------------- temporal
def flow_warp(x, flow):
    """Warp NHWC x by pixel-space flow [B, H, W, 2] (u horizontal, v
    vertical), bilinear, zeros outside — matches the reference WarpingLayer
    (utils/warping.py:16-30: grid_sample, align_corners=True, zero pad).
    """
    b, h, w, c = x.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    grid_x = jnp.broadcast_to(xs[None, None, :], (b, h, w)) + flow[..., 0]
    grid_y = jnp.broadcast_to(ys[None, :, None], (b, h, w)) + flow[..., 1]

    x0 = jnp.floor(grid_x)
    y0 = jnp.floor(grid_y)
    wx = grid_x - x0
    wy = grid_y - y0

    def sample(yy, xx):
        valid = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = x[batch_idx, yi, xi]  # [B, H, W, C]
        return vals * valid[..., None].astype(x.dtype)

    out = (
        sample(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + sample(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + sample(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + sample(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


def consistency_loss(pred_lab_current, pred_ab_last, flow_forward, mask):
    """Temporal consistency (reference train.py:702-707): warp the current
    prediction by the forward flow, masked MSE against the last frame's
    prediction. mask: [B, H, W, 1] occlusion/validity weights."""
    warped = flow_warp(pred_lab_current, flow_forward)
    return weighted_mse(warped[..., 1:3], pred_ab_last, mask)


# ---------------------------------------------------------- GAN (RaLSGAN)
def _batch_mean(x, axis_name=None):
    """Mean over the batch — GLOBAL batch when running inside shard_map
    with `axis_name` set (the relativistic average couples samples across
    shards, so the inner mean must be a collective there; the reference's
    DataParallel gathers logits to one device, train.py:591-601, which
    has the same global-mean semantics)."""
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def ralsgan_d_loss(real_logits, fake_logits, axis_name=None):
    """Relativistic average LSGAN discriminator loss
    (reference train.py:594-599)."""
    y = 1.0
    return (
        jnp.mean(jnp.square(real_logits - _batch_mean(fake_logits, axis_name) - y))
        + jnp.mean(jnp.square(fake_logits - _batch_mean(real_logits, axis_name) + y))
    ) / 2.0


def ralsgan_g_loss(real_logits, fake_logits, axis_name=None):
    """Generator side (reference train.py:629-636)."""
    y = 1.0
    return (
        jnp.mean(jnp.square(real_logits - _batch_mean(fake_logits, axis_name) + y))
        + jnp.mean(jnp.square(fake_logits - _batch_mean(real_logits, axis_name) - y))
    ) / 2.0
